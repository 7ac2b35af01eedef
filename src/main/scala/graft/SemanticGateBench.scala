package graft

import org.apache.spark.sql.functions._

import graft.stream.StreamingCuration

/** Throughput figure for the streaming SEMANTIC near-dup gate alone
  * (CurationStreamBench leg 3, runnable against an embeddings-only
  * dir): build the static IVF-PQ index over the dir's embeddings,
  * stream those same embeddings (ids offset past the corpus, so every
  * doc has an exact twin in the index — worst-case flag rate) through
  * [[StreamingCuration.runSemanticGate]] in file micro-batches, and
  * print one JSON line with docs/s.
  *
  * The number this bench prices is the IVF geometry: per query the
  * probed ADC scan touches ~corpus·nprobe/nlist code rows, so the
  * LABEL CARDINALITY of the corpus is the throughput dial — the
  * driver testdata's 10 labels make the gate scan 20% of the corpus
  * per doc (the pathological-nlist point, measured 64 docs/s against
  * 60k vectors), while a ClusteredGen corpus with √n components is
  * the production posture (FAISS's nlist ≈ √n rule). Run both to see
  * the dial, not one number.
  *
  * `runMain graft.SemanticGateBench <dir> [perTrigger=8] [maxDistX1000=1000]`
  */
object SemanticGateBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val perTrigger = args.lift(1).map(_.toInt).getOrElse(8)
    val maxDist = args.lift(2).map(_.toInt).getOrElse(1000) / 1000.0
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val root = java.nio.file.Files.createTempDirectory("graft_semgate").toString
    val emb = Tables.embeddings(spark, dir)
    val nVec = emb.count()
    val nLabels = emb.select(countDistinct("label")).head.getLong(0)

    val t0 = System.nanoTime()
    val idx = StreamingCuration.semanticIndex(emb)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val src = s"$root/src"
    emb.select((col("vec_id") + 1000000000L).as("doc_id"), col("embedding"))
      .repartitionByRange(32, col("doc_id"))
      .write.parquet(src)
    val parts = new java.io.File(src).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val nowMs = System.currentTimeMillis()
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(nowMs - (parts.length - i) * 1000L)
    }
    val schema = spark.read.parquet(src).schema

    val t1 = System.nanoTime()
    val q = StreamingCuration.runSemanticGate(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", perTrigger).parquet(src),
      idx, maxDist, s"$root/lake", s"$root/ckpt")
    q.awaitTermination()
    val gateSec = (System.nanoTime() - t1) / 1e9
    val verdicts = spark.read.parquet(s"$root/lake")
      .groupBy("verdict").agg(count(lit(1)).as("n"))
      .collect().map(r => s""""${r.getString(0)}":${r.getLong(1)}""")
      .sorted.mkString("{", ",", "}")
    println(
      s"""{"metric":"semantic_gate","docs":$nVec,"index_vectors":$nVec,""" +
        s""""n_labels":$nLabels,"build_sec":${f"$buildSec%.1f"},""" +
        s""""wall_sec":${f"$gateSec%.1f"},"docs_per_sec":${(nVec / gateSec).toInt},""" +
        s""""max_dist":$maxDist,"verdicts":$verdicts}""")
    graft.stream.OrderlyShutdown.stop(spark)
  }
}
