package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Skew

/** A/B for the r11 verdict ask #2: with the banding quadratic gone,
  * q166's top term is the LINEAR `simhash128` fingerprint projection
  * (1,329 task-sec at ×1000 — an md5 digest per 3-token shingle). This
  * bench prices the md5 form against `simhash128mix` (poly-31 +
  * multiply-shift lanes, XOR-free so a DuckDB mirror stays pure
  * integer SQL) on a real corpus:
  *
  *   - wall seconds for the full fingerprint projection (noop sink,
  *     min over repeats, uncounted warmup pass) per kernel;
  *   - the banding-pair yield of each kernel (same 8×16 banding, same
  *     hamming ≤ 12 verify) — the two fingerprint families must find
  *     a comparable near-dup pair set for the cheaper kernel to be a
  *     candidate at all (SimHash recall lives in the hash bits'
  *     uniformity, which is exactly what the A/B could degrade).
  *
  * `runMain graft.MixerBench <sfDir> [repeats]` — one JSON line per
  * form plus a pair-yield line. Evidence lands in STREAM_r{N}.jsonl;
  * verdict and adoption decision in SCALE.md r12.
  */
object MixerBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val repeats = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.functions.VectorExpressions.register(spark)
    val nShuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      (2 * Runtime.getRuntime.availableProcessors()).toString)
    spark.conf.set("spark.sql.shuffle.partitions", nShuffle)

    def project(kernel: String): DataFrame =
      Tables.documents(spark, dir)
        .selectExpr("doc_id", s"$kernel(text) as fp")
        .filter(col("fp").isNotNull)

    // the checksum aggregate forces every fingerprint to evaluate while
    // keeping the measured plan scan→project→partial-agg (no exchange
    // noise in a kernel A/B)
    def time(kernel: String): Double = {
      val t0 = System.nanoTime()
      project(kernel)
        .selectExpr("sum(fp[0] + fp[1] + fp[2] + fp[3]) as checksum")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def pairs(kernel: String): Long = {
      val chunks = (0 until 4).map(c => s"c$c")
      val fp = project(kernel)
        .select(col("doc_id") +: (0 until 4).map(c =>
          col("fp").getItem(c).as(s"c$c")): _*)
        .transform(CacheScope.scoped)
      val bands = fp
        .select(col("doc_id") +: chunks.map(col) :+
          explode(expr("sequence(0, 7)")).as("b"): _*)
        .withColumn("bv", expr(
          "shiftright(CASE WHEN b < 2 THEN c0 WHEN b < 4 THEN c1 " +
            "WHEN b < 6 THEN c2 ELSE c3 END, 16 * (b % 2)) & 65535"))
      val n = Skew.selfPairs(bands, "doc_id", Seq("b", "bv"), payloadCols = chunks)
        .select(col("a_id"), col("b_id"),
          expr("cast(bit_count(a_c0 ^ b_c0) + bit_count(a_c1 ^ b_c1) " +
            "+ bit_count(a_c2 ^ b_c2) + bit_count(a_c3 ^ b_c3) as bigint)")
            .as("hamming"))
        .filter(col("hamming") <= 12)
        .distinct()
        .count()
      CacheScope.drain(); spark.catalog.clearCache()
      n
    }

    val forms = Seq("simhash128", "simhash128mix")
    // uncounted JIT/codegen warmup on the small slice
    forms.foreach { k => try time(k) catch { case _: Throwable => () } }
    val walls = forms.map { k =>
      k -> (1 to repeats).map(_ => time(k)).min
    }
    val yields = forms.map(k => k -> pairs(k))
    walls.foreach { case (k, sec) =>
      println(f"""{"metric":"mixer_bench","kernel":${Json.str(k)},"sec":$sec%.2f,"repeats":$repeats,"sf":${Json.str(dir)}}""")
    }
    yields.foreach { case (k, n) =>
      println(s"""{"metric":"mixer_pair_yield","kernel":${Json.str(k)},"pairs":$n,"sf":${Json.str(dir)}}""")
    }
    spark.stop()
  }
}
