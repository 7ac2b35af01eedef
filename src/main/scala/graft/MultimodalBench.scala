package graft

import org.apache.spark.sql.functions._

import graft.ext.MultimodalStub

/** Real-decode soak for the multimodal codec seam (round-10 verdict
  * ask #8): the `imageio` path was spec'd against a golden PNG but
  * never PRICED at soak scale — only the stub had a throughput number.
  * `runMain graft.MultimodalBench [nAssets] [side]` generates nAssets
  * REAL PNG payloads on the executors (deterministic per-id RGB
  * pattern, encoded through javax.imageio — so the decode input is a
  * genuine compressed bitstream, not text bytes), materializes them,
  * then runs the SAME batched decode pipeline ([[MultimodalStub
  * .features]], `grouped(64)` partition-local map) under BOTH codecs
  * and prints one JSON line per codec: wall (min-of-2), assets/s, and
  * decoded-payload MB/s.
  *
  * What this prices: the per-asset cost of a real bitstream decode +
  * per-pixel luminance histogram vs the stub's byte scan — i.e. the
  * factor to budget when swapping the stub for a production codec at
  * 100 TB. The pipeline around the codec (schema, batching, no
  * shuffle, no collect) is identical in both runs by construction.
  *
  * Third arg (r11 verdict ask #5): comma-separated DECODE parallelism
  * list — the asset relation is re-partitioned to each value OUTSIDE
  * the timed block, then decoded. This is the production posture for
  * a decode-bound stage, measured: parallelism at the codec seam is a
  * property of the asset RELATION's partitioning (a `repartition(p)`
  * at the seam), NOT of `spark.sql.shuffle.partitions` — a pipeline
  * whose shuffle config is tuned for exchange efficiency (small) must
  * not let a CPU-bound decode stage inherit it, and conversely a
  * 100 TB job can size decode tasks to cores × codec-latency share
  * without touching the shuffle geometry. 0 = leave the relation as
  * generated (the pre-r12 behavior, default).
  */
object MultimodalBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(100000)
    val side = args.lift(1).map(_.toInt).getOrElse(64)
    val decodeParts = args.lift(2)
      .map(_.split(',').map(_.trim.toInt).toSeq).getOrElse(Seq(0))
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    // Deterministic synthetic PNGs, generated ON the executors (the
    // driver never holds the corpus): a per-id RGB gradient keeps every
    // payload unique (PNG filters see different rows → realistic
    // compressed sizes) without any RNG.
    val assets = spark.range(n).select(col("id").as("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < side) {
            var x = 0
            while (x < side) {
              img.setRGB(x, y, (x * 31 + y * 17 + id).toInt & 0xffffff)
              x += 1
            }
            y += 1
          }
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", buf)
          (id, buf.toByteArray)
        }
      }.toDF("doc_id", "payload")
      .persist()
    val totBytes = assets.agg(sum(octet_length(col("payload")))).head().getLong(0)

    for (codec <- Seq("stub", "imageio"); p <- decodeParts) {
      // partitioning happens OUTSIDE the timed block (persist +
      // materialize), so the measurement is the decode stage at
      // parallelism p, not the repartition exchange
      val rel =
        if (p > 0) { val r = assets.repartition(p).persist(); r.count(); r }
        else assets
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        MultimodalStub.features(rel, payloadCol = "payload", codec = Some(codec))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      val pLabel = if (p > 0) p else rel.rdd.getNumPartitions
      println(f"""{"metric":"multimodal_decode","codec":"$codec","n_assets":$n,"side":$side,"decode_parts":$pLabel,"payload_mb":${totBytes / 1048576.0}%.1f,"sec":$best%.2f,"assets_per_sec":${n / best}%.0f,"decoded_mb_per_sec":${totBytes / 1048576.0 / best}%.1f,"repeats":2}""")
      if (p > 0) rel.unpersist()
    }
    assets.unpersist()
    spark.stop()
  }
}
