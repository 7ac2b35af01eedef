package graft

import org.apache.spark.sql.functions._

import graft.ext.Layout

/** Z-order layout payoff at soak scale (round-9 verdict ask #8):
  * `runMain graft.LayoutBench <scaledDir> [numFiles]` lays the scaled
  * `events` table out twice — natural (time-ordered, what ingestion
  * gives you for free) and [[Layout.clusterByZ]] on
  * (user_id, ts) — then runs the q48-shaped two-dimension slicer
  * (one user band × one time band) against both and reports, per
  * layout:
  *
  *   - `cand_files` / `cand_rowgroups`: files and row groups whose
  *     footer min-max box intersects the predicate — read straight
  *     from the parquet footers, i.e. exactly what a manifest-backed
  *     planner (file level) and the vectorized reader (row-group
  *     level) skip with. Deterministic, unlike task input-bytes on a
  *     page-cached local filesystem.
  *   - `scan_sec`: min-of-3 wall for the filtered aggregate (at local
  *     scale the table sits in page cache, so this under-reports the
  *     skip benefit a cold object store would show).
  *
  * Three predicates: a TIME band (the ts-sorted natural layout's best
  * case), a USER band (its worst — every file spans all users), and
  * USER×TIME (the dashboard slicer). Z-order's claim is pruning on
  * EVERY dimension from one layout, at a measured small cost on the
  * single-dimension-sorted case. Writes land under /tmp and are
  * removed on exit.
  */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val numFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // ts is stored as epoch-seconds LONG in the laid-out files: Spark
    // writes TimestampType as INT96 by default, whose parquet statistics
    // are Binary and NOT usable for min-max pruning — itself a layout
    // lesson (a lakehouse that wants timestamp skipping stores
    // INT64/micros or a numeric derivative)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("ts_sec"),
        col("user_id"), col("event_type"), col("value"))
    val dom = ev.agg(
      min("ts_sec").as("tlo"), max("ts_sec").as("thi"),
      min("user_id").as("ulo"), max("user_id").as("uhi")).head()
    val (tlo, thi) = (dom.getLong(0), dom.getLong(1))
    val (ulo, uhi) = (dom.getLong(2), dom.getLong(3))

    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    // everything below runs under try/finally: the temp layout (two
    // full copies of the scaled events table) must not outlive a
    // mid-run exception — "removed on exit" has to hold on ALL exits
    try {
    // natural: the arrival order a streaming ingest lands — ts-sorted
    // range partitions (tight ts stats, arbitrary user_id stats)
    ev.repartitionByRange(numFiles, col("ts_sec"))
      .sortWithinPartitions(col("ts_sec"))
      .write.mode("overwrite").parquet(s"$base/natural")
    // z-order: 16-bit quantized user × time interleave
    Layout.clusterByZ(ev,
      Layout.quantize16(col("user_id"), ulo.toDouble, uhi.toDouble),
      Layout.quantize16(col("ts_sec"), tlo.toDouble, thi.toDouble),
      numFiles)
      .write.mode("overwrite").parquet(s"$base/zorder")

    // slicer bands: ~1/16 of each dimension — one user band, one
    // ~2-day band of the 34-day range. Three predicates tell the whole
    // story: TIME-only is the natural (ts-sorted) layout's best case;
    // USER-only is its worst (every file spans all users); USER×TIME
    // is the dashboard slicer both dimensions constrain. Z-order's
    // claim is not "beats a ts-sort on time" — it's "prunes on EVERY
    // dimension from one layout".
    val uSpan = (uhi - ulo + 1) / 16
    val tSpan = (thi - tlo + 1) / 16
    val (uA, uB) = (ulo + 5 * uSpan, ulo + 6 * uSpan)
    val (tA, tB) = (tlo + 8 * tSpan, tlo + 9 * tSpan)
    val userP = col("user_id") >= uA && col("user_id") < uB
    val timeP = col("ts_sec") >= tA && col("ts_sec") < tB
    val preds: Seq[(String, org.apache.spark.sql.Column,
        (Long, Long, Long, Long) => Boolean)] = Seq(
      ("full_scan", lit(true), (_, _, _, _) => true),
      ("time_band", timeP,
        (_, _, flo, fhi) => fhi >= tA && flo < tB),
      ("user_band", userP,
        (flo, fhi, _, _) => fhi >= uA && flo < uB),
      ("user_x_time", userP && timeP,
        (fulo, fuhi, ftlo, fthi) =>
          fuhi >= uA && fulo < uB && fthi >= tA && ftlo < tB))

    // Per-ROW-GROUP min-max boxes, read straight from the parquet
    // footers — the actual skip unit the vectorized reader prunes with
    // (and the per-FILE union of them is what a manifest planner
    // lists). Deterministic, unlike task input-bytes on a page-cached
    // local fs.
    def rowGroupBoxes(path: String): Seq[(String, Long, Long, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val conf = spark.sessionState.newHadoopConf()
      new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .toSeq.flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf)
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try rdr.getFooter.getBlocks.asScala.toSeq.map { b =>
            val byName = b.getColumns.asScala
              .map(c => c.getPath.toDotString -> c.getStatistics).toMap
            // a row group with missing/empty stats can't be pruned — a
            // real planner must treat it as a candidate for EVERY
            // predicate, so report the full-range box instead of
            // CCE/NPE-ing on the cast (the writer here always emits
            // long stats, but the measurement tool shouldn't assume)
            def lng(c: String, mn: Boolean): Long = byName.get(c) match {
              case Some(st: org.apache.parquet.column.statistics.LongStatistics)
                  if !st.isEmpty && st.hasNonNullValue =>
                if (mn) st.getMin else st.getMax
              case _ => if (mn) Long.MinValue else Long.MaxValue
            }
            (f.getName, lng("user_id", mn = true), lng("user_id", mn = false),
              lng("ts_sec", mn = true), lng("ts_sec", mn = false))
          } finally rdr.close()
        }
    }

    def measure(path: String): Seq[(String, Long, Long, Long, Long, Double)] = {
      val boxes = rowGroupBoxes(path)
      val nFiles = boxes.map(_._1).distinct.size.toLong
      preds.map { case (pname, pcol, boxHit) =>
        val candRg = boxes.count(b => boxHit(b._2, b._3, b._4, b._5))
        val candFiles = boxes.filter(b => boxHit(b._2, b._3, b._4, b._5))
          .map(_._1).distinct.size.toLong
        var bestSec = Double.MaxValue
        (1 to 3).foreach { _ =>
          val t0 = System.nanoTime()
          spark.read.parquet(path).filter(pcol)
            .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
            .head()
          val dt = (System.nanoTime() - t0) / 1e9
          if (dt < bestSec) bestSec = dt
        }
        (pname, candFiles, nFiles, candRg.toLong, boxes.size.toLong, bestSec)
      }
    }

    val natural = measure(s"$base/natural")
    val zorder = measure(s"$base/zorder")
    val nRows = ev.count()
    def side(rs: Seq[(String, Long, Long, Long, Long, Double)]): String =
      rs.map { case (p, candF, nf, candRg, nRg, sec) =>
        s""""$p":{"cand_files":$candF,"n_files":$nf,""" +
          s""""cand_rowgroups":$candRg,"n_rowgroups":$nRg,""" +
          s""""scan_sec":${f"$sec%.2f"}}"""
      }.mkString(",")
    println(
      s"""{"metric":"layout_bench","dir":"$dir","rows":$nRows,"num_files":$numFiles,""" +
        s""""natural":{${side(natural)}},"zorder":{${side(zorder)}}}""")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      spark.stop()
    }
  }
}
