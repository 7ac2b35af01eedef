package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
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
  *   - `cand_files`: files whose footer min-max box intersects the
  *     predicate — the skipping PROXY (what a manifest-backed scan
  *     planner would list);
  *   - `input_mb`: bytes the vectorized parquet reader actually
  *     touched (task-metrics ground truth — row-group min-max skipping
  *     via the pushed filters);
  *   - `scan_sec`: min-of-3 wall for the filtered aggregate.
  *
  * The natural layout is ts-sorted, so a TIME-only predicate prunes it
  * perfectly already; the measured slicer constrains BOTH dimensions,
  * which is exactly the case one-dimensional layouts lose and the
  * z-curve exists for. Writes land under /tmp and are removed on exit.
  */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val numFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val inputBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) inputBytes.addAndGet(m.inputMetrics.bytesRead)
      }
    })

    val ev = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dom = ev.agg(
      min(unix_timestamp(col("ts"))).as("tlo"),
      max(unix_timestamp(col("ts"))).as("thi"),
      min("user_id").as("ulo"), max("user_id").as("uhi")).head()
    val (tlo, thi) = (dom.getLong(0), dom.getLong(1))
    val (ulo, uhi) = (dom.getLong(2), dom.getLong(3))

    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    // natural: the arrival order a streaming ingest lands — ts-sorted
    // range partitions (tight ts stats, arbitrary user_id stats)
    ev.repartitionByRange(numFiles, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(s"$base/natural")
    // z-order: 16-bit quantized user × time interleave
    Layout.clusterByZ(ev,
      Layout.quantize16(col("user_id"), ulo.toDouble, uhi.toDouble),
      Layout.quantize16(unix_timestamp(col("ts")), tlo.toDouble, thi.toDouble),
      numFiles)
      .write.mode("overwrite").parquet(s"$base/zorder")

    // the slicer: ~1/16 of each dimension (~0.4% of the grid) — one
    // user band over one ~2-day band of the 34-day range
    val uSpan = (uhi - ulo + 1) / 16
    val tSpan = (thi - tlo + 1) / 16
    val (uA, uB) = (ulo + 5 * uSpan, ulo + 6 * uSpan)
    val (tA, tB) = (tlo + 8 * tSpan, tlo + 9 * tSpan)

    def slicer(df: DataFrame): DataFrame = df
      .filter(col("user_id") >= uA && col("user_id") < uB &&
        unix_timestamp(col("ts")) >= tA && unix_timestamp(col("ts")) < tB)
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

    def measure(path: String): (Long, Long, Double, Long) = {
      val df = spark.read.parquet(path)
      // footer min-max candidate set: the file-skipping proxy
      val cand = df.groupBy(input_file_name().as("f"))
        .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
          min(unix_timestamp(col("ts"))).as("tlo"),
          max(unix_timestamp(col("ts"))).as("thi"))
        .filter(col("uhi") >= uA && col("ulo") < uB &&
          col("thi") >= tA && col("tlo") < tB)
        .count()
      val nFiles = df.select(input_file_name()).distinct().count()
      // min-of-3 filtered-aggregate scans; bytes from the best run
      var bestSec = Double.MaxValue; var bestBytes = 0L
      var rows = 0L
      (1 to 3).foreach { _ =>
        inputBytes.set(0L)
        val t0 = System.nanoTime()
        rows = slicer(spark.read.parquet(path)).head().getLong(0)
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < bestSec) { bestSec = dt; bestBytes = inputBytes.get() }
      }
      (cand, nFiles, bestSec, bestBytes / 1048576L)
    }

    val (candN, filesN, secN, mbN) = measure(s"$base/natural")
    val (candZ, filesZ, secZ, mbZ) = measure(s"$base/zorder")
    val nRows = ev.count()
    println(
      s"""{"metric":"layout_bench","dir":"$dir","rows":$nRows,"num_files":$numFiles,""" +
        s""""natural":{"cand_files":$candN,"n_files":$filesN,"scan_sec":${f"$secN%.2f"},"input_mb":$mbN},""" +
        s""""zorder":{"cand_files":$candZ,"n_files":$filesZ,"scan_sec":${f"$secZ%.2f"},"input_mb":$mbZ}}""")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    spark.stop()
  }
}
