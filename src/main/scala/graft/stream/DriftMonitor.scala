package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ext.Statistics

/** Streaming distribution-drift monitor — the STREAMING shape of
  * q87's batch audit: per finalized event-time window and event type,
  * compare the value-bin distribution against a static baseline
  * profile and alarm past an L1 threshold. "Did this feed change
  * under us" as an always-on monitor instead of a nightly batch.
  *
  * Split of labor across the stream/batch boundary (the
  * StreamingCuration discipline): the STREAM runs exactly one
  * stateful operator — windowed (type, bin) counts, state bounded by
  * the watermark horizon, partial-aggregated before the exchange —
  * and the L1 comparison runs per micro-batch as stateless batch math
  * over the (tiny) finalized window aggregates. The baseline is a
  * static relation computed once by [[baseline]]; both sides bin
  * through ONE shared expression ([[Statistics.binSpark]]), so the
  * monitor can never bin differently from the audit that calibrated
  * its threshold.
  */
object DriftMonitor {

  /** Static baseline profile (event_type, bin, base_ppm) from a batch
    * of reference events — integer ppm shares, the q87 discipline
    * (per-bin division before anything sums → overflow-free).
    */
  def baseline(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .select(col("event_type"), expr(Statistics.binSpark).as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("n"))
      .withColumn("total", sum("n").over(Window.partitionBy("event_type")))
      .select(col("event_type"), col("bin"),
        expr("n * 1000000 div total").as("base_ppm"))

  /** The stream's single stateful operator: tumbling-window (type,
    * bin) counts in append mode. Works on batch frames too (watermark
    * no-op), which is how the spec cross-checks the window math.
    */
  def windowedBinCounts(
      stream: DataFrame,
      tsCol: String,
      delay: String = "10 minutes",
      width: String = "1 hour"): DataFrame = {
    val base = if (stream.isStreaming) stream.withWatermark(tsCol, delay) else stream
    base.filter(col("value").isNotNull)
      .groupBy(window(col(tsCol), width), col("event_type"),
        expr(Statistics.binSpark).as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("bin"), col("n"))
  }

  /** Stateless L1 comparison of finalized window aggregates against
    * the baseline — the per-micro-batch body of [[run]], factored for
    * direct spec coverage. The bin domain is the FIXED 0..9 of the
    * shared binning, so the grid explodes sequence(0,9) per (window,
    * type) and left-joins both sides: a bin empty in the stream
    * contributes |0 − base|, a bin unseen in the baseline contributes
    * |share − 0| — neither silently drops.
    */
  def l1Alarms(
      winCounts: DataFrame,
      baselineDf: DataFrame,
      thresholdPpm: Long = 100000L): DataFrame = {
    val wins = winCounts.select("window_start", "event_type").distinct()
    wins
      .withColumn("bin", explode(expr("sequence(0L, 9L)")))
      .join(baselineDf, Seq("event_type", "bin"), "left")
      .join(winCounts, Seq("window_start", "event_type", "bin"), "left")
      .na.fill(0L, Seq("base_ppm", "n"))
      .withColumn("total",
        sum("n").over(Window.partitionBy("window_start", "event_type")))
      .groupBy("window_start", "event_type")
      .agg(
        expr("CAST(sum(n) AS BIGINT)").as("n_events"),
        expr("sum(abs(n * 1000000 div total - base_ppm))").as("l1_ppm"))
      .filter(col("l1_ppm") >= thresholdPpm)
  }

  /** Deployable monitor: alarms append to parquet per micro-batch. */
  def run(
      stream: DataFrame,
      baselineDf: DataFrame,
      outDir: String,
      checkpointDir: String,
      tsCol: String = "ts",
      delay: String = "10 minutes",
      width: String = "1 hour",
      thresholdPpm: Long = 100000L): StreamingQuery =
    windowedBinCounts(stream, tsCol, delay, width).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        l1Alarms(batch, baselineDf, thresholdPpm)
          .write.mode("append").parquet(outDir)
        ()
      }
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
