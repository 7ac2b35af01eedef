package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarking (SURVEY.md §2.7
  * ST5, §2.4 A7): the dashboard's hourly series as a *streaming*
  * query — tumbling windows over the event-time column, append-mode
  * emission once the watermark passes the window end.
  *
  * Scale notes: state is one row per (window, key) — bounded by the
  * watermark horizon, not stream history; partial aggregation runs
  * map-side before the keyed exchange, so the shuffle carries
  * already-reduced rows. The same plan runs in batch (watermark is a
  * no-op there), which is how the oracle-checked q22/q23 verify the
  * aggregation semantics this operator streams.
  */
object WindowedAggs {

  /** Tumbling event-time windows of `width` over `tsCol`, summing and
    * counting `valueCol` per (window × keyCols). Works on streaming and
    * batch frames alike.
    */
  def tumbling(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      width: String = "1 hour",
      delay: String = "10 minutes",
      keyCols: Seq[String] = Nil): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(tsCol, delay) else df
    base
      .groupBy(window(col(tsCol), width) +: keyCols.map(col): _*)
      .agg(
        sum(valueCol).as("sum_value"),
        avg(valueCol).as("avg_value"),
        count(lit(1)).as("n"))
      .select(Seq(
        col("window.start").as("window_start"),
        col("window.end").as("window_end")) ++ keyCols.map(col) ++ Seq(
        col("sum_value"), col("avg_value"), col("n")): _*)
  }

  /** Hopping (sliding) event-time windows: width `width`, advancing
    * every `slide` — each event lands in width/slide overlapping
    * windows (the smoothing trend tile tumbling can't produce: a
    * 10-min window sliding by 5 re-reports each event twice at two
    * alignments). Spark expands the overlap BEFORE the partial
    * aggregation, so the exchange still carries (window × key)
    * aggregate rows — width/slide × the tumbling state, bounded by the
    * watermark horizon as usual. Same plan runs in batch; q107's
    * RANGE-frame rolling window is the batch-series cousin over
    * pre-aggregated days.
    */
  def hopping(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      width: String = "10 minutes",
      slide: String = "5 minutes",
      delay: String = "10 minutes",
      keyCols: Seq[String] = Nil): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(tsCol, delay) else df
    base
      .groupBy(window(col(tsCol), width, slide) +: keyCols.map(col): _*)
      .agg(
        sum(valueCol).as("sum_value"),
        count(lit(1)).as("n"))
      .select(Seq(
        col("window.start").as("window_start"),
        col("window.end").as("window_end")) ++ keyCols.map(col) ++ Seq(
        col("sum_value"), col("n")): _*)
  }

  /** Gap-based session windows over `tsCol` (`session_window`, the
    * streaming form of the batch sessionization operator q46): a
    * session extends while successive events per key arrive within
    * `gap`; the window closes — and in append mode, emits — once the
    * watermark passes session end + gap. State per key is one open
    * session row, merged by Spark's native session-window state
    * operator (no custom state code), bounded by the watermark horizon.
    */
  def sessionized(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      gap: String = "30 minutes",
      delay: String = "10 minutes",
      keyCols: Seq[String] = Nil): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(tsCol, delay) else df
    base
      .groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(
        sum(valueCol).as("sum_value"),
        count(lit(1)).as("n_events"))
      .select(Seq(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end")) ++ keyCols.map(col) ++ Seq(
        col("sum_value"), col("n_events")): _*)
  }
}
