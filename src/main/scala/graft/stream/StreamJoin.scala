package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (SURVEY.md §2.7 family): correlate two
  * live streams on a key within an event-time window — "the readings
  * that led up to this alert", "the click that followed this view".
  * The reference pipeline has no cross-stream correlation (its Lambda
  * sees one record at a time; correlation happens offline in Redshift),
  * so this is the Spark-native capability that closes that gap in
  * real time.
  *
  * Scale contract (the reason this shape survives 100 TB/day): Spark
  * buffers BOTH sides' state keyed by the join key, and the interval
  * condition plus watermarks let it evict — left rows age out `delay`
  * after their event time, right rows `delay + lookback` after theirs,
  * so state is bounded by (rate × horizon) per key shard, never by
  * stream history. Without the time-bound predicate the state manager
  * would hold every row forever — a correct-looking query that OOMs in
  * production weeks later. Both inputs must carry DISTINCT column
  * names (Spark cannot disambiguate stream-stream self-conflicts).
  */
object StreamJoin {

  /** Inner-join `left` rows to `right` rows with equal `leftKey` /
    * `rightKey` whose `rightTime` falls in the interval
    * `(leftTime - lookback, leftTime]` — right events that IMMEDIATELY
    * PRECEDE each left event. Watermarks of `delay` on both sides
    * bound the buffered state and define completeness: a match
    * arriving later than `delay` after its event time may be missed —
    * the standard streaming trade, tuned by the caller.
    */
  def precedingContext(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      delay: String, lookback: String): DataFrame =
    left.withWatermark(leftTime, delay)
      .join(
        right.withWatermark(rightTime, delay),
        expr(
          s"""$leftKey = $rightKey AND
             |$rightTime > $leftTime - interval $lookback AND
             |$rightTime <= $leftTime""".stripMargin))
}
