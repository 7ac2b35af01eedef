package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exactly-once-style dedup (SURVEY.md §2.7 ST6): the
  * reference carries `event_id` but never dedups on it (its incremental
  * load keys on timestamp only — README's "incremental loads based on
  * event_id" claim doesn't match its code). This operator supplies the
  * missing semantics Spark-natively.
  *
  * `dropDuplicatesWithinWatermark` keeps dedup state only for the
  * watermark horizon — the 100 TB property: state is bounded by
  * (arrival rate × delay), not by stream history, and shards by key
  * across executors. Plain `dropDuplicates` on a stream would grow
  * state forever.
  *
  * At-least-once upstreams (Kinesis re-drives, producer retries) become
  * effectively-once downstream as long as redeliveries land within the
  * watermark delay.
  */
object StreamingDedup {

  /** Drop re-deliveries of the same `idCols` tuple arriving within the
    * watermark horizon of `eventTimeCol`. Rows with a null id or event
    * time pass through unchanged (malformed/DLQ records must never be
    * collapsed — null keys would otherwise dedupe against each other).
    */
  def withinWatermark(
      df: DataFrame,
      eventTimeCol: String,
      delay: String,
      idCols: Seq[String]): DataFrame = {
    val dedupable = idCols.map(col(_).isNotNull).reduce(_ && _) &&
      col(eventTimeCol).isNotNull
    val deduped = df.filter(dedupable)
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(idCols)
    // isNotNull conjunctions are never SQL NULL, so plain negation is
    // total here
    deduped.unionByName(df.filter(!dedupable))
  }
}
