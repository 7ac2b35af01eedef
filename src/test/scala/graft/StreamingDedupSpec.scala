package graft

import java.sql.Timestamp

import graft.stream.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** dropDuplicatesWithinWatermark semantics over a MemoryStream:
  * redeliveries within the watermark horizon collapse, null-keyed rows
  * pass through untouched.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("redelivered event_ids within the watermark collapse to one row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val deduped = StreamingDedup.withinWatermark(
      in.toDF.toDF("event_id", "ts", "value"),
      "ts", "10 minutes", Seq("event_id"))
    in.addData(
      ("evt_1", ts("2025-08-09 12:00:00"), 1.0),
      ("evt_1", ts("2025-08-09 12:00:30"), 1.0), // redelivery
      ("evt_2", ts("2025-08-09 12:01:00"), 2.0))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val ids = spark.table("dedup_out")
      .select("event_id").collect().map(_.getString(0)).toSeq
    assert(ids.sorted === Seq("evt_1", "evt_2"))
  }

  test("null-keyed rows are never collapsed against each other") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Option[String], Timestamp, Double)]
    val deduped = StreamingDedup.withinWatermark(
      in.toDF.toDF("event_id", "ts", "value"),
      "ts", "10 minutes", Seq("event_id"))
    in.addData(
      (None, ts("2025-08-09 12:00:00"), 1.0),
      (None, ts("2025-08-09 12:00:30"), 2.0), // distinct malformed rows
      (Some("evt_1"), ts("2025-08-09 12:01:00"), 3.0))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_nulls")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("dedup_nulls").count() === 3)
  }
}
