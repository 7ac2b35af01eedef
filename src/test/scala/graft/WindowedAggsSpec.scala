package graft

import java.sql.Timestamp

import graft.stream.WindowedAggs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming tumbling-window aggregation: append-mode emission is
  * gated by the watermark (closed windows emit, open windows hold
  * state), and the same plan aggregates identically in batch.
  */
class WindowedAggsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append mode emits only windows the watermark has closed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    in.addData(
      (ts("2025-08-09 12:00:00"), 1.0),
      (ts("2025-08-09 12:30:00"), 2.0),
      // advances watermark to 13:00 → closes the 12:00 window; its own
      // 13:00 window stays open (no emission)
      (ts("2025-08-09 13:10:00"), 5.0))
    val q = WindowedAggs.tumbling(
      in.toDF.toDF("ts", "value"), "ts", "value")
      .writeStream
      .format("memory").queryName("win_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.table("win_out")
      .select("window_start", "sum_value", "n").collect()
    assert(rows.length === 1)
    assert(rows.head.getTimestamp(0) === ts("2025-08-09 12:00:00"))
    assert(rows.head.getDouble(1) === 3.0)
    assert(rows.head.getLong(2) === 2L)
  }

  test("same plan aggregates in batch (watermark no-op), keyed variant") {
    import spark.implicits._
    val df = Seq(
      (ts("2025-08-09 12:05:00"), "a", 1.0),
      (ts("2025-08-09 12:55:00"), "a", 2.0),
      (ts("2025-08-09 12:10:00"), "b", 10.0),
      (ts("2025-08-09 13:10:00"), "a", 4.0)
    ).toDF("ts", "k", "value")
    val out = WindowedAggs.tumbling(df, "ts", "value", keyCols = Seq("k"))
      .orderBy("window_start", "k")
      .collect()
    assert(out.map(r => (r.getTimestamp(0), r.getString(2), r.getDouble(3), r.getLong(5))).toSeq === Seq(
      (ts("2025-08-09 12:00:00"), "a", 3.0, 2L),
      (ts("2025-08-09 12:00:00"), "b", 10.0, 1L),
      (ts("2025-08-09 13:00:00"), "a", 4.0, 1L)))
  }
}
