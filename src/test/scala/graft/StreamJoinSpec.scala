package graft

import java.sql.Timestamp

import graft.stream.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join over MemoryStreams: only same-key right
  * rows inside the lookback interval attach, and the state-cleanup
  * predicates Spark derives from the watermarks are present (the
  * bounded-state contract — without them the join buffers forever).
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("alerts pick up only same-loc readings within the lookback") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val alerts = MemoryStream[(String, Timestamp)]
    val reads = MemoryStream[(String, Timestamp, Double)]
    val joined = StreamJoin.precedingContext(
      alerts.toDF.toDF("a_loc", "alert_ts"),
      reads.toDF.toDF("r_loc", "read_ts", "value"),
      "a_loc", "r_loc", "alert_ts", "read_ts",
      delay = "10 minutes", lookback = "5 minutes")
    reads.addData(
      ("loc_1", ts("2025-08-09 11:56:00"), 41.0), // in window
      ("loc_1", ts("2025-08-09 11:54:00"), 39.0), // too early (> 5 min before)
      ("loc_2", ts("2025-08-09 11:58:00"), 37.0), // wrong loc
      ("loc_1", ts("2025-08-09 12:01:00"), 44.0)) // after the alert
    alerts.addData(("loc_1", ts("2025-08-09 12:00:00")))
    val q = joined.writeStream
      .format("memory").queryName("sj_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.table("sj_out")
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(rows === Seq(41.0),
      s"expected exactly the in-window same-loc reading, got $rows")
  }

  test("the plan carries watermark-derived state cleanup on both sides") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val alerts = MemoryStream[(String, Timestamp)]
    val reads = MemoryStream[(String, Timestamp, Double)]
    val joined = StreamJoin.precedingContext(
      alerts.toDF.toDF("a_loc", "alert_ts"),
      reads.toDF.toDF("r_loc", "read_ts", "value"),
      "a_loc", "r_loc", "alert_ts", "read_ts",
      delay = "10 minutes", lookback = "5 minutes")
    // run one batch so the executed streaming plan materializes
    alerts.addData(("loc_1", ts("2025-08-09 12:00:00")))
    reads.addData(("loc_1", ts("2025-08-09 11:59:00"), 1.0))
    val q = joined.writeStream
      .format("memory").queryName("sj_plan")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // the physical evidence lives in the last executed batch's progress
    val lastPlan = q.lastProgress
    assert(lastPlan != null, "no progress recorded")
    val sm = lastPlan.stateOperators
    assert(sm.nonEmpty && sm.exists(_.operatorName.contains("symmetricHashJoin")),
      s"no stream-stream join state operator in progress: $lastPlan")
    // state must be evicted, not accumulated: after AvailableNow
    // completes, removed rows show up in the operator metrics as the
    // watermark passes (numRowsTotal stays bounded by the interval)
    assert(sm.head.numRowsTotal <= 5, s"state not bounded: ${sm.head}")
  }

  test("join state PLATEAUS across batches as the watermark evicts old rows") {
    // The bounded-state claim with a measured number: 8 micro-batches,
    // each advancing event time 20 minutes — far past the
    // delay(10m)+lookback(5m) horizon — so every batch makes the
    // previous batches' buffered rows evictable. If cleanup works,
    // numRowsTotal plateaus at ~the rows of the 1-2 batches still
    // inside the horizon (watermark eviction lags one batch); if it
    // doesn't, state grows linearly with batch count and the final
    // total approaches total input rows (24 reads + 8 alerts).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val alerts = MemoryStream[(String, Timestamp)]
    val reads = MemoryStream[(String, Timestamp, Double)]
    val joined = StreamJoin.precedingContext(
      alerts.toDF.toDF("a_loc", "alert_ts"),
      reads.toDF.toDF("r_loc", "read_ts", "value"),
      "a_loc", "r_loc", "alert_ts", "read_ts",
      delay = "10 minutes", lookback = "5 minutes")
    val q = joined.writeStream
      .format("memory").queryName("sj_plateau")
      .outputMode("append")
      .start()
    try {
      val t0 = ts("2025-08-09 12:00:00").getTime
      (0 until 8).foreach { b =>
        val base = t0 + b * 20 * 60 * 1000L
        reads.addData(
          ("loc_1", new Timestamp(base - 60000), 1.0 + b),
          ("loc_1", new Timestamp(base - 120000), 2.0 + b),
          ("loc_2", new Timestamp(base - 60000), 3.0 + b))
        alerts.addData(("loc_1", new Timestamp(base)))
        q.processAllAvailable()
      }
      val totals = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.head.numRowsTotal)
        .filter(_ > 0)
      assert(totals.nonEmpty, "no state-operator metrics recorded")
      // plateau, not growth: the high-water mark over the LAST three
      // batches must not exceed two batches' worth of rows (4 each),
      // despite 32 total input rows by then
      assert(totals.takeRight(3).max <= 8,
        s"state grew instead of plateauing: numRowsTotal per batch = $totals")
      // and eviction must actually have removed rows at some point
      assert(totals.max < 32,
        s"state accumulated all input rows: $totals")
    } finally q.stop()
  }
}
