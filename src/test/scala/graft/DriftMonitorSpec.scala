package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.stream.DriftMonitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming drift monitor: baseline ppm profile, the fixed-bin L1
  * comparison (empty bins on either side must still count), and the
  * end-to-end alarm path — a window matching the baseline stays
  * silent, a concentrated window alarms once finalized.
  */
class DriftMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  // 2 reference events per bin (values 5, 15, …, 95) → exactly
  // 100000 ppm per bin for type 'click'
  private def referenceBatch = {
    import spark.implicits._
    (0 until 10).flatMap(b => Seq.fill(2)(("click", b * 10 + 5.0)))
      .toDF("event_type", "value")
  }

  test("baseline yields exact uniform ppm shares") {
    val base = DriftMonitor.baseline(referenceBatch).collect()
    assert(base.length === 10)
    base.foreach(r => assert(r.getAs[Long]("base_ppm") === 100000L))
  }

  test("l1 counts bins empty in the stream AND bins unseen in the baseline") {
    import spark.implicits._
    // stream window: everything in bin 0 → |10⁶−10⁵| + 9·|0−10⁵| = 1.8·10⁶
    val win = Seq((ts("2025-08-09 13:00:00"), "click", 0L, 10L))
      .toDF("window_start", "event_type", "bin", "n")
    val alarms = DriftMonitor.l1Alarms(win, DriftMonitor.baseline(referenceBatch))
      .collect()
    assert(alarms.length === 1)
    assert(alarms.head.getAs[Long]("l1_ppm") === 1800000L)
  }

  test("end-to-end: matching window silent, shifted window alarms") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("drift-out").toString
    val ckpt = Files.createTempDirectory("drift-ckpt").toString
    val in = MemoryStream[(Timestamp, String, Double)]
    // 12:00 window: uniform over all 10 bins — matches baseline exactly
    in.addData((0 until 10).map(b =>
      (ts(f"2025-08-09 12:${b * 5}%02d:00"), "click", b * 10 + 5.0)): _*)
    // 13:00 window: all mass in bin 0 — drifted
    in.addData((0 until 10).map(i =>
      (ts(f"2025-08-09 13:${i * 5}%02d:00"), "click", 1.0)): _*)
    // advances the watermark past 14:00 → finalizes both windows; its
    // own window stays open and must NOT be compared
    in.addData((ts("2025-08-09 14:20:00"), "click", 50.0))
    val q = DriftMonitor.run(
      in.toDF.toDF("ts", "event_type", "value"),
      DriftMonitor.baseline(referenceBatch), out, ckpt)
    q.awaitTermination(120000)
    val alarms = spark.read.parquet(out).collect()
    assert(alarms.length === 1, s"expected one alarm, got ${alarms.toSeq}")
    assert(alarms.head.getAs[Timestamp]("window_start") === ts("2025-08-09 13:00:00"))
    assert(alarms.head.getAs[String]("event_type") === "click")
    assert(alarms.head.getAs[Long]("l1_ppm") === 1800000L)
  }
}
