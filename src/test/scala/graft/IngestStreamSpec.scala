package graft

import java.nio.file.Files

import graft.stream.IngestStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end streaming ingest (SURVEY §3 E1): parse → validate →
  * alert → status-routed lake sink + throttled alert sink, driven
  * through a file source with AvailableNow triggers.
  */
class IngestStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rawDf(lines: String*) = {
    import spark.implicits._
    lines.toDF("raw")
  }

  test("routing: valid / warnings / invalid / json_decode") {
    val routes = IngestStream.process(rawDf(
      FarmFixtures.record(),                                              // VALID
      FarmFixtures.record(sensors = FarmFixtures.withSensor("temperature", "52.0")), // near_threshold → WARNING
      FarmFixtures.record(sensors = FarmFixtures.withSensor("humidity", "9999")),    // sentinel → INVALID
      "this is not json {"))
      .select("route").collect().map(_.getString(0)).toSeq
    assert(routes === Seq("valid", "valid/warnings", "invalid", "errors/json_decode"))
  }

  test("malformed payloads keep their raw text for the DLQ route") {
    val out = IngestStream.process(rawDf("oops, not json"))
      .filter(col("route") === "errors/json_decode")
    assert(out.select("raw").head.getString(0) === "oops, not json")
  }

  test("end-to-end: file stream → routed lake + throttled alerts") {
    val src = Files.createTempDirectory("graft-src").toString
    val lake = Files.createTempDirectory("graft-lake").toString
    val alerts = Files.createTempDirectory("graft-alerts").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    Files.writeString(java.nio.file.Paths.get(s"$src/events.jsonl"),
      Seq(
        FarmFixtures.record(eventId = "evt_a"),
        // temp 52 → near-threshold WARNING + High Temperature alert
        // (weather 45 keeps |diff| ≤ 15: no mismatch warning)
        FarmFixtures.record(
          sensors = FarmFixtures.withSensor("temperature", "52.0"),
          weatherTemp = Some("45.0"),
          eventId = "evt_b",
          timestamp = "2025-08-09T12:05:00.000000Z"),
        FarmFixtures.record(
          sensors = FarmFixtures.withSensor("humidity", "9999"),
          eventId = "evt_c",
          timestamp = "2025-08-09T12:06:00.000000Z")
      ).mkString("\n"))

    val (lakeQ, alertQ) = IngestStream.start(
      IngestStream.fileSource(spark, src), lake, alerts, ckpt)
    lakeQ.awaitTermination(120000)
    alertQ.awaitTermination(120000)

    val landed = spark.read.json(lake)
    assert(landed.count() === 3)
    assert(landed.select("route").distinct().collect().map(_.getString(0)).toSet
      === Set("valid", "valid/warnings", "invalid"))
    // flattened: nested structs became underscore columns
    assert(landed.columns.contains("location_latitude"))
    assert(landed.columns.contains("sensor_data_temperature"))

    val sent = spark.read.parquet(alerts)
    // evt_b fires High Temperature (52 > 35); evt_c fires CRITICAL
    // sensor_failure (extreme_value) which bypasses the throttle
    val types = sent.select("alertType").collect().map(_.getString(0)).toSet
    assert(types.contains("High Temperature"))
    assert(types.contains("Sensor Failure"))
    // SNS-shaped formatting with recommended-action lookup
    val msg = sent.filter(col("alertType") === "High Temperature")
      .select("message").head.getString(0)
    assert(msg.contains("Recommended Action: Increase irrigation frequency"))

    // batch summary metrics observed on the lake query (A4)
    val observed = lakeQ.recentProgress
      .flatMap(p => Option(p.observedMetrics.get("graft_ingest")))
    assert(observed.nonEmpty)
    assert(observed.map(_.getLong(0)).sum === 3) // n_records
    assert(observed.map(_.getLong(1)).sum === 1) // n_invalid
  }

  test("warning route is a subdirectory of valid (reference key layout)") {
    // The sink partitions by the route value; Spark escapes '/' in
    // partition values on disk but restores it on read — the logical
    // layout matches the reference's valid/warnings prefix.
    val r = IngestStream.process(rawDf(
      FarmFixtures.record(sensors = FarmFixtures.withSensor("temperature", "52.0"))))
      .select("route").head.getString(0)
    assert(r.startsWith("valid/"))
  }
}
