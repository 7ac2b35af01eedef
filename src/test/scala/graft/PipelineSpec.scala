package graft

import java.nio.file.Files

import graft.etl.{Incremental, LakeToWarehouse}
import graft.stream.{IngestStream, WindowedAggs}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's whole flow, end to end: producer-format JSONL →
  * streaming ingest (validate/alert/route/flatten) → status-routed
  * lake → valid_readings projection → incremental star schema →
  * dashboard aggregate. One test, every boundary crossed.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("producer JSONL → lake → star schema → dashboard aggregates") {
    val src = Files.createTempDirectory("pipe-src").toString
    val lake = Files.createTempDirectory("pipe-lake").toString
    val alerts = Files.createTempDirectory("pipe-alerts").toString
    val ckpt = Files.createTempDirectory("pipe-ckpt").toString

    Files.writeString(java.nio.file.Paths.get(s"$src/events.jsonl"),
      Seq(
        FarmFixtures.record(eventId = "evt_1",
          timestamp = "2025-08-09T12:00:00.000000Z"),
        FarmFixtures.record(eventId = "evt_2", locId = Some("loc_2"),
          timestamp = "2025-08-09T12:30:00.000000Z"),
        // quoted-numeric sensor: coerces with WARNING, lands in
        // valid/warnings and must still reach the warehouse
        FarmFixtures.record(eventId = "evt_3",
          sensors = FarmFixtures.withSensor("temperature", "\"25.5\""),
          timestamp = "2025-08-09T13:10:00.000000Z"),
        // sentinel → INVALID: routed to the lake but kept out of the
        // warehouse projection
        FarmFixtures.record(eventId = "evt_4",
          sensors = FarmFixtures.withSensor("humidity", "9999"),
          timestamp = "2025-08-09T13:20:00.000000Z"),
        "garbage { not json"
      ).mkString("\n"))

    val (lakeQ, alertQ) = IngestStream.start(
      IngestStream.fileSource(spark, src), lake, alerts, ckpt)
    lakeQ.awaitTermination(120000)
    alertQ.awaitTermination(120000)

    // Lake: everything landed, including the DLQ record
    val landed = spark.read.json(lake)
    assert(landed.count() === 5)

    // Warehouse projection: VALID + WARNING only, coerced measures
    val readings = LakeToWarehouse.validReadings(landed)
    assert(readings.count() === 3)
    assert(readings.filter(col("event_id") === "evt_3")
      .select("temperature").head.getDouble(0) === 25.5)

    // Star schema from scratch
    val res = Incremental.load(readings, fact = None, dims = None)
    val fact = res.newFactRows.get
    assert(fact.count() === 3)
    assert(res.dimLocation.get.count() === 2) // loc_1, loc_2
    assert(res.dimTime.get.count() === 3)
    // the WARNING record carries its status into the fact
    assert(fact.filter(col("validation_status") === "WARNING").count() === 1)

    // Dashboard aggregate over the fact (hourly sums, batch plan of
    // the streaming windowed agg)
    val hourly = WindowedAggs.tumbling(
      fact.withColumnRenamed("full_date", "ts"), "ts", "soil_temperature")
      .orderBy("window_start").collect()
    assert(hourly.length === 2)
    assert(hourly.map(_.getLong(4)).toSeq === Seq(2L, 1L)) // 12h: 2 events, 13h: 1
  }
}
