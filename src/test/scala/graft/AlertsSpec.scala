package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.rules.{Alerts, Validation}
import graft.schema.FarmSchema

/** Alert derivation semantics (`Lambda/lamda.py:152-244`): operational
  * alerts on VALID/WARNING records, CRITICAL sensor alerts on INVALID,
  * exact f-string descriptions, recommended-action lookup.
  */
class AlertsSpec extends AnyFunSuite {
  import FarmFixtures._

  private def alertsFor(raw: String): List[(String, String, String)] = {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Alerts.derive(Validation.annotate(FarmSchema.parse(Seq(raw).toDF("raw"), "raw")))
    df.select("alerts").collect().head.getSeq[Row](0).toList
      .map(a => (a.getString(0), a.getString(1), a.getString(2)))
  }

  test("high temperature alert with %.1f formatting (lamda.py:189-194)") {
    assert(alertsFor(record(sensors = withSensor("temperature", "38.0"))) ===
      List(("High Temperature", "HIGH", "High temperature warning: 38.0°C at loc_1")))
  }

  test("low water level alert with %.2f formatting (lamda.py:203-210)") {
    assert(alertsFor(record(sensors = withSensor("water_level", "0.8"))) ===
      List(("Low Water Level", "HIGH", "Low water level alert: 0.80m at loc_1")))
  }

  test("high water level alert at MEDIUM (lamda.py:211-216)") {
    assert(alertsFor(record(sensors = withSensor("water_level", "2.8"))) ===
      List(("High Water Level", "MEDIUM", "High water level: 2.80m at loc_1")))
  }

  test("pH outside optimal band → MEDIUM; beyond hard band → HIGH (lamda.py:219-227)") {
    assert(alertsFor(record(sensors = withSensor("ph", "7.6"))) ===
      List(("Soil pH Warning", "MEDIUM", "Soil pH out of optimal range: 7.6 at loc_1")))
    // 5.9 is also near_threshold (below loc_1 min 6.0, within buffer) —
    // record is WARNING, still operational.
    assert(alertsFor(record(sensors = withSensor("ph", "5.9"))) ===
      List(("Soil pH Warning", "MEDIUM", "Soil pH out of optimal range: 5.9 at loc_1")))
  }

  test("healthy record produces no alerts") {
    assert(alertsFor(record()) === Nil)
  }

  test("INVALID record gets CRITICAL sensor alert, operational alerts suppressed (lamda.py:163-185)") {
    // nitrogen 60 < 0.8·min(80) would be Low Nutrient, but 60 is also
    // out_of_range (beyond buffered [73,157]) → INVALID → only the
    // CRITICAL alert fires; the reference's Low Nutrient branch is
    // unreachable the same way (status gate at lamda.py:185).
    assert(alertsFor(record(sensors = withSensor("nitrogen", "60.0"))) ===
      List(("Sensor Failure", "CRITICAL",
        "Critical sensor issue detected at loc_1: sensor_malfunction")))
  }

  test("sentinel value → CRITICAL sensor_failure alert (lamda.py:163-182)") {
    assert(alertsFor(record(sensors = withSensor("temperature", "\"NULL\""))) ===
      List(("Sensor Failure", "CRITICAL",
        "Critical sensor issue detected at loc_1: sensor_failure")))
  }

  test("multiple operational alerts accumulate in rule order") {
    assert(alertsFor(record(sensors =
      withSensor("temperature", "38.0").map {
        case ("water_level", _) => "water_level" -> "0.8"
        case kv => kv
      })) ===
      List(
        ("High Temperature", "HIGH", "High temperature warning: 38.0°C at loc_1"),
        ("Low Water Level", "HIGH", "Low water level alert: 0.80m at loc_1")))
  }

  test("recommended-action lookup with default (lamda.py:316-330)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq("High Temperature", "Never Seen").toDF("t")
      .select(Alerts.recommendedAction(col("t"))).as[String].collect().toList
    assert(out === List(
      "Increase irrigation frequency and check cooling systems",
      Alerts.defaultAction))
  }
}
