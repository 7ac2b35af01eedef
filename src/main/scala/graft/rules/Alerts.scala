package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alert derivation — the reference's `handle_alerts`
  * (`Lambda/lamda.py:152-244`, SURVEY.md §2.8): 1 record → 0..n alerts,
  * expressed as a when-chain building ARRAY<STRUCT> (explode downstream)
  * instead of a per-record Python function.
  *
  * Faithfulness notes:
  *  - CRITICAL sensor alerts group INVALID records' sensor errors by
  *    failure class (lamda.py:163-182). The reference iterates a Python
  *    set (nondeterministic order); we emit the fixed order
  *    sensor_failure, sensor_disconnected, sensor_malfunction.
  *    (sensor_disconnected is unreachable — see Validation notes — but
  *    kept for fidelity to the written rule.)
  *  - operational alerts fire only for VALID/WARNING records
  *    (lamda.py:185) where every sensor value is already numeric, so the
  *    coerced `sensor_<name>` columns are exactly the reference's
  *    post-conversion values.
  *  - descriptions replicate the reference's f-string formats
  *    (%.1f / %.2f).
  */
object Alerts {

  private def alert(tpe: String, priority: Column, description: Column): Column =
    struct(
      lit(tpe).as("type"),
      priority.as("priority"),
      description.as("description"))

  /** Adds an `alerts` ARRAY<STRUCT<type,priority,description>> column.
    * Expects Validation.annotate output (validation_status/_errors +
    * coerced sensor_<name> columns + loc_id).
    */
  def derive(df: DataFrame): DataFrame = {
    val loc = coalesce(col("loc_id"), lit("unknown"))
    val status = col("validation_status")
    val errs = col("validation_errors")

    def hasSensorError(marker: String): Column =
      exists(errs, e => e.startsWith("sensor_data") && e.contains(marker))

    def critical(marker: String, errorType: String): Column =
      when(status === "INVALID" && hasSensorError(marker),
        alert("Sensor Failure", lit("CRITICAL"),
          concat(lit("Critical sensor issue detected at "), loc,
            lit(s": $errorType"))))

    val operational = status.isin("VALID", "WARNING")
    val temp = col("sensor_temperature")
    val water = col("sensor_water_level")
    val ph = col("sensor_ph")

    val tempAlert = when(operational && temp.isNotNull,
      when(temp > 35,
        alert("High Temperature", lit("HIGH"),
          format_string("High temperature warning: %.1f°C at %s", temp, loc)))
        .when(temp < 5,
          alert("Low Temperature", lit("HIGH"),
            format_string("Low temperature warning: %.1f°C at %s", temp, loc))))

    val waterAlert = when(operational && water.isNotNull,
      when(water < 1.0,
        alert("Low Water Level", lit("HIGH"),
          format_string("Low water level alert: %.2fm at %s", water, loc)))
        .when(water > 2.5,
          alert("High Water Level", lit("MEDIUM"),
            format_string("High water level: %.2fm at %s", water, loc))))

    val phAlert = when(operational && ph.isNotNull && (ph < 6.0 || ph > 7.5),
      alert("Soil pH Warning",
        when(ph < 5.5 || ph > 8.0, "HIGH").otherwise("MEDIUM"),
        format_string("Soil pH out of optimal range: %.1f at %s", ph, loc)))

    val nutrientAlerts = Seq("nitrogen", "phosphorus", "potassium").map { n =>
      val v = col(s"sensor_$n")
      // 20% below the location minimum (lamda.py:236)
      val minCol = Ranges.locations.foldLeft(lit(null).cast("double")) {
        (acc, l) => when(col("loc_id") === l, lit(Ranges.perLocation(l)(n).min)).otherwise(acc)
      }
      when(operational && v.isNotNull && v < minCol * 0.8,
        alert("Low Nutrient", lit("MEDIUM"),
          format_string(s"Low $n level: %.1f at %s", v, loc)))
    }

    val all = Seq(
      critical("extreme_value", "sensor_failure"),
      critical("missing", "sensor_disconnected"),
      critical("out_of_range", "sensor_malfunction"),
      tempAlert, waterAlert, phAlert) ++ nutrientAlerts

    df.withColumn("alerts", filter(array(all: _*), a => a.isNotNull))
  }

  /** Recommended-action lookup (`Lambda/lamda.py:316-330`) as a map
    * literal + element_at with default.
    */
  val recommendedActions: Map[String, String] = Map(
    "High Temperature" -> "Increase irrigation frequency and check cooling systems",
    "Low Temperature" -> "Check heating systems and frost protection",
    "Low Water Level" -> "Inspect irrigation system and water supply",
    "High Water Level" -> "Check drainage systems and reduce irrigation",
    "Soil pH Warning" -> "Test soil samples and adjust pH levels as needed",
    "Low Nutrient" -> "Schedule fertilizer application and soil testing",
    "Sensor Failure" -> "Immediate sensor inspection and replacement required")

  val defaultAction = "Investigate the issue and contact technical support"

  def recommendedAction(alertType: Column): Column = {
    val m = map(recommendedActions.toSeq
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    coalesce(element_at(m, alertType), lit(defaultAction))
  }

  /** SNS message formatting (`Lambda/lamda.py:285-301`) as columns:
    * (subject, message) for an exploded alert row.
    */
  def formatMessage(
      alertType: Column, priority: Column, description: Column,
      locId: Column, eventId: Column, timestamp: Column): (Column, Column) = {
    val subject = concat(
      lit("🚨 "), priority, lit(" Alert: "), alertType,
      lit(" @ "), locId)
    val message = concat(
      lit("🚨 Farm IoT Alert Notification\n\n"),
      lit("📍 Location: "), locId, lit("\n"),
      lit("🕒 Timestamp: "), timestamp, lit("\n"),
      lit("⚠️  Alert Type: "), alertType, lit("\n"),
      lit("📊 Priority: "), priority, lit("\n"),
      lit("📝 Description: "), description, lit("\n\n"),
      lit("🔧 Recommended Action: "), recommendedAction(alertType),
      lit("\n\n"),
      lit("🆔 Event ID: "), eventId, lit("\n"),
      lit("🤖 Generated by Farm Monitoring System"))
    (subject, message)
  }
}
