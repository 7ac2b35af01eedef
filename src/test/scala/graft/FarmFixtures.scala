package graft

/** Raw-JSON farm event builders replicating the reference's wire format
  * and fault taxonomy (FIXTURES.md §A; `Producer /producer.py:355-362`).
  * Sensor values are raw JSON tokens so quoted/unquoted/null/sentinel
  * cases are all expressible.
  */
object FarmFixtures {

  val defaultSensors: Seq[(String, String)] = Seq(
    "temperature" -> "24.1", "humidity" -> "60.2", "water_level" -> "1.8",
    "nitrogen" -> "115.0", "phosphorus" -> "60.0", "potassium" -> "58.0",
    "ph" -> "6.9")

  /** Build one wire-format JSON record; `sensors` entries are raw JSON
    * tokens (pass `"\"25.5\""` for a quoted string, `"null"` for JSON
    * null). `weatherTemp = None` drops the whole weather_data key.
    */
  def record(
      locId: Option[String] = Some("loc_1"),
      sensors: Seq[(String, String)] = defaultSensors,
      weatherTemp: Option[String] = Some("31.0"),
      eventId: String = "evt_000000000001",
      timestamp: String = "2025-08-09T12:00:00.000000Z"): String = {
    val loc = locId.map(l => s""""loc_id": "$l", """).getOrElse("")
    val sensorJson = sensors.map { case (k, v) => s""""$k": $v""" }.mkString(", ")
    val weather = weatherTemp.map { t =>
      s""", "weather_data": {"temperature_2m": $t, "relative_humidity_2m": 45.0,
         | "is_day": 1, "wind_speed_10m": 9.5, "wind_direction_10m": 180.0,
         | "wind_gusts_10m": 14.0, "rain": 0.0, "precipitation": 0.0,
         | "surface_pressure": 1009.0, "apparent_temperature": 33.0}""".stripMargin
        .replace("\n", "")
    }.getOrElse("")
    s"""{"event_id": "$eventId", "timestamp": "$timestamp", """ +
      loc +
      s""""location": {"latitude": 23.4219, "longitude": 30.5978}, """ +
      s""""sensor_data": {$sensorJson}""" + weather + "}"
  }

  /** Default sensors with one value replaced by a raw token. */
  def withSensor(name: String, rawToken: String): Seq[(String, String)] =
    defaultSensors.map { case (k, v) => if (k == name) k -> rawToken else k -> v }
}
