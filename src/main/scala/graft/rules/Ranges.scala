package graft.rules

/** Per-location sensor validation ranges.
  *
  * Source of truth: the identical constant tables in the reference —
  * `Lambda/lamda.py:30-58` (EXPECTED_RANGES_PER_LOCATION) ≡
  * `Producer /producer.py:50-78` (sensor_ranges min/max). The two are
  * kept in sync by hand in the reference ("Updated to match producer
  * exactly"); here there is exactly one table.
  */
object Ranges {

  final case class Range(min: Double, max: Double) {
    /** 10% buffer band for near-threshold warnings (lamda.py:122). */
    def buffer: Double = (max - min) * 0.1
  }

  /** Sensor names in the reference's dict-insertion order — error and
    * warning arrays are order-sensitive (lamda.py:94 iterates this).
    * Canonical list lives with the wire schema. */
  val sensors: Seq[String] = graft.schema.FarmSchema.sensorFields

  val perLocation: Map[String, Map[String, Range]] = Map(
    "loc_1" -> Map(
      "temperature" -> Range(10, 50),
      "humidity" -> Range(30, 90),
      "water_level" -> Range(0.5, 3.0),
      "nitrogen" -> Range(80, 150),
      "phosphorus" -> Range(40, 80),
      "potassium" -> Range(40, 80),
      "ph" -> Range(6.0, 8.0)),
    "loc_2" -> Map(
      "temperature" -> Range(15, 55),
      "humidity" -> Range(25, 80),
      "water_level" -> Range(0.3, 2.5),
      "nitrogen" -> Range(70, 140),
      "phosphorus" -> Range(30, 70),
      "potassium" -> Range(30, 70),
      "ph" -> Range(6.5, 8.5)),
    "loc_3" -> Map(
      "temperature" -> Range(12, 52),
      "humidity" -> Range(28, 85),
      "water_level" -> Range(0.4, 2.8),
      "nitrogen" -> Range(75, 145),
      "phosphorus" -> Range(35, 75),
      "potassium" -> Range(35, 75),
      "ph" -> Range(6.2, 8.2)))

  /** Known location ids, i.e. the loc_id validation domain (lamda.py:75). */
  val locations: Seq[String] = Seq("loc_1", "loc_2", "loc_3")
}
