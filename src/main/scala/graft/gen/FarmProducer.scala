package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native analog of the reference's data generator
  * (`Producer /producer.py:92-269,347-386`): wire-format farm records
  * with deterministic fault injection, built entirely from column
  * expressions over `spark.range(n)` — so the same generator that makes
  * a 2k-row test fixture makes a 100 TB ingest-soak corpus, partitioned
  * and parallel for free, with no driver-side loop.
  *
  * Determinism: every random choice derives from the md5-based
  * [[graft.ext.Portable]] hash of (seed, record id, field) — identical
  * output for identical (n, seed) on any cluster/partitioning.
  *
  * Fault taxonomy replicated from the producer (SURVEY §0/§5): sentinel
  * values (0/9999/-9999/'NULL'/'NaN'), uncoercible strings ('FAIL'),
  * quoted numerics, empty sensor_data, missing weather_data, unknown
  * loc_id, out-of-range values, and alert-band values (high temp / low
  * water). Rates are either flat ([[records]]) or the reference's
  * staged degradation schedule ([[stagedRecords]] /
  * [[stagedInvalidRate]] / [[stagedAlertRate]],
  * `Producer /producer.py:96-118`): a stable early phase, a late-stable
  * phase with minor wear, then a linear degradation factor capped at
  * 3×, which caps invalid at 6% and alert at 9% (the code's 15%/25%
  * ceilings never bind because the factor saturates first).
  */
object FarmProducer {

  /** The reference's staged invalid-rate schedule as a pure column
    * expression of the record index (`producer.py:96-118`,
    * `calculate_fault_probabilities`). Thresholds mirror the
    * reference's code (8 / 10 / 0.1-per-record escalation), scaled by
    * `unit` so a soak run can stretch the same curve over any horizon
    * (unit=100 reproduces the comments' 800/1000-record story).
    */
  def stagedInvalidRate(idCol: String, unit: Long = 1L): org.apache.spark.sql.Column =
    expr(s"""CASE WHEN $idCol < ${8 * unit} THEN 0.001D
            |     WHEN $idCol < ${10 * unit} THEN 0.005D
            |     ELSE least(0.02D * least(1.0D + ($idCol - ${10 * unit}) * 0.1D / ${100 * unit}D, 3.0D), 0.15D)
            |END""".stripMargin)

  /** Staged alert-rate schedule — same phases, alert base rates
    * (0.002 / 0.01 / 0.03·factor capped at 0.25). */
  def stagedAlertRate(idCol: String, unit: Long = 1L): org.apache.spark.sql.Column =
    expr(s"""CASE WHEN $idCol < ${8 * unit} THEN 0.002D
            |     WHEN $idCol < ${10 * unit} THEN 0.01D
            |     ELSE least(0.03D * least(1.0D + ($idCol - ${10 * unit}) * 0.1D / ${100 * unit}D, 3.0D), 0.25D)
            |END""".stripMargin)

  private def h(parts: String*): String =
    graft.ext.Portable.h60Spark(s"concat_ws('|', ${parts.mkString(", ")})")

  /** `n` wire-format JSON records as a single `raw` column.
    *
    * Land the output (write to files/topic, or `.cache()`/collect for
    * tests) before feeding it to the ingest path: the record is one
    * large concat-expression tree, and downstream plans that reference
    * `raw` many times (the validator's regexp probes) would otherwise
    * duplicate that tree per reference. A sink boundary is also the
    * faithful topology — the reference's producer publishes to MQTT,
    * it never feeds the Lambda in-process.
    */
  def records(
      spark: SparkSession,
      n: Long,
      seed: Long = 42L,
      faultPct: Int = 10,
      alertPct: Int = 15,
      numPartitions: Int = 0): DataFrame =
    recordsWithRates(spark, n, seed,
      lit(faultPct / 100.0), lit(alertPct / 100.0), numPartitions)

  /** [[records]] with the reference's staged degradation schedule: the
    * fault/alert rates ramp with the record index instead of being
    * flat (`producer.py:96-118`). `unit` stretches the curve's phase
    * boundaries for longer soaks.
    */
  def stagedRecords(
      spark: SparkSession,
      n: Long,
      seed: Long = 42L,
      unit: Long = 1L): DataFrame =
    recordsWithRates(spark, n, seed,
      stagedInvalidRate("id", unit), stagedAlertRate("id", unit))

  /** Generalized generator: fault/alert rates are arbitrary column
    * expressions over the record `id` (flat literals, the staged
    * schedule, or any caller-supplied curve), evaluated per record in
    * [0, 1].
    */
  def recordsWithRates(
      spark: SparkSession,
      n: Long,
      seed: Long,
      faultRate: org.apache.spark.sql.Column,
      alertRate: org.apache.spark.sql.Column,
      numPartitions: Int = 0): DataFrame = {
    // range partitions are CONTIGUOUS id slices, and every derived
    // field (timestamp included) is a function of id — so with an
    // explicit numPartitions each output partition is a contiguous
    // event-time slice, which lets callers write time-ordered shards
    // (the broker analog) without a shuffle
    val base = (if (numPartitions > 0) spark.range(0L, n, 1L, numPartitions)
                else spark.range(n)).withColumn("sd", lit(seed))

    // per-record draws
    def draw(tag: String, mod: Int): org.apache.spark.sql.Column =
      expr(s"${h("sd", "id", s"'$tag'")} % $mod")

    val locId = expr("concat('loc_', 1 + id % 3)")
    val ts = expr(
      "date_format(timestamp_micros(1704067200000000 + id * 3000000), \"yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'\")")

    // healthy in-range value per sensor, deterministic jitter
    def healthy(sensor: String, lo: Double, hi: Double) =
      expr(s"round($lo + (${h("sd", "id", s"'$sensor'")} % 1000) * (${hi - lo}) / 1000.0, 2)")

    // sensor token: mostly healthy, faulted at faultRate (fault class
    // chosen by a second draw), alert-band values at alertRate. The
    // draw modulus is 1e6 so sub-percent rates (the staged schedule's
    // 0.1% early phase) still resolve instead of flooring to zero.
    def sensorToken(sensor: String, lo: Double, hi: Double, alertExpr: String) = {
      val fault = draw(s"f_$sensor", 1000000) < faultRate * 500000.0 // per-sensor faults ≈ faultRate/2 each
      val faultKind = draw(s"fk_$sensor", 6)
      val alert = draw(s"a_$sensor", 1000000) < alertRate * 1000000.0
      when(fault,
        when(faultKind === 0, lit("9999"))
          .when(faultKind === 1, lit("-9999"))
          .when(faultKind === 2, lit("0"))
          .when(faultKind === 3, lit("\"NULL\""))
          .when(faultKind === 4, lit("\"FAIL\""))
          .otherwise(concat(lit("\""), healthy(sensor, lo, hi), lit("\""))))
        .otherwise(when(alert && lit(alertExpr.nonEmpty), expr(
          if (alertExpr.nonEmpty) alertExpr else "'0'"))
          .otherwise(healthy(sensor, lo, hi).cast("string")))
    }

    // loc_1 ranges (producer.py:50-58); alert bands: temp>35, water<1.0
    val sensors = Seq(
      "temperature" -> sensorToken("temperature", 10, 50, "cast(round(36 + (id % 9), 1) as string)"),
      "humidity" -> sensorToken("humidity", 30, 90, ""),
      "water_level" -> sensorToken("water_level", 0.5, 3.0, "cast(round(0.5 + (id % 5) * 0.1, 2) as string)"),
      "nitrogen" -> sensorToken("nitrogen", 80, 150, ""),
      "phosphorus" -> sensorToken("phosphorus", 40, 80, ""),
      "potassium" -> sensorToken("potassium", 40, 80, ""),
      "ph" -> sensorToken("ph", 6.0, 8.0, ""))

    val sensorJson = when(draw("empty_sensors", 200) === 0, lit("{}"))
      .otherwise(concat(
        lit("{"),
        concat_ws(", ", sensors.map { case (k, v) =>
          concat(lit(s""""$k": """), v)
        }: _*),
        lit("}")))

    val weatherJson = when(draw("drop_weather", 200) === 0, lit(""))
      .otherwise(concat(
        lit(""", "weather_data": {"temperature_2m": """),
        healthy("w_temp", 20, 40),
        lit(""", "relative_humidity_2m": 45.0, "is_day": 1, "wind_speed_10m": 9.5, "wind_direction_10m": 180.0, "wind_gusts_10m": 14.0, "rain": 0.0, "precipitation": 0.0, "surface_pressure": 1009.0, "apparent_temperature": 33.0}""")))

    val locToken = when(draw("bad_loc", 500) === 0, lit("loc_9")).otherwise(locId)

    base.select(concat(
      lit("""{"event_id": "evt_"""), format_string("%012d", col("id")), lit("\", "),
      lit(""""timestamp": """"), ts, lit("\", "),
      lit(""""loc_id": """"), locToken, lit("\", "),
      lit(""""location": {"latitude": 23.4219, "longitude": 30.5978}, """),
      lit(""""sensor_data": """), sensorJson,
      weatherJson,
      lit("}")).as("raw"))
  }
}
