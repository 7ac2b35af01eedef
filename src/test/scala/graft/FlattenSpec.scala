package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.schema.FarmSchema

/** Schema-driven flatten (`Lambda/lamda.py:333-348`): structs recurse
  * with `_` separator, the sensor_data map expands per known key,
  * arrays serialize to JSON strings, absent map keys land as NULL.
  */
class FlattenSpec extends AnyFunSuite {
  import FarmFixtures._

  test("wire record flattens to warehouse column names (s3-to-redshift.py:131-136)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = FarmSchema.flatten(
      FarmSchema.parse(Seq(record()).toDF("raw"), "raw").drop("raw"))
    val cols = df.columns.toList
    assert(cols.containsSlice(List("location_latitude", "location_longitude")))
    assert(cols.containsSlice(FarmSchema.sensorFields.map(s => s"sensor_data_$s").toList))
    assert(cols.containsSlice(FarmSchema.weatherFields.map(w => s"weather_data_$w").toList))
    val row = df.collect().head
    assert(row.getAs[String]("sensor_data_temperature") === "24.1")
    assert(row.getAs[Double]("weather_data_temperature_2m") === 31.0)
    assert(row.getAs[Double]("location_latitude") === 23.4219)
  }

  test("absent sensor key flattens to NULL (uniform columnar schema)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = FarmSchema.flatten(
      FarmSchema.parse(
        Seq(record(sensors = Seq("temperature" -> "24.1"))).toDF("raw"), "raw")
        .drop("raw"))
    val row = df.collect().head
    assert(row.getAs[String]("sensor_data_temperature") === "24.1")
    assert(row.getAs[String]("sensor_data_ph") === null)
  }

  test("arrays serialize to JSON strings (lamda.py:343-344)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, Seq("a", "b"))).toDF("id", "tags")
      .withColumn("nested", struct(col("id").as("x"), col("tags").as("ys")))
    val flat = FarmSchema.flatten(df.select("nested"))
    val row = flat.collect().head
    assert(flat.columns.toList === List("nested_x", "nested_ys"))
    assert(row.getAs[String]("nested_ys") === """["a","b"]""")
  }
}
