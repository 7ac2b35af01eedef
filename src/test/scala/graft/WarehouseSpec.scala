package graft

import graft.etl.{StarSchema, Warehouse}
import org.scalatest.funsuite.AnyFunSuite

/** JDBC warehouse edge (S6/S7/S8 parity) against an embedded Derby
  * database — real JDBC round-trips, no network.
  */
class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val url = "jdbc:derby:memory:graftwh;create=true"

  test("append + readTable round-trips a dim; readQuery probes the watermark") {
    import spark.implicits._
    val dim = (1 to 100).map(i => (i.toLong, s"loc_$i", 20.0 + i, 30.0 + i))
      .toDF("location_key", "loc_id", "latitude", "longitude")
    Warehouse.append(dim, url, "dim_location_t")

    val back = Warehouse.readTable(spark, url, "dim_location_t")
    assert(back.count() === 100)
    assert(back.columns.map(_.toLowerCase).sorted ===
      Array("latitude", "loc_id", "location_key", "longitude"))

    // the reference's watermark probe shape (s3-to-redshift.py:27-33);
    // Spark's Derby dialect quotes column identifiers on write, so a
    // raw query addresses them case-sensitively
    val max = Warehouse.readQuery(spark, url,
      "SELECT MAX(\"location_key\") AS last_key FROM dim_location_t")
    assert(max.head.getLong(0) === 100L)
  }

  test("partitioned read fans out to parallel range queries") {
    import spark.implicits._
    (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .write.format("jdbc").option("url", url).option("dbtable", "wide_t").save()
    val df = Warehouse.readPartitioned(spark, url, "wide_t",
      partitionColumn = "k", lower = 1L, upper = 1000L, numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 1000)
    // filters compile into the per-partition JDBC queries (pushdown)
    assert(df.filter("k <= 10").count() === 10)
  }

  test("star-schema dims flow through the JDBC edge unchanged") {
    import spark.implicits._
    val readings = Seq(
      ("evt_1", java.sql.Timestamp.valueOf("2025-08-09 12:00:00"), "loc_1",
        23.4, 30.6, 24.1, 60.2, 1.8, 115.0, 60.0, 58.0, 6.9,
        31.0, 45.0, 9.5, 180.0, 0.0, 1009.0, "VALID"))
      .toDF(
        "event_id", "timestamp", "loc_id", "latitude", "longitude",
        "temperature", "humidity", "water_level",
        "nitrogen", "phosphorus", "potassium", "ph",
        "weather_temperature_2m", "weather_relative_humidity_2m",
        "weather_wind_speed_10m", "weather_wind_direction_10m",
        "weather_rain", "weather_surface_pressure", "validation_status")
    Warehouse.append(StarSchema.dimLocation(readings), url, "dim_location_e2e")
    val dim = Warehouse.readTable(spark, url, "dim_location_e2e")
    assert(dim.count() === 1)
    assert(dim.select("loc_id").head.getString(0) === "loc_1")
  }
}
