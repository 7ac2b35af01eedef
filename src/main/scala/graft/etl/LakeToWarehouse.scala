package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lake → warehouse projection: turns the flattened status-routed lake
  * output ([[graft.stream.IngestStream]]) into the `valid_readings`
  * relation the batch ETL consumes (`ETL job - Glue/s3-to-redshift.py:
  * 44-50` column names). The reference leaves this mapping implicit
  * (S3 JSON → Redshift COPY is outside its code); the semantics are
  * pinned by the Glue job's column usage.
  *
  * - Keeps `valid` and `valid/warnings` routes (the warehouse carries
  *   validation_status VALID and WARNING; `Transforming Tables.sql`
  *   never filters status, and the fact stores it as a column).
  * - Sensor measures come from the *coerced* `sensor_<name>` columns —
  *   the reference mutates converted values into the record before
  *   landing (lamda.py:112), so the lake's post-coercion numbers are
  *   what the warehouse loads; for VALID/WARNING records every sensor
  *   is numeric by construction.
  */
object LakeToWarehouse {

  def validReadings(lake: DataFrame): DataFrame =
    lake
      .filter(col("route").isin("valid", "valid/warnings"))
      .select(
        col("event_id"),
        to_timestamp(col("timestamp")).as("timestamp"),
        col("loc_id"),
        col("location_latitude").cast("double").as("latitude"),
        col("location_longitude").cast("double").as("longitude"),
        col("sensor_temperature").cast("double").as("temperature"),
        col("sensor_humidity").cast("double").as("humidity"),
        col("sensor_water_level").cast("double").as("water_level"),
        col("sensor_nitrogen").cast("double").as("nitrogen"),
        col("sensor_phosphorus").cast("double").as("phosphorus"),
        col("sensor_potassium").cast("double").as("potassium"),
        col("sensor_ph").cast("double").as("ph"),
        col("weather_data_temperature_2m").cast("double").as("weather_temperature_2m"),
        col("weather_data_relative_humidity_2m").cast("double").as("weather_relative_humidity_2m"),
        col("weather_data_wind_speed_10m").cast("double").as("weather_wind_speed_10m"),
        col("weather_data_wind_direction_10m").cast("double").as("weather_wind_direction_10m"),
        col("weather_data_rain").cast("double").as("weather_rain"),
        col("weather_data_surface_pressure").cast("double").as("weather_surface_pressure"),
        col("validation_status"))
}
