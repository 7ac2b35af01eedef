package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC warehouse parity — the reference's Glue job reads its source
  * and watermark over JDBC and writes the star schema back to Redshift
  * (`ETL job - Glue/s3-to-redshift.py:27-50` read side, `:186-190`
  * write side). The batch ETL here is storage-agnostic
  * ([[StarSchema]]/[[Incremental]] take DataFrames), so warehouse
  * support is a thin `format("jdbc")` edge, kept in one place.
  *
  * Scale notes (100 TB): a naive JDBC read is a SINGLE connection —
  * one task scanning the whole table. [[readPartitioned]] is the form
  * that survives scale: `partitionColumn` + bounds fan the read out to
  * `numPartitions` parallel range queries, which is exactly how the
  * warehouse side of a big backfill must be read. Pushdown still
  * applies on top (Spark compiles `.filter`/`.select` on a JDBC scan
  * into the generated SQL's WHERE/SELECT list). Writes batch rows per
  * partition (`batchsize`), so write parallelism = upstream partitions.
  */
object Warehouse {

  private def props(user: Option[(String, String)]): Properties = {
    val p = new Properties()
    user.foreach { case (u, pw) =>
      p.setProperty("user", u)
      p.setProperty("password", pw)
    }
    p
  }

  /** Single-query read (the reference's MAX(full_date) watermark probe,
    * `s3-to-redshift.py:27-33` — a one-row result; parallelism is
    * irrelevant there).
    */
  def readQuery(
      spark: SparkSession, url: String, query: String,
      credentials: Option[(String, String)] = None): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
      .options(credentials.map { case (u, p) => Map("user" -> u, "password" -> p) }
        .getOrElse(Map.empty))
      .load()

  /** Whole-table read on one connection — only for genuinely small
    * tables (dims). For anything that grows, use [[readPartitioned]].
    */
  def readTable(
      spark: SparkSession, url: String, table: String,
      credentials: Option[(String, String)] = None): DataFrame =
    spark.read.jdbc(url, table, props(credentials))

  /** Range-partitioned parallel read: `numPartitions` concurrent range
    * queries over `partitionColumn` ∈ [lower, upper]. The scale path
    * for the reference's full-table `valid_readings` read
    * (`s3-to-redshift.py:44-50`), which as written is single-threaded.
    */
  def readPartitioned(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long, numPartitions: Int,
      credentials: Option[(String, String)] = None): DataFrame =
    spark.read.jdbc(
      url, table, partitionColumn, lower, upper, numPartitions,
      props(credentials))

  /** Append a frame to a warehouse table (the Glue job's
    * `write.format("jdbc").mode("append")`, `s3-to-redshift.py:186-190`).
    * `batchsize` controls rows per INSERT batch per partition.
    */
  def append(
      df: DataFrame, url: String, table: String,
      credentials: Option[(String, String)] = None,
      batchSize: Int = 10000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .options(credentials.map { case (u, p) => Map("user" -> u, "password" -> p) }
        .getOrElse(Map.empty))
      .mode(SaveMode.Append)
      .save()
}
