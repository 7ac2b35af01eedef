package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All reads go through here so scan-level policy (schema expectations,
  * future bucketing / sorted-read hints) lives in one place. Column
  * pruning + predicate pushdown then happen automatically because every
  * query builds a declarative plan on top of these scans.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's vectorized
    * parquet reader rejects (PARQUET_TYPE_ILLEGAL). The session reads
    * the nanos as a plain long (`spark.sql.legacy.parquet.nanosAsLong`,
    * set at session construction — [[GraftSession]]); truncate to a
    * microsecond timestamp with *integral* division (`div`, not `/` —
    * long `/` is double division and epoch-nanos exceed a double's
    * 53-bit mantissa). This matches DuckDB's µs truncation exactly, so
    * oracle comparisons on raw ts values stay exact.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
