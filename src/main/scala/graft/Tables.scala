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

  /** Resolved-scan memo (r16 opt round): `spark.read.parquet` builds a
    * fresh file index and re-reads the footer for schema inference on
    * EVERY call, and the registry calls each loader hundreds of times
    * per bench/verify run (177 queries × repeats × 1–3 tables each) —
    * pure driver-side fixed cost. Memoizing the resolved DataFrame per
    * (session, dir, table) reuses the listed file index and inferred
    * schema; it caches NO data and NO results — every action still
    * scans the parquet files (the noop-sink bench and the oracle
    * compare are unaffected; RegistrySpec's persisted-RDD leak check
    * still holds since nothing is persisted). Keyed on the session so
    * test suites that build and stop their own sessions never see a
    * stale plan.
    */
  private val scans =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    scans.computeIfAbsent((spark, sfDir, table),
      _ => spark.read.parquet(s"$sfDir/$table.parquet"))

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.parquet`'s `ts` encoding has drifted across testdata
    * generations, so the loader is type-adaptive on the *read* schema:
    *
    *  - TIMESTAMP(NANOS) parquet (original data): Spark's reader has no
    *    nanos timestamp type; the session's
    *    `spark.sql.legacy.parquet.nanosAsLong` flag ([[GraftSession]])
    *    surfaces it as a plain LONG of epoch-nanos. Truncate to µs with
    *    *integral* division (`div`, not `/` — long `/` is double
    *    division and epoch-nanos exceed a double's 53-bit mantissa),
    *    matching DuckDB's µs truncation exactly.
    *  - timestamp[us] parquet (regenerated data): arrives as
    *    TIMESTAMP_NTZ (no tz in the footer) or TIMESTAMP (tz-aware);
    *    cast to the session-UTC TimestampType so downstream time
    *    functions and the driver's DuckDB schema compare see one type.
    *    With the session zone pinned to UTC the NTZ→TS cast is
    *    value-preserving.
    *
    * Branching on `schema("ts").dataType` (not on a session flag) means
    * a future regeneration back to nanos — or on to tz-aware µs —
    * cannot silently break 48 queries again; unknown encodings fail
    * loudly here with the actual type in the message.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = load(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType                         => timestamp_micros(expr("ts div 1000"))
      case TimestampType                    => col("ts")
      case TimestampNTZType                 => col("ts").cast(TimestampType)
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected LONG nanos or a timestamp)")
    }
    raw.withColumn("ts", ts)
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
