package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for silent driver-side testdata regeneration (round-7
  * postmortem: `events.ts` flipped nanos-as-long → timestamp[us] and 48
  * registry queries erred opaquely). If this suite fails, the message IS
  * the diagnosis: one line per drifted column with actual vs expected.
  */
class SchemaDriftSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  test("testdata schemas match SchemaGuard expectations (drift = named column, not 48 query errors)") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val drifts = SchemaGuard.check(TestSpark.spark, sfDir)
    assert(drifts.isEmpty, "\n" + drifts.mkString("\n"))
  }

  test("Tables.events normalizes ts to TimestampType under every accepted encoding") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val spark = TestSpark.spark
    import org.apache.spark.sql.types._
    // current on-disk encoding, whatever it is
    assert(Tables.events(spark, sfDir).schema("ts").dataType === TimestampType)
    // synthesize the OTHER encodings so a future regeneration in either
    // direction is already covered: write a long-nanos variant and an
    // NTZ variant to temp dirs and load them through the same path.
    import org.apache.spark.sql.functions._
    val base = Tables.events(spark, sfDir).limit(100)
    val tmp = java.nio.file.Files.createTempDirectory("schemadrift").toString
    // long nanos (what nanosAsLong used to surface)
    base.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val fromNanos = Tables.events(spark, tmp)
    assert(fromNanos.schema("ts").dataType === TimestampType)
    // round-trip equality against the canonical read (µs precision)
    val a = base.select("event_id", "ts").collect().map(r => (r.getLong(0), r.getTimestamp(1))).toMap
    val b = fromNanos.select("event_id", "ts").collect().map(r => (r.getLong(0), r.getTimestamp(1))).toMap
    assert(a === b)
    // timestamp_ntz
    val tmp2 = java.nio.file.Files.createTempDirectory("schemadrift2").toString
    base.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$tmp2/events.parquet")
    assert(Tables.events(spark, tmp2).schema("ts").dataType === TimestampType)
  }
}
