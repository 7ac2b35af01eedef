package graft

import graft.gen.FarmProducer
import graft.stream.IngestStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Volume/fault-model soak: 2000 generated wire records through the
  * full stateless ingest path — the generator's fault taxonomy must
  * produce every route, the validator must stay total, and the status
  * distribution must track the configured fault rates.
  */
class FarmProducerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("generator is deterministic for (n, seed)") {
    val a = FarmProducer.records(spark, 50).collect().map(_.getString(0))
    val b = FarmProducer.records(spark, 50).collect().map(_.getString(0))
    assert(a.toSeq === b.toSeq)
    assert(a.length === 50)
  }

  test("staged schedule: rate curve matches the reference's phases") {
    import spark.implicits._
    val r = Seq(0L, 7L, 8L, 9L, 10L, 510L, 2010L, 100000L).toDF("id")
      .select(col("id"), FarmProducer.stagedInvalidRate("id").as("inv"),
        FarmProducer.stagedAlertRate("id").as("al"))
      .collect().map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2)))).toMap
    // early stable phase (producer.py:99-101)
    assert(r(0L) === ((0.001, 0.002)) && r(7L) === ((0.001, 0.002)))
    // late stable phase (producer.py:103-105)
    assert(r(8L) === ((0.005, 0.01)) && r(9L) === ((0.005, 0.01)))
    // degradation starts at base rates (factor = 1)
    assert(r(10L) === ((0.02, 0.03)))
    // factor = 1 + 500·0.1/100 = 1.5 halfway up the ramp
    assert(math.abs(r(510L)._1 - 0.03) < 1e-12)
    assert(math.abs(r(510L)._2 - 0.045) < 1e-12)
    // factor saturates at 3.0 → invalid 6%, alert 9%; the reference's
    // 15%/25% ceilings never bind because the factor caps first
    assert(r(2010L) === ((0.06, 0.09)) && r(100000L) === ((0.06, 0.09)))
  }

  test("staged records: early phase near-clean, capped phase degraded") {
    import spark.implicits._
    val raws = FarmProducer.stagedRecords(spark, 3000)
      .collect().map(_.getString(0)).toSeq.toDF("raw")
    val p = IngestStream.process(raws)
      .withColumn("rid", expr("cast(substr(event_id, 5) as bigint)"))
      .select("rid", "validation_status").cache()
    def invalidFrac(lo: Long, hi: Long): Double = {
      val seg = p.filter(col("rid") >= lo && col("rid") < hi)
      seg.filter(col("validation_status") === "INVALID").count().toDouble /
        seg.count()
    }
    // ids < 10: ≤0.5% per-record sensor-fault rate — essentially clean
    // (structural faults like empty sensor_data stay flat and rare)
    val early = invalidFrac(0, 10)
    // ids ≥ 2010 sit at the saturated 6% rate → per-record ≈
    // 1 − (1 − 0.03)^7 ≈ 19% from sensor faults alone
    val capped = invalidFrac(2400, 3000)
    assert(early <= 0.1, s"early=$early")
    assert(capped > 0.08, s"capped=$capped")
    assert(capped > early + 0.05, s"early=$early capped=$capped")
    p.unpersist()
  }

  test("2000 faulted records: validator total, all classes appear, rates track") {
    import spark.implicits._
    // materialization boundary (see FarmProducer.records scaladoc)
    val raws = FarmProducer.records(spark, 2000)
      .collect().map(_.getString(0)).toSeq.toDF("raw")
    val processed = IngestStream.process(raws)
    val byStatus = processed.groupBy("validation_status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet === Set("VALID", "WARNING", "INVALID"))
    val n = byStatus.values.sum
    assert(n === 2000)
    // ~7 sensors × faultPct/2 ≈ 1 - (1 - 0.05)^7 ≈ 30% INVALID ceiling;
    // loose band: the point is "faults present, not dominant"
    val invalidFrac = byStatus("INVALID").toDouble / n
    assert(invalidFrac > 0.05 && invalidFrac < 0.6, s"invalid=$invalidFrac")

    // every fault class surfaced somewhere
    val allErrors = processed
      .select(explode(col("validation_errors")).as("e"))
      .select(regexp_replace(col("e"), "^sensor_data:[a-z_]+?_", "")
        .as("cls"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(allErrors.exists(_.contains("extreme_value")))
    assert(allErrors.exists(_.contains("invalid_type")))
    assert(allErrors.exists(_.contains("missing_sensor_data")))

    // alerts fire on healthy-but-alerting bands
    assert(processed.filter(size(col("alerts")) > 0).count() > 0)
  }
}
