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
