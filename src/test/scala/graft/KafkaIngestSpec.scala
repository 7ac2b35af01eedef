package graft

import java.sql.Timestamp

import graft.stream.IngestStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Kafka form of the ingest source (r8 VERDICT ask #4): SURVEY
  * §2.1/S1 promises "prod swaps `readStream.format("kafka")`", and this
  * pins that swap's contract without the connector jar (not bundled in
  * this container): a streaming source declared with the EXACT schema
  * spark-sql-kafka emits ([[IngestStream.KafkaWireSchema]]) drives the
  * full decode → validate → alert → route chain through
  * [[IngestStream.fromKafkaWire]], and the kafka provenance columns
  * (topic/partition/offset — the Kinesis sequence-number analog,
  * `Lambda/lamda.py:420-424`) survive to the routed output.
  */
object KafkaIngestSpec {
  /** One case class per spark-sql-kafka output column, encoder-derived
    * to the same Catalyst types the connector's relation reports.
    */
  case class KafkaRecord(
      key: Array[Byte], value: Array[Byte], topic: String, partition: Int,
      offset: Long, timestamp: Timestamp, timestampType: Int)
}

class KafkaIngestSpec extends AnyFunSuite {
  import KafkaIngestSpec._
  private lazy val spark = TestSpark.spark

  private def rec(payload: String, partition: Int, offset: Long) =
    KafkaRecord(null, payload.getBytes("UTF-8"), "farm/data", partition,
      offset, new Timestamp(1704067200000L + offset * 1000L), 0)

  test("memory-stream kafka analog matches the connector's wire schema exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KafkaRecord]
    // names AND types must agree field-for-field, else the spec would
    // be exercising a different contract than the production swap
    val got = input.toDF().schema.map(f => (f.name, f.dataType))
    val want = IngestStream.KafkaWireSchema.map(f => (f.name, f.dataType))
    assert(got === want)
  }

  test("fromKafkaWire binds the full ingest chain to a kafka-shaped stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KafkaRecord]
    val chain = IngestStream.process(IngestStream.fromKafkaWire(input.toDF()))
    assert(chain.isStreaming, "the chain must stay a streaming plan")
    val q = chain.writeStream.format("memory").queryName("kafka_ingest")
      .outputMode("append").start()
    try {
      input.addData(
        rec(FarmFixtures.record(), partition = 0, offset = 7L),
        rec("this is not json {", partition = 1, offset = 8L))
      q.processAllAvailable()
      val out = spark.table("kafka_ingest")
        .select("route", "ingest_topic", "ingest_partition", "ingest_offset")
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
        .sortBy(_._4)
      // routing semantics are IngestStreamSpec's; here: the same chain
      // runs against the kafka shape and provenance rides through
      assert(out === Seq(
        ("valid", "farm/data", 0, 7L),
        ("errors/json_decode", "farm/data", 1, 8L)))
    } finally q.stop()
  }

  test("base64-bridged kafka payloads reuse the Kinesis decode path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def b64(s: String) =
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    val input = MemoryStream[KafkaRecord]
    val chain = IngestStream.process(
      IngestStream.fromKafkaWire(input.toDF(), base64 = true))
    val q = chain.writeStream.format("memory").queryName("kafka_ingest_b64")
      .outputMode("append").start()
    try {
      input.addData(rec(b64(FarmFixtures.record()), partition = 0, offset = 1L))
      q.processAllAvailable()
      assert(spark.table("kafka_ingest_b64")
        .select("route").collect().map(_.getString(0)).toSeq === Seq("valid"))
    } finally q.stop()
  }

  test("a non-kafka frame is rejected loudly, not mis-bound") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      IngestStream.fromKafkaWire(Seq(("x", 1)).toDF("value", "partition"))
    }
    assert(e.getMessage.contains("kafka-wire"))
  }
}
