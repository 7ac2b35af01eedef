package graft

import java.sql.Timestamp

import graft.ext.Dedup
import graft.stream.StreamingCuration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming curation gate: Gopher-rule verdicts with reasons, the
  * stream-static contamination semi-join (flagged once per doc, clean
  * docs untouched), and the end-to-end verdict-partitioned sink.
  */
class StreamingCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  // 62 clean tokens incl. two stopwords: passes every Gopher rule AND
  // shares the tok3..tok7 5-gram with the benchmark below
  private val goodText =
    (1 to 60).map(i => s"tok$i").mkString(" ") + " the is"
  // same shape, disjoint vocabulary: passes the gate, no bench overlap
  private val cleanText =
    (1 to 60).map(i => s"cln$i").mkString(" ") + " the is"
  // shares the 5-gram "tok3 tok4 tok5 tok6 tok7" with goodText
  private val benchText =
    "zzz tok3 tok4 tok5 tok6 tok7 yyy www vvv uuu"
  // long enough but drowning in punctuation: fails symbol_ratio
  private val noisyText =
    (1 to 60).map(i => s"t$i!!").mkString(" ") + " the is"

  private def benchShingles = {
    import spark.implicits._
    Dedup.shinglesOf(Seq((900L, benchText)).toDF("doc_id", "text"))
      .select("sh").distinct()
  }

  test("gate passes clean docs and names each failed rule") {
    import spark.implicits._
    val out = StreamingCuration.gate(
        Seq((1L, goodText), (2L, "too short"), (3L, noisyText))
          .toDF("doc_id", "text"))
      .select(col("doc_id"), col("quality_pass"), col("reasons"))
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getSeq[String](2)))
      .toMap
    assert(out(1L) === (true, Seq.empty))
    assert(!out(2L)._1 && out(2L)._2.contains("doc_length"))
    assert(!out(3L)._1 && out(3L)._2.contains("symbol_ratio"))
  }

  test("stream-static semi join flags a contaminated doc exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val flagged = StreamingCuration.contaminatedIds(
      in.toDF.toDF("doc_id", "ts", "text"),
      benchShingles, "ts", "10 minutes")
    in.addData(
      (1L, ts("2025-08-09 12:00:00"), goodText),   // shares 5 shingles
      (2L, ts("2025-08-09 12:00:10"), "aaa bbb ccc ddd eee fff ggg"),
      (3L, ts("2025-08-09 12:00:20"), "one two"))  // sub-shingle, must not crash
    val q = flagged.writeStream
      .format("memory").queryName("contam_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val ids = spark.table("contam_out").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    // doc 1 overlaps bench in MULTIPLE shingles yet appears exactly once
    assert(ids === Seq(1L))
  }

  test("streaming near-dup gate flags a corpus duplicate once, passes novel docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // static corpus: goodText is already ingested (doc 500)
    val corpusSig = StreamingCuration.signatureTable(
      Seq((500L, goodText), (501L, benchText)).toDF("doc_id", "text"))
    val in = MemoryStream[(Long, Timestamp, String)]
    val flagged = StreamingCuration.nearDupCandidateIds(
      in.toDF.toDF("doc_id", "ts", "text"),
      corpusSig, "ts", "10 minutes")
    in.addData(
      (1L, ts("2025-08-09 12:00:00"), goodText),  // exact re-ingest: all 16 positions collide
      (2L, ts("2025-08-09 12:00:10"), cleanText), // novel vocabulary: no collision
      (3L, ts("2025-08-09 12:00:20"), "one two")) // sub-shingle, must not crash
    val q = flagged.writeStream
      .format("memory").queryName("neardup_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val ids = spark.table("neardup_out").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    // doc 1 collides in all 16 signature positions yet appears exactly once
    assert(ids === Seq(1L))
  }

  test("end-to-end sink routes by verdict; accepted partition is clean") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_curation").toString
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingCuration.run(
      in.toDF.toDF("doc_id", "ts", "text"),
      benchShingles, s"$base/out", s"$base/ckpt")
    in.addData(
      (1L, ts("2025-08-09 12:00:00"), cleanText),   // clean pass
      (2L, ts("2025-08-09 12:00:10"), goodText),    // contaminated
      (3L, ts("2025-08-09 12:00:20"), "too short")) // quality reject
    q.awaitTermination(120000)
    val rows = spark.read.parquet(s"$base/out")
      .select("doc_id", "verdict")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) === "accepted")
    assert(rows(2L) === "rejected_contaminated")
    assert(rows(3L) === "rejected_quality")
  }
}
