package graft

import graft.ext.MultimodalStub
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal pipeline's plumbing contract: binary payload schema,
  * batch-shaped partition-local decode, deterministic stub features.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "hello world"),
      (1L, "key agg row scan"),
      (2L, "")
    ).toDF("doc_id", "text")
  }

  test("feature schema: doc_id, n_bytes, dims, 16-bin histogram") {
    val out = MultimodalStub.features(docs)
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_bytes", "width", "height", "histogram"))
    assert(out.count() === 3)
  }

  test("decode is deterministic and matches a direct in-memory run") {
    val viaSpark = MultimodalStub.features(docs)
      .select("doc_id", "n_bytes", "width", "height")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    val direct = Seq((0L, "hello world"), (1L, "key agg row scan"), (2L, ""))
      .map { case (id, t) => MultimodalStub.decodeStub(id, t.getBytes("UTF-8")) }
      .map(f => (f.doc_id, f.n_bytes, f.width, f.height)).toSet
    assert(viaSpark === direct)
  }

  test("histogram is normalized (sums to 1 for non-empty payloads)") {
    val sums = MultimodalStub.features(docs.filter(length(col("text")) > 0))
      .select(col("doc_id"), expr("aggregate(histogram, cast(0 as double), (a, x) -> a + x)").as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("empty payload decodes to zero histogram, not NaN") {
    val h = MultimodalStub.features(docs.filter(col("doc_id") === 2))
      .select("histogram").head().getSeq[Double](0)
    assert(h.forall(_ == 0.0))
  }
}
