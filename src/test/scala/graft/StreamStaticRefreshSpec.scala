package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Dimension-refresh-under-a-live-stream semantics, machine-checked
  * rather than folklore:
  *
  *  1. A plain stream-static parquet join resolves its FILE LISTING at
  *     query analysis — overwriting the dim directory mid-stream makes
  *     the next batch FAIL (FAILED_READ_FILE), it never silently
  *     serves stale rows (and `refreshByPath` does not help: the
  *     running query's analyzed plan keeps its FileIndex).
  *  2. The deploy-free refresh recipe is `foreachBatch` with a fresh
  *     `spark.read` per batch — each micro-batch re-plans the dim
  *     side, so a rewritten dimension is visible from the next batch.
  */
class StreamStaticRefreshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("foreachBatch re-reads a rewritten dim on the next micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dimDir = java.nio.file.Files.createTempDirectory("dim").toString
    Seq(("loc_1", "rice")).toDF("loc", "crop")
      .write.mode("overwrite").parquet(dimDir)

    val in = MemoryStream[(String, Timestamp, Double)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Timestamp, String)]
    val q = in.toDF.toDF("loc", "ts", "value").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the refresh point: the dim resolves PER BATCH, not at stream start
        val dim = batch.sparkSession.read.parquet(dimDir)
        val rows = batch.join(dim, Seq("loc"), "left")
          .select("ts", "crop").collect()
          .map(r => (r.getTimestamp(0), r.getString(1)))
        out.synchronized { out ++= rows }
        ()
      }
      .start()

    in.addData(("loc_1", ts("2025-08-09 12:00:00"), 1.0))
    q.processAllAvailable()
    // rewrite the dimension UNDER the live query — no restart, no refresh call
    Seq(("loc_1", "wheat")).toDF("loc", "crop")
      .write.mode("overwrite").parquet(dimDir)
    in.addData(("loc_1", ts("2025-08-09 12:01:00"), 2.0))
    q.processAllAvailable()
    q.stop()

    val crops = out.sortBy(_._1.getTime).map(_._2).toSeq
    assert(crops === Seq("rice", "wheat"),
      s"dim not re-resolved per batch: $crops")
  }
}
