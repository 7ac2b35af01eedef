package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Construction invariants the oracle gate can't see — it proves
  * engine-equality, not that the shared property HOLDS: Hamilton
  * apportionment must sum exactly to the budget (both engines could
  * agree on a wrong total), and index segmentation must actually bound
  * posting-list size (both engines would agree on an unbounded list
  * too).
  */
class OperatorInvariantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q89 largest-remainder allocations sum exactly to the 10^6 budget") {
    val rows = SparkEntry.queries("q89_token_budget")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("alloc")).sum === 1000000L)
    // no lang may receive more than base+1 (the largest-remainder bound)
    rows.foreach { r =>
      val extra = r.getAs[Long]("alloc") - r.getAs[Long]("base_alloc")
      assert(extra === 0L || extra === 1L)
    }
  }

  test("q86 segmentation bounds every posting list at the segment size") {
    val rows = SparkEntry.queries("q86_inverted_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_postings") <= 100L,
        s"posting list exceeds segment bound: $r")
      // seek metadata must sit inside the segment's doc range
      val seg = r.getAs[Long]("segment")
      assert(r.getAs[Long]("min_doc") >= seg * 100 &&
        r.getAs[Long]("max_doc") < (seg + 1) * 100)
    }
  }

  test("q98 TextRank gives symmetric-degree tokens identical ranks") {
    // On a regular graph PageRank's fixpoint is uniform, and the
    // damped integer iteration preserves that symmetry exactly: every
    // round each node receives the same floor-divided contributions.
    // The corpus is uncontrolled, so pin the property on a fixture —
    // "x y x y x y" yields the 2-cycle with equal weights both ways.
    import spark.implicits._
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("textrank").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ranks = SparkEntry.queries("q98_textrank")(spark, dir).collect()
    assert(ranks.length === 2)
    assert(ranks.map(_.getAs[Long]("rank")).distinct.length === 1,
      s"symmetric tokens diverged: ${ranks.mkString(", ")}")
    // damping floor: rank can never drop below the (1-d) restart mass
    ranks.foreach(r => assert(r.getAs[Long]("rank") >= 150000L))
  }

  test("q122 attribution credits reconcile to exactly 1e6 ppm per purchase") {
    // the largest-remainder split must make the books balance: total
    // credit across all click-days = 10⁶ × (purchases with ≥1 touch)
    import org.apache.spark.sql.expressions.Window
    val rows = SparkEntry.queries("q122_attribution")(spark, sf)
    val total = rows.agg(sum("credit_ppm")).collect()(0).getLong(0)
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("ts").as("pt"),
        col("event_id").as("pid"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("ct"))
    val attributed = p.join(c, col("c_uid") === col("p_uid") &&
        col("ct") < col("pt") && expr("ct >= pt - INTERVAL 1 DAY"))
      .select("pid").distinct().count()
    assert(total === 1000000L * attributed,
      s"credits $total != 1e6 x $attributed purchases")
  }
}
