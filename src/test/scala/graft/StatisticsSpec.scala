package graft

import graft.ext.{Portable, Statistics}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the exact-percentile operator that the DuckDB oracle
  * can't exercise on the generated corpus (it has no all-NULL group):
  * an empty micro-unit array must yield NULL, not an element_at(arr, 0)
  * runtime error (Spark throws on index 0 where DuckDB returns NULL).
  */
class StatisticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("percentile of an all-NULL group is NULL, not a runtime error") {
    import spark.implicits._
    val df = Seq(("a", Option(1.5)), ("a", Option(2.5)), ("a", Option(4.0)),
        ("b", Option.empty[Double]), ("b", Option.empty[Double]))
      .toDF("g", "value")
    val rows = df.groupBy("g")
      .agg(sort_array(collect_list(expr(Portable.qval("value")))).as("arr"))
      .select(col("g"), expr(Statistics.pctlSpark("0.5")).as("p50"))
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows("a") === Some(2.5))
    assert(rows("b") === None)
  }

  test("sketch percentiles sit within rank-error of the exact distribution") {
    // q63 has no DuckDB oracle (quantile sketches are not cross-engine
    // hash-exact), so THIS is its correctness contract: every sketch
    // percentile must be an actual data value whose rank is within the
    // sketch's guaranteed error (1/accuracy) of the target, plus one
    // element of discreteness slack.
    val sf = "/root/testdata/sf0.001"
    val sketch = SparkEntry.queries("q63_percentile_sketch")(spark, sf).collect()
    assert(sketch.nonEmpty)
    val exact = Tables.events(spark, sf)
      .select("event_type", "value").where(col("value").isNotNull)
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    for (r <- sketch; (p, i) <- Seq(0.5 -> 1, 0.95 -> 2, 0.99 -> 3)) {
      val arr = exact(r.getString(0))
      val v = r.getDouble(i)
      assert(arr.contains(v), s"sketch p$p for ${r.getString(0)} is not a data value")
      // a tied value occupies the whole rank interval [count(<v),
      // count(<=v)]; testing only the upper bound would charge the
      // duplicate count against the error budget and could reject a
      // sketch that is within its guarantee
      val lo = arr.count(_ < v).toDouble / arr.length
      val hi = arr.count(_ <= v).toDouble / arr.length
      val tol = 1e-4 + 1.0 / arr.length + 1e-9
      assert(p >= lo - tol && p <= hi + tol,
        s"p$p for ${r.getString(0)}: sketch rank interval [$lo,$hi] (n=${arr.length})")
    }
  }

  test("HLL cardinalities sit within relative error of the exact counts") {
    // q70 has no DuckDB oracle (HLL sketches are not cross-engine
    // hash-exact), so THIS is its correctness contract: each
    // approx_count_distinct must be within the HLL++ guarantee of the
    // exact distinct count. Spark's default rsd is 0.05 (one standard
    // deviation); 3σ = 15% bounds effectively all runs, and the sketch
    // is deterministic for a given input, so this is not flaky.
    val sf = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("q70_hll_cardinality")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(approx.nonEmpty)
    val exactRows = Tables.documents(spark, sf)
      .select(col("source"), md5(col("text")).as("ch"), expr("split(text, ' ')").as("ts"))
      .select(col("source"), col("ch"), explode(col("ts")).as("tok"))
      .groupBy("source")
      .agg(countDistinct("ch").as("texts"), countDistinct("tok").as("toks"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for ((src, (_, aTexts, aToks)) <- approx) {
      val (eTexts, eToks) = exactRows(src)
      assert(math.abs(aTexts - eTexts).toDouble / eTexts <= 0.15,
        s"$src texts: approx $aTexts vs exact $eTexts")
      assert(math.abs(aToks - eToks).toDouble / eToks <= 0.15,
        s"$src tokens: approx $aToks vs exact $eToks")
    }
  }
}
