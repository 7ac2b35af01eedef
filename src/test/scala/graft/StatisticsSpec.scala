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

  test("q63 bound certificate: every sketch percentile certifies true") {
    // q63's driver oracle emits literal `true`s, so a hash match
    // certifies the sketch's rank-error bound cross-engine; this test
    // pins the same contract in-process so a bound violation fails
    // HERE with a readable message, not as an opaque driver hash diff.
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q63_percentile_sketch")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows; i <- 2 to 4)
      assert(r.getBoolean(i),
        s"${r.getString(0)} col $i: sketch rank outside guaranteed error (n=${r.getLong(1)})")
  }

  test("q63 certificate logic CAN fail: an off-rank value certifies false") {
    // Negative control — the certificate must not be vacuously true.
    // For n=1000 sorted values, a "sketch" equal to the minimum has
    // rank interval [0, 1]; the p99 target rank is 990 with tolerance
    // n/10000+2 = 2, so le >= 988 must fail.
    import spark.implicits._
    val df = Seq((0L, 1L, 1000L)).toDF("lt99", "le99", "n")
    assert(!df.select(expr(Statistics.rankOk(99, "lt99", "le99")).as("ok"))
      .head().getBoolean(0))
    // and the same logic accepts a genuinely in-bound rank interval
    val good = Seq((989L, 991L, 1000L)).toDF("lt99", "le99", "n")
    assert(good.select(expr(Statistics.rankOk(99, "lt99", "le99")).as("ok"))
      .head().getBoolean(0))
  }

  test("q70 bound certificate: HLL counts certify true, and CAN fail") {
    // Same pattern as q63: the driver's hash match on literal `true`s
    // certifies the HLL++ 3σ bound; this test keeps the readable
    // in-process failure, plus a negative control on the predicate.
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q70_hll_cardinality")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getBoolean(2), s"${r.getString(0)}: texts outside 15% of exact")
      assert(r.getBoolean(3), s"${r.getString(0)}: tokens outside 15% of exact")
    }
    import spark.implicits._
    val bad = Seq((100L, 50L)).toDF("ad", "ed")
      .select((abs(col("ad") - col("ed")) * 100 <= col("ed") * 15).as("ok"))
    assert(!bad.head().getBoolean(0))
  }
}
