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
}
