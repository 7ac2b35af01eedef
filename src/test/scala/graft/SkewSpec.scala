package graft

import graft.ext.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted transforms are result-identical to their unsalted forms on a
  * pathologically skewed key distribution (90% of rows on one key).
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def skewed = {
    import spark.implicits._
    (0 until 10000).map { i =>
      val k = if (i % 10 == 0) s"cold_${i % 97}" else "hot"
      (k, i.toDouble)
    }.toDF("k", "v")
  }

  test("salted aggregation equals plain groupBy") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    // double sums: partial merge order differs, compare rounded
    def canon(s: Set[(String, Double, Long)]) =
      s.map { case (k, sm, n) => (k, math.round(sm * 100) / 100.0, n) }
    assert(canon(salted) === canon(plain))
  }

  test("salted join equals plain inner join") {
    import spark.implicits._
    val dim = Seq(("hot", "H"), ("cold_1", "C1"), ("cold_2", "C2"))
      .toDF("k", "name")
    val plain = skewed.join(dim, "k")
      .select("k", "v", "name")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k")
      .select("k", "v", "name")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }
}
