package graft

import graft.ext.Clustering
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Min-label propagation connected components: transitive merging
  * (A~B, B~C ⇒ one cluster even though A, C never collided), chain
  * graphs needing multiple propagation rounds, singletons, and
  * determinism of the min-id cluster labeling.
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cc(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Clustering.components(
        nodes.toDF("doc_id"), pairs.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("transitive closure across indirect pairs") {
    // 1~2, 2~3: 3 joins 1's cluster without a (1,3) pair; 4~5 separate
    val m = cc(1L to 6L, Seq((1L, 2L), (2L, 3L), (4L, 5L)))
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("long chain converges (diameter > a couple of rounds)") {
    // path graph 10-11-12-...-25: one component labeled by the min id
    val ids = 10L to 25L
    val m = cc(ids, ids.init.map(i => (i, i + 1)))
    assert(m.values.toSet === Set(10L))
    assert(m.keySet === ids.toSet)
  }

  test("edge direction does not matter (labels flow both ways)") {
    // the smaller id sits on the b side; min label must still win
    val m = cc(Seq(7L, 8L, 9L), Seq((9L, 7L), (8L, 9L)))
    assert(m === Map(7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("empty pair set leaves every doc a singleton") {
    val m = cc(Seq(1L, 2L, 3L), Seq.empty)
    assert(m === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
