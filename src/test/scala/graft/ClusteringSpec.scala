package graft

import graft.ext.Clustering
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected components: transitive merging (A~B, B~C ⇒ one cluster
  * even when A, C never collided), chain graphs needing multiple
  * propagation rounds, singletons, determinism of the min-id cluster
  * labeling, and the large-star/small-star fallback (Kiveris et al.,
  * SOCC'14) — property-tested against a local union-find oracle on
  * random graphs and driven end-to-end on a 1000-node path, the
  * adversarial shape that exceeds any propagation round budget.
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cc(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Clustering.components(
        nodes.toDF("doc_id"), pairs.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def starCC(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Clustering.starComponents(
        nodes.toDF("doc_id"), pairs.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Ground truth: path-compressed union-find, labels = component min. */
  private def unionFind(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      if (parent(x) != x) parent(x) = find(parent(x))
      parent(x)
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    // second pass so every root is the true component min
    val members = nodes.groupBy(find)
    members.flatMap { case (_, ms) => ms.map(_ -> ms.min) }.toMap
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

  test("output is exactly `nodes` regardless of algorithm path") {
    // a pair endpoint absent from `nodes` (id 7) must not add a row on
    // the propagation path, and the result must not depend on which
    // algorithm ran — pre-fix, propagation emitted 7 while the star
    // fallback dropped it, so row count depended on graph diameter
    val nodes = Seq(1L, 2L)
    val pairs = Seq((1L, 2L), (2L, 7L))
    val fast = cc(nodes, pairs)
    val viaFallback = {
      import spark.implicits._
      Clustering.components(
          nodes.toDF("doc_id"), pairs.toDF("a_id", "b_id"), propagationRounds = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(fast.keySet === nodes.toSet)
    assert(fast === viaFallback)
  }

  test("star contraction handles the empty graph and singletons") {
    assert(starCC(Seq(4L, 9L), Seq.empty) === Map(4L -> 4L, 9L -> 9L))
  }

  test("q67 keeps exactly one survivor per cluster, the best-quality member") {
    // the oracle verifies values; this pins the operator's invariants
    // on real data: per cluster exactly one keep=true, and no kept doc
    // is beaten by a dropped doc of the same cluster on
    // (quality, doc_id) order
    val rows = SparkEntry.queries("q67_canonical_docs")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (cid, ms) =>
      val kept = ms.filter(_._4)
      assert(kept.size === 1, s"cluster $cid has ${kept.size} survivors")
      val best = ms.minBy(m => (-m._3, m._1))
      assert(kept.head._1 === best._1,
        s"cluster $cid kept ${kept.head._1} but best is ${best._1}")
    }
  }

  test("star contraction matches union-find on random graphs") {
    // seeded: mixed shapes — sparse forests, denser multi-cluster
    // graphs, duplicate and reversed edges
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 10 + rnd.nextInt(30)
      val nodes = (1L to n.toLong)
      val nEdges = rnd.nextInt(2 * n)
      val pairs = Seq.fill(nEdges) {
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n))
      }.filter { case (a, b) => a != b }
      val expect = unionFind(nodes, pairs)
      assert(starCC(nodes, pairs) === expect, s"trial $trial: $pairs")
      // and the public entry point (propagation + fallback) agrees
      assert(cc(nodes, pairs) === expect, s"trial $trial (components): $pairs")
    }
  }

  test("1000-node path: components falls back to star contraction and completes") {
    // diameter 999 — propagation alone would need 999 rounds; the
    // star-contraction fallback squares path lengths per round and
    // finishes in O(log² n). Pre-r5 this graph threw.
    val ids = 1L to 1000L
    val m = cc(ids, ids.init.map(i => (i, i + 1)))
    assert(m.keySet === ids.toSet)
    assert(m.values.toSet === Set(1L))
  }
}
