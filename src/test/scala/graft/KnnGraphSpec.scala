package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the kNN-graph family (ext/KnnGraph.scala). The DuckDB
  * oracle pins exact row equality at both SFs; these tests pin the
  * structure that makes the graph and its audit meaningful:
  *
  *  - graph bookkeeping: no self edges, no duplicate neighbors, ranks
  *    contiguous from 1, ≤ K per node;
  *  - the NN-descent EXPANSION on a hand graph: B(v) ∪ B(B(v)) exactly
  *    — both directions, two hops, no self pairs, deduplicated (a
  *    duplicate candidate row would double-place a neighbor in the
  *    rank window);
  *  - the MONOTONE LAW: g₍ᵣ₋₁₎(v) ⊆ Cᵣ(v) means each node's neighbor
  *    quality never degrades across rounds — checked per NODE (sum of
  *    kept cosines), not just in aggregate;
  *  - the audit actually measures improvement: on the fixed corpus,
  *    recall strictly increases init → round 2 (NN-descent crossing
  *    LSH bucket boundaries is the operator's whole point).
  */
class KnnGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def q(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("q175 graph bookkeeping: no self edges, no dup neighbors, contiguous ranks <= K") {
    val rows = q("q175_knn_graph", "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val byNode = rows.groupBy(_.getLong(0))
    byNode.foreach { case (v, es) =>
      assert(es.length <= ext.KnnGraph.K, s"node $v has ${es.length} > K neighbors")
      val ranks = es.map(_.getInt(1)).sorted
      assert(ranks.toSeq === (1 to es.length), s"node $v ranks not contiguous: ${ranks.toSeq}")
      val nbrs = es.map(_.getLong(2))
      assert(!nbrs.contains(v), s"node $v has a self edge")
      assert(nbrs.distinct.length === nbrs.length, s"node $v has duplicate neighbors")
      // rank order must follow cosine descending (ties broken by id upstream)
      val byRank = es.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"node $v cosines not non-increasing by rank: ${byRank.toSeq}")
    }
    CacheScope.drain()
  }

  test("roundCand is exactly B(v) ∪ B(B(v)): both directions, two hops, no self, deduped") {
    import spark.implicits._
    // hand graph 1→2, 2→3: B = {(1,2),(2,1),(2,3),(3,2)}; two-hop adds
    // (1,3) and (3,1); nothing else, nothing twice, no (v,v)
    val g = Seq((1L, 2L), (2L, 3L)).toDF("v", "w")
    val got = ext.KnnGraph.roundCand(g).as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L)))
  }

  test("monotone law per NODE: each round's kept-cosine sum never degrades") {
    val e = ext.Similarity.nv(spark, "/root/testdata/sf0.001")
      .select("vec_id", "qe", "nrm").transform(CacheScope.scoped)
    val gs = ext.KnnGraph.descend(e)
    val sums = gs.map(
      _.groupBy("v").agg(sum("cos").as("s"), count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap)
    sums.zip(sums.tail).zipWithIndex.foreach { case ((prev, next), i) =>
      prev.foreach { case (v, (ps, pn)) =>
        val (ns, nn) = next.getOrElse(v, (Double.MinValue, 0L))
        assert(nn >= pn, s"round ${i + 1}: node $v lost neighbors ($pn -> $nn)")
        // candidate containment: with at least as many kept, the sum of
        // the top-k cosines can only grow (same k, superset candidates)
        assert(ns >= ps - 1e-12, s"round ${i + 1}: node $v quality degraded ($ps -> $ns)")
      }
    }
    CacheScope.drain()
  }

  test("q176 audit: bounded bookkeeping and strictly improving recall on the fixed corpus") {
    val rows = q("q176_knn_graph_recall", "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet === Set(0L, 1L, 2L))
    val ne = rows(0L)._1
    rows.foreach { case (it, (nExact, nFound, recall)) =>
      assert(nExact === ne, s"iter $it: exact ground truth must not vary by round")
      assert(nFound >= 0L && nFound <= nExact, s"iter $it: found out of range")
      assert(recall === math.floor(nFound * 1e6 / nExact) / 1e6,
        s"iter $it: recall inconsistent with counts")
    }
    assert(rows(1L)._2 >= rows(0L)._2 && rows(2L)._2 >= rows(1L)._2,
      s"recall must be monotone non-decreasing: $rows")
    assert(rows(2L)._2 > rows(0L)._2,
      s"NN-descent must improve on the LSH init on this corpus: $rows")
    CacheScope.drain()
  }
}
