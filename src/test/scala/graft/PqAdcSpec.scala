package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of q173_pq_adc — the product-quantization ADC scan
  * (Similarity.scala). The DuckDB oracle pins exact row equality at
  * both SFs; these tests pin the two contracts that make the audit
  * meaningful:
  *
  *  - bookkeeping: one row per query, recall consistent with the
  *    overlap count, both bounded;
  *  - FIDELITY LAW: on a corpus with ZERO quantization error (every
  *    vector sits exactly on a codebook centroid — built by pairing
  *    each seed with one exact copy, so the per-subspace floor-mean
  *    recompute reproduces the seed subvector), the asymmetric
  *    distance equals the exact distance for EVERY (query, vector)
  *    pair, so ADC top-5 ≡ exact top-5: recall 1.0, rank-1 = the
  *    planted twin at distance 0. A PQ implementation that shuffles
  *    codes, subspaces, or LUT keys fails this exactly.
  */
class PqAdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def q(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("q173 bookkeeping on the real corpus: one row per query, recall consistent") {
    val rows = q("q173_pq_adc", "/root/testdata/sf0.001").collect()
    assert(rows.length === 10, "one row per query point (vec_id < 10)")
    assert(rows.map(_.getLong(0)).toSet === (0L until 10L).toSet)
    rows.foreach { r =>
      val (n, recall) = (r.getLong(3), r.getDouble(4))
      assert(n >= 0L && n <= 5L, s"overlap out of range: $r")
      assert(recall === math.floor(n * 1e6 / 5) / 1e6, s"recall inconsistent: $r")
      assert(r.getLong(2) >= 0L, s"ADC distance is a sum of integer squares: $r")
    }
    CacheScope.drain()
  }

  test("q173 fidelity law: zero quantization error makes ADC exact (recall 1.0, twin at 0)") {
    import spark.implicits._
    // 16 vectors = 8 distinct bases (the codebook seeds, vec_id < 8)
    // + 1 exact copy each; every subvector of every base is distinct
    // (i*5 mod 13 is a bijection on 0..7 at every dim), so assignment
    // is unambiguous and the {seed, copy} floor-mean is the seed itself
    val vecs = (0 until 16).map { i =>
      val b = i % 8
      (i.toLong,
        (0 until 64).map(t => (((b * 31 + t * 17) % 13) - 6) / 8.0f).toArray,
        b)
    }.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("pqfix").toString
    vecs.coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "embeddings.parquet").toString)
    val rows = q("q173_pq_adc", dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows.keySet === (0L until 10L).toSet)
    rows.foreach { case (qid, (top1, adist, n, recall)) =>
      val twin = if (qid < 8) qid + 8 else qid - 8
      assert(top1 === twin, s"q$qid rank-1 must be the planted twin $twin, got $top1")
      assert(adist === 0L, s"q$qid twin distance must be 0, got $adist")
      assert(n === 5L && recall === 1.0,
        s"q$qid: zero quantization error must make ADC top-5 exact, got n=$n recall=$recall")
    }
    CacheScope.drain()
  }

  test("q174 bookkeeping on the real corpus: one row per query, recall consistent") {
    val rows = q("q174_ivfpq_ann", "/root/testdata/sf0.001").collect()
    assert(rows.length === 10, "one row per query point (vec_id < 10)")
    rows.foreach { r =>
      val (n, recall) = (r.getLong(3), r.getDouble(4))
      assert(n >= 0L && n <= 5L, s"overlap out of range: $r")
      assert(recall === math.floor(n * 1e6 / 5) / 1e6, s"recall inconsistent: $r")
      assert(r.getLong(2) >= 0L, s"ADC distance is a sum of integer squares: $r")
    }
    CacheScope.drain()
  }

  test("q174 probe-miss law: a true NN in an unprobed partition is missed AND reported") {
    // The end-to-end audit must be able to see IVF's characteristic
    // failure — the true nearest neighbor sitting in a partition whose
    // CENTROID is far (so nprobe=2 never scans it). Fixture: query 0
    // lives in label 0 (tight cluster at the origin); its true NN is
    // vector 30, planted 0.01 away — but labeled 1, whose other ten
    // members sit at 50.0 per dim, dragging that centroid far beyond
    // label 2's (at 10.0 per dim). Probes for query 0 are therefore
    // {0, 2}: vector 30 matches no LUT row, the scan returns only
    // label-0/label-2 members, and n_overlap ≤ 4 — the recall deficit
    // IS the probe miss, visible in the registered output.
    import spark.implicits._
    def vec(f: Int => Float): Array[Float] = (0 until 64).map(f).toArray
    val rows =
      // label 0: vectors 0..15 (queries 0..9, PQ seeds 0..7), jittered origin
      (0 until 16).map(i => (i.toLong, vec(t => ((i * 7 + t) % 5) * 0.1f), 0)) ++
        // label 1: ten far members + the planted near-neighbor of query 0
        (20 until 30).map(i => (i.toLong, vec(t => 50.0f + ((i + t) % 3) * 0.1f), 1)) ++
        Seq((30L, vec(t => (t % 5) * 0.1f + (if (t == 0) 0.01f else 0f)), 1)) ++
        // label 2: a medium-distance cluster — the second probe
        (40 until 50).map(i => (i.toLong, vec(t => 10.0f + ((i + 2 * t) % 3) * 0.1f), 2))
    val dir = java.nio.file.Files.createTempDirectory("ivfpqfix").toString
    rows.toDF("vec_id", "embedding", "label").coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "embeddings.parquet").toString)
    val out = q("q174_ivfpq_ann", dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val (top1, nOverlap) = out(0L)
    // query 0's exact top-1 is the planted vector 30 (distance 0.01 in
    // one dim vs >= 0.1-grid jitter across many dims inside label 0)
    assert(top1 !== 30L, s"vector 30 is in an unprobed partition, cannot be scanned: $out")
    assert(Set(0, 2).contains(if (top1 < 16) 0 else if (top1 >= 40) 2 else 1),
      s"rank-1 must come from a probed partition (label 0 or 2): $top1")
    assert(nOverlap <= 4L,
      s"the probe miss must show as a recall deficit (exact top-5 contains 30): $out")
    CacheScope.drain()
  }

  test("celled coarse layout: width law, identity at p=0, constant cell envelope (r16)") {
    import ext.Similarity
    // the dial law: smallest p with labels·64·2^p ≥ n — and p = 0
    // whenever the corpus fits its labels (the spec fixtures, sf0.01)
    assert(Similarity.cellWidthFor(500, 10) === 0)
    assert(Similarity.cellWidthFor(640, 10) === 0)
    assert(Similarity.cellWidthFor(641, 10) === 1)
    assert(Similarity.cellWidthFor(2000, 10) === 2)
    assert(Similarity.cellWidthFor(1500000, 10) === 12) // the ×300 fix
    for (n <- Seq(1L, 64L, 1000L, 999983L, 100000000L); l <- Seq(1L, 8L, 40L)) {
      val p = Similarity.cellWidthFor(n, l)
      assert(l * 64L * (1L << p) >= n, s"n=$n l=$l: cells too big at p=$p")
      if (p > 0)
        assert(l * 64L * (1L << (p - 1)) < n, s"n=$n l=$l: width $p not tight")
    }
    // p = 0 is the identity relabel — the degenerate pin the sf0.01
    // oracle covers
    functions.VectorExpressions.register(spark)
    val qv = ext.Similarity.nv(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), lit(1L).as("label"), col("qe"))
    assert(Similarity.celled(qv, 0) eq qv)
    // live split: every cell's label decodes back to a real source
    // label, and occupancy is bounded by construction of the bucket
    val p = 3
    val c = Similarity.celled(qv, p)
    assert(c.select(expr(s"label div ${1L << p}")).distinct().count() === 1L,
      "cell ids must decode to the source label")
    assert(c.select("label").distinct().count() > 1L,
      "p=3 must actually split the single source label")
    CacheScope.drain()
  }
}
