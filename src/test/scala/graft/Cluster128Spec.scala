package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the production-width (128-bit) cluster family
  * q167/q168/q169 — the r12 adoption of q166's wide-fingerprint pair
  * relation by the CC machinery (SURVEY §8, SCALE.md r12). The DuckDB
  * oracle already pins exact row equality at both SFs; these tests pin
  * the STRUCTURAL contracts that make the family usable downstream,
  * on the real sf0.001 corpus:
  *
  *  - every q166 pair cohabits a q167 cluster (the CC is a closure of
  *    the pair relation, not a re-derivation that could drift);
  *  - the cluster map is a partition of the corpus (one row per doc,
  *    cluster id = component min, exactly one canonical per cluster);
  *  - q168 keeps exactly one survivor per cluster and it is the
  *    quality-max (doc_id tiebreak) member;
  *  - q169 assigns one split per cluster, so ZERO near-dup pairs
  *    straddle the train/val/test boundary (the leakage-freedom that
  *    is the query's reason to exist);
  *  - exact duplicates (identical text ⇒ identical fingerprint at any
  *    width ⇒ guaranteed banding collision) cohabit under BOTH the
  *    60-bit (q53) and 128-bit (q167) widths — the cross-width
  *    consistency floor that holds even though the two similarity
  *    levels (hamming ≤ 6/60 vs ≤ 12/128) legitimately differ on
  *    near-duplicates.
  */
class Cluster128Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  private lazy val pairs =
    q("q166_simhash128_pairs").select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
  private lazy val clusters =
    q("q167_dedup_clusters128").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap

  test("every 128-bit pair cohabits a q167 cluster") {
    assert(pairs.nonEmpty, "fixture must produce near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 === clusters(b)._1,
        s"pair ($a, $b) split across clusters")
    }
  }

  test("q167 is a partition: one row per doc, min-id label, one canonical per cluster") {
    val nDocs = Tables.documents(spark, sf).count()
    assert(clusters.size.toLong === nDocs)
    // cluster id is a member of its own cluster and is the min member
    val byCluster = clusters.groupBy(_._2._1)
    byCluster.foreach { case (cid, ms) =>
      assert(ms.keys.min === cid, s"cluster $cid not labeled by its min member")
      assert(ms.count(_._2._3) === 1, s"cluster $cid canonical count != 1")
      assert(ms(cid)._3, s"cluster $cid canonical is not the min member")
      // cluster_size column agrees with the actual member count
      ms.foreach { case (id, (_, size, _)) =>
        assert(size === ms.size.toLong, s"doc $id cluster_size $size != ${ms.size}")
      }
    }
  }

  test("q168 keeps exactly the quality-max member per cluster") {
    val rows = q("q168_canonical_docs128").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, ms) =>
      val keeps = ms.filter(_._4)
      assert(keeps.length === 1, s"cluster $cid keep count ${keeps.length}")
      // survivor = max quality, doc_id ascending tiebreak
      val expect = ms.minBy(m => (-m._3, m._1))
      assert(keeps.head._1 === expect._1,
        s"cluster $cid kept ${keeps.head._1}, expected ${expect._1}")
    }
  }

  test("q169: one split per cluster, zero pairs straddle the boundary") {
    val split = q("q169_cluster_split128").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // split is a pure function of the cluster id
    split.values.groupBy(_._1).foreach { case (cid, vs) =>
      assert(vs.map(_._2).toSet.size === 1, s"cluster $cid spans splits")
    }
    pairs.foreach { case (a, b) =>
      assert(split(a)._2 === split(b)._2, s"pair ($a, $b) straddles splits")
    }
    assert(split.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("exact duplicates cohabit under both fingerprint widths") {
    // the sf corpora contain near-dups but no exact-text twins, so the
    // cross-width floor is proven on a synthetic documents dir:
    // identical text ⇒ identical fingerprint at any width ⇒ a
    // guaranteed banding collision ⇒ one cluster, under both 6/60 and
    // 12/128 — while the shuffled-text decoys may or may not pair
    import spark.implicits._
    val doc = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, doc, "en", "web", doc.length.toLong),
      (2L, doc, "en", "web", doc.length.toLong),
      (3L, doc, "en", "mirror", doc.length.toLong),
      (4L, "completely different content with no shared shingles at all here", "en", "web", 64L),
      (5L, "another unrelated document body for the singleton case in this test", "en", "web", 68L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("c128fix").toString
    docs.coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "documents.parquet").toString)
    val twins = Seq(1L, 2L, 3L)
    val c128 = q2("q167_dedup_clusters128", dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c60 = q2("q53_dedup_clusters", dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twins.map(c128).toSet === Set(1L), s"128-bit clusters split exact twins: $c128")
    assert(twins.map(c60).toSet === Set(1L), s"60-bit clusters split exact twins: $c60")
    assert(c128.keySet === Set(1L, 2L, 3L, 4L, 5L))
  }

  private def q2(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("q171 pigeonhole law: the guaranteed window reads recall 1.0") {
    // hamming ≤ 7 over 8 disjoint 16-bit bands MUST share a band
    // (pigeonhole) — a miss there is a code bug, not a tuning result;
    // the best-effort window is the measured number and only its
    // bookkeeping is law (found + missed = exact, recall consistent)
    val rows = q("q171_simhash128_recall").collect()
    rows.foreach { r =>
      val (win, nExact, nFound, nMissed, recall) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nFound + nMissed === nExact, s"$win bookkeeping broken: $r")
      assert(recall === math.floor(nFound * 1e6 / nExact) / 1e6,
        s"$win recall inconsistent with counts: $r")
      if (win == "guaranteed_le7")
        assert(nMissed === 0L && recall === 1.0,
          s"pigeonhole guarantee violated: $r")
    }
  }

  test("q171's audit detects a banding miss: adversarial 12-bit pair") {
    // The audit must be ABLE to report a miss — a recall metric that
    // structurally reads 1.0 measures nothing. Craft two fingerprints
    // differing in exactly 12 bits spread over ALL EIGHT 16-bit bands
    // (2+2+2+2+1+1+1+1): no clean 16-bit band, so the production
    // 8 × 16 banding misses the pair — but every differing bit sits in
    // the LOW byte of its band, so each band's high byte matches and
    // the 16 × 8 ground-truth blocking (pigeonhole-exact ≤ 15) finds
    // it. Plus a 7-bit pair for the guaranteed side.
    import spark.implicits._
    val base = Seq(0L, 0L, 0L, 0L)
    // bits 0,1 + 16,17 of c0/c1 (2 per band), bit 0 + 16 of c2/c3 (1 per band)
    val miss = Seq(0x00030003L, 0x00030003L, 0x00010001L, 0x00010001L)
    val hit7 = Seq(0x7FL, 0L, 0L, 0L) // 7 bits in one band: must be found
    val fp = Seq(
      (1L, base), (2L, miss), (3L, hit7))
      .map { case (id, cs) => (id, cs(0), cs(1), cs(2), cs(3)) }
      .toDF("doc_id", "c0", "c1", "c2", "c3")
    def pairsOf(nBands: Int, bandBits: Int): Set[(Long, Long)] =
      graft.ext.Dedup.simhash128Verified(
          graft.ext.Dedup.simhash128Bands(fp, nBands, bandBits))
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val prod = pairsOf(8, 16)
    val truth = pairsOf(16, 8)
    assert(!prod.contains((1L, 2L)),
      s"adversarial 12-bit pair unexpectedly caught by 8x16 banding: $prod")
    assert(truth.contains((1L, 2L)),
      s"16x8 ground-truth blocking missed the 12-bit pair: $truth")
    assert(prod.contains((1L, 3L)) && truth.contains((1L, 3L)),
      s"7-bit pair must be pigeonhole-guaranteed in both: $prod / $truth")
    CacheScope.drain()
  }

  test("q172 soft-dedup: weights bounded, totals partition the corpus") {
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val nTokens = docs.select(sum(expr("size(split(text, ' '))"))).head.getLong(0)
    val rows = q("q172_soft_dedup").collect()
    assert(rows.map(_.getLong(1)).sum === nDocs, "n_docs must partition the corpus")
    assert(rows.map(_.getLong(3)).sum === nTokens, "tokens_total must partition the corpus")
    rows.foreach { r =>
      val (total, hard, soft) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(hard <= total, s"hard mass exceeds total: $r")
      assert(soft <= total, s"soft mass exceeds total (weights are <= 1): $r")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 100.0, s"hard_pct out of range: $r")
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 100.0, s"soft_pct out of range: $r")
    }
  }

  test("q172 soft-dedup: cross-source mirror splits mass pro-rata, hard credits the canonical") {
    // the divergence the policy table exists to expose: docs 1/2 (web)
    // and 3 (mirror) are exact twins — hard dedup credits all 12 tokens
    // to web's canonical doc 1; soft weighting gives every copy
    // 12 * (10^6 div 3) ppm, so mirror keeps floor(3.999996) = 3
    // effective tokens instead of 0
    import spark.implicits._
    val doc = "the quick brown fox jumps over the lazy dog again and again" // 12 tokens
    val docs = Seq(
      (1L, doc, "en", "web", doc.length.toLong),
      (2L, doc, "en", "web", doc.length.toLong),
      (3L, doc, "en", "mirror", doc.length.toLong),
      (4L, "completely different content with no shared shingles at all here", "en", "web", 64L), // 10
      (5L, "another unrelated document body for the singleton case in this test", "en", "web", 68L)) // 11
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("softfix").toString
    docs.coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "documents.parquet").toString)
    val bySource = q2("q172_soft_dedup", dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val web = bySource("web")
    assert((web.getLong(1), web.getLong(2), web.getLong(3)) === ((4L, 3L, 45L)))
    assert(web.getLong(4) === 33L, s"web hard mass: $web") // docs 1 + 4 + 5
    // 2 * 12 * 333333 + (10 + 11) * 1000000 = 28,999,992 ppm -> 28
    assert(web.getLong(5) === 28L, s"web soft mass: $web")
    val mirror = bySource("mirror")
    assert((mirror.getLong(1), mirror.getLong(2), mirror.getLong(3)) === ((1L, 1L, 12L)))
    assert(mirror.getLong(4) === 0L, s"mirror hard mass must be 0 (canonical is web's): $mirror")
    assert(mirror.getLong(5) === 3L, s"mirror soft mass: $mirror") // floor(12 * 333333 / 1e6)
    assert(mirror.getDouble(6) === 0.0)
    assert(mirror.getDouble(7) === 33.3333)
    CacheScope.drain()
  }

  test("q177: none/hard/soft policies apportion three DISTINCT budgets") {
    // The end-to-end claim that makes q172's policy table load-bearing
    // (r13 verdict ask #4): the retention policy demonstrably changes
    // what the trainer sees. Cross-lang mirror fixture — docs 1/2 (en)
    // and 3 (ar) are exact twins, docs 4 (ar, 10 tok) and 5 (en, 11
    // tok) unique — so per-lang token masses diverge per policy:
    //   none: en 35, ar 22          (raw corpus mass)
    //   hard: en 23, ar 10          (cluster credited to en's doc 1)
    //   soft: en 18999992, ar 13999996 ppm  (twin mass split 1/3 each)
    // Golden Hamilton allocations of the 10⁶ budget (hand-derived):
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog again and again" // 12 tokens
    val docs = Seq(
      (1L, t, "en", "web", t.length.toLong),
      (2L, t, "en", "web", t.length.toLong),
      (3L, t, "ar", "mirror", t.length.toLong),
      (4L, "unique arabic tagged document body with ten whitespace tokens here", "ar", "web", 67L),
      (5L, "a second unique english document body holding eleven whitespace tokens here", "en", "web", 77L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("wtbfix").toString
    docs.coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "documents.parquet").toString)
    val rows = q2("q177_weighted_token_budget", dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(rows.keySet === Set("en", "ar"))
    // (tokens_none, tokens_hard, tokens_soft, alloc_none, alloc_hard, alloc_soft)
    assert(rows("en") === ((35L, 23L, 18L, 614035L, 696970L, 575758L)))
    assert(rows("ar") === ((22L, 10L, 13L, 385965L, 303030L, 424242L)))
    // every policy's column sums to the budget EXACTLY
    val sums = (rows("en"), rows("ar")) match {
      case ((_, _, _, n1, h1, s1), (_, _, _, n2, h2, s2)) =>
        Seq(n1 + n2, h1 + h2, s1 + s2)
    }
    assert(sums === Seq(1000000L, 1000000L, 1000000L), s"budgets must sum exactly: $sums")
    // and the three budget vectors are pairwise distinct — the policy
    // choice is visible downstream, not a report-only artifact
    val vecs = Seq(
      Seq(rows("en")._4, rows("ar")._4),
      Seq(rows("en")._5, rows("ar")._5),
      Seq(rows("en")._6, rows("ar")._6))
    assert(vecs.distinct.size === 3, s"policies must yield distinct budgets: $vecs")
    CacheScope.drain()
  }
}
