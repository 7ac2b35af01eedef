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

  // The driver corpus guarantees ≥10 tokens per doc, so the oracle gate
  // cannot exercise the short/empty-doc edges of the segmenting queries
  // (the r5-ADVICE failure class: descending sequence() on degenerate
  // input). Pin them on a fixture.
  private def degenerateDocs(): String = {
    import spark.implicits._
    val docs = Seq(
      (1L, "a"), // single token
      (2L, ""), // empty text (split yields [""])
      // 21 tokens: segment 1 repeats segment 0; trailing "a" repeats doc1
      (3L, "a b c d e f g h i j a b c d e f g h i j a"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("degen").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q149 segment dedup: short/empty docs survive; keep-first drops repeats") {
    val dir = degenerateDocs()
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md5.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val rows = SparkEntry.queries("q149_segment_dedup")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_kept"),
          r.getAs[String]("kept_hash")))).toMap
    assert(rows(1L) === ((1L, 1L, hex("a"))))
    assert(rows(2L) === ((1L, 1L, hex(""))))
    // doc3: repeated middle segment dropped corpus-positionally, and the
    // trailing "a" segment lost keep-first to doc1
    assert(rows(3L) === ((3L, 1L, hex("a b c d e f g h i j"))))
  }

  test("q150 chunking covers every token exactly to the document end") {
    val dir = degenerateDocs()
    val rows = SparkEntry.queries("q150_chunk_windows")(spark, dir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    // single-token and empty docs still yield exactly one chunk
    assert(byDoc(1L).length === 1 && byDoc(1L).head.getAs[Long]("n_tok") === 1L)
    assert(byDoc(2L).length === 1 && byDoc(2L).head.getAs[Long]("n_tok") === 1L)
    // coverage: the last chunk's window must end exactly at token n
    byDoc.foreach { case (docId, chunks) =>
      val n = Map(1L -> 1L, 2L -> 1L, 3L -> 21L)(docId)
      val end = chunks.map(c =>
        c.getAs[Long]("chunk_idx") * 24 + c.getAs[Long]("n_tok")).max
      assert(end === n, s"doc $docId: coverage ends at $end, want $n")
      // stride contract: chunk_idx is dense from 0
      val idxs = chunks.map(_.getAs[Long]("chunk_idx")).sorted
      assert(idxs.sameElements(0L until idxs.length.toLong),
        s"doc $docId: chunk indices not dense: ${idxs.mkString(",")}")
    }
  }

  test("q151 k-anonymity accounting reconciles against the raw corpus") {
    val rows = SparkEntry.queries("q151_k_anonymity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val (groups, k, riskyG, riskyD) = (r.getAs[Long]("n_groups"),
        r.getAs[Long]("k_anonymity"), r.getAs[Long]("n_risky_groups"),
        r.getAs[Long]("n_risky_docs"))
      assert(k >= 1L && groups >= 1L)
      // a risky group holds 1..4 docs by definition of k=5
      assert(riskyD >= riskyG && riskyD <= 4L * riskyG, r.toString)
      // the achieved k and the risk flag must agree
      assert((k < 5L) === (riskyG > 0L), r.toString)
      assert(r.getAs[Long]("risky_ppm") ===
        riskyD * 1000000L / r.getAs[Long]("n_docs"))
    }
  }

  test("q152 length buckets partition the corpus; waste is the padding") {
    val rows = SparkEntry.queries("q152_length_buckets")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_seqs")).sum === nDocs)
    rows.foreach { r =>
      val (b, n, tok, pad) = (r.getAs[Long]("bucket"), r.getAs[Long]("n_seqs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("padded_tokens"))
      val padTo = r.getAs[Long]("pad_to")
      assert(Set(-1L, 32L, 64L, 128L, 256L, 512L).contains(b))
      if (b > 0) assert(padTo === b) else assert(padTo > 512L, r.toString)
      assert(pad === n * padTo && pad >= tok, r.toString)
      assert(r.getAs[Long]("n_batches") === (n + 15L) / 16L)
      val ppm = r.getAs[Long]("waste_ppm")
      assert(ppm >= 0L && ppm < 1000000L)
      assert(ppm === math.floor((pad - tok).toDouble / pad * 1000000.0).toLong)
    }
  }

  test("q152 overflow bucket pads >512-token docs to their own max (r6 ADVICE)") {
    // the driver corpus never exceeds 512 tokens, so exercise the
    // overflow arm on a synthetic documents table: 600- and 700-token
    // docs land in bucket -1 padded to 700; a 10-token doc stays in 32
    val dir = java.nio.file.Files.createTempDirectory("q152ovf").toString
    try {
      import spark.implicits._
      Seq((1L, ("w " * 600).trim, 601L), (2L, ("w " * 700).trim, 701L),
          (3L, ("w " * 10).trim, 11L))
        .toDF("doc_id", "text", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("q152_length_buckets")(spark, dir)
        .collect().map(r => r.getAs[Long]("bucket") -> r).toMap
      val ovf = rows(-1L)
      assert(ovf.getAs[Long]("n_seqs") === 2L)
      assert(ovf.getAs[Long]("pad_to") === 700L)
      assert(ovf.getAs[Long]("padded_tokens") === 1400L)
      assert(ovf.getAs[Long]("n_tokens") === 1300L)
      assert(ovf.getAs[Long]("padded_tokens") >= ovf.getAs[Long]("n_tokens"))
      assert(ovf.getAs[Long]("waste_ppm") ===
        math.floor(100.0 / 1400.0 * 1000000.0).toLong)
      assert(rows(32L).getAs[Long]("n_seqs") === 1L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("q153 IVF recall audit is bounded and counts real intersections") {
    val rows = SparkEntry.queries("q153_ivf_recall")(spark, sf).collect()
    // one row per query point, the fixed qid < 10 probe set
    assert(rows.length === 10)
    rows.foreach { r =>
      val (ne, nf) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_found"))
      assert(ne === 5L)
      assert(nf >= 0L && nf <= ne)
      assert(r.getAs[Double]("recall") ===
        math.floor(nf * 1000000.0 / ne) / 1000000.0)
    }
  }

  test("q155 temperature weights flatten the distribution, books balance") {
    val rows = SparkEntry.queries("q155_temperature_mix")(spark, sf).collect()
    assert(rows.length > 1)
    // weights are a distribution up to per-source floor truncation
    val qSum = rows.map(_.getAs[Long]("q_ppm")).sum
    assert(qSum <= 1000000L && qSum >= 1000000L - rows.length)
    // α=0.5 flattens: rarer sources get boosted ABOVE their raw share,
    // the most common source gets damped below it — and the boost is
    // monotone decreasing in the raw share
    val byShare = rows.sortBy(_.getAs[Long]("p_ppm"))
    val boosts = byShare.map(_.getAs[Long]("boost_ppm"))
    assert(boosts.head >= boosts.last)
    assert(boosts.head > 1000000L, s"rarest source not upsampled: $boosts")
    assert(boosts.last < 1000000L, s"top source not damped: $boosts")
  }

  test("q156 BPE encode reconciles with q154's final token total") {
    // Σ per-doc BPE tokens must equal the tokens_after of the last
    // merge round: training counts Σ freq·|toks| over the vocabulary,
    // encoding sums |toks| over every word occurrence — same quantity
    // reached by two different plans
    val trained = SparkEntry.queries("q154_bpe_train")(spark, sf)
      .orderBy(col("step").desc).limit(1).collect()(0)
      .getAs[Long]("tokens_after")
    val enc = SparkEntry.queries("q156_bpe_encode")(spark, sf).collect()
    assert(enc.map(_.getAs[Long]("n_bpe_tokens")).sum === trained)
    enc.foreach { r =>
      // merging only ever shrinks: tokens ≤ chars, and at least 1
      // token per word survives
      assert(r.getAs[Long]("n_bpe_tokens") <= r.getAs[Long]("n_word_chars"))
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("chars_per_token_ppm") >= 1000000L)
    }
    spark.catalog.clearCache() // q156 leaves the trained vocab persisted
  }

  test("q157 source matrix is normalized and reconciles with q36's pairs") {
    val m = SparkEntry.queries("q157_dup_source_matrix")(spark, sf).collect()
    assert(m.nonEmpty)
    // order normalization: upper-triangular, diagonal flagged
    m.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(a <= b)
      assert(r.getAs[Boolean]("within_source") === (a == b))
    }
    // every verified near-dup pair lands in exactly one matrix cell
    val nPairs = SparkEntry.queries("q36_minhash_lsh")(spark, sf).count()
    assert(m.map(_.getAs[Long]("n_pairs")).sum === nPairs)
    val shareSum = m.map(_.getAs[Long]("pair_share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - m.length)
    spark.catalog.clearCache() // q36/q157 persist shingle relations
  }

  test("q158 decontamination reports one nearest benchmark hit per vector") {
    val rows = SparkEntry.queries("q158_semantic_decontamination")(spark, sf)
      .collect()
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length === ids.length, "duplicate vec_id rows")
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id") >= 20L)
      assert(r.getAs[Long]("bench_id") < 20L)
      assert(r.getAs[Double]("cosine") >= 0.4)
    }
  }

  test("q159 nprobe sweep is monotone and agrees with q153 at nprobe=2") {
    val sweep = SparkEntry.queries("q159_nprobe_sweep")(spark, sf)
      .orderBy("nprobe").collect()
    assert(sweep.length === 4)
    sweep.foreach(r => assert(r.getAs[Long]("n_exact") === 50L))
    // more probes can only widen the candidate set
    val found = sweep.map(_.getAs[Long]("n_found"))
    assert(found.sameElements(found.sorted),
      s"recall not monotone in nprobe: ${found.mkString(",")}")
    // the sweep's nprobe=2 arm IS q153's deployed operating point
    val q153 = SparkEntry.queries("q153_ivf_recall")(spark, sf).collect()
    assert(found(1) === q153.map(_.getAs[Long]("n_found")).sum)
  }

  test("q160 cluster split covers the corpus and cannot leak near-dups") {
    val split = SparkEntry.queries("q160_cluster_split")(spark, sf)
    val rows = split.collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    assert(rows.map(_.getAs[String]("split")).toSet
      .subsetOf(Set("train", "val", "test")))
    // the guarantee q62 audits for the doc-hash split: here NO verified
    // near-dup pair may straddle a split boundary, by construction —
    // check it against the actual pair relation, not the construction
    val pairs = SparkEntry.queries("q37_simhash")(spark, sf)
      .select(col("a_id"), col("b_id"))
    val sp = split.select(col("doc_id"), col("split"))
    val leaked = pairs
      .join(sp.as("sa"), col("sa.doc_id") === col("a_id"))
      .join(sp.as("sb"), col("sb.doc_id") === col("b_id"))
      .filter(col("sa.split") =!= col("sb.split"))
      .count()
    assert(leaked === 0L, s"$leaked near-dup pairs straddle a split")
    spark.catalog.clearCache() // pair machinery persists shingles
  }

  test("q161 weak labels: majority sign, abstains, and coverage") {
    val rows = SparkEntry.queries("q161_weak_labels")(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val votes = Seq(r.getAs[Int]("lf_len"), r.getAs[Int]("lf_wlen"),
        r.getAs[Int]("lf_div"))
      assert(votes.forall(v => v >= -1 && v <= 1))
      val expected =
        if (votes.sum > 0) "keep" else if (votes.sum < 0) "drop" else "abstain"
      assert(r.getAs[String]("label") === expected, r.toString)
      assert(r.getAs[Long]("n_voting") === votes.count(_ != 0).toLong)
    }
    // the rule set must actually discriminate on this corpus — if every
    // doc abstains the LF thresholds are dead and the op is vacuous
    assert(rows.exists(_.getAs[String]("label") != "abstain"))
  }

  test("q162 hard negatives are top-ranked and never share the anchor label") {
    val rows = SparkEntry.queries("q162_hard_negatives")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 10)
    byQ.foreach { case (q, negs) =>
      assert(negs.map(_.getAs[Int]("rank")).sorted.sameElements(Seq(1, 2, 3)))
      negs.foreach { n =>
        assert(n.getAs[Int]("neg_label") != n.getAs[Int]("anchor_label"),
          s"anchor $q mined a same-label negative: $n")
      }
    }
  }

  test("q163 shuffle shards: deterministic, covering, bounded") {
    val run1 = SparkEntry.queries("q163_shuffle_shards")(spark, sf)
      .orderBy("shard").collect()
    assert(run1.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).count())
    run1.foreach(r =>
      assert(r.getAs[Long]("shard") >= 0L && r.getAs[Long]("shard") < 32L))
    // the whole point: re-running the pipeline reproduces the exact
    // order — the order-sensitive checksum must be bit-identical
    val run2 = SparkEntry.queries("q163_shuffle_shards")(spark, sf)
      .orderBy("shard").collect()
    assert(run1.map(_.getAs[Long]("order_sum"))
      .sameElements(run2.map(_.getAs[Long]("order_sum"))))
  }

  test("q154 BPE runs the merge recursion, not just step 1") {
    // Hand-computable vocabulary: "abab"x2, "ab"x1.
    //   round 1: pairs (a,b)->5, (b,a)->2  => merge (a,b), 5 tokens left
    //   round 2: pairs (ab,ab)->2          => merge (ab,ab), 3 tokens left
    //   round 3: no adjacent pairs remain  => loop stops early
    // Exercises: frequency weighting, greedy left-to-right application
    // ([a,b,a,b] -> [ab,ab], not [ab,a,b]), and pair exhaustion.
    import spark.implicits._
    val docs = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q154_bpe_train")(spark, dir)
      .orderBy("step").collect()
    assert(rows.length === 2, s"want 2 merges, got ${rows.mkString("; ")}")
    val r1 = rows(0)
    assert(r1.getAs[String]("lhs") === "a" && r1.getAs[String]("rhs") === "b")
    assert(r1.getAs[String]("merged") === "ab")
    assert(r1.getAs[Long]("pair_count") === 5L)
    assert(r1.getAs[Long]("tokens_after") === 5L)
    val r2 = rows(1)
    assert(r2.getAs[String]("lhs") === "ab" && r2.getAs[String]("rhs") === "ab")
    assert(r2.getAs[String]("merged") === "abab")
    assert(r2.getAs[Long]("pair_count") === 2L)
    assert(r2.getAs[Long]("tokens_after") === 3L)
  }

  test("q154 BPE argmax tie-break picks the lexicographically smallest pair") {
    // "cd cd ab ab": pairs (a,b)->2 and (c,d)->2 tie on count; the
    // contract (ORDER BY c DESC, a, b — and the r9 min(struct(-c,a,b))
    // reformulation) must pick (a,b). Word order in the corpus puts
    // "cd" first so a wrong "first seen wins" implementation fails too.
    import spark.implicits._
    val docs = Seq((1L, "cd cd ab ab")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("bpe_tie").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q154_bpe_train")(spark, dir)
      .orderBy("step").collect()
    assert(rows.nonEmpty)
    assert(rows(0).getAs[String]("lhs") === "a")
    assert(rows(0).getAs[String]("rhs") === "b")
    assert(rows(0).getAs[Long]("pair_count") === 2L)
    // after merging (a,b): "ab" words are 1 token, "cd" still 2 chars
    // → round 2 merges (c,d); both rounds' tokens_after are exact
    assert(rows(1).getAs[String]("merged") === "cd")
    assert(rows(0).getAs[Long]("tokens_after") === 6L)
    assert(rows(1).getAs[Long]("tokens_after") === 4L)
  }

  test("q108 degree-oriented triangles ≡ id-oriented enumeration on a hub graph") {
    // Adversarial shape for the id-oriented form: node 0 is a low-id
    // HUB (under id orientation all its edges point out, so wedges
    // explode at the hub — the exact "last reducer" case degree
    // orientation bounds), plus two overlapping cliques and a chain
    // (no triangles). The triangle SET is orientation-invariant, so
    // both enumerations must emit identical per-corner rows.
    import spark.implicits._
    val hub = (1L to 40L).map(v => (0L, v))
    val ring = (1L to 39L).map(v => (v, v + 1)) // hub + ring → 39 triangles
    val clique = for (a <- 100L to 105L; b <- (a + 1) to 105L) yield (a, b)
    val chain = (200L to 210L).map(v => (v, v + 1))
    val pairs = (hub ++ ring ++ clique ++ chain).toDF("a", "b")
      .transform(CacheScope.scoped)
    val byDegree = graft.ext.Clustering.trianglesByDegree(pairs)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val byId = {
      val tri = pairs.as("p1")
        .join(pairs.as("p2"), col("p2.a") === col("p1.b"))
        .join(pairs.as("p3"),
          col("p3.a") === col("p1.a") && col("p3.b") === col("p2.b"))
        .select(col("p1.a").as("x"), col("p1.b").as("y"), col("p2.b").as("z"))
      tri.select(col("x").as("doc_id"))
        .unionAll(tri.select(col("y")))
        .unionAll(tri.select(col("z")))
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
    }
    assert(byDegree.join(byId, Seq("doc_id"), "full")
      .filter(byDegree("n") =!= byId("n") ||
        byDegree("n").isNull || byId("n").isNull)
      .count() === 0)
    // sanity: the hub participates in all 39 hub-ring triangles and the
    // clique members in C(5,2) = 10 each
    val m = byDegree.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) === 39L)
    assert(m(100L) === 10L)
    CacheScope.drain()
  }
}
