package graft.ext

import org.apache.spark.sql.functions._
import graft.{CacheScope, Q, Tables}

/** Corpus-curation operators a training-data pipeline runs after
  * dedup/quality: deterministic stratified sampling, train/val/test
  * splitting, benchmark-contamination detection, and per-stratum quota
  * capping.
  *
  * All are built for the 100 TB shape: sampling is a pure hash filter
  * on a narrow projection (no shuffle, no RNG state — reproducible
  * across runs, engines, and partitionings because the coin is the
  * content id, not a seed sequence); contamination broadcasts the
  * (small) benchmark shingle set against one narrow corpus pass, then
  * aggregates per doc with map-side combine.
  */
object Curation {

  /** The shard-then-pack layout base shared by q60 (pack assignment),
    * q76 (efficiency report), and q81 (materialization): ONE salt, ONE
    * shard count, ONE token counter — drift between the three surfaces
    * would silently de-align pack ids from their efficiency report and
    * materialized text. Catalyst prunes unused columns per consumer
    * (q76's plan reads neither text nor doc_id).
    */
  private val packHashDuck = Portable.h60Duck("concat('pack|', doc_id::VARCHAR)")
  private val packHashSpark = Portable.h60Spark("concat('pack|', cast(doc_id as string))")

  private def packLayout(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"), col("text"),
      expr(s"$packHashSpark % 8").as("shard"),
      expr(packHashSpark).as("h"),
      expr("cast(size(split(text, ' ')) as bigint)").as("n_tokens"))

  /** Running token count within each (lang, shard) stream — the pack
    * cut position, shared by q60 and q81.
    */
  private def packCum(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("cum", sum("n_tokens").over(
      Window.partitionBy("lang", "shard")
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
  }

  val all: Seq[Q] = Seq(
    // ── Deterministic stratified sampling ──────────────────────────────
    // Per-stratum rates (en 50%, de 25%, rest 10%) — the "dataset
    // mixing" knob. The inclusion coin is h(doc_id) mod 1000, so the
    // sample is stable under re-runs and engine changes, and a
    // different operator can re-derive membership without a sample
    // table. (Salting the hash input ('sample|') decorrelates it from
    // any other hash use of doc_id.)
    Q(
      "q49_stratified_sample",
      s"""SELECT doc_id, lang
         |FROM documents
         |WHERE ${Portable.h60Duck("concat('sample|', doc_id::VARCHAR)")} % 1000 <
         |  CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250 ELSE 100 END""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .filter(expr(
            s"${Portable.h60Spark("concat('sample|', cast(doc_id as string))")} % 1000 < " +
              "CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250 ELSE 100 END"))
          .select("doc_id", "lang")
    },

    // ── Deterministic train/val/test split ─────────────────────────────
    // 90/5/5 assignment from the same content-hash coin family as q49
    // (different salt → independent of the sampling decision). Because
    // membership is a pure function of doc_id, the split is stable
    // under re-runs, engine changes, and corpus growth — a doc never
    // migrates between splits when new data arrives, which is the
    // property that keeps eval sets uncontaminated over time.
    Q(
      "q52_train_split",
      s"""SELECT split, count(*) AS n_docs, count(DISTINCT lang) AS n_langs
         |FROM (SELECT doc_id, lang,
         |        CASE WHEN ${Portable.h60Duck("concat('split|', doc_id::VARCHAR)")} % 100 < 90 THEN 'train'
         |             WHEN ${Portable.h60Duck("concat('split|', doc_id::VARCHAR)")} % 100 < 95 THEN 'val'
         |             ELSE 'test' END AS split
         |      FROM documents)
         |GROUP BY split""".stripMargin) { (s, d) =>
      val coin = s"${Portable.h60Spark("concat('split|', cast(doc_id as string))")} % 100"
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          expr(s"CASE WHEN $coin < 90 THEN 'train' WHEN $coin < 95 THEN 'val' ELSE 'test' END")
            .as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), countDistinct("lang").as("n_langs"))
    },

    // ── Benchmark-contamination check (decontamination) ────────────────
    // Corpus docs sharing word-5-gram shingles with a benchmark set
    // (here: doc_id < 50 stands in for the eval set). Both sides are
    // per-doc-distinct shingles, the benchmark side globally distinct,
    // so the join count IS the distinct-overlap count. At 100 TB the
    // benchmark set is a broadcast (evals are ~10⁵ docs); the corpus
    // never shuffles its text — only (doc_id, 1) counts move.
    Q(
      "q50_contamination",
      s"""WITH ${Dedup.shingles5Duck},
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 50),
         |corp AS (SELECT doc_id, sh FROM sh WHERE doc_id >= 50),
         |sz AS (SELECT doc_id, count(*) AS n FROM corp GROUP BY doc_id),
         |hit AS (SELECT c.doc_id, count(*) AS n_overlap
         |        FROM corp c JOIN bench b ON b.sh = c.sh
         |        GROUP BY c.doc_id)
         |SELECT h.doc_id, h.n_overlap,
         |  floor(h.n_overlap * 1000000.0 / sz.n) / 1000000.0 AS overlap_ratio
         |FROM hit h JOIN sz ON sz.doc_id = h.doc_id""".stripMargin) { (s, d) =>
      val sh = Dedup.shingles5(s, d)
      val bench = sh.filter(col("doc_id") < 50).select("sh").distinct()
      val corp = sh.filter(col("doc_id") >= 50)
      val sz = corp.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val hit = corp.join(broadcast(bench), "sh")
        .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      hit.join(sz.withColumnRenamed("doc_id", "sz_id"),
          col("doc_id") === col("sz_id"))
        .select(col("doc_id"), col("n_overlap"),
          expr("floor(n_overlap * 1000000.0D / n) / 1000000.0D").as("overlap_ratio"))
    },

    // ── Quota sampling: per-stratum cap (the "balance the mix" op) ─────
    // Keep at most K docs per (lang, source) stratum, chosen by the
    // same deterministic content-hash family as q49/q52 (salt 'quota|')
    // with doc_id as the total tiebreak: over-represented strata are
    // down-sampled to the cap, small strata pass through whole, and the
    // kept set is stable under re-runs and growth EXCEPT where new docs
    // hash below a stratum's current cut — the standard quota-sample
    // trade. One shuffle: the rank-filter shape triggers Spark's
    // WindowGroupLimit, which keeps only each stratum's top-K rows
    // per partition BEFORE the exchange (the plan shows
    // WindowGroupLimit → Sort → Exchange → WindowGroupLimit → Window),
    // so a giant stratum ships ≤ K·partitions rows, not its full size.
    Q(
      "q57_quota_sample",
      s"""SELECT doc_id, lang, source, pick_rank
         |FROM (SELECT doc_id, lang, source,
         |        row_number() OVER (PARTITION BY lang, source
         |          ORDER BY ${Portable.h60Duck("concat('quota|', doc_id::VARCHAR)")}, doc_id)
         |          AS pick_rank
         |      FROM documents)
         |WHERE pick_rank <= 5""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("pick_rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("lang", "source")
            .orderBy(
              expr(Portable.h60Spark("concat('quota|', cast(doc_id as string))")),
              col("doc_id"))))
        .filter(col("pick_rank") <= 5)
        .select("doc_id", "lang", "source", "pick_rank")
    },

    // ── Sequence packing: docs → fixed-token-budget training rows ──────
    // The batch-prep op that turns a curated corpus into training
    // sequences: within each (lang, shard) stream, docs are laid out in
    // a deterministic content-hash order and cut into 2048-token packs
    // by running token count; each doc reports its pack and offset. The
    // shard key (content-hash mod 8) bounds every packing window to
    // 1/(langs×shards) of the corpus — the real pipeline's
    // shard-then-pack layout, so no global sort exists anywhere. All
    // math is integer (token counts, running sums, integer division):
    // bit-exact across engines by construction.
    Q(
      "q60_sequence_packing",
      s"""SELECT doc_id, lang, shard, n_tokens,
         |  (cum - n_tokens) // 2048 AS pack_id,
         |  (cum - n_tokens) % 2048 AS tok_offset
         |FROM (SELECT doc_id, lang, shard, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY lang, shard
         |          ORDER BY h, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM (SELECT doc_id, lang,
         |              $packHashDuck % 8 AS shard,
         |              $packHashDuck AS h,
         |              len(string_split(text, ' ')) AS n_tokens
         |            FROM documents))""".stripMargin) { (s, d) =>
      packCum(packLayout(s, d))
        .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
          expr("(cum - n_tokens) div 2048").as("pack_id"),
          expr("(cum - n_tokens) % 2048").as("tok_offset"))
    },

    // ── Packing-efficiency audit (the q60 layout's report card) ────────
    // Tokens, used packs, and fill ratio per (lang, shard): the metric
    // that decides whether the 2048-token budget and shard count are
    // right BEFORE a 100 TB packing run. Because q60 lays tokens out
    // contiguously (offsets continue across pack boundaries), used
    // packs is exactly ceil(total/2048) — no window needed, just ONE
    // map-side-combined aggregation over the narrow (lang, shard,
    // n_tokens) projection. All integer; sums CAST AS BIGINT per the
    // HUGEINT rule.
    Q(
      "q76_packing_efficiency",
      s"""SELECT lang, shard, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  (CAST(sum(n_tokens) AS BIGINT) + 2047) // 2048 AS n_packs,
         |  (CAST(sum(n_tokens) AS BIGINT) + 2047) // 2048 * 2048
         |    - CAST(sum(n_tokens) AS BIGINT) AS waste_tokens,
         |  floor(CAST(sum(n_tokens) AS BIGINT) * 1000000.0
         |    / ((CAST(sum(n_tokens) AS BIGINT) + 2047) // 2048 * 2048)) / 1000000.0 AS fill_ratio
         |FROM (SELECT lang, $packHashDuck % 8 AS shard,
         |        len(string_split(text, ' ')) AS n_tokens
         |      FROM documents)
         |GROUP BY lang, shard""".stripMargin) { (s, d) =>
      packLayout(s, d)
        .groupBy("lang", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
        .select(col("lang"), col("shard"), col("n_docs"), col("total_tokens"),
          expr("(total_tokens + 2047) div 2048").as("n_packs"),
          expr("(total_tokens + 2047) div 2048 * 2048 - total_tokens").as("waste_tokens"),
          expr("floor(total_tokens * 1000000.0D / ((total_tokens + 2047) div 2048 * 2048)) / 1000000.0D")
            .as("fill_ratio"))
    },

    // ── Split-leakage audit: near-dup pairs straddling splits ──────────
    // The eval-hygiene closer: content-hash splitting (q52) assigns
    // docs independently, so two near-duplicates can land in train and
    // test — exactly the leakage a benchmark must not have. This audits
    // the MinHash pair set (q36's machinery) against the split
    // assignment and reports every cross-split near-dup pair. Empty
    // result = clean eval; at 100 TB the pair relation is the (tiny)
    // near-dup set, so the audit joins dup-rate-sized data, never the
    // corpus.
    Q(
      "q62_split_leakage", {
        val coin = Portable.h60Duck("concat('split|', doc_id::VARCHAR)")
        val split = s"CASE WHEN $coin % 100 < 90 THEN 'train' " +
          s"WHEN $coin % 100 < 95 THEN 'val' ELSE 'test' END"
        s"""WITH ${Dedup.shingles5Duck},
           |${Dedup.minhashCandDuck},
           |${Dedup.minhashPairsThresholdDuck},
           |sp AS (SELECT doc_id, $split AS split FROM documents)
           |SELECT a_id, b_id, spa.split AS a_split, spb.split AS b_split
           |FROM pairs
           |JOIN sp spa ON spa.doc_id = a_id
           |JOIN sp spb ON spb.doc_id = b_id
           |WHERE spa.split <> spb.split""".stripMargin
      }) { (s, d) =>
      val coin = Portable.h60Spark("concat('split|', cast(doc_id as string))")
      val splitExpr = s"CASE WHEN $coin % 100 < 90 THEN 'train' " +
        s"WHEN $coin % 100 < 95 THEN 'val' ELSE 'test' END"
      val pairs = Dedup.minhashPairs(s, d).select("a_id", "b_id")
      val sp = Tables.documents(s, d)
        .select(col("doc_id"), expr(splitExpr).as("split"))
      pairs
        .join(sp.as("spa"), col("spa.doc_id") === col("a_id"))
        .join(sp.as("spb"), col("spb.doc_id") === col("b_id"))
        .filter(col("spa.split") =!= col("spb.split"))
        .select(col("a_id"), col("b_id"),
          col("spa.split").as("a_split"), col("spb.split").as("b_split"))
    },

    // ── Mixture weighting: fractional epoch replication per source ─────
    // The "dataset mixing" step before packing: each lang gets an epoch
    // weight in milli-epochs (en 2.0, de 1.5, rest 1.0); every doc
    // yields floor(w) copies plus one more when its content-hash coin
    // lands under the fractional part — so the EXPECTED copy count per
    // lang equals the weight exactly, per-doc membership is
    // deterministic/replayable, and downstream packing sees copy as
    // part of the identity. Narrow explode, no shuffle; output size =
    // Σ weights, the op's intrinsic cost.
    Q(
      "q61_mixture_weights", {
        val coin = Portable.h60Duck("concat('mix|', doc_id::VARCHAR)")
        s"""SELECT doc_id, lang, unnest(range(1, n_copies + 1)) AS copy
           |FROM (SELECT doc_id, lang,
           |        w // 1000 + CASE WHEN $coin % 1000 < w % 1000 THEN 1 ELSE 0 END AS n_copies
           |      FROM (SELECT doc_id, lang,
           |              CASE lang WHEN 'en' THEN 2000 WHEN 'de' THEN 1500
           |                        ELSE 1000 END AS w
           |            FROM documents))""".stripMargin
      }) { (s, d) =>
      val coin = Portable.h60Spark("concat('mix|', cast(doc_id as string))")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          expr("CASE lang WHEN 'en' THEN 2000 WHEN 'de' THEN 1500 ELSE 1000 END").as("w"))
        .select(col("doc_id"), col("lang"),
          expr(s"w div 1000 + CASE WHEN $coin % 1000 < w % 1000 THEN 1 ELSE 0 END").as("n_copies"))
        .select(col("doc_id"), col("lang"),
          explode(expr("sequence(1, n_copies)")).as("copy"))
    },

    // ── Temperature-scaled mixture weights (multi-source rebalance) ────
    // The multilingual/multi-source sampling rule (XLM-R, Conneau et
    // al. 2020): raw source shares pᵢ flattened to qᵢ ∝ pᵢ^α so rare
    // sources are upsampled without letting any one source dominate.
    // α = 0.5 EXACTLY — not a tunable float — because √x is the one
    // power IEEE guarantees correctly rounded in both engines; pow(x,
    // 0.7) has no such guarantee and the two libms may disagree in the
    // last ulp. The share pᵢ is floor(n·10⁶/total) via DOUBLE — a
    // BIGINT n·10⁶ would wrap at 9.2e12 corpus tokens (≈50 TB of
    // text, the r5-ADVICE overflow class), while the double staging is
    // value-exact below 2⁵³ and engine-identical above it (same two
    // correctly-rounded ops). Everything else is integer: sᵢ =
    // ⌊√(ppmᵢ)⌋, weights = sᵢ·10⁶ div Σsⱼ (integer sum — no float
    // accumulation), boost = qᵢ/pᵢ in ppm (NULL for sub-ppm trace
    // sources via nullif, not a div-by-zero).
    //
    // Scale: one combine-reduced (source, count) aggregate, then every
    // total is the scalar-total pattern (broadcast 1-row crossJoin) —
    // nothing larger than the source list ever moves.
    Q(
      "q155_temperature_mix",
      """WITH c AS (SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM c),
        |p AS (SELECT source, n_tokens,
        |        CAST(floor(CAST(n_tokens AS DOUBLE) * 1000000.0
        |          / CAST(total AS DOUBLE)) AS BIGINT) AS p_ppm FROM c, t),
        |s AS (SELECT source, n_tokens, p_ppm,
        |        CAST(floor(sqrt(CAST(p_ppm AS DOUBLE))) AS BIGINT) AS s_i
        |      FROM p),
        |st AS (SELECT CAST(sum(s_i) AS BIGINT) AS s_total FROM s)
        |SELECT source, n_tokens, p_ppm,
        |  s_i * 1000000 // s_total AS q_ppm,
        |  (s_i * 1000000 // s_total) * 1000000 // nullif(p_ppm, 0) AS boost_ppm
        |FROM s, st""".stripMargin) { (s, d) =>
      val c = Tables.documents(s, d)
        .groupBy("source")
        .agg(expr("cast(sum(size(split(text, ' '))) as bigint)").as("n_tokens"))
      val t = c.agg(sum("n_tokens").as("total"))
      val p = c.crossJoin(broadcast(t))
        .select(col("source"), col("n_tokens"),
          expr("cast(floor(cast(n_tokens as double) * 1000000.0D" +
            " / cast(total as double)) as bigint)").as("p_ppm"))
      val sq = p.select(col("source"), col("n_tokens"), col("p_ppm"),
        expr("cast(floor(sqrt(cast(p_ppm as double))) as bigint)").as("s_i"))
      val st = sq.agg(sum("s_i").as("s_total"))
      sq.crossJoin(broadcast(st))
        .select(col("source"), col("n_tokens"), col("p_ppm"),
          expr("s_i * 1000000L div s_total").as("q_ppm"),
          expr("(s_i * 1000000L div s_total) * 1000000L div nullif(p_ppm, 0)")
            .as("boost_ppm"))
    },

    // ── Seeded global shuffle + shard manifest (training ingestion) ────
    // The last hop before the trainer: a DETERMINISTIC shuffle (hash
    // order, seeded — rerunning the pipeline must reproduce the exact
    // batch sequence) and an assignment into fixed shards, with a
    // manifest row per shard. Order is certified cross-engine without
    // materializing any per-shard list: rank each doc within its shard
    // by the seeded order key, fold (rank, doc_id) into a hash, and
    // integer-SUM the folds — the rank captures order inside an
    // associative aggregate, so the checksum is exchange-friendly
    // where a collect_list manifest would concentrate a whole shard
    // in one task. Checksums are reduced mod 10⁹ before summing:
    // the BIGINT sum stays exact below 9.2e9 docs PER SHARD (shard
    // counts are chosen to keep shards ~GB-sized long before that).
    //
    // Scale: one window sort within shard (the same sort the shard
    // writer needs anyway) + a 32-row combine-reduced manifest
    // aggregate. Nothing but (shard, rank, ids) moves.
    Q(
      "q163_shuffle_shards", {
        val shard = Portable.h60Duck("concat('shuf|42|', doc_id::VARCHAR)")
        val ordk = Portable.h60Duck("concat('ord|42|', doc_id::VARCHAR)")
        s"""WITH a AS (SELECT doc_id,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
           |    $shard % 32 AS shard, $ordk AS ordk
           |  FROM documents),
           |r AS (SELECT doc_id, n, shard,
           |    row_number() OVER (PARTITION BY shard ORDER BY ordk, doc_id) AS rk
           |  FROM a)
           |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n) AS BIGINT) AS n_tokens,
           |  CAST(sum(${Portable.h60Duck("concat(rk::VARCHAR, '|', doc_id::VARCHAR)")} % 1000000000) AS BIGINT)
           |    AS order_sum
           |FROM r GROUP BY shard""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val shard =
        s"${Portable.h60Spark("concat('shuf|42|', cast(doc_id as string))")} % 32"
      val ordk = Portable.h60Spark("concat('ord|42|', cast(doc_id as string))")
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("cast(size(split(text, ' ')) as bigint)").as("n"),
          expr(shard).as("shard"), expr(ordk).as("ordk"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("shard").orderBy(col("ordk"), col("doc_id"))))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"),
          sum(expr(s"${Portable.h60Spark("concat(cast(rk as string), '|', cast(doc_id as string))")} % 1000000000"))
            .as("order_sum"))
    },

    // ── Sequence-length histogram: the packing-planner's profile ───────
    // Power-of-two length bins per lang with doc counts, token mass,
    // cumulative docs and share-of-lang — the distribution a packing
    // job (q60) reads to pick its sequence budget and shard count, and
    // the truncation-loss estimate for any candidate max_len. The bin
    // index is length(bin(n)) = ⌊log₂ n⌋ + 1 computed on the BINARY
    // STRING, not floor(log2(n)): float log returns 4.999… at power-of-
    // two boundaries on some libm builds, and the two engines need not
    // share one — string length is integer-exact on both. One
    // aggregation exchange on (lang, bin); the windows then run over
    // the ~langs×bins aggregate, not the corpus. Integer sums wrapped
    // CAST AS BIGINT in the oracle (DuckDB widens sum() to HUGEINT,
    // which the driver canonicalizes differently — the q55/q60 rule).
    Q(
      "q69_length_histogram",
      s"""SELECT lang, bin_id, (1::BIGINT << CAST(bin_id - 1 AS INT)) AS bin_lo,
         |  n_docs, n_tokens_total,
         |  CAST(sum(n_docs) OVER (PARTITION BY lang ORDER BY bin_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
         |  floor(n_docs * 1000000.0
         |    / CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT)) / 1000000.0 AS doc_share
         |FROM (SELECT lang, length(bin(n_tokens)) AS bin_id,
         |        count(*) AS n_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total
         |      FROM (SELECT lang, len(string_split(text, ' ')) AS n_tokens FROM documents)
         |      GROUP BY lang, length(bin(n_tokens)))""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byBin = Tables.documents(s, d)
        .select(col("lang"), expr("cast(size(split(text, ' ')) as bigint)").as("n_tokens"))
        .groupBy(col("lang"),
          expr("cast(length(bin(n_tokens)) as bigint)").as("bin_id"))
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens_total"))
      byBin
        .withColumn("cum_docs", sum("n_docs").over(
          Window.partitionBy("lang").orderBy("bin_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("lang_docs", sum("n_docs").over(Window.partitionBy("lang")))
        .select(col("lang"), col("bin_id"),
          expr("shiftleft(cast(1 as bigint), cast(bin_id - 1 as int))").as("bin_lo"),
          col("n_docs"), col("n_tokens_total"), col("cum_docs"),
          expr("floor(n_docs * 1000000.0D / lang_docs) / 1000000.0D").as("doc_share"))
    },

    // ── Pack materialization: the packing layout's OUTPUT step ─────────
    // q60 assigns docs to packs; this op actually BUILDS each training
    // sequence: concatenate the pack's docs in the layout order and
    // emit per-pack rows. The comparison column is md5 of the
    // concatenated text — any divergence in membership, order, or
    // content shows up as a hash mismatch, without corpus-sized output
    // rows. Spark has no ORDER BY inside string_agg, so the ordered
    // concat is array_sort(collect_list(struct(h, doc_id, text))) →
    // transform → array_join: struct sort is lexicographic by field,
    // exactly the oracle's ORDER BY h, doc_id. Scale: the window is
    // q60's per-(lang, shard) pass; the final groupBy's clustering
    // keys extend the window's partitioning keys, so it introduces NO
    // new exchange (partial agg feeds the same layout), and the text
    // movement it does is the op's intrinsic output cost. Per-group
    // state is one pack ≈ 2048 tokens — bounded regardless of corpus
    // size.
    Q(
      "q81_pack_materialize",
      s"""WITH base AS (SELECT doc_id, lang, text, $packHashDuck % 8 AS shard,
         |                $packHashDuck AS h,
         |                len(string_split(text, ' ')) AS n_tokens
         |              FROM documents),
         |w AS (SELECT doc_id, lang, shard, text, h, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY h, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM base)
         |SELECT lang, shard, pack_id, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  md5(string_agg(text, ' ' ORDER BY h, doc_id)) AS pack_md5
         |FROM (SELECT lang, shard, (cum - n_tokens) // 2048 AS pack_id,
         |        text, h, doc_id, n_tokens FROM w)
         |GROUP BY lang, shard, pack_id""".stripMargin) { (s, d) =>
      packCum(packLayout(s, d))
        .withColumn("pack_id", expr("(cum - n_tokens) div 2048"))
        .groupBy("lang", "shard", "pack_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("pack_tokens"),
          md5(expr("array_join(transform(array_sort(collect_list(struct(h, doc_id, text)))," +
            " x -> x.text), ' ')")).as("pack_md5"))
    },

    // ── Snapshot diff: what changed between two corpus versions ────────
    // The data-versioning audit run before re-training on a refreshed
    // corpus: per source, how many docs were added, removed, edited, or
    // untouched between yesterday's snapshot and today's. The two
    // snapshots here are deterministic derivations of the one test
    // table (v1 = docs below the q58-style absolute cut, with
    // doc_id ≡ 0 mod 7 "edited since"; v2 = today's corpus minus
    // doc_id ≡ 5 mod 13 "deleted today") standing in for two real
    // manifests. The operator proper is the hash-diff: ONE narrow scan
    // computes both versions' content md5s, and the full-outer join
    // moves (doc_id, 32-byte hash, source, count) — never text — so at
    // 100 TB the diff costs one id-keyed exchange of hash rows; class
    // counts then combine map-side. The cut broadcasts as a 1-row
    // dimension (no driver collect).
    Q(
      "q82_snapshot_diff",
      """WITH cut AS (SELECT max(doc_id) - 49 AS c FROM documents),
        |v1 AS (SELECT doc_id, source,
        |         md5(CASE WHEN doc_id % 7 = 0 THEN concat(text, ' rev1') ELSE text END) AS h,
        |         len(string_split(text, ' ')) AS n_tokens
        |       FROM documents, cut WHERE doc_id < cut.c),
        |v2 AS (SELECT doc_id, source, md5(text) AS h,
        |         len(string_split(text, ' ')) AS n_tokens
        |       FROM documents WHERE doc_id % 13 <> 5),
        |d AS (SELECT COALESCE(v2.source, v1.source) AS source,
        |        COALESCE(v2.n_tokens, v1.n_tokens) AS n_tokens,
        |        CASE WHEN v1.doc_id IS NULL THEN 'added'
        |             WHEN v2.doc_id IS NULL THEN 'removed'
        |             WHEN v1.h <> v2.h THEN 'changed'
        |             ELSE 'unchanged' END AS change
        |      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT source, change, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM d GROUP BY source, change""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cut = docs.agg(expr("max(doc_id) - 49").as("c"))
      val base = docs.select(col("doc_id"), col("source"),
          md5(col("text")).as("h2"),
          md5(expr("CASE WHEN doc_id % 7 = 0 THEN concat(text, ' rev1') ELSE text END"))
            .as("h1"),
          expr("cast(size(split(text, ' ')) as bigint)").as("n_tokens"))
        .crossJoin(broadcast(cut))
        .transform(CacheScope.scoped) // one text scan + md5 pass serves both snapshot views
      val v1 = base.filter(col("doc_id") < col("c"))
        .select(col("doc_id").as("id1"), col("source").as("src1"),
          col("h1"), col("n_tokens").as("nt1"))
      val v2 = base.filter(expr("doc_id % 13 <> 5"))
        .select(col("doc_id").as("id2"), col("source").as("src2"),
          col("h2"), col("n_tokens").as("nt2"))
      v1.join(v2, col("id1") === col("id2"), "full_outer")
        .select(
          coalesce(col("src2"), col("src1")).as("source"),
          expr("CASE WHEN id1 IS NULL THEN 'added' WHEN id2 IS NULL THEN 'removed' " +
            "WHEN h1 <> h2 THEN 'changed' ELSE 'unchanged' END").as("change"),
          coalesce(col("nt2"), col("nt1")).as("toks"))
        .groupBy("source", "change")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
    },

    // ── Token-budget apportionment (largest-remainder allocation) ──────
    // The mix-planning op upstream of q61's replication: split a fixed
    // training-token budget (10⁶ here) across languages proportionally
    // to corpus mass so the parts sum to the budget EXACTLY — floor
    // division alone under-allocates by up to (parts−1) tokens, and
    // naive rounding can over- or under-shoot. Hamilton's
    // largest-remainder method is exact and fully relational: base =
    // B·w ∕∕ W per lang, then the leftover B − Σbase (< #langs) goes
    // to the largest remainders, ties broken by lang. Every stage is
    // integer; the ranking window runs over the LANG AGGREGATE
    // (~languages rows — q56's single-partition concern does not
    // apply to aggregate-sized windows). Overflow bound: B·w < 2⁶³,
    // i.e. budget × largest-lang mass under ~9.2×10¹⁸ — production at
    // 100 TB pre-scales weights to ppm first (the documented qval
    // trade) at the cost of the exact-sum guarantee's last token.
    Q(
      "q89_token_budget",
      """WITH w AS (SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS w
        |           FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
        |base AS (SELECT lang, w, CAST(1000000 * w // tot.tw AS BIGINT) AS base_alloc,
        |           CAST((1000000 * w) % tot.tw AS BIGINT) AS rem
        |         FROM w, tot),
        |lo AS (SELECT CAST(1000000 - sum(base_alloc) AS BIGINT) AS leftover FROM base),
        |r AS (SELECT lang, w, base_alloc, rem,
        |        CAST(row_number() OVER (ORDER BY rem DESC, lang) AS BIGINT) AS rk FROM base)
        |SELECT lang, w AS n_tokens, base_alloc,
        |  CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END AS extra,
        |  base_alloc + CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END AS alloc
        |FROM r, lo""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Tables.documents(s, d)
        .select(col("lang"), expr("cast(size(split(text, ' ')) as bigint)").as("n"))
        .groupBy("lang").agg(sum("n").as("w"))
        .transform(CacheScope.scoped) // tiny lang aggregate, consumed by tot/base/lo chain
      val tot = w.agg(sum("w").as("tw"))
      val base = w.crossJoin(broadcast(tot))
        .select(col("lang"), col("w"),
          expr("(1000000 * w) div tw").as("base_alloc"),
          expr("(1000000 * w) % tw").as("rem"))
      val lo = base.agg(expr("1000000 - sum(base_alloc)").as("leftover"))
      base
        .withColumn("rk", expr("cast(row_number() over (order by rem desc, lang) as bigint)"))
        .crossJoin(broadcast(lo))
        .select(col("lang"), col("w").as("n_tokens"), col("base_alloc"),
          expr("CASE WHEN rk <= leftover THEN 1 ELSE 0 END").as("extra"),
          expr("base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END").as("alloc"))
    },

    // ── Weighted priority sampling, top-K per stratum ──────────────────
    // Length-weighted sampling without RNG state (Duffield et al.'s
    // priority sampling; the hash-coin analog of A-ES weighted
    // reservoirs): each doc draws a deterministic uniform u ∈ [1, 2^20]
    // from its salted content hash and competes on priority = w·2^20/u
    // — inclusion probability proportional to weight, reproducible
    // across runs, engines, and partitionings. Both factors are exact
    // integers ≤ 2^53, so the single IEEE divide is correctly rounded
    // and bit-identical on both engines — no float accumulation
    // anywhere. The per-source top-K rank-filter triggers
    // WindowGroupLimit (like q57): each map task keeps ≤ K rows per
    // stratum BEFORE the exchange, so the shuffle carries
    // K·partitions·strata rows, never the corpus.
    Q(
      "q101_priority_sample", {
        val h = Portable.h60Duck("concat('psamp|', doc_id::VARCHAR)")
        s"""SELECT source, rk, doc_id, n_chars FROM (
           |  SELECT source, doc_id, n_chars,
           |    row_number() OVER (PARTITION BY source ORDER BY
           |      CAST(n_chars AS DOUBLE) * 1048576.0 / ($h % 1048576 + 1) DESC,
           |      doc_id) AS rk
           |  FROM documents)
           |WHERE rk <= 25""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val h = Portable.h60Spark("concat('psamp|', cast(doc_id as string))")
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"),
          expr(s"CAST(n_chars AS DOUBLE) * 1048576.0D / ($h % 1048576 + 1)").as("pri"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(col("pri").desc, col("doc_id"))))
        .where(col("rk") <= 25)
        .select("source", "rk", "doc_id", "n_chars")
    },

    // ── Bloom-prefiltered contamination gate ───────────────────────────
    // q50's decontamination join with an explicit bloom runtime filter
    // in front of it — the shape Spark's own InjectRuntimeFilter gives
    // selective joins, here as a first-class operator with fixed,
    // deterministic bits. The benchmark's 5-gram shingles fold into a
    // 4096-bit / 2-probe bloom represented as a 64-row (word, bits)
    // RELATION — built with one bit_or aggregation, broadcast at
    // constant size no matter how large the benchmark grows (the full
    // distinct-shingle broadcast q50 uses stops fitting first; in
    // production m scales ~10 bits/shingle). Corpus shingles probe both
    // bit positions via broadcast equi-joins; only bloom-positive
    // shingles reach the exact benchmark join, which removes the false
    // positives, so the output is EXACT — the oracle is the bloom-free
    // join. Docs with ≥ 3 true benchmark shingles are the delete list.
    Q(
      "q102_bloom_contamination",
      s"""WITH ${Dedup.shingles5Duck},
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 50),
         |corp AS (SELECT doc_id, sh FROM sh WHERE doc_id >= 50)
         |SELECT c.doc_id, count(*) AS n_overlap
         |FROM corp c JOIN bench b ON b.sh = c.sh
         |GROUP BY c.doc_id HAVING count(*) >= 3""".stripMargin) { (s, d) =>
      val sh = Dedup.shingles5(s, d)
      val bench = sh.filter(col("doc_id") < 50).select("sh").distinct().transform(CacheScope.scoped)
      val corp = sh.filter(col("doc_id") >= 50)
      // two probe positions per shingle from disjoint hash bits
      val p1 = "(sh % 4096)"
      val p2 = "((sh div 4096) % 4096)"
      val bloom = bench
        .select(explode(array(expr(p1), expr(p2))).as("p"))
        .groupBy(expr("p div 64").as("w"))
        .agg(expr("bit_or(shiftleft(1L, cast(p % 64 as int)))").as("bits"))
      val cand = corp
        .withColumn("w1", expr(s"$p1 div 64"))
        .join(broadcast(bloom.select(col("w").as("w1"), col("bits").as("b1"))), "w1")
        .where(expr(s"(b1 & shiftleft(1L, cast($p1 % 64 as int))) != 0"))
        .withColumn("w2", expr(s"$p2 div 64"))
        .join(broadcast(bloom.select(col("w").as("w2"), col("bits").as("b2"))), "w2")
        .where(expr(s"(b2 & shiftleft(1L, cast($p2 % 64 as int))) != 0"))
        .select("doc_id", "sh")
      cand.join(broadcast(bench), "sh")
        .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
        .where(col("n_overlap") >= 3)
    },

    // ── DSIR-style importance weighting (data selection) ───────────────
    // Data Selection via Importance Resampling (Xie et al. 2023,
    // arXiv:2302.03169): score every raw doc by how target-domain-like
    // its HASHED N-GRAM feature distribution is, then keep the top
    // slice. Target here = the src0 docs (the "curated in-domain
    // sample"); features = unigram tokens hashed into a FIXED 4096
    // buckets — the paper's point, and the 100 TB point: model size is
    // 4096 counters regardless of corpus vocabulary, the two feature
    // tables are one map-side-combined aggregation each, and scoring is
    // a broadcast join of a constant-size relation onto one token pass.
    // DIVERGENCE (documented): DSIR's weight is Π p_t/p_r over tokens
    // (= exp Σ log-ratios); libm log/exp is not engine-portable, so the
    // score is the ARITHMETIC mean of per-token probability ratios —
    // same signal (monotone in per-token lift), integer-exact edges.
    // Ratio math: smoothed (+1 count, +B denominator) bucket probs via
    // one correctly-rounded DOUBLE expression — counts cast exactly
    // (int64 < 2^53 up to ~9e15 tokens ≈ 36 PB of text), identical op
    // order both engines — floored to ppm and capped at 100× (1e8 ppm)
    // so a doc's BIGINT ratio sum is bounded by n_tok·1e8 (overflow
    // needs a 9e10-token doc). Top-20 by (score, doc_id) plans as
    // TakeOrderedAndProject — no global sort, no window.
    Q(
      "q146_dsir_importance", {
        val b = s"${Portable.h60Duck("t")} % 4096"
        s"""WITH tb AS (SELECT doc_id, source, lang, $b AS b
           |            FROM (SELECT doc_id, source, lang,
           |                    unnest(string_split(text, ' ')) AS t
           |                  FROM documents)),
           |raw AS (SELECT b, count(*) AS cr FROM tb GROUP BY b),
           |tgt AS (SELECT b, count(*) AS ct FROM tb WHERE source = 'src0' GROUP BY b),
           |tot AS (SELECT count(*) AS nr,
           |          count(CASE WHEN source = 'src0' THEN 1 END) AS nt FROM tb),
           |feats AS (SELECT raw.b,
           |  CAST(floor(least(((CAST(coalesce(ct, 0) + 1 AS DOUBLE) * CAST(nr + 4096 AS DOUBLE))
           |    / (CAST(cr + 1 AS DOUBLE) * CAST(nt + 4096 AS DOUBLE))) * 1000000.0,
           |    100000000.0)) AS BIGINT) AS ratio_ppm
           |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot)
           |SELECT tb.doc_id, tb.source, tb.lang, count(*) AS n_tok,
           |  CAST(CAST(sum(ratio_ppm) AS BIGINT) // count(*) AS BIGINT) AS score_ppm
           |FROM tb JOIN feats ON tb.b = feats.b
           |GROUP BY tb.doc_id, tb.source, tb.lang
           |ORDER BY score_ppm DESC, doc_id LIMIT 20""".stripMargin
      }) { (s, d) =>
      val tb = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"),
          explode(expr("split(text, ' ')")).as("t"))
        .select(col("doc_id"), col("source"), col("lang"),
          expr(s"${Portable.h60Spark("t")} % 4096").as("b"))
        .transform(CacheScope.scoped) // one token pass feeds both feature tables and the probe
      val raw = tb.groupBy("b").agg(count(lit(1)).as("cr"))
      val tgt = tb.filter(col("source") === "src0")
        .groupBy("b").agg(count(lit(1)).as("ct"))
      val tot = tb.agg(
        count(lit(1)).as("nr"),
        count(expr("CASE WHEN source = 'src0' THEN 1 END")).as("nt"))
      // feats is ≤ 4096 rows BY CONSTRUCTION (hashed feature space) —
      // the broadcast hint is justified at any corpus size
      val feats = raw.join(tgt, Seq("b"), "left")
        .crossJoin(broadcast(tot))
        .select(col("b"),
          expr("CAST(floor(least(((CAST(coalesce(ct, 0) + 1 AS DOUBLE) * CAST(nr + 4096 AS DOUBLE))" +
            " / (CAST(cr + 1 AS DOUBLE) * CAST(nt + 4096 AS DOUBLE))) * 1000000.0D," +
            " 100000000.0D)) AS BIGINT)").as("ratio_ppm"))
      tb.join(broadcast(feats), "b")
        .groupBy("doc_id", "source", "lang")
        .agg(count(lit(1)).as("n_tok"),
          expr("sum(ratio_ppm) div count(*)").as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("doc_id"))
        .limit(20)
    },

    // ── Context-window chunking with stride ────────────────────────────
    // The training-prep step between curation and packing: split each
    // document into model-context-sized token windows (W=32) with
    // overlap (stride S=24, so 8 tokens of context carry over), the
    // standard recipe for next-token training over docs longer than the
    // context. Chunk count is 1 + ceil(max(n−W, 0)/S) — every token is
    // covered, the last window may run short. Output one row per chunk
    // with its md5, so the oracle certifies the exact chunk contents,
    // boundaries, and count. Scale shape: pure narrow per-row work —
    // split/transform/posexplode with NO exchange at all (the ×(W/S)
    // amplification happens inside the map stage); downstream consumers
    // (packing q60, tokenize) see chunks as ordinary docs.
    Q(
      "q150_chunk_windows",
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |ch AS (SELECT doc_id,
        |    unnest(list_transform(range(0, (greatest(len(ws) - 32, 0) + 23) // 24 + 1),
        |      i -> {'idx': i,
        |            'ntok': len(ws[(i*24+1):(i*24+32)]),
        |            'h': md5(array_to_string(ws[(i*24+1):(i*24+32)], ' '))})) AS u
        |  FROM ws)
        |SELECT doc_id, CAST(u.idx AS BIGINT) AS chunk_idx,
        |  CAST(u.ntok AS BIGINT) AS n_tok, u.h AS chunk_hash
        |FROM ch""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        // sequence upper bound ≥ 0 by construction (greatest(..., 0)),
        // so the descending-sequence edge (ADVICE r5) cannot trigger
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, (greatest(size(ws) - 32, 0) + 23) div 24)," +
            " i -> struct(size(slice(ws, i * 24 + 1, 32)) as ntok," +
            " md5(array_join(slice(ws, i * 24 + 1, 32), ' ')) as h))")))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          col("col.ntok").cast("long").as("n_tok"),
          col("col.h").as("chunk_hash"))
    },

    // ── Length-bucketed batching + padding-waste audit ─────────────────
    // The inference/eval-serving counterpart of training-side packing
    // (q60): sequences batched together pad to the longest in the
    // batch, so servers bucket by length first. Fixed power-of-two
    // boundaries (32/64/128/256/512 — explicit CASE, not log2(): float
    // log at an exact power of two is not guaranteed correctly rounded
    // in either engine, and real servers use a fixed bucket table
    // anyway). Sequences longer than the last boundary go to an
    // explicit overflow bucket (label -1) that pads to its own longest
    // sequence — padding to a boundary SHORTER than the sequence would
    // be dishonest (r6 ADVICE), and a real server falls back to
    // max-in-batch exactly this way. `pad_to` carries the realized pad
    // width per bucket (= the boundary for labeled buckets, = max(n)
    // for overflow). Per bucket: sequence/batch counts at batch size
    // 16, the padded token volume actually computed, and the ppm of it
    // that is padding — the number the boundaries are tuned to
    // minimize.
    //
    // Scale: one narrow projection (token count per doc) into a
    // 5-row combine-reduced aggregate; nothing but (bucket, n, 1)
    // crosses the exchange. waste_ppm divides two exact int64-valued
    // doubles (padded < 2⁵³ holds to ~9e15 padded tokens per bucket —
    // beyond any real shard; the division-then-scale is two correctly-
    // rounded IEEE ops, identical in both engines).
    Q(
      "q152_length_buckets",
      """WITH n AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents),
        |b AS (SELECT n, CAST(CASE WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64
        |                 WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256
        |                 WHEN n <= 512 THEN 512
        |                 ELSE -1 END AS BIGINT) AS bucket FROM n),
        |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_seqs,
        |        CAST(sum(n) AS BIGINT) AS n_tokens,
        |        CASE WHEN bucket = -1 THEN CAST(max(n) AS BIGINT)
        |             ELSE bucket END AS pad_to
        |      FROM b GROUP BY bucket)
        |SELECT bucket, n_seqs, n_tokens, pad_to,
        |  n_seqs * pad_to AS padded_tokens,
        |  (n_seqs + 15) // 16 AS n_batches,
        |  CAST(floor(CAST(n_seqs * pad_to - n_tokens AS DOUBLE)
        |       / CAST(n_seqs * pad_to AS DOUBLE) * 1000000.0) AS BIGINT)
        |    AS waste_ppm
        |FROM g""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(expr("cast(size(split(text, ' ')) as bigint)").as("n"))
        .select(col("n"), expr(
          "cast(CASE WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64" +
            " WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256" +
            " WHEN n <= 512 THEN 512 ELSE -1 END as bigint)").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_seqs"), sum("n").as("n_tokens"),
          expr("CASE WHEN bucket = -1 THEN max(n) ELSE bucket END")
            .as("pad_to"))
        .select(col("bucket"), col("n_seqs"), col("n_tokens"), col("pad_to"),
          (col("n_seqs") * col("pad_to")).as("padded_tokens"),
          expr("(n_seqs + 15) div 16").as("n_batches"),
          expr("cast(floor(cast(n_seqs * pad_to - n_tokens as double)" +
            " / cast(n_seqs * pad_to as double) * 1000000.0D) as bigint)")
            .as("waste_ppm"))
    })
}
