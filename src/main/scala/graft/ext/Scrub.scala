package graft.ext

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Content-scrubbing operators a training-data pipeline runs before
  * releasing a corpus: PII detection/redaction and repetition-based
  * quality metrics (the Gopher-style filters of Rae et al. 2021,
  * "Scaling Language Models", §A.1.1).
  *
  * Regex portability: patterns avoid backslash escapes entirely
  * (character classes like `[.]` instead of `\.`), because Spark's SQL
  * string literals process backslashes while DuckDB's do not — the same
  * pattern TEXT must reach both engines' regex compilers. The pattern
  * subset used (classes, repetition counts, no backrefs/lookaround)
  * behaves identically under Java regex and RE2.
  *
  * Scale: q54 is a pure narrow projection. q55 shuffles (doc_id,
  * 8-byte gram hash) pairs — never gram text — with map-side combine;
  * both survive a 100× scale-up unchanged.
  */
object Scrub {

  private val emailPat = "[a-z0-9._]+@[a-z0-9.-]+[.][a-z]+"
  private val phonePat = "[0-9]{3}-[0-9]{4}"
  private val ipPat = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

  /** The PII operator proper: given (doc_id, enr), emit per-type match
    * counts, the total, the redacted text, and its md5. Redaction order
    * matters and must match the oracle: email first (its local part
    * may contain digits and dots), then IP before phone (an IP octet
    * pair must not be half-eaten by a phone-shaped digit run). Spark's
    * regexp_replace is global by default; the DuckDB mirror passes 'g'.
    * Pure projection — codegen'd, no shuffle.
    */
  private[graft] def scrub(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(
      col("doc_id"),
      expr(s"cast(size(regexp_extract_all(enr, '$emailPat', 0)) as bigint)").as("n_emails"),
      expr(s"cast(size(regexp_extract_all(enr, '$phonePat', 0)) as bigint)").as("n_phones"),
      expr(s"cast(size(regexp_extract_all(enr, '$ipPat', 0)) as bigint)").as("n_ips"),
      expr(s"""cast(size(regexp_extract_all(enr, '$emailPat', 0)) +
             |     size(regexp_extract_all(enr, '$phonePat', 0)) +
             |     size(regexp_extract_all(enr, '$ipPat', 0)) as bigint)""".stripMargin).as("pii_total"),
      expr(s"""regexp_replace(regexp_replace(regexp_replace(enr,
             |  '$emailPat', '<EMAIL>'),
             |  '$ipPat', '<IP>'),
             |  '$phonePat', '<PHONE>')""".stripMargin).as("redacted"))
      .withColumn("redacted_md5", md5(col("redacted")))

  /** The synthetic corpus contains no PII, so the query ENRICHES each
    * doc with deterministic fixture PII first (email on ids ≡ 0 mod 3,
    * phone on ≡ 0 mod 4, IP on ≡ 0 mod 5) — identical string built on
    * both engines — then detects and redacts it. The md5 of the
    * redacted text makes the comparison total: any cross-engine
    * divergence in match boundaries or replacement shows up as a hash
    * mismatch, not a silently-equal count.
    */
  private def enrichedDuck =
    """CASE WHEN doc_id % 3 = 0
      |     THEN concat('mail user', CAST(doc_id AS VARCHAR), '@mail.example ') ELSE '' END ||
      |CASE WHEN doc_id % 4 = 0
      |     THEN concat('call 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' ') ELSE '' END ||
      |CASE WHEN doc_id % 5 = 0
      |     THEN concat('host 10.0.', CAST(doc_id % 256 AS VARCHAR), '.',
      |                 CAST((doc_id * 7) % 256 AS VARCHAR), ' ') ELSE '' END || text""".stripMargin

  private def enrichedSpark =
    """concat(
      |  CASE WHEN doc_id % 3 = 0
      |       THEN concat('mail user', CAST(doc_id AS STRING), '@mail.example ') ELSE '' END,
      |  CASE WHEN doc_id % 4 = 0
      |       THEN concat('call 555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), ' ') ELSE '' END,
      |  CASE WHEN doc_id % 5 = 0
      |       THEN concat('host 10.0.', CAST(doc_id % 256 AS STRING), '.',
      |                   CAST((doc_id * 7) % 256 AS STRING), ' ') ELSE '' END,
      |  text)""".stripMargin

  val all: Seq[Q] = Seq(
    // ── PII detection + redaction ──────────────────────────────────────
    Q(
      "q54_pii_scrub",
      s"""SELECT doc_id,
         |  len(regexp_extract_all(enr, '$emailPat')) AS n_emails,
         |  len(regexp_extract_all(enr, '$phonePat')) AS n_phones,
         |  len(regexp_extract_all(enr, '$ipPat'))    AS n_ips,
         |  len(regexp_extract_all(enr, '$emailPat')) +
         |  len(regexp_extract_all(enr, '$phonePat')) +
         |  len(regexp_extract_all(enr, '$ipPat'))    AS pii_total,
         |  md5(regexp_replace(regexp_replace(regexp_replace(enr,
         |      '$emailPat', '<EMAIL>', 'g'),
         |      '$ipPat', '<IP>', 'g'),
         |      '$phonePat', '<PHONE>', 'g'))          AS redacted_md5
         |FROM (SELECT doc_id, $enrichedDuck AS enr FROM documents)""".stripMargin) { (s, d) =>
      scrub(Tables.documents(s, d)
          .select(col("doc_id"), expr(enrichedSpark).as("enr")))
        .drop("redacted")
    },

    // ── Repetition metrics (Gopher-style quality filters) ──────────────
    // Fraction of tokens accounted for by the most frequent token, and
    // of 2-grams by the most frequent 2-gram — the "excessive
    // repetition" signals used to drop degenerate/boilerplate docs.
    // One exchange: unigrams and bigrams are tagged into one gram
    // stream hashed to 60-bit ints ([[Portable]]), counted per (doc,
    // n, hash) with map-side combine, then reduced to per-doc maxima.
    Q(
      "q55_repetition", {
        val g1 = Portable.h60Duck("t")
        val g2 = Portable.h60Duck("array_to_string(ts[i:i+1], ' ')")
        s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
           |grams AS (
           |  SELECT doc_id, 1 AS n, unnest(list_transform(ts, t -> $g1)) AS h FROM tok
           |  UNION ALL
           |  SELECT doc_id, 2 AS n, unnest(list_transform(range(1, len(ts)),
           |           i -> $g2)) AS h FROM tok),
           |cnt AS (SELECT doc_id, n, h, count(*) AS c FROM grams GROUP BY doc_id, n, h),
           |agg AS (SELECT doc_id, n, max(c) AS top_c,
           |               CAST(sum(c) AS BIGINT) AS total_c
           |        FROM cnt GROUP BY doc_id, n)
           |SELECT doc_id,
           |  max(CASE WHEN n = 1 THEN total_c END) AS n_tokens,
           |  floor(max(CASE WHEN n = 1 THEN top_c END) * 1000000.0
           |        / max(CASE WHEN n = 1 THEN total_c END)) / 1000000.0 AS top_token_share,
           |  max(CASE WHEN n = 2 THEN total_c END) AS n_2grams,
           |  floor(max(CASE WHEN n = 2 THEN top_c END) * 1000000.0
           |        / max(CASE WHEN n = 2 THEN total_c END)) / 1000000.0 AS top_2gram_share,
           |  floor(max(CASE WHEN n = 2 THEN top_c END) * 1000000.0
           |        / max(CASE WHEN n = 2 THEN total_c END)) / 1000000.0 >= 0.2 AS repetitive
           |FROM agg GROUP BY doc_id""".stripMargin
      }) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), expr("split(text, ' ')").as("ts"))
      val uni = toks.select(col("doc_id"), lit(1).as("n"),
        explode(expr(s"transform(ts, t -> ${Portable.h60Spark("t")})")).as("h"))
      // 1-token docs have no bigram (DuckDB's range is empty; Spark's
      // sequence(1, 0) would descend and crash slice(ts, 0, 2)) — they
      // still reach the unigram branch above, so n_2grams is NULL for
      // them on both engines
      val bi = toks.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), lit(2).as("n"),
          explode(expr("transform(sequence(1, size(ts) - 1), " +
            s"i -> ${Portable.h60Spark("array_join(slice(ts, i, 2), ' ')")})")).as("h"))
      uni.union(bi)
        .groupBy("doc_id", "n", "h").agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "n").agg(max("c").as("top_c"), sum("c").as("total_c"))
        .groupBy("doc_id")
        .agg(
          max(when(col("n") === 1, col("total_c"))).as("n_tokens"),
          expr("floor(max(CASE WHEN n = 1 THEN top_c END) * 1000000.0D" +
            " / max(CASE WHEN n = 1 THEN total_c END)) / 1000000.0D").as("top_token_share"),
          max(when(col("n") === 2, col("total_c"))).as("n_2grams"),
          expr("floor(max(CASE WHEN n = 2 THEN top_c END) * 1000000.0D" +
            " / max(CASE WHEN n = 2 THEN total_c END)) / 1000000.0D").as("top_2gram_share"),
          // the flag compares the TRUNCATED share (bit-identical across
          // engines), not the raw ratio — a raw decimal-vs-double ratio
          // could straddle the threshold differently on a near-tie
          expr("floor(max(CASE WHEN n = 2 THEN top_c END) * 1000000.0D" +
            " / max(CASE WHEN n = 2 THEN total_c END)) / 1000000.0D >= 0.2D").as("repetitive"))
    },

    // ── k-anonymity audit over release metadata ────────────────────────
    // The privacy check a corpus release runs AFTER content scrubbing
    // (q54 removes PII from text; this measures re-identification risk
    // from the metadata that ships alongside it): a document whose
    // quasi-identifier tuple — (lang, source, coarse length bucket)
    // here — is shared by fewer than k=5 documents can be singled out
    // by anyone who knows those attributes (Sweeney 2002). Per source:
    // the achieved k (the smallest group = the k the release actually
    // provides), group/risk counts, and the ppm of docs needing
    // suppression or generalization to reach k=5.
    //
    // Scale: two hash aggregations. The first is keyed on the quasi-id
    // tuple — by definition coarse (its whole point is to be low-
    // cardinality), so the combine-reduced exchange carries one row per
    // distinct tuple, metadata-sized at any corpus size; the second
    // reduces tuples per source. No text ever moves. All counts are
    // BIGINT; the ppm is integer-division of integer counts — no
    // float aggregation anywhere.
    Q(
      "q151_k_anonymity",
      """WITH g AS (SELECT lang, source, n_chars // 100 AS len_bucket,
        |             CAST(count(*) AS BIGINT) AS c
        |           FROM documents GROUP BY 1, 2, 3)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  min(c) AS k_anonymity,
        |  CAST(count(CASE WHEN c < 5 THEN 1 END) AS BIGINT) AS n_risky_groups,
        |  CAST(COALESCE(sum(CASE WHEN c < 5 THEN c END), 0) AS BIGINT) AS n_risky_docs,
        |  CAST(sum(c) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(sum(CASE WHEN c < 5 THEN c END), 0) AS BIGINT)
        |    * 1000000 // CAST(sum(c) AS BIGINT) AS risky_ppm
        |FROM g GROUP BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 100").as("len_bucket"))
        .agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_groups"),
          min("c").as("k_anonymity"),
          count(when(col("c") < 5, 1)).as("n_risky_groups"),
          coalesce(sum(when(col("c") < 5, col("c"))), lit(0L)).as("n_risky_docs"),
          sum("c").as("n_docs"))
        .select(col("source"), col("n_groups"), col("k_anonymity"),
          col("n_risky_groups"), col("n_risky_docs"), col("n_docs"),
          expr("n_risky_docs * 1000000L div n_docs").as("risky_ppm"))
    })
}
