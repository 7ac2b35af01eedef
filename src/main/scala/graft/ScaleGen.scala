package graft

import org.apache.spark.sql.functions._

/** Builds a scaled-up copy of the generated test tables for the scale
  * soak ([[Scale]]):
  * `runMain graft.ScaleGen <srcSfDir> <outDir> <copies> [mode]`.
  *
  * Construction: each copy is an ISOMORPHIC, VOCABULARY-DISJOINT image
  * of the source corpus — every token gets a per-copy suffix, ids get a
  * per-copy stride offset. This is the honest way to scale a dedup/
  * text-analytics corpus: naive replication would make every doc an
  * exact twin of its 9 copies, so near-dup cluster sizes (and pair
  * counts, which grow with the SQUARE of cluster size) would explode
  * superlinearly by construction and indict the queries for the
  * generator's sin. With disjoint vocabularies, no shingle/token/pair
  * crosses copies: dup structure, vocabulary growth, and candidate-pair
  * counts all scale exactly ×copies, so a query whose measured cost
  * grows faster than ×copies is genuinely superlinear in its own plan.
  *
  * `mode` (r16, the fixture-realism gap the r15 verdict named):
  *
  *  - `disjoint` (default, the original behavior): EVERY token gets a
  *    `~copy` suffix. Maximally disjoint — but the suffix renames the
  *    Gopher stopwords and its `~` is a symbol under the q65 punct
  *    rule, so the quality gate in `enforce` mode kills every copy>0
  *    doc twice over (stops=0 AND punct≈n_tokens) — a fixture
  *    artifact that forced the composed [[Pipeline]] to run its ×300/
  *    ×1000 probes in `annotate` (shadow-gate) mode.
  *  - `stopsafe`: non-stopword tokens get an ALPHANUMERIC `x<copy>`
  *    suffix; the [[graft.ext.TextAnalysis.stopAll]] stopwords pass
  *    through untouched. Measured on the sf0.1 corpus: n_tokens,
  *    punct, and stops are unchanged by construction, and the ≤4
  *    extra chars/token leave mean word length ≈8.5 < the 10 bar —
  *    gate verdicts flip on 0/5000 docs, so `enforce` survivor counts
  *    scale exactly ×copies. Disjointness still holds at the SHINGLE
  *    level, which is what the dedup/decontamination operators key
  *    on: a 5-gram crosses copies only if all five tokens are
  *    stopwords, and the source corpus has ZERO all-stopword windows
  *    (measured over all 250,704 windows at sf0.1; the run prints the
  *    count for the actual source as `all_stop_windows` so the claim
  *    re-certifies per fixture).
  *
  * Tables: documents (token-suffixed text, recomputed n_chars),
  * events (stride-offset event/user ids, raw LONG-nanos ts preserved so
  * the scaled dir round-trips through [[Tables.events]] exactly like
  * the driver layout), embeddings (stride-offset vec_id; coordinate 0
  * nudged by copy·2⁻¹⁰ so copies are not exact vector twins — exact
  * twins would give every vector `copies−1` tied nearest neighbors and
  * rewrite ANN semantics at scale).
  */
object ScaleGen {
  /** Id stride between copies — far above any generated id. */
  val Stride = 100000000L

  def main(args: Array[String]): Unit = {
    val (src, out, copies) = (args(0), args(1), args(2).toInt)
    val mode = args.lift(3).getOrElse("disjoint")
    require(mode == "disjoint" || mode == "stopsafe",
      s"mode must be disjoint|stopsafe, got '$mode'")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val copyDf = spark.range(copies).select(col("id").as("copy"))

    val suffixed =
      if (mode == "disjoint")
        "array_join(transform(split(text, ' '), t -> concat(t, '~', copy)), ' ')"
      else
        "array_join(transform(split(text, ' '), t -> CASE WHEN t IN (" +
          graft.ext.TextAnalysis.stopAll +
          ") THEN t ELSE concat(t, 'x', copy) END), ' ')"
    // the stopsafe honesty line: shingle-level disjointness holds iff
    // the SOURCE has no all-stopword 5-gram window (each suffixed
    // window then contains ≥1 copy-tagged token) — certify per fixture
    val allStopWindows =
      if (mode == "stopsafe")
        Tables.documents(spark, src)
          .select(expr("split(text, ' ')").as("toks"))
          .filter(expr("size(toks) >= 5"))
          .select(explode(expr(
            "transform(sequence(0, size(toks) - 5)," +
              " i -> slice(toks, i + 1, 5))")).as("gram"))
          .filter(expr("size(filter(gram, g -> g IN (" +
            graft.ext.TextAnalysis.stopAll + "))) = 5"))
          .count()
      else -1L

    Tables.documents(spark, src)
      .crossJoin(copyDf)
      .select(
        (col("doc_id") + col("copy") * Stride).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(expr(suffixed))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // raw load (not Tables.events): copies ts in whatever encoding the
    // source parquet carries (LONG nanos via the session's nanosAsLong
    // flag, or timestamp[us] after the testdata regeneration) — the
    // type-adaptive Tables.events loader handles either on read-back
    Tables.load(spark, src, "events")
      .crossJoin(copyDf)
      .select(
        (col("event_id") + col("copy") * Stride).as("event_id"),
        col("ts"),
        (col("user_id") + col("copy") * Stride).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    Tables.embeddings(spark, src)
      .crossJoin(copyDf)
      .select(
        (col("vec_id") + col("copy") * Stride).as("vec_id"),
        expr("transform(embedding, (x, i) -> CASE WHEN i = 0" +
          " THEN CAST(x + copy / 1024.0D AS FLOAT) ELSE x END)").as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // the TPC-H star tables pass through UNSCALED so every registry
    // query still runs against a scaled dir (q90 profiles lineitem;
    // the star queries are dimension-bound and not what the soak
    // measures) — raw load, not the typed loaders, so parquet types
    // round-trip unchanged
    Tables.names
      .filterNot(Set("documents", "events", "embeddings"))
      .foreach { t =>
        Tables.load(spark, src, t)
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }

    val modeField =
      if (mode == "stopsafe")
        s""","mode":"stopsafe","all_stop_windows":$allStopWindows"""
      else s""","mode":"disjoint""""
    println(s"""{"scalegen":"$out","copies":$copies,"src":"$src"$modeField}""")
    spark.stop()
  }
}
