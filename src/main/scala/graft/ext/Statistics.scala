package graft.ext

import org.apache.spark.sql.functions._
import graft.{CacheScope, Q, Tables}

/** Dataset-statistics operators a training-data pipeline runs over its
  * corpus: exact percentile profiles per group and multi-level ROLLUP
  * totals (the dashboard's drill-down shape). Both are single-exchange
  * aggregation plans.
  *
  * Percentiles use the linear-interpolated definition (index p·(n−1))
  * computed EXPLICITLY over micro-unit integers: Spark's built-in
  * `percentile` and DuckDB's `quantile_cont` agree mathematically but
  * interpolate with different floating-point op orders ((h−pos)·lo +
  * (pos−l)·hi vs lo + frac·(hi−lo)), which last-ulp-diverges and flips
  * floor boundaries. Writing the lerp ourselves — identical formula
  * text, integer bracketing values, single correctly-rounded ops —
  * makes the comparison engine-exact, per the repo's quantized
  * contract. At 100 TB the drop-in scale path is `approx_percentile`
  * (t-digest sketch, mergeable map-side) — same query shape, bounded
  * memory, documented divergence from the exact value.
  */
object Statistics {

  /** The fixed 10-bin value binning shared by the batch drift audit
    * (q87) and the streaming [[graft.stream.DriftMonitor]] — one
    * definition so the stream's windows and the batch baseline can
    * never bin differently.
    */
  private[graft] val binSpark =
    "least(greatest(CAST(floor(value / 10.0D) AS BIGINT), 0L), 9L)"

  /** Interpolated percentile over a sorted micro-unit array `arr`
    * (1-indexed in both dialects); identical arithmetic both sides,
    * only the length/index syntax differs.
    */
  // Both dialects guard the all-NULL group: an empty arr would make pos
  // negative, and Spark's element_at(arr, 0) throws where DuckDB's
  // arr[0] returns NULL — the guard yields NULL on both sides instead.
  private[graft] def pctlSpark(p: String): String = {
    val pos = s"(${p}D * (size(arr) - 1))"
    val lo = s"cast(element_at(arr, cast(floor($pos) as int) + 1) as double)"
    val hi = s"cast(element_at(arr, least(cast(floor($pos) as int) + 2, size(arr))) as double)"
    s"CASE WHEN size(arr) = 0 THEN CAST(NULL AS DOUBLE) " +
      s"ELSE floor($lo + ($hi - $lo) * ($pos - floor($pos))) / 1000000.0D END"
  }
  private[graft] def pctlDuck(p: String): String = {
    // CAST to DOUBLE: DuckDB parses a bare decimal literal as DECIMAL
    // and would compute pos in exact decimal arithmetic — the double
    // multiply must happen on BOTH sides for frac to be identical
    val pos = s"(CAST($p AS DOUBLE) * (len(arr) - 1))"
    val lo = s"CAST(arr[CAST(floor($pos) AS INT) + 1] AS DOUBLE)"
    val hi = s"CAST(arr[least(CAST(floor($pos) AS INT) + 2, len(arr))] AS DOUBLE)"
    s"CASE WHEN len(arr) = 0 THEN CAST(NULL AS DOUBLE) " +
      s"ELSE floor($lo + ($hi - $lo) * ($pos - floor($pos))) / 1000000.0 END"
  }

  /** Bound-certificate predicate for q63: does the sketch value's rank
    * interval `[lt, le]` (counts of values strictly-below / at-or-below
    * the sketch value) intersect the target rank `pPct%·n` within the
    * sketch's guaranteed error `n/accuracy` plus 2 for floor/tie
    * discreteness? Pure BIGINT math over an `n` column — deterministic
    * for ANY sketch value satisfying the guarantee, which is what makes
    * the boolean oracle-comparable even though sketch values aren't.
    */
  private[graft] def rankOk(pPct: Int, lt: String, le: String): String = {
    val target = s"(n * ${pPct}L) div 100L"
    val tol = "(n div 10000L + 2L)"
    s"($lt <= $target + $tol) AND ($le >= $target - $tol)"
  }

  val all: Seq[Q] = Seq(
    // ── Exact percentile profile per group ─────────────────────────────
    Q(
      "q43_percentile_profile",
      s"""SELECT event_type,
         |  ${pctlDuck("0.5")}  AS p50,
         |  ${pctlDuck("0.95")} AS p95,
         |  ${pctlDuck("0.99")} AS p99,
         |  n
         |FROM (SELECT event_type,
         |        list_sort(list(${Portable.qval("value")}) FILTER (WHERE value IS NOT NULL)) AS arr,
         |        count(*) AS n
         |      FROM events GROUP BY event_type)""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          sort_array(collect_list(expr(Portable.qval("value")))).as("arr"),
          count(lit(1)).as("n"))
        .select(
          col("event_type"),
          expr(pctlSpark("0.5")).as("p50"),
          expr(pctlSpark("0.95")).as("p95"),
          expr(pctlSpark("0.99")).as("p99"),
          col("n"))
    },

    // ── Sketch-path percentile profile (the 100 TB form of q43) ────────
    // Same query shape as q43 but through approx_percentile: a KLL-type
    // quantile sketch that aggregates map-side in bounded memory and
    // MERGES across partitions, where q43's exact form collects each
    // group's full value array — fine per-group at test scale, not at
    // 100 TB. accuracy=10000 bounds the rank error at 1/10000 of the
    // group. Sketch VALUES are not cross-engine hash-exact (DuckDB's
    // approx_quantile is a different sketch with different ties), so
    // the oracle-checked output is a BOUND CERTIFICATE instead: Spark
    // computes the sketch AND, via a second pass over the same scan,
    // the exact rank interval [count(<v), count(<=v)] of each sketch
    // value, then emits `(event_type, n, pXX_ok)` booleans asserting
    // the interval intersects the target rank within the guaranteed
    // error (n/accuracy, +2 for floor/tie discreteness). The oracle
    // computes the exact side trivially — count(*) per group plus
    // literal `true`s — so a hash match certifies the sketch's error
    // bound cross-engine without requiring bit-equal sketch values.
    // The certificate is robust to sketch merge-order nondeterminism:
    // ANY value satisfying the guarantee produces the same booleans.
    // Shapes: one scan for the sketch agg, one broadcast of the tiny
    // per-type sketch row back onto a second scan for the rank counts —
    // both map-side-combining aggs, no value arrays on the exchange.
    Q(
      "q63_percentile_sketch",
      """SELECT event_type, count(*) AS n,
        |  true AS p50_ok, true AS p95_ok, true AS p99_ok
        |FROM events WHERE value IS NOT NULL GROUP BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select("event_type", "value")
      val sk = ev.groupBy("event_type").agg(
        expr("approx_percentile(value, array(0.5D, 0.95D, 0.99D), 10000)").as("pct"))
      ev.join(broadcast(sk), "event_type")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("value") < element_at(col("pct"), 1), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("value") <= element_at(col("pct"), 1), 1L).otherwise(0L)).as("le50"),
          sum(when(col("value") < element_at(col("pct"), 2), 1L).otherwise(0L)).as("lt95"),
          sum(when(col("value") <= element_at(col("pct"), 2), 1L).otherwise(0L)).as("le95"),
          sum(when(col("value") < element_at(col("pct"), 3), 1L).otherwise(0L)).as("lt99"),
          sum(when(col("value") <= element_at(col("pct"), 3), 1L).otherwise(0L)).as("le99"))
        .select(col("event_type"), col("n"),
          expr(rankOk(50, "lt50", "le50")).as("p50_ok"),
          expr(rankOk(95, "lt95", "le95")).as("p95_ok"),
          expr(rankOk(99, "lt99", "le99")).as("p99_ok"))
    },

    // ── HLL cardinality profile per source (the 100 TB distinct path) ──
    // The corpus-profiling numbers a curation team tracks per source:
    // doc count, approximate distinct contents (dup mass), approximate
    // distinct tokens (vocabulary growth). Both distinct counts go
    // through approx_count_distinct — HyperLogLog++ sketches whose
    // fixed-size registers merge map-side and across partitions, so the
    // exchange carries ~1.5 KB per (group, agg) no matter how many
    // distinct values exist. The exact forms (count(DISTINCT text),
    // distinct-token counts) shuffle every distinct value — fine here,
    // corpus-sized at 100 TB. Like q63, HLL sketch values are not
    // cross-engine hash-exact, so the oracle-checked output is a BOUND
    // CERTIFICATE: Spark computes approx AND exact distinct counts in
    // the same aggregate and emits `(source, n_docs, *_ok)` booleans
    // asserting relative error ≤ 15% (3× the default 5% rsd; HLL++
    // registers take max, so the sketch is merge-order-deterministic
    // for fixed data and this is not flaky). The oracle emits count(*)
    // plus literal `true`s; a hash match certifies the HLL++ error
    // bound cross-engine. The exact side exists ONLY to certify — at
    // 100 TB you run the sketch alone.
    Q(
      "q70_hll_cardinality",
      """SELECT source, count(*) AS n_docs, true AS texts_ok, true AS tokens_ok
        |FROM documents GROUP BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val perDoc = docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(md5(col("text"))).as("ad_texts"),
        countDistinct(md5(col("text"))).as("ed_texts"))
      val tok = docs
        .select(col("source"), explode(expr("split(text, ' ')")).as("tok"))
        .groupBy("source")
        .agg(
          approx_count_distinct(col("tok")).as("ad_toks"),
          countDistinct(col("tok")).as("ed_toks"))
      perDoc.join(tok, "source")
        .select(col("source"), col("n_docs"),
          (abs(col("ad_texts") - col("ed_texts")) * 100 <= col("ed_texts") * 15)
            .as("texts_ok"),
          (abs(col("ad_toks") - col("ed_toks")) * 100 <= col("ed_toks") * 15)
            .as("tokens_ok"))
    },

    // ── ROLLUP drill-down totals (type → type×hour → grand total) ──────
    Q(
      "q44_rollup_totals",
      s"""SELECT event_type, hour(ts) AS hour_of_day,
         |  ${Portable.qsum("value", 2)} AS total, count(*) AS n
         |FROM events GROUP BY ROLLUP(event_type, hour(ts))""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .rollup(col("event_type"), hour(col("ts")).as("hour_of_day"))
        .agg(expr(Portable.qsum("value", 2)).as("total"), count(lit(1)).as("n"))
    },

    // ── Distribution-drift audit (integer L1 / PSI-style alarm) ────────
    // The monitoring op behind "did this feed change under us": per
    // event type, compare the value distribution of the first half of
    // the time range against the second and alarm past a threshold.
    // PSI's log-ratio needs libm log (not portable bit-for-bit), so
    // the metric is total-variation-style L1 over binned shares — the
    // SCALE-SAFE integer form: per-bin shares become ppm integers
    // (n·10⁶ ∕∕ total, bounded 10⁶ at any corpus size, so nothing
    // here can overflow no matter how many events), and L1 is a plain
    // BIGINT sum of absolute ppm differences. The midpoint derives
    // from min/max epoch-µs as a broadcast 1-row dimension (no
    // driver collect, no hardcoded date); the contract requires a
    // type present in BOTH halves (ta, tb > 0) — integer division by
    // zero errors in DuckDB but NULLs in Spark, so the guard is
    // what keeps the engines aligned on the edge. Shapes: one scan →
    // (type, bin) conditional counts with map-side combine; windows
    // and L1 run over the ~types×10-row aggregate.
    Q(
      "q87_drift_l1",
      """WITH mid AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS m FROM events),
        |b AS (SELECT event_type,
        |        CASE WHEN epoch_us(ts) < mid.m THEN 'a' ELSE 'b' END AS period,
        |        least(greatest(CAST(floor(value / 10.0) AS BIGINT), 0), 9) AS bin
        |      FROM events, mid WHERE value IS NOT NULL),
        |cnt AS (SELECT event_type, bin,
        |          count(CASE WHEN period = 'a' THEN 1 END) AS na,
        |          count(CASE WHEN period = 'b' THEN 1 END) AS nb
        |        FROM b GROUP BY event_type, bin),
        |tot AS (SELECT event_type, bin, na, nb,
        |          CAST(sum(na) OVER (PARTITION BY event_type) AS BIGINT) AS ta,
        |          CAST(sum(nb) OVER (PARTITION BY event_type) AS BIGINT) AS tb
        |        FROM cnt)
        |SELECT event_type, min(ta) AS n_first_half, min(tb) AS n_second_half,
        |  CAST(sum(abs(na * 1000000 // ta - nb * 1000000 // tb)) AS BIGINT) AS l1_ppm,
        |  CAST(sum(abs(na * 1000000 // ta - nb * 1000000 // tb)) AS BIGINT) >= 100000 AS drifted
        |FROM tot WHERE ta > 0 AND tb > 0
        |GROUP BY event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      val mid = ev.agg(expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2").as("m"))
      val cnt = ev.filter(col("value").isNotNull)
        .crossJoin(broadcast(mid))
        .select(col("event_type"),
          expr("CASE WHEN unix_micros(ts) < m THEN 'a' ELSE 'b' END").as("period"),
          expr(Statistics.binSpark).as("bin"))
        .groupBy("event_type", "bin")
        .agg(
          count(expr("CASE WHEN period = 'a' THEN 1 END")).as("na"),
          count(expr("CASE WHEN period = 'b' THEN 1 END")).as("nb"))
      cnt
        .withColumn("ta", sum("na").over(Window.partitionBy("event_type")))
        .withColumn("tb", sum("nb").over(Window.partitionBy("event_type")))
        .filter(col("ta") > 0 && col("tb") > 0)
        .groupBy("event_type")
        .agg(
          min("ta").as("n_first_half"), min("tb").as("n_second_half"),
          expr("sum(abs(na * 1000000 div ta - nb * 1000000 div tb))").as("l1_ppm"),
          expr("sum(abs(na * 1000000 div ta - nb * 1000000 div tb)) >= 100000L").as("drifted"))
    },

    // ── Shuffle-key skew profiler (the pre-salting diagnostic) ─────────
    // The measurement behind every salting/AQE-skew decision in this
    // library ([[Skew.selfPairs]]'s hotThreshold, the banding salts):
    // per candidate shuffle key, how far the hottest key's share sits
    // above the uniform mean (skew_factor = max_share · n_keys; 1.0 =
    // perfectly even, ≥ ~5 = salt it). Three representative relations
    // profiled in one query; each profile is a key-count aggregate
    // with map-side combine, a 3-number summary, and a top-1 via
    // orderBy().limit(1) → TakeOrderedAndProject (q56's discipline —
    // a key's cardinality at 100 TB forbids a global ranking window).
    // The share becomes ppm BEFORE multiplying by n_keys, so the math
    // is overflow-free for any row count (n_keys·10⁶ < 2⁶³).
    Q(
      "q90_skew_profile", {
        def prof(rel: String, key: String, tbl: String) =
          s"""p_$rel AS (SELECT '$rel' AS relation, CAST($key AS VARCHAR) AS key, count(*) AS n
             |           FROM $tbl GROUP BY 2),
             |s_$rel AS (SELECT relation, CAST(count(*) AS BIGINT) AS n_keys,
             |             CAST(sum(n) AS BIGINT) AS n_rows, CAST(max(n) AS BIGINT) AS max_n
             |           FROM p_$rel GROUP BY relation),
             |t_$rel AS (SELECT key AS top_key FROM p_$rel ORDER BY n DESC, key LIMIT 1)""".stripMargin
        s"""WITH ${prof("events_user", "user_id", "events")},
           |${prof("documents_source", "source", "documents")},
           |${prof("lineitem_part", "l_partkey", "lineitem")}
           |SELECT relation, n_rows, n_keys, max_n, top_key,
           |  CAST(((max_n * 1000000) // n_rows) * n_keys AS DOUBLE) / 1000000.0 AS skew_factor
           |FROM (SELECT * FROM s_events_user, t_events_user
           |      UNION ALL SELECT * FROM s_documents_source, t_documents_source
           |      UNION ALL SELECT * FROM s_lineitem_part, t_lineitem_part)""".stripMargin
      }) { (s, d) =>
      def profile(df: org.apache.spark.sql.DataFrame, rel: String, key: String) = {
        val counts = df
          .select(expr(s"CAST($key AS STRING)").as("key"))
          .groupBy("key").agg(count(lit(1)).as("n"))
          .transform(CacheScope.scoped) // two consumers: the summary agg and the top-1
        val stats = counts.agg(
          count(lit(1)).as("n_keys"), sum("n").as("n_rows"), max("n").as("max_n"))
        val top = counts.orderBy(col("n").desc, col("key")).limit(1)
          .select(col("key").as("top_key"))
        stats.crossJoin(top)
          .select(lit(rel).as("relation"), col("n_rows"), col("n_keys"),
            col("max_n"), col("top_key"),
            expr("CAST(((max_n * 1000000) div n_rows) * n_keys AS DOUBLE) / 1000000.0D")
              .as("skew_factor"))
      }
      profile(Tables.events(s, d), "events_user", "user_id")
        .union(profile(Tables.documents(s, d), "documents_source", "source"))
        .union(profile(Tables.lineitem(s, d), "lineitem_part", "l_partkey"))
    },

    // ── Per-type linear value trend (OLS slope, units per day) ─────────
    // The trend companion to q87's distribution drift: is this metric
    // drifting LINEARLY, and how fast. Portability split: the
    // AGGREGATION is pure integer — x = seconds since the type's first
    // event (magnitude control: ≤ 2.6·10⁶ for a 30-day range), y =
    // centi-units via the qval rounding, and Σx/Σy/Σx²/Σxy are exact
    // order-free BIGINT sums — while the closed-form slope
    // (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²) evaluates in DOUBLE with
    // identical expression text on both engines: deterministic IEEE
    // ops on identical inputs round identically, so even past 2⁵³ the
    // result is bit-equal (what is NOT portable is float AGGREGATION
    // order, which never happens here). Overflow bound: Σx·y <
    // 2⁶³ holds to ~10¹⁰ rows/type at these magnitudes; beyond,
    // pre-scale x to minutes (the documented qsum trade). The x0
    // anchor joins back as a broadcast type-cardinality dimension.
    Q(
      "q94_value_trend",
      """WITH x0 AS (SELECT event_type, min(epoch_us(ts) // 1000000) AS x0
        |            FROM events GROUP BY event_type),
        |pts AS (SELECT e.event_type,
        |          epoch_us(e.ts) // 1000000 - x0.x0 AS x,
        |          CAST(floor(e.value * 100.0 + 0.5) AS BIGINT) AS y
        |        FROM events e JOIN x0 ON x0.event_type = e.event_type
        |        WHERE e.value IS NOT NULL),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
        |      FROM pts GROUP BY event_type)
        |SELECT event_type, n,
        |  floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * 864.0 * 1000000.0) / 1000000.0 AS slope_per_day
        |FROM s""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val x0 = ev.groupBy(col("event_type").as("x0_type"))
        .agg(expr("min(unix_micros(ts) div 1000000)").as("x0"))
      ev.filter(col("value").isNotNull)
        .join(broadcast(x0), col("event_type") === col("x0_type"))
        .select(col("event_type"),
          expr("unix_micros(ts) div 1000000 - x0").as("x"),
          expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("y"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          expr("sum(x * x)").as("sxx"), expr("sum(x * y)").as("sxy"))
        .select(col("event_type"), col("n"),
          expr("floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
            " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
            " * 864.0D * 1000000.0D) / 1000000.0D").as("slope_per_day"))
    },

    // ── Volume-anomaly profile (Tukey IQR fence over per-user counts) ──
    // The bot/abuse screen: per-user event volumes, quartiles, the
    // Tukey upper fence (p75 + 1.5·IQR), and how many users sit above
    // it. Quartiles go through the shared exact-percentile machinery
    // (counts scaled to micro-units so the interpolation arithmetic is
    // the pctl contract verbatim); the summary is ONE row regardless
    // of user cardinality. The per-user count is combine-reduced; the
    // single-group sorted array is the exact form, with
    // approx_percentile as the documented scale path past ~10⁸ users
    // (q63's trade). On this corpus the fence finds 0 outliers —
    // volumes are near-uniform — which is the correct report, and the
    // fence value itself is the informative output.
    Q(
      "q95_volume_outliers",
      s"""WITH uc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id),
         |arr_t AS (SELECT list_sort(list(n * 1000000)) AS arr,
         |            CAST(count(*) AS BIGINT) AS n_users,
         |            CAST(max(n) AS BIGINT) AS max_n FROM uc),
         |qq AS (SELECT n_users, max_n,
         |         ${pctlDuck("0.25")} AS p25, ${pctlDuck("0.75")} AS p75 FROM arr_t)
         |SELECT n_users, max_n, p25, p75,
         |  floor((p75 + 1.5 * (p75 - p25)) * 1000000.0) / 1000000.0 AS upper_fence,
         |  (SELECT count(*) FROM uc, qq q2 WHERE uc.n > q2.p75 + 1.5 * (q2.p75 - q2.p25))
         |    AS n_outliers
         |FROM qq""".stripMargin) { (s, d) =>
      val uc = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .transform(CacheScope.scoped) // two consumers: the quartile summary and the fence count
      val qq = uc.agg(
          sort_array(collect_list(expr("n * 1000000"))).as("arr"),
          count(lit(1)).as("n_users"), max("n").as("max_n"))
        .select(col("n_users"), col("max_n"),
          expr(pctlSpark("0.25")).as("p25"), expr(pctlSpark("0.75")).as("p75"))
      val outliers = uc.crossJoin(broadcast(qq.select("p25", "p75")))
        .filter(expr("n > p75 + 1.5D * (p75 - p25)"))
        .agg(count(lit(1)).as("n_outliers"))
      qq.crossJoin(broadcast(outliers))
        .select(col("n_users"), col("max_n"), col("p25"), col("p75"),
          expr("floor((p75 + 1.5D * (p75 - p25)) * 1000000.0D) / 1000000.0D").as("upper_fence"),
          col("n_outliers"))
    },

    // ── Referential-integrity audit (orphan keys across the star) ──────
    // The warehouse data-quality gate: for each FK edge, how many rows
    // reference a missing dimension key. Three REAL edges (all clean on
    // this data — the desired report) plus one SIMULATED-loss edge
    // (orders with o_orderkey ≡ 3 mod 97 dropped, the q88 planting
    // discipline) proving the audit actually detects orphans. Each
    // audit is a LEFT join counting NULL probe hits — hint-free, AQE
    // broadcasts dimension-sized sides; counts combine map-side; the
    // orphan rate is floor-ppm off integer counts.
    Q(
      "q96_integrity_audit", {
        def audit(fk: String, factTbl: String, fkCol: String,
            dimTbl: String, pkCol: String, dimFilter: String = "") =
          s"""SELECT '$fk' AS fk, count(*) AS n_rows,
             |  count(CASE WHEN dd.$pkCol IS NULL THEN 1 END) AS n_orphans,
             |  floor(count(CASE WHEN dd.$pkCol IS NULL THEN 1 END) * 1000000.0 / count(*))
             |    / 1000000.0 AS orphan_rate
             |FROM $factTbl ff LEFT JOIN
             |  (SELECT $pkCol FROM $dimTbl $dimFilter) dd ON dd.$pkCol = ff.$fkCol""".stripMargin
        Seq(
          audit("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          audit("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
          audit("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
          audit("lineitem->orders_simulated_loss", "lineitem", "l_orderkey",
            "orders", "o_orderkey", "WHERE o_orderkey % 97 <> 3")
        ).mkString("\nUNION ALL\n")
      }) { (s, d) =>
      def audit(fk: String, fact: org.apache.spark.sql.DataFrame, fkCol: String,
          dim: org.apache.spark.sql.DataFrame, pkCol: String) =
        fact.select(col(fkCol))
          .join(dim.select(col(pkCol).as("pk")), col(fkCol) === col("pk"), "left")
          .agg(count(lit(1)).as("n_rows"),
            count(expr("CASE WHEN pk IS NULL THEN 1 END")).as("n_orphans"))
          .select(lit(fk).as("fk"), col("n_rows"), col("n_orphans"),
            expr("floor(n_orphans * 1000000.0D / n_rows) / 1000000.0D").as("orphan_rate"))
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      audit("lineitem.l_orderkey->orders", li, "l_orderkey", ord, "o_orderkey")
        .union(audit("lineitem.l_partkey->part", li, "l_partkey", Tables.part(s, d), "p_partkey"))
        .union(audit("orders.o_custkey->customer", ord, "o_custkey", Tables.customer(s, d), "c_custkey"))
        .union(audit("lineitem->orders_simulated_loss", li, "l_orderkey",
          ord.filter(expr("o_orderkey % 97 <> 3")), "o_orderkey"))
    },

    // ── PIVOT: per-source char volume cross-tabbed by language ─────────
    // The dashboard cross-tab as a native pivot. Pivot values are
    // DECLARED (the 5 fixed langs), not discovered — Spark's
    // values-free pivot() runs an extra distinct-collect job over the
    // pivot column before planning, a corpus-wide pass a 100 TB run
    // can't afford. The corpus is touched ONCE, by a plain
    // (source, lang) pre-aggregate with map-side combine; both the
    // pivot and n_docs derive from that ≤ sources×langs-row relation,
    // so n_docs is an UNCONDITIONAL count — a doc whose lang falls
    // outside the declared cell list (or is NULL) still counts toward
    // its source's total, exactly like the oracle's count(*), instead
    // of silently vanishing from a cell-sum reconstruction. Missing
    // cells coalesce to 0 on both engines.
    Q(
      "q99_lang_pivot", {
        val cells = Seq("de", "en", "es", "fr", "zh").map { l =>
          s"CAST(coalesce(sum(CASE WHEN lang = '$l' THEN n_chars END), 0) AS BIGINT) AS $l"
        }.mkString(",\n  ")
        s"""SELECT source, count(*) AS n_docs,
           |  $cells
           |FROM documents GROUP BY source""".stripMargin
      }) { (s, d) =>
      val langs = Seq("de", "en", "es", "fr", "zh")
      val per = Tables.documents(s, d)
        .groupBy("source", "lang")
        .agg(sum("n_chars").as("chars"), count(lit(1)).as("n"))
      val nDocs = per.groupBy("source").agg(sum("n").as("n_docs"))
      val pivoted = per.groupBy("source")
        .pivot("lang", langs)
        .agg(sum("chars"))
      val cols = col("source") +: col("n_docs") +:
        langs.map(l => coalesce(col(s"`$l`"), lit(0L)).as(l))
      nDocs.join(pivoted, "source").select(cols: _*)
    },

    // ── CUBE: all (lang × source) aggregation lattices in one pass ─────
    // The OLAP drill-anywhere companion to q44's ROLLUP: one CUBE pass
    // produces detail, both one-dimension marginals, and the grand
    // total, tagged by grouping_id so a dashboard can slice one result
    // set instead of running 4 queries. Spark expands the cube into a
    // single Expand + hash-aggregate — each input row fans out to its
    // 4 lattice cells BEFORE the exchange, and the partial aggregates
    // combine map-side, so the shuffle carries at most 4× the group
    // count (126 rows here), never 4× the data. grouping_id bit order
    // (first listed column = MSB) matches GROUPING(lang, source) on
    // both engines.
    Q(
      "q100_cube_profile",
      """SELECT CAST(GROUPING(lang, source) AS BIGINT) AS gid, lang, source,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY CUBE(lang, source)""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .cube("lang", "source")
        .agg(
          expr("cast(grouping_id() as bigint)").as("gid"),
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("chars"))
        .select("gid", "lang", "source", "n_docs", "chars")
    },

    // ── Equi-depth (CDF-histogram) length deciles per language ─────────
    // The curriculum/quality-binning partner to q24's fixed-width bins:
    // ~10% of each language's docs per bin, derived WITHOUT a per-lang
    // total sort. ntile() would be the one-liner, but its window is a
    // single sorted task per language — the hottest language at 100 TB
    // funnels through one reducer. Instead: value-frequency histogram
    // (map-side-combined groupBy over the DISCRETE length domain),
    // cumulative count over the HISTOGRAM rows (a window over
    // lang × distinct-lengths — thousands of rows, not the corpus),
    // and bin = 10·cum_before div total. Docs sharing a length land in
    // the same bin (no tie-splitting, the one semantic difference from
    // ntile — and the defensible one: equal inputs, equal treatment).
    // Pure integer math throughout; per-bin stats re-aggregate the
    // histogram, so the corpus is scanned exactly once.
    Q(
      "q105_equidepth_bins",
      """WITH h AS (SELECT lang, n_chars, CAST(count(*) AS BIGINT) AS f
        |           FROM documents GROUP BY lang, n_chars),
        |cum AS (SELECT lang, n_chars, f,
        |          CAST(coalesce(sum(f) OVER (PARTITION BY lang ORDER BY n_chars
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |               AS BIGINT) AS cb,
        |          CAST(sum(f) OVER (PARTITION BY lang) AS BIGINT) AS tot
        |        FROM h)
        |SELECT lang, CAST(cb * 10 // tot AS BIGINT) AS bin,
        |  CAST(sum(f) AS BIGINT) AS n_docs,
        |  min(n_chars) AS lo, max(n_chars) AS hi,
        |  CAST(sum(f * n_chars) AS BIGINT) AS chars
        |FROM cum GROUP BY lang, cb * 10 // tot""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byLang = Window.partitionBy("lang").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .groupBy("lang", "n_chars").agg(count(lit(1)).as("f"))
        .withColumn("cb", coalesce(sum("f").over(byLang), lit(0L)))
        .withColumn("tot", sum("f").over(Window.partitionBy("lang")))
        .groupBy(col("lang"), expr("(cb * 10) div tot").as("bin"))
        .agg(
          sum("f").as("n_docs"),
          min("n_chars").as("lo"), max("n_chars").as("hi"),
          expr("cast(sum(f * n_chars) as bigint)").as("chars"))
    },

    // ── Winsorized robust stats (outlier-clamped mean) ─────────────────
    // The metric-pipeline defense against sensor spikes: per-type mean
    // with values clamped to the [p05, p95] nearest-rank percentiles.
    // Everything stays in the micro-unit INTEGER domain — the clamp
    // bounds are array elements (no interpolation), and the winsorized
    // sum folds the clamped array with an integer `aggregate` HOF — so
    // the only float op is the final fixed-order scaling. Same
    // per-group sorted-array form as q43 (exact percentile contract);
    // the group count is the type cardinality, and at extreme per-group
    // sizes the documented sketch path (q63) takes over.
    Q(
      "q112_winsorized_stats",
      s"""WITH a AS (SELECT event_type,
         |             list_sort(list(${Portable.qval("value")})) AS arr,
         |             count(value) AS n
         |           FROM events WHERE value IS NOT NULL GROUP BY event_type),
         |b AS (SELECT event_type, n, arr,
         |        arr[floor(0.05 * (n - 1))::BIGINT + 1] AS lo,
         |        arr[floor(0.95 * (n - 1))::BIGINT + 1] AS hi
         |      FROM a)
         |SELECT event_type, n,
         |  ${Portable.qscale("lo", 2)} AS p05,
         |  ${Portable.qscale("hi", 2)} AS p95,
         |  ${Portable.qscale(
        "CAST(list_sum(list_transform(arr, x -> least(greatest(x, lo), hi))) AS BIGINT)" +
          " // n", 2)} AS wmean
         |FROM b""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy("event_type")
        .agg(
          sort_array(collect_list(expr(Portable.qval("value")))).as("arr"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("n"), col("arr"),
          expr("element_at(arr, cast(0.05D * (n - 1) as int) + 1)").as("lo"),
          expr("element_at(arr, cast(0.95D * (n - 1) as int) + 1)").as("hi"))
        .select(col("event_type"), col("n"),
          expr(Portable.qscale("lo", 2)).as("p05"),
          expr(Portable.qscale("hi", 2)).as("p95"),
          expr(Portable.qscale(
            "aggregate(arr, 0L, (acc, x) -> acc + least(greatest(x, lo), hi)) div n",
            2)).as("wmean"))
    },

    // ── A/B lift with Welch t-statistic (experiment readout) ───────────
    // Deterministic experiment analysis: users split A/B by salted
    // content hash (stable assignment, re-derivable anywhere), then
    // per-type group moments as EXACT integer sums — n, Σy, Σy² in
    // centi-units, one combine-reduced pass with conditional aggregates
    // (no second scan, no pivot job). Mean/variance/t derive from the
    // exact integers through one fixed sequence of correctly-rounded
    // double ops (sqrt included — IEEE sqrt is correctly rounded), so
    // both engines emit identical bits; float AGGREGATION never
    // happens. Overflow bound: Σy² in centi² stays ≤ 2^63 while
    // n·(100·y_max)² < 9.2e18 — y ≤ 100 here gives ~9e10 rows headroom
    // per group.
    Q(
      "q113_ab_lift", {
        val grp = s"${Portable.h60Duck("concat('ab|', user_id::VARCHAR)")} % 2"
        s"""WITH m AS (SELECT event_type,
           |  count(CASE WHEN $grp = 0 THEN 1 END) AS na,
           |  CAST(coalesce(sum(CASE WHEN $grp = 0
           |    THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS sa,
           |  CAST(coalesce(sum(CASE WHEN $grp = 0
           |    THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
           |       * CAST(floor(value * 100.0 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS qa,
           |  count(CASE WHEN $grp = 1 THEN 1 END) AS nb,
           |  CAST(coalesce(sum(CASE WHEN $grp = 1
           |    THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS sb,
           |  CAST(coalesce(sum(CASE WHEN $grp = 1
           |    THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
           |       * CAST(floor(value * 100.0 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS qb
           |FROM events WHERE value IS NOT NULL GROUP BY event_type)
           |SELECT event_type, na, nb,
           |  floor(CAST(sa AS DOUBLE) / na) / 100.0 AS mean_a,
           |  floor(CAST(sb AS DOUBLE) / nb) / 100.0 AS mean_b,
           |  CAST(floor((CAST(sb AS DOUBLE) / nb - CAST(sa AS DOUBLE) / na)
           |        * 1000000.0 / (CAST(sa AS DOUBLE) / na)) AS BIGINT) AS lift_ppm,
           |  floor((CAST(sb AS DOUBLE) / nb - CAST(sa AS DOUBLE) / na)
           |    / sqrt((CAST(qa AS DOUBLE) / na - (CAST(sa AS DOUBLE) / na) * (CAST(sa AS DOUBLE) / na)) / na
           |         + (CAST(qb AS DOUBLE) / nb - (CAST(sb AS DOUBLE) / nb) * (CAST(sb AS DOUBLE) / nb)) / nb)
           |    * 10000.0) / 10000.0 AS t_stat
           |FROM m""".stripMargin
      }) { (s, d) =>
      val grp = s"${Portable.h60Spark("concat('ab|', cast(user_id as string))")} % 2"
      val cy = "CAST(floor(value * 100.0D + 0.5D) AS BIGINT)"
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy("event_type")
        .agg(
          count(expr(s"CASE WHEN $grp = 0 THEN 1 END")).as("na"),
          expr(s"CAST(coalesce(sum(CASE WHEN $grp = 0 THEN $cy END), 0L) AS BIGINT)").as("sa"),
          expr(s"CAST(coalesce(sum(CASE WHEN $grp = 0 THEN $cy * $cy END), 0L) AS BIGINT)").as("qa"),
          count(expr(s"CASE WHEN $grp = 1 THEN 1 END")).as("nb"),
          expr(s"CAST(coalesce(sum(CASE WHEN $grp = 1 THEN $cy END), 0L) AS BIGINT)").as("sb"),
          expr(s"CAST(coalesce(sum(CASE WHEN $grp = 1 THEN $cy * $cy END), 0L) AS BIGINT)").as("qb"))
        .select(col("event_type"), col("na"), col("nb"),
          expr("floor(CAST(sa AS DOUBLE) / na) / 100.0D").as("mean_a"),
          expr("floor(CAST(sb AS DOUBLE) / nb) / 100.0D").as("mean_b"),
          expr("CAST(floor((CAST(sb AS DOUBLE) / nb - CAST(sa AS DOUBLE) / na)" +
            " * 1000000.0D / (CAST(sa AS DOUBLE) / na)) AS BIGINT)").as("lift_ppm"),
          expr("floor((CAST(sb AS DOUBLE) / nb - CAST(sa AS DOUBLE) / na)" +
            " / sqrt((CAST(qa AS DOUBLE) / na - (CAST(sa AS DOUBLE) / na) * (CAST(sa AS DOUBLE) / na)) / na" +
            "      + (CAST(qb AS DOUBLE) / nb - (CAST(sb AS DOUBLE) / nb) * (CAST(sb AS DOUBLE) / nb)) / nb)" +
            " * 10000.0D) / 10000.0D").as("t_stat"))
    },

    // ── Source-concentration Gini per language (diversity audit) ───────
    // Is a language's token mass spread across sources or dominated by
    // one crawl? Gini over per-source token masses, log-free and
    // integer-exact: with sources ranked ascending by (mass, source),
    // G = (2·Σ rank·wᵢ − (n+1)·Σw) / (n·Σw) — numerator and
    // denominator accumulate as BIGINTs, one floor-ppm division at the
    // edge. The ranking window runs over the lang × source AGGREGATE
    // (≤ 20 rows per lang), never documents; the token-mass groupBy is
    // the single corpus pass, combine-reduced.
    Q(
      "q114_source_gini",
      """WITH w AS (SELECT lang, source,
        |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS w
        |           FROM documents GROUP BY lang, source),
        |r AS (SELECT lang, source, w,
        |        CAST(row_number() OVER (PARTITION BY lang ORDER BY w, source) AS BIGINT) AS rk
        |      FROM w)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_sources,
        |  CAST(sum(w) AS BIGINT) AS total_tokens,
        |  CAST((2 * CAST(sum(rk * w) AS BIGINT) - (count(*) + 1) * CAST(sum(w) AS BIGINT))
        |       * 1000000 // (count(*) * CAST(sum(w) AS BIGINT)) AS BIGINT) AS gini_ppm
        |FROM r GROUP BY lang""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, d)
        .groupBy("lang", "source")
        .agg(expr("cast(sum(size(split(text, ' '))) as bigint)").as("w"))
        .withColumn("rk", expr("cast(row_number() over " +
          "(partition by lang order by w, source) as bigint)"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_sources"),
          sum("w").as("total_tokens"),
          expr("(2 * sum(rk * w) - (count(1) + 1) * sum(w))" +
            " * 1000000 div (count(1) * sum(w))").as("gini_ppm"))
    },

    // ── CUSUM change-point detection over the daily series ─────────────
    // Where did each metric's level shift? Page's CUSUM statistic,
    // integer-exact: per-type daily sums y_k (centi-units), deviations
    // scaled by n so the mean needs no division — d_k = n·y_k − Σy —
    // and the running Σd_k over ordered days peaks at the most likely
    // change point. One corpus pass builds the daily aggregate; the
    // cumulative window and the argmax (max_by with a day tiebreak on
    // both engines) run over the ~30-row-per-type series. Overflow:
    // |n·y_k| ≤ days · Σy ≤ 31 · 2^40 ≪ 2^63. Emits the peak day, its
    // |CUSUM| (scaled back to value-units via n), and the mean shift
    // direction.
    Q(
      "q115_cusum_changepoint",
      """WITH day_agg AS (SELECT event_type,
        |                   CAST(date_trunc('day', ts) AS DATE) AS day,
        |                   CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |                 FROM events WHERE value IS NOT NULL
        |                 GROUP BY 1, 2),
        |s AS (SELECT event_type, day, y,
        |        CAST(count(*) OVER p AS BIGINT) AS n,
        |        CAST(sum(y) OVER p AS BIGINT) AS sy,
        |        CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cy,
        |        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS k
        |      FROM day_agg WINDOW p AS (PARTITION BY event_type)),
        |c AS (SELECT event_type, day, n, n * cy - k * sy AS cusum FROM s),
        |r AS (SELECT event_type, day, n, cusum,
        |        row_number() OVER (PARTITION BY event_type
        |                           ORDER BY abs(cusum) DESC, day DESC) AS rn
        |      FROM c)
        |SELECT event_type, day AS peak_day,
        |  CAST(floor(CAST(abs(cusum) AS DOUBLE) / n / 100.0) AS BIGINT) AS peak_cusum,
        |  CASE WHEN cusum > 0 THEN 'down' ELSE 'up' END AS shift_dir
        |FROM r WHERE rn = 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val p = Window.partitionBy("event_type")
      val ord = Window.partitionBy("event_type").orderBy("day")
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(expr("CAST(sum(CAST(floor(value * 100.0D + 0.5D) AS BIGINT)) AS BIGINT)")
          .as("y"))
        .withColumn("n", count(lit(1)).over(p))
        .withColumn("sy", sum("y").over(p))
        .withColumn("cy", sum("y").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("k", row_number().over(ord).cast("long"))
        .withColumn("cusum", expr("n * cy - k * sy"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type")
            .orderBy(abs(col("cusum")).desc, col("day").desc)))
        .where(col("rn") === 1)
        .select(col("event_type"), col("day").as("peak_day"),
          expr("CAST(floor(CAST(abs(cusum) AS DOUBLE) / n / 100.0D) AS BIGINT)")
            .as("peak_cusum"),
          expr("CASE WHEN cusum > 0 THEN 'down' ELSE 'up' END").as("shift_dir"))
    },

    // ── Lag-1 autocorrelation of the daily series (seasonality probe) ──
    // Is yesterday predictive of today? Population lag-1 autocorrelation
    // per type, integer-exact by the q94/q115 trick: deviations scale
    // by n (d_t = n·y_t − Σy, no mean division), numerator pairs come
    // from a lag() window over the ~30-row daily series (no self-join),
    // and num/den accumulate as exact BIGINTs — their double images are
    // identical on both engines (BIGINT→DOUBLE is correctly rounded),
    // so the single floor-ppm division matches bit-for-bit. Overflow:
    // Σd² ≤ days · (days·y_max)² ≈ 1.3e16 ≪ 2^63 at these scales;
    // document-bound like qval.
    Q(
      "q116_autocorrelation",
      """WITH day_agg AS (SELECT event_type,
        |                   CAST(date_trunc('day', ts) AS DATE) AS day,
        |                   CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |                 FROM events WHERE value IS NOT NULL
        |                 GROUP BY 1, 2),
        |s AS (SELECT event_type, day, y,
        |        CAST(count(*) OVER p AS BIGINT) AS n,
        |        CAST(sum(y) OVER p AS BIGINT) AS sy,
        |        lag(y) OVER (PARTITION BY event_type ORDER BY day) AS yl
        |      FROM day_agg WINDOW p AS (PARTITION BY event_type))
        |SELECT event_type, n AS n_days,
        |  CAST(floor(CAST(sum(CASE WHEN yl IS NOT NULL
        |         THEN (n * y - sy) * (n * yl - sy) ELSE 0 END) AS DOUBLE)
        |       * 1000000.0
        |       / CAST(sum((n * y - sy) * (n * y - sy)) AS DOUBLE)) AS BIGINT) AS r1_ppm
        |FROM s GROUP BY event_type, n""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val p = Window.partitionBy("event_type")
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(expr("CAST(sum(CAST(floor(value * 100.0D + 0.5D) AS BIGINT)) AS BIGINT)")
          .as("y"))
        .withColumn("n", count(lit(1)).over(p))
        .withColumn("sy", sum("y").over(p))
        .withColumn("yl", lag("y", 1).over(p.orderBy("day")))
        .groupBy("event_type", "n")
        .agg(expr(
          "CAST(floor(CAST(sum(CASE WHEN yl IS NOT NULL" +
            " THEN (n * y - sy) * (n * yl - sy) ELSE 0L END) AS DOUBLE)" +
            " * 1000000.0D" +
            " / CAST(sum((n * y - sy) * (n * y - sy)) AS DOUBLE)) AS BIGINT)")
          .as("r1_ppm"))
        .select(col("event_type"), col("n").as("n_days"), col("r1_ppm"))
    },

    // ── Dataset card: the one-shot corpus summary ──────────────────────
    // The numbers a dataset release ships (docs, languages, sources,
    // token/char mass, exact-dup mass, central tendency) as one
    // (metric, value) relation — every metric an INTEGER so the card
    // is engine-exact. Each leg is a combine-reduced scalar aggregate;
    // the median comes from the n_chars value-frequency histogram (the
    // q105 CDF trick — a window over distinct lengths, not a corpus
    // sort), and the dup mass reuses one distinct-md5 pass. Cheap by
    // construction: nothing here shuffles more than a histogram.
    Q(
      "q118_dataset_card",
      """WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |h AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS f
        |      FROM documents GROUP BY n_chars),
        |c AS (SELECT n_chars,
        |        CAST(sum(f) OVER (ORDER BY n_chars
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM h)
        |SELECT 'n_docs' AS metric, n AS value FROM tot
        |UNION ALL SELECT 'n_langs', CAST(count(DISTINCT lang) AS BIGINT) FROM documents
        |UNION ALL SELECT 'n_sources', CAST(count(DISTINCT source) AS BIGINT) FROM documents
        |UNION ALL SELECT 'total_tokens',
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) FROM documents
        |UNION ALL SELECT 'total_chars', CAST(sum(n_chars) AS BIGINT) FROM documents
        |UNION ALL SELECT 'distinct_texts',
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) FROM documents
        |UNION ALL SELECT 'exact_dup_docs',
        |  (SELECT n FROM tot) - CAST(count(DISTINCT md5(text)) AS BIGINT)
        |  FROM documents
        |UNION ALL SELECT 'median_chars', min(n_chars)
        |  FROM c WHERE 2 * cum >= (SELECT n FROM tot)
        |UNION ALL SELECT 'mean_tokens_per_doc',
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) // (SELECT n FROM tot)
        |  FROM documents""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      def m(name: String, df: org.apache.spark.sql.DataFrame) =
        df.select(lit(name).as("metric"), col("value"))
      val tot = docs.agg(count(lit(1)).as("value"))
      val cum = docs.groupBy("n_chars").agg(count(lit(1)).as("f"))
        .withColumn("cum", sum("f").over(
          Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)))
      val median = cum.crossJoin(broadcast(tot.select(col("value").as("n"))))
        .filter(col("cum") * 2 >= col("n"))
        .agg(min("n_chars").as("value"))
      m("n_docs", tot)
        .unionAll(m("n_langs", docs.agg(countDistinct("lang").as("value"))))
        .unionAll(m("n_sources", docs.agg(countDistinct("source").as("value"))))
        .unionAll(m("total_tokens",
          docs.agg(expr("cast(sum(size(split(text, ' '))) as bigint)").as("value"))))
        .unionAll(m("total_chars", docs.agg(sum("n_chars").as("value"))))
        .unionAll(m("distinct_texts",
          docs.agg(countDistinct(md5(col("text"))).as("value"))))
        .unionAll(m("exact_dup_docs",
          docs.agg((count(lit(1)) - countDistinct(md5(col("text")))).as("value"))))
        .unionAll(m("median_chars", median))
        .unionAll(m("mean_tokens_per_doc",
          docs.agg(expr("cast(sum(size(split(text, ' '))) as bigint)" +
            " div count(1)").as("value"))))
    },

    // ── Percent-of-parent hierarchy rollup (region → nation) ───────────
    // The drill-down tile's share column at every level: each nation's
    // revenue share within its region AND its region's share of the
    // grand total, off ONE aggregated (region, nation) relation (≤ 25
    // rows) with two window levels. Shares divide exact micro-unit
    // integers as doubles (one correctly-rounded divide each — the
    // integer ppm shortcut would overflow at sv·10⁶ ≈ 2⁶³ for 100 TB
    // revenue masses, so the double path is the SCALE-correct one
    // here), floored to ppm. The star join broadcasts every dim.
    Q(
      "q129_pct_of_parent",
      s"""WITH rev AS (SELECT r.r_name AS region, n.n_name AS nation,
         |               CAST(sum(${Portable.qval("l.l_extendedprice")}) AS BIGINT) AS sv
         |             FROM lineitem l
         |             JOIN orders o ON o.o_orderkey = l.l_orderkey
         |             JOIN customer c ON c.c_custkey = o.o_custkey
         |             JOIN nation n ON n.n_nationkey = c.c_nationkey
         |             JOIN region r ON r.r_regionkey = n.n_regionkey
         |             GROUP BY 1, 2)
         |SELECT region, nation, ${Portable.qscale("sv", 2)} AS revenue,
         |  CAST(floor(CAST(sv AS DOUBLE) * 1000000.0
         |       / CAST(CAST(sum(sv) OVER (PARTITION BY region) AS BIGINT) AS DOUBLE))
         |       AS BIGINT) AS pct_of_region_ppm,
         |  CAST(floor(CAST(CAST(sum(sv) OVER (PARTITION BY region) AS BIGINT) AS DOUBLE)
         |       * 1000000.0
         |       / CAST(CAST(sum(sv) OVER () AS BIGINT) AS DOUBLE))
         |       AS BIGINT) AS region_pct_of_total_ppm
         |FROM rev""".stripMargin) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(expr(s"CAST(sum(${Portable.qval("l_extendedprice")}) AS BIGINT)").as("sv"))
      rev.select(col("region"), col("nation"),
        expr(Portable.qscale("sv", 2)).as("revenue"),
        expr("CAST(floor(CAST(sv AS DOUBLE) * 1000000.0D" +
          " / CAST(sum(sv) OVER (PARTITION BY region) AS DOUBLE)) AS BIGINT)")
          .as("pct_of_region_ppm"),
        expr("CAST(floor(CAST(sum(sv) OVER (PARTITION BY region) AS DOUBLE)" +
          " * 1000000.0D / CAST(sum(sv) OVER () AS DOUBLE)) AS BIGINT)")
          .as("region_pct_of_total_ppm"))
    },

    // ── Column profiling (the Deequ/expectations staple) ───────────────
    // Per-column completeness, cardinality, and mode for the event
    // stream — the profile a data-quality framework computes before
    // anyone writes a constraint. Each column leg is a pair of
    // combine-reduced aggregates (stats + mode with a (count DESC,
    // value) tiebreak), values rendered as strings so one relation
    // carries every column's profile. Exact distincts here (they ARE
    // the oracle contract); at extreme cardinalities the documented
    // sketch path (q70's approx_count_distinct) takes over. NULLs are
    // excluded from the mode — a null mode is a completeness fact, not
    // a frequency fact, and the null count already reports it.
    Q(
      "q130_column_profile", {
        def leg(c: String, render: String) =
          s"""SELECT '$c' AS column, count(*) AS n_rows,
             |  count($c) AS n_present,
             |  count(*) - count($c) AS n_null,
             |  CAST((count(*) - count($c)) * 1000000 // count(*) AS BIGINT) AS null_ppm,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  (SELECT $render FROM (
             |     SELECT $c AS v, count(*) AS n FROM events
             |     WHERE $c IS NOT NULL GROUP BY $c
             |     ORDER BY n DESC, v LIMIT 1)) AS mode_value,
             |  (SELECT CAST(max(n) AS BIGINT) FROM (
             |     SELECT count(*) AS n FROM events
             |     WHERE $c IS NOT NULL GROUP BY $c)) AS mode_count
             |FROM events""".stripMargin
        // the value column's mode renders as its micro-unit integer
        // (double→string formatting differs across engines — sci-
        // notation thresholds, shortest-roundtrip rules — while the
        // micro-unit integer's text is identical everywhere)
        Seq(
          leg("event_type", "v"),
          leg("user_id", "v::VARCHAR"),
          leg("value", s"${Portable.qval("v")}::VARCHAR"),
          leg("props", "v")).mkString("\nUNION ALL\n")
      }) { (s, d) =>
      val ev = Tables.events(s, d).transform(CacheScope.scoped) // 4 column legs × 2 aggregates
      def leg(c: String, renderSpark: String): org.apache.spark.sql.DataFrame = {
        val stats = ev.agg(
          count(lit(1)).as("n_rows"),
          count(col(c)).as("n_present"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          expr(s"(count(1) - count($c)) * 1000000 div count(1)").as("null_ppm"),
          countDistinct(col(c)).as("n_distinct"))
        val mode = ev.filter(col(c).isNotNull)
          .groupBy(col(c).as("v")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("v"))
          .limit(1)
          .select(expr(renderSpark).as("mode_value"), col("n").as("mode_count"))
        stats.crossJoin(mode).select(
          lit(c).as("column"), col("n_rows"), col("n_present"), col("n_null"),
          col("null_ppm"), col("n_distinct"), col("mode_value"), col("mode_count"))
      }
      leg("event_type", "cast(v as string)")
        .unionAll(leg("user_id", "cast(v as string)"))
        .unionAll(leg("value", s"cast(${Portable.qval("v")} as string)"))
        .unionAll(leg("props", "cast(v as string)"))
    },

    // ── Benford first-digit audit (fabricated-data detector) ───────────
    // Natural multi-magnitude amounts follow Benford's law; fabricated
    // or truncated feeds don't — the classic forensic screen, log-free:
    // the first digit comes from the INTEGER's decimal string (no
    // log10), expected shares are the nine public Benford ppm
    // constants as a VALUES literal joined in, and the deviation is
    // pure integer |obs − exp|. One combine-reduced digit histogram
    // (9 groups) off a pushed-down scan; everything after is 9 rows.
    Q(
      "q131_benford_audit", {
        val benford = (1 to 9).map { dgt =>
          val ppm = math.floor(math.log10(1.0 + 1.0 / dgt) * 1000000).toLong
          s"($dgt, ${ppm})"
        }.mkString(", ")
        s"""WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
           |                 AS VARCHAR), 1, 1) AS BIGINT) AS digit
           |           FROM orders WHERE o_totalprice >= 1.0),
           |h AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM h),
           |e(digit, exp_ppm) AS (VALUES $benford)
           |SELECT h.digit, h.n,
           |  CAST(h.n * 1000000 // tot.t AS BIGINT) AS obs_ppm,
           |  CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
           |  CAST(abs(h.n * 1000000 // tot.t - e.exp_ppm) AS BIGINT) AS abs_dev_ppm
           |FROM h JOIN e ON e.digit = h.digit, tot""".stripMargin
      }) { (s, d) =>
      import s.implicits._
      val benford = (1 to 9).map { dgt =>
        (dgt.toLong, math.floor(math.log10(1.0 + 1.0 / dgt) * 1000000).toLong)
      }
      val e = benford.toDF("digit", "exp_ppm")
      val h = Tables.orders(s, d)
        .filter(col("o_totalprice") >= 1.0)
        .select(expr("CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)" +
          " AS STRING), 1, 1) AS BIGINT)").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = h.agg(sum("n").as("t"))
      h.join(broadcast(e), "digit")
        .crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          expr("n * 1000000 div t").as("obs_ppm"),
          col("exp_ppm"),
          expr("abs(n * 1000000 div t - exp_ppm)").as("abs_dev_ppm"))
    },

    // ── GROUPING SETS: exactly the marginals, no detail rows ───────────
    // The third grouped-aggregation form next to ROLLUP (q44) and CUBE
    // (q100): a dashboard wanting ONLY the per-lang totals, per-source
    // totals, and grand total declares those three sets — Spark's
    // Expand fans each row to 3 lattice cells (vs CUBE's 4) before the
    // combine-reduced exchange, so the unwanted detail level never
    // exists anywhere. Same grouping_id/GROUPING bit parity as q100.
    Q(
      "q139_grouping_sets",
      """SELECT CAST(GROUPING(lang, source) AS BIGINT) AS gid, lang, source,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupingSets(
          Seq(Seq(col("lang")), Seq(col("source")), Seq.empty),
          col("lang"), col("source"))
        .agg(
          expr("cast(grouping_id() as bigint)").as("gid"),
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("chars"))
        .select("gid", "lang", "source", "n_docs", "chars")
    },

    // ── Week-over-week deltas (the trend arrows on every tile) ─────────
    // Weekly totals per type with absolute and relative change vs the
    // prior week: one combine-reduced weekly aggregate, lag() over the
    // ≤ weeks-per-type series, delta in exact micro-units and
    // floor-ppm relative change (NULL on the first week — no fake 0%).
    Q(
      "q140_wow_delta",
      s"""WITH w AS (SELECT event_type,
         |             CAST((CAST(date_trunc('day', ts) AS DATE)
         |                   - DATE '2024-01-01') // 7 AS BIGINT) AS week,
         |             CAST(sum(${Portable.qval("value")}) AS BIGINT) AS sv
         |           FROM events WHERE value IS NOT NULL
         |           GROUP BY 1, 2),
         |l AS (SELECT event_type, week, sv,
         |        lag(sv) OVER (PARTITION BY event_type ORDER BY week) AS pv
         |      FROM w)
         |SELECT event_type, week, ${Portable.qscale("sv", 2)} AS week_value,
         |  ${Portable.qscale("sv - pv", 2)} AS delta_value,
         |  CAST(floor(CAST(sv - pv AS DOUBLE) * 1000000.0 / CAST(pv AS DOUBLE))
         |       AS BIGINT) AS delta_ppm
         |FROM l""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"),
          expr("cast(datediff(cast(date_trunc('day', ts) as date)," +
            " date'2024-01-01') div 7 as bigint)").as("week"))
        .agg(expr(s"CAST(sum(${Portable.qval("value")}) AS BIGINT)").as("sv"))
        .withColumn("pv", lag("sv", 1).over(
          Window.partitionBy("event_type").orderBy("week")))
        .select(col("event_type"), col("week"),
          expr(Portable.qscale("sv", 2)).as("week_value"),
          expr(Portable.qscale("sv - pv", 2)).as("delta_value"),
          expr("CAST(floor(CAST(sv - pv AS DOUBLE) * 1000000.0D" +
            " / CAST(pv AS DOUBLE)) AS BIGINT)").as("delta_ppm"))
    },

    // ── Misra-Gries heavy hitters, batch merge under the oracle gate ───
    // The batch form of [[graft.stream.HeavyHitters]] (r9 verdict #6):
    // the streaming op's per-batch merge applied to the whole relation
    // at once IS plain one-shot Misra-Gries — exact counts per
    // (key, item), subtract the (k+1)-th largest count from every
    // counter, keep the strictly-positive ones — which is a pure,
    // deterministic data function (the uniform subtraction makes tie
    // and merge order irrelevant; boundary ties die together, exactly
    // as the streaming Processor's decrement does). So unlike q63/q70,
    // whose sketches aren't cross-engine bit-equal and certify via
    // booleans, here the ENTIRE summary hash-matches DuckDB: estimates,
    // totals, and the N/(k+1) undercount certificate. `mg_bound_ok`
    // asserts the guarantee itself — the uniform decrement (= the
    // (k+1)-th largest count) never exceeds N/(k+1), so every emitted
    // estimate undercounts its true frequency by at most the bound and
    // every item with true frequency above the bound is guaranteed
    // present (anything excluded had count ≤ thresh ≤ bound).
    //
    // Scale shapes: the (event_type, user_id) counts relation is the
    // only corpus-sized intermediate and aggregates with map-side
    // combine. The (k+1)-th-largest threshold is found by a salted
    // two-level tournament — top-(k+1) per (key, salt-of-64) first,
    // then top-(k+1) over the ≤ 64·(k+1) finalists — so no per-key
    // distinct-item set ever sits in one window partition (the naive
    // row_number-over-key puts a 1B-user key on one reducer at 100 TB;
    // the tournament's biggest partition is distinct-items/64). The
    // threshold+total dimension is ~|event_type| rows and broadcasts
    // back onto the counts relation. The exact counts side exists to
    // certify, as in q70 — the always-on 100 TB path is the streaming
    // op's bounded ≤k-counter state.
    Q(
      "q165_heavy_hitters",
      """WITH c AS (SELECT event_type, user_id, count(*) AS c
        |           FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_seen
        |        FROM c GROUP BY 1),
        |r AS (SELECT event_type, c,
        |        row_number() OVER (PARTITION BY event_type
        |                           ORDER BY c DESC, user_id ASC) AS rn
        |      FROM c),
        |th AS (SELECT event_type,
        |         coalesce(max(CASE WHEN rn = 9 THEN c END), 0) AS thresh
        |       FROM r GROUP BY 1)
        |SELECT c.event_type, c.user_id, c.c - th.thresh AS est,
        |  tot.n_seen, tot.n_seen // 9 AS err_bound,
        |  (th.thresh <= tot.n_seen // 9) AS mg_bound_ok
        |FROM c
        |JOIN th ON c.event_type = th.event_type
        |JOIN tot ON c.event_type = tot.event_type
        |WHERE c.c - th.thresh > 0""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val k = 8
      val counts = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("c"))
      val counts1 = CacheScope.scoped(counts)
      // salted tournament: per-(key, salt) top-(k+1) → global top-(k+1)
      val salted = counts1.withColumn("salt", pmod(col("user_id"), lit(64)))
      val heat1 = Window.partitionBy("event_type", "salt")
        .orderBy(col("c").desc, col("user_id").asc)
      val finalists = salted
        .withColumn("rn1", row_number().over(heat1))
        .filter(col("rn1") <= k + 1)
      val heat2 = Window.partitionBy("event_type")
        .orderBy(col("c").desc, col("user_id").asc)
      val thresh = finalists
        .withColumn("rn", row_number().over(heat2))
        .groupBy("event_type")
        .agg(coalesce(max(when(col("rn") === k + 1, col("c"))), lit(0L))
          .as("thresh"))
      val totals = counts1.groupBy("event_type")
        .agg(sum("c").cast("long").as("n_seen"))
      val dim = broadcast(thresh.join(totals, "event_type"))
      counts1.join(dim, "event_type")
        .filter(col("c") - col("thresh") > 0)
        .select(col("event_type"), col("user_id"),
          (col("c") - col("thresh")).as("est"),
          col("n_seen"),
          expr(s"n_seen div ${k + 1}").as("err_bound"),
          (col("thresh") <= expr(s"n_seen div ${k + 1}")).as("mg_bound_ok"))
    })
}
