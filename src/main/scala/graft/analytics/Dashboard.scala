package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{CacheScope, Q, Tables}
import graft.ext.Portable

/** The reference's analytical query surface — the Power BI dashboard
  * aggregates (SURVEY.md §2.4 A5–A10, `Dashboard/Dashboard.jpg`) —
  * re-expressed over the driver's `events` stream table: avg tiles,
  * status donut, hourly time series, binned counts, totals-by-measure,
  * share-by-location. Plus the validation-status derivation chain
  * (§2.2 P4/P6/P8, `Lambda/lamda.py:97-150`) as a batch classifier.
  *
  * All are single-shuffle groupBy plans on pruned scans; the share
  * query's global window runs over the tiny post-aggregation result,
  * not the raw events.
  */
object Dashboard {

  /** Dashboard slicer parameters (SURVEY §3 E3 — the Date and Farm
    * selectors on `Dashboard/Dashboard.jpg`'s right panel). Every
    * dashboard query takes these as plain column predicates applied
    * UNDER the aggregation, so Catalyst pushes them into the parquet
    * scan (`PushedFilters` on ts/user_id) — on a date-partitioned
    * 100 TB lake a sliced dashboard reads only the sliced fraction.
    *
    * `dateFrom` inclusive / `dateTo` exclusive, `yyyy-MM-dd`;
    * `farms` = the location multi-select (events' user_id stands in
    * for the farm id, as in the rest of the events mapping).
    */
  final case class Slicers(
      dateFrom: Option[String] = None,
      dateTo: Option[String] = None,
      farms: Option[Seq[Long]] = None) {
    def apply(df: DataFrame): DataFrame = {
      val preds = Seq(
        dateFrom.map(d => col("ts") >= lit(d).cast("timestamp")),
        dateTo.map(d => col("ts") < lit(d).cast("timestamp")),
        farms.map(f => col("user_id").isin(f: _*))).flatten
      preds.foldLeft(df)((acc, p) => acc.filter(p))
    }
  }

  /** Per-type dashboard breakdown (donut + totals + averages) over an
    * optionally-sliced event scan — the parameterized form behind q21/
    * q25/q26; q48 registers one fixed slice for the oracle gate.
    */
  def byType(events: DataFrame, slicers: Slicers = Slicers()): DataFrame =
    slicers(events)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        expr(Portable.qsum("value", 2)).as("total_value"),
        expr(Portable.qavg("value", 4)).as("avg_value"))

  val all: Seq[Q] = Seq(
    // A5: dashboard tiles — global averages.
    Q(
      "q20_avg_tiles",
      s"""SELECT ${Portable.qavg("value", 4)} AS avg_value,
         |       round(min(value), 2) AS min_value,
         |       round(max(value), 2) AS max_value,
         |       count(*) AS n_events
         |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).agg(
        expr(Portable.qavg("value", 4)).as("avg_value"),
        round(min("value"), 2).as("min_value"),
        round(max("value"), 2).as("max_value"),
        count(lit(1)).as("n_events"))
    },

    // A6: count by category (validation-status donut analog).
    Q(
      "q21_count_by_type",
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type") {
      (s, d) =>
        Tables.events(s, d).groupBy("event_type").agg(count(lit(1)).as("n"))
    },

    // A7: time-bucketed sums (hourly line chart; dim_time.hour analog).
    Q(
      "q22_hourly_series",
      s"""SELECT hour(ts) AS hour_of_day,
         |  ${Portable.qsum("value", 2)} AS sum_value,
         |  count(*) AS n
         |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(hour(col("ts")).as("hour_of_day"))
        .agg(expr(Portable.qsum("value", 2)).as("sum_value"), count(lit(1)).as("n"))
    },

    // A7 streaming-shaped variant: tumbling 1-day event-time window.
    Q(
      "q23_daily_window",
      // CAST AS DATE on both sides: Spark's date_trunc returns TIMESTAMP
      // while DuckDB's returns DATE for day-or-coarser granularity.
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         |  ${Portable.qsum("value", 2)} AS sum_value, count(*) AS n
         |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(expr(Portable.qsum("value", 2)).as("sum_value"), count(lit(1)).as("n"))
    },

    // A8: binned counts (wind-direction compass buckets analog).
    Q(
      "q24_value_bins",
      """SELECT CASE WHEN value < 50 THEN 'low'
        |            WHEN value < 120 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |  count(*) AS n
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(
          when(col("value") < 50, "low")
            .when(col("value") < 120, "mid")
            .otherwise("high").as("bucket"))
        .agg(count(lit(1)).as("n"))
    },

    // A9: totals by measure.
    Q(
      "q25_totals_by_type",
      s"""SELECT event_type, ${Portable.qsum("value", 2)} AS total_value
         |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(expr(Portable.qsum("value", 2)).as("total_value"))
    },

    // A10: share by location (readings % per farm analog) + per-key avg.
    Q(
      "q26_share_by_user",
      s"""SELECT user_id, n, round(n * 1.0 / sum(n) OVER (), 6) AS share,
         |       avg_value
         |FROM (SELECT user_id, count(*) AS n, ${Portable.qavg("value", 4)} AS avg_value
         |      FROM events GROUP BY user_id)""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), expr(Portable.qavg("value", 4)).as("avg_value"))
        .withColumn("share",
          round(col("n") * lit(1.0) / sum("n").over(Window.partitionBy()), 6))
        .select("user_id", "n", "share", "avg_value")
    },

    // P4+P6+P8: sentinel detection → range check → status derivation,
    // as the reference's when-chain (`Lambda/lamda.py:97-150`).
    Q(
      "q27_validation_status",
      """SELECT CASE WHEN value IN (0, 9999, -9999) THEN 'INVALID'
        |            WHEN value < 1 OR value > 170 THEN 'WARNING'
        |            ELSE 'VALID' END AS validation_status,
        |  count(*) AS n
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(
          when(col("value").isin(0, 9999, -9999), "INVALID")
            .when(col("value") < 1 || col("value") > 170, "WARNING")
            .otherwise("VALID").as("validation_status"))
        .agg(count(lit(1)).as("n"))
    },

    // F7/P12: JSON property extraction from the props payload column.
    Q(
      "q28_json_extract",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    },

    // E3: sliced dashboard — the Date + Farm slicer predicates at one
    // fixed setting, proving the parameterized path end-to-end.
    Q(
      "q48_sliced_dashboard",
      s"""SELECT event_type, count(*) AS n,
         |  ${Portable.qsum("value", 2)} AS total_value,
         |  ${Portable.qavg("value", 4)} AS avg_value
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
         |  AND user_id IN (1, 2, 3, 4, 5)
         |GROUP BY event_type""".stripMargin) { (s, d) =>
      byType(Tables.events(s, d), Slicers(
        dateFrom = Some("2024-01-10"),
        dateTo = Some("2024-01-20"),
        farms = Some(Seq(1L, 2L, 3L, 4L, 5L))))
    },

    // A3/ST6: exact dedup keep-first (event_id order) per (user, type).
    Q(
      "q29_dedup_keep_first",
      """SELECT user_id, event_type, min(event_id) AS first_event_id
        |FROM events GROUP BY user_id, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(min("event_id").as("first_event_id"))
    },

    // ── Rolling 7-day RANGE window over the daily series ───────────────
    // The trailing-week trend tile: per-type daily totals with a
    // 7-day rolling sum/count. RANGE (not ROWS) semantics — a type
    // with missing days must not silently widen its window to 7
    // PRESENT rows. Scale shape: the rolling window runs over the
    // pre-aggregated (type, day) SERIES (map-side-combined groupBy
    // first), never over raw events — the exchange carries one row per
    // type-day. The order key is an integer epoch-day so the RANGE
    // frame is pure integer arithmetic on both engines; sums are
    // micro-unit integers re-scaled at the edge (Portable.qresum).
    Q(
      "q107_rolling_window",
      s"""WITH d AS (SELECT event_type,
         |             CAST(date_trunc('day', ts) AS DATE) AS day,
         |             CAST(sum(${Portable.qval("value")}) AS BIGINT) AS sv,
         |             count(*) AS n
         |           FROM events GROUP BY 1, 2)
         |SELECT event_type, day, ${Portable.qscale("sv", 2)} AS day_value, n,
         |  ${Portable.qscale("CAST(sum(sv) OVER w AS BIGINT)", 2)} AS roll7_value,
         |  CAST(sum(n) OVER w AS BIGINT) AS roll7_n
         |FROM d
         |WINDOW w AS (PARTITION BY event_type ORDER BY day - DATE '1970-01-01'
         |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type")
        .orderBy(expr("datediff(day, date'1970-01-01')"))
        .rangeBetween(-6, 0)
      Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(
          expr(s"CAST(sum(${Portable.qval("value")}) AS BIGINT)").as("sv"),
          count(lit(1)).as("n"))
        .withColumn("rsv", sum("sv").over(w).cast("long"))
        .withColumn("roll7_n", sum("n").over(w).cast("long"))
        .select(col("event_type"), col("day"),
          expr(Portable.qscale("sv", 2)).as("day_value"), col("n"),
          expr(Portable.qscale("rsv", 2)).as("roll7_value"), col("roll7_n"))
    },

    // ── Recency-decayed engagement score (half-life weighting) ─────────
    // "Most active users, recent activity counting more" with a 7-day
    // half-life — the standard exponential decay, made integer-exact by
    // QUANTIZING the decay to week steps: weight = 2^(−⌊age/7d⌋), so
    // each event contributes its micro-unit value RIGHT-SHIFTED by the
    // week age. Shifts are exact on both engines — no pow(), no libm,
    // and the shifted sum is associative, so map-side combine composes
    // exactly like every other micro-unit aggregate. Age anchors to the
    // corpus max(ts) (broadcast 1-row dim); top-20 via
    // TakeOrderedAndProject with a user_id tiebreak.
    Q(
      "q121_decayed_engagement",
      s"""WITH mx AS (SELECT max(ts) AS mt FROM events),
         |s AS (SELECT user_id,
         |        CAST(sum(${Portable.qval("value")}
         |          >> CAST(date_diff('day', ts, mx.mt) // 7 AS INT)) AS BIGINT)
         |          AS dv,
         |        count(*) AS n_events
         |      FROM events, mx WHERE value IS NOT NULL
         |      GROUP BY user_id)
         |SELECT user_id, n_events, ${Portable.qscale("dv", 2)} AS decayed_value
         |FROM s ORDER BY dv DESC, user_id LIMIT 20""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
      val mx = ev.agg(max("ts").as("mt"))
      ev.crossJoin(broadcast(mx))
        .groupBy("user_id")
        .agg(
          expr(s"CAST(sum(shiftright(${Portable.qval("value")}," +
            " cast(datediff(cast(mt as date), cast(ts as date)) div 7 as int)))" +
            " AS BIGINT)").as("dv"),
          count(lit(1)).as("n_events"))
        .orderBy(col("dv").desc, col("user_id"))
        .limit(20)
        .select(col("user_id"), col("n_events"),
          expr(Portable.qscale("dv", 2)).as("decayed_value"))
    },

    // ── Day-of-week × hour activity heatmap ────────────────────────────
    // The weekly-rhythm dashboard tile: one map-side-combined aggregate
    // over two derived integer keys — the exchange carries ≤ 7×24
    // groups regardless of corpus size. Day-of-week numbering differs
    // across engines (Spark's dayofweek is 1-based Sunday-first,
    // DuckDB's dow is 0-based Sunday-first), so the Spark side
    // subtracts 1 — the alignment pinned here rather than left to a
    // reader's luck.
    Q(
      "q128_weekly_heatmap",
      s"""SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
         |  CAST(hour(ts) AS BIGINT) AS hour,
         |  count(*) AS n, ${Portable.qsum("value", 2)} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(
          expr("cast(dayofweek(ts) - 1 as bigint)").as("dow"),
          expr("cast(hour(ts) as bigint)").as("hour"))
        .agg(count(lit(1)).as("n"),
          expr(Portable.qsum("value", 2)).as("sum_value"))
    },

    // ── DAU / WAU / stickiness (rolling COUNT DISTINCT done right) ─────
    // The engagement tile. Rolling distinct users can't come from a
    // running window (DISTINCT doesn't decompose over frames); the
    // scale shape is COVERAGE EXPLODE: the (user, day) DISTINCT
    // relation — already reduced to presence bits, tiny next to raw
    // events — fans out ×7 (each active day covers the next week's
    // windows), then one distinct count per cover day. Fan-out is
    // bounded by the window length BY CONSTRUCTION; the corpus is
    // touched once for the presence relation. Stickiness = DAU/WAU in
    // integer ppm. Cover days past the observed range drop via the
    // inner join with the DAU series.
    Q(
      "q132_engagement",
      """WITH ud AS (SELECT DISTINCT user_id,
        |              CAST(date_trunc('day', ts) AS DATE) AS day
        |            FROM events),
        |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
        |cover AS (SELECT user_id, day + to_days(i::INT) AS day
        |          FROM ud, range(7) t(i)),
        |wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |        FROM cover GROUP BY day)
        |SELECT dau.day, dau.dau, wau.wau,
        |  CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stickiness_ppm
        |FROM dau JOIN wau ON wau.day = dau.day""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .distinct()
        .transform(CacheScope.scoped) // presence bits feed DAU and the 7× coverage fan-out
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(expr("sequence(0, 6)")).as("i"), col("day"))
        .select(col("user_id"), expr("date_add(day, cast(i as int))").as("day"))
        .groupBy("day").agg(countDistinct("user_id").as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          expr("dau * 1000000 div wau").as("stickiness_ppm"))
    },

    // ── New vs returning users per day ─────────────────────────────────
    // The acquisition/retention split every growth dashboard leads
    // with: a daily active user is "new" on their first-seen day and
    // "returning" after. One pass builds the (user, day) presence
    // relation, a per-user min marks the first day (combine-reduced),
    // and the classification is a presence-sized join — events are
    // never touched twice. Share in integer ppm.
    Q(
      "q138_new_vs_returning",
      """WITH ud AS (SELECT DISTINCT user_id,
        |              CAST(date_trunc('day', ts) AS DATE) AS day
        |            FROM events),
        |f AS (SELECT user_id, min(day) AS d0 FROM ud GROUP BY user_id)
        |SELECT ud.day,
        |  CAST(count(CASE WHEN ud.day = f.d0 THEN 1 END) AS BIGINT) AS new_users,
        |  CAST(count(CASE WHEN ud.day > f.d0 THEN 1 END) AS BIGINT) AS returning_users,
        |  CAST(count(CASE WHEN ud.day = f.d0 THEN 1 END) * 1000000 // count(*)
        |       AS BIGINT) AS new_share_ppm
        |FROM ud JOIN f ON f.user_id = ud.user_id
        |GROUP BY ud.day""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .distinct()
        .transform(CacheScope.scoped) // presence bits feed the first-day aggregate AND the split
      val f = ud.groupBy("user_id").agg(min("day").as("d0"))
      ud.join(f, "user_id")
        .groupBy("day")
        .agg(
          count(expr("CASE WHEN day = d0 THEN 1 END")).as("new_users"),
          count(expr("CASE WHEN day > d0 THEN 1 END")).as("returning_users"),
          expr("count(CASE WHEN day = d0 THEN 1 END) * 1000000 div count(1)")
            .as("new_share_ppm"))
    })
}
