package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{CacheScope, Q, Tables}

/** Temporal operators Spark has no native verb for, composed from
  * window functions (preference (a) of the custom-operator ladder:
  * compose existing ops when semantics allow — no custom plan needed):
  *
  *  - AS-OF join: attach the most recent *prior* observation of one
  *    series to each row of another (the time-series/IoT staple —
  *    "latest purchase before this click", "latest calibration before
  *    this reading"). One sort-window pass per partition key instead of
  *    a per-row range probe: scales as a single keyed exchange + sort,
  *    no O(n·m) range join.
  *  - Sessionization: split each user's event stream on >30 min gaps
  *    and aggregate per session — integer cumulative-sum windows, one
  *    exchange.
  *
  * Both output raw parquet values or integer counts (no derived float
  * arithmetic), so oracle rows match exactly; q45 also round-trips raw
  * `ts` values, pinning the nanos→µs truncation contract in
  * [[graft.Tables.events]].
  */
object Temporal {

  /** The ordered-funnel step relations shared by q84 (conversion
    * counts) and q93 (step-latency distribution): u1 = first view per
    * user, u2 = first click within a day after u1, u3 = first purchase
    * within a day after u2. One definition on each side so the
    * latency metric can never measure a different funnel than the
    * conversion report.
    */
  private val funnelStepsDuck =
    """u1 AS (SELECT user_id, min(ts) AS t FROM events
      |            WHERE event_type = 'view' GROUP BY user_id),
      |u2 AS (SELECT e.user_id, min(e.ts) AS t
      |       FROM events e JOIN u1 ON u1.user_id = e.user_id
      |       WHERE e.event_type = 'click'
      |         AND e.ts > u1.t AND e.ts <= u1.t + INTERVAL 1 DAY
      |       GROUP BY e.user_id),
      |u3 AS (SELECT e.user_id, min(e.ts) AS t
      |       FROM events e JOIN u2 ON u2.user_id = e.user_id
      |       WHERE e.event_type = 'purchase'
      |         AND e.ts > u2.t AND e.ts <= u2.t + INTERVAL 1 DAY
      |       GROUP BY e.user_id)""".stripMargin

  /** The 30-min gaps-and-islands session assignment as a DuckDB CTE —
    * `sess(user_id, ts, event_id, event_type, value, session_idx)` —
    * ONE definition shared by q46 (session aggregates) and q141
    * (within-session funnel), so the funnel can never count sessions
    * the sessionizer wouldn't produce.
    */
  private val sessionRowsDuck =
    """sess AS (SELECT user_id, ts, event_id, event_type, value,
      |           (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id))::BIGINT
      |             AS session_idx
      |         FROM (SELECT user_id, ts, event_id, event_type, value,
      |                 CASE WHEN lag(ts) OVER w IS NULL
      |                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |                      THEN 1 ELSE 0 END AS new_session
      |               FROM events
      |               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))"""
      .stripMargin

  /** Spark side of [[sessionRowsDuck]]. */
  private def sessionRows(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("new_session",
        when(lag(col("ts"), 1).over(byTime).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byTime)) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_idx", sum("new_session").over(byTime))
  }

  private def funnelSteps(s: org.apache.spark.sql.SparkSession, d: String) = {
    val ev = Tables.events(s, d)
    val u1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t"))
    def step(prev: org.apache.spark.sql.DataFrame, etype: String) =
      ev.filter(col("event_type") === etype)
        .join(prev.select(col("user_id").as("p_uid"), col("t").as("pt")),
          col("user_id") === col("p_uid") &&
            col("ts") > col("pt") && expr("ts <= pt + INTERVAL 1 DAY"))
        .groupBy("user_id").agg(min("ts").as("t"))
    val u2 = step(u1, "click")
    val u3 = step(u2, "purchase")
    (u1, u2, u3)
  }

  val all: Seq[Q] = Seq(
    // ── AS-OF join via IGNORE NULLS last-value window ──────────────────
    Q(
      "q45_asof_join",
      """SELECT event_id, user_id, ts, value, last_purchase
        |FROM (SELECT event_id, user_id, ts, value, event_type,
        |        last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase
        |      FROM events)
        |WHERE event_type = 'click'""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("last_purchase",
          last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value", "last_purchase")
    },

    // ── Sessionization on 30-minute inactivity gaps ────────────────────
    Q(
      "q46_sessionize",
      s"""WITH $sessionRowsDuck
        |SELECT user_id, session_idx,
        |  count(*) AS n_events,
        |  min(ts) AS session_start,
        |  ${Portable.qsum("value", 2)} AS session_value
        |FROM sess GROUP BY user_id, session_idx""".stripMargin) { (s, d) =>
      sessionRows(s, d)
        .groupBy("user_id", "session_idx")
        .agg(
          count(lit(1)).as("n_events"),
          min("ts").as("session_start"),
          expr(Portable.qsum("value", 2)).as("session_value"))
    },

    // ── Within-session funnel (session-scoped conversion) ──────────────
    // q84 counts conversions ACROSS a user's whole history; product
    // decisions usually need the stricter question — did the click
    // happen in the SAME session as the view, after it? Shape: the
    // shared session assignment ([[sessionRows]]), a first-view window
    // per session, then ONE session-keyed aggregate whose partitioning
    // extends the window's (exchange reused, q81's discipline) counts
    // views and after-view clicks; the summary is sessions-sized then
    // one row. Rates in floor-ppm.
    Q(
      "q141_session_funnel",
      s"""WITH $sessionRowsDuck,
        |fv AS (SELECT user_id, session_idx, ts, event_type,
        |         min(CASE WHEN event_type = 'view' THEN ts END)
        |           OVER (PARTITION BY user_id, session_idx) AS first_view
        |       FROM sess),
        |g AS (SELECT user_id, session_idx,
        |        max(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS has_view,
        |        max(CASE WHEN event_type = 'click' AND ts > first_view
        |              THEN 1 ELSE 0 END) AS converted
        |      FROM fv GROUP BY user_id, session_idx)
        |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(has_view) AS BIGINT) AS n_with_view,
        |  CAST(sum(converted) AS BIGINT) AS n_converted,
        |  CAST(sum(converted) * 1000000 // sum(has_view) AS BIGINT) AS conv_ppm
        |FROM g""".stripMargin) { (s, d) =>
      val bySession = Window.partitionBy("user_id", "session_idx")
      sessionRows(s, d)
        .withColumn("first_view",
          min(when(col("event_type") === "view", col("ts"))).over(bySession))
        .groupBy("user_id", "session_idx")
        .agg(
          max(when(col("first_view").isNotNull, 1).otherwise(0)).as("has_view"),
          max(when(col("event_type") === "click" && col("ts") > col("first_view"), 1)
            .otherwise(0)).as("converted"))
        .agg(
          count(lit(1)).as("n_sessions"),
          expr("CAST(sum(has_view) AS BIGINT)").as("n_with_view"),
          expr("CAST(sum(converted) AS BIGINT)").as("n_converted"),
          expr("CAST(sum(converted) * 1000000 div sum(has_view) AS BIGINT)")
            .as("conv_ppm"))
    },

    // ── Transition dwell-time distribution (q92 with timing) ───────────
    // Not just WHICH transitions happen but how LONG they take: the
    // inter-event gap per (src → dst) step, with count, integer mean
    // µs, and exact interpolated p50 via the shared sorted-array
    // percentile machinery (µs are micro-units of seconds — q93's
    // identity). Gaps come from one lead() pass over bounded per-user
    // partitions; the arrays group by the |types|² transition matrix,
    // the per-group-array trade q43 documents (sketch path at extreme
    // per-pair volumes).
    Q(
      "q142_dwell_times",
      s"""WITH t AS (SELECT event_type AS src,
         |             lead(event_type) OVER w AS dst,
         |             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS us
         |           FROM events
         |           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |arr_t AS (SELECT src, dst, list_sort(list(us)) AS arr,
         |            count(*) AS n,
         |            CAST(sum(us) AS BIGINT) // count(*) AS mean_us
         |          FROM t WHERE dst IS NOT NULL GROUP BY src, dst)
         |SELECT src, dst, n, mean_us,
         |  ${Statistics.pctlDuck("0.5")} AS p50_s
         |FROM arr_t""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("event_type").as("src"),
          lead("event_type", 1).over(w).as("dst"),
          (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))).as("us"))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst")
        .agg(
          sort_array(collect_list("us")).as("arr"),
          count(lit(1)).as("n"),
          expr("sum(us) div count(1)").as("mean_us"))
        .select(col("src"), col("dst"), col("n"), col("mean_us"),
          expr(Statistics.pctlSpark("0.5")).as("p50_s"))
    },

    // ── Native session_window vs independent gaps-and-islands oracle ───
    // The same sessions as q46, but computed by Spark's built-in
    // session-window aggregation (graft.stream.WindowedAggs.sessionized
    // — the operator the STREAMING path uses) and verified against a
    // DuckDB gaps-and-islands formulation written independently of it.
    // Boundary rule differs from q46 on purpose: session_window's
    // half-open [start, end) means an event exactly `gap` after its
    // predecessor starts a NEW session (>= in the oracle, vs q46's >).
    Q(
      "q51_session_window",
      s"""SELECT user_id,
        |  min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events,
        |  ${Portable.qsum("value", 2)} AS session_value
        |FROM (SELECT user_id, ts, value,
        |        (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id))::BIGINT AS session_idx
        |      FROM (SELECT user_id, ts, event_id, value,
        |              CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                     OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800000000
        |                   THEN 1 ELSE 0 END AS new_session
        |            FROM events))
        |GROUP BY user_id, session_idx""".stripMargin) { (s, d) =>
      // feed the session operator pre-quantized micro-units so its sum
      // is the portable integer sum (Portable.qval), scaled afterwards
      graft.stream.WindowedAggs.sessionized(
        Tables.events(s, d).withColumn("value_q", expr(Portable.qval("value"))),
        "ts", "value_q", keyCols = Seq("user_id"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), expr(Portable.qscale("sum_value", 2)).as("session_value"))
    },

    // ── Ordered-funnel conversion (view → click → purchase) ────────────
    // The product-analytics staple over the event stream: users who
    // completed each step of an ORDERED sequence, each step within one
    // day of the previous (unbounded windows don't discriminate on a
    // long-running stream — every user eventually does everything).
    // Chained conditional-min formulation instead of a per-user
    // sort-and-scan: step N = min(ts of its event type strictly after
    // step N−1's ts, within the window), so each step is one
    // TYPE-FILTERED scan (predicate pushed to parquet) joined to the
    // previous step's user-cardinality (user, t) relation — tiny, and
    // hint-free so AQE broadcasts it while it fits — then a user-keyed
    // min with map-side combine. At 100 TB of events: 3 pushed-filter
    // scans, 3 broadcast joins, 3 combine-reduced aggs; no corpus-wide
    // window sort anywhere. Comparisons are engine-internal timestamp
    // orderings (each engine compares its own ts representation), so
    // per-step user counts match exactly; outputs are counts + one
    // floor-truncated share.
    Q(
      "q84_funnel",
      s"""WITH $funnelStepsDuck,
         |n1 AS (SELECT count(*) AS n FROM u1)
         |SELECT step, n_users,
         |  floor(n_users * 1000000.0 / n1.n) / 1000000.0 AS conversion
         |FROM (SELECT '1_view' AS step, count(*) AS n_users FROM u1
         |      UNION ALL SELECT '2_click', count(*) FROM u2
         |      UNION ALL SELECT '3_purchase', count(*) FROM u3), n1""".stripMargin) { (s, d) =>
      val (u1, u2, u3) = funnelSteps(s, d)
      val n1 = u1.agg(count(lit(1)).as("n"))
      u1.agg(count(lit(1)).as("n_users"))
        .select(lit("1_view").as("step"), col("n_users"))
        .union(u2.agg(count(lit(1)).as("n_users"))
          .select(lit("2_click").as("step"), col("n_users")))
        .union(u3.agg(count(lit(1)).as("n_users"))
          .select(lit("3_purchase").as("step"), col("n_users")))
        .crossJoin(broadcast(n1))
        .select(col("step"), col("n_users"),
          expr("floor(n_users * 1000000.0D / n) / 1000000.0D").as("conversion"))
    },

    // ── Retention cohorts (first-seen day × weeks-since grid) ──────────
    // The other product-analytics staple: users grouped by first-seen
    // day, and for each cohort the share still active N weeks later.
    // DATE is the cross-engine type for the cohort key (DuckDB's
    // date_trunc('week') yields DATE where Spark's yields TIMESTAMP —
    // casting ts to DATE on both sides removes the mismatch), and the
    // week offset is pure integer day arithmetic ((day − cohort) ∕∕ 7).
    // A user active on several days of the same offset week counts
    // once: the DISTINCT runs on (user, cohort, offset) AFTER the
    // offset is computed, not on raw activity days. Shapes: first-seen
    // is a user-keyed min with map-side combine; activity is a
    // distinct over (user, day) pairs — both combine-reduced; the join
    // is user-keyed and hint-free (user dimension can be huge — AQE
    // picks); the final grid is cohorts × offsets, tiny at any scale.
    Q(
      "q85_retention_cohorts",
      """WITH wk AS (SELECT user_id, ts::DATE AS w FROM events),
        |ua AS (SELECT user_id, min(w) AS cohort FROM wk GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, w FROM wk),
        |uo AS (SELECT DISTINCT act.user_id, ua.cohort,
        |         (act.w - ua.cohort) // 7 AS week_offset
        |       FROM act JOIN ua ON ua.user_id = act.user_id),
        |ret AS (SELECT cohort, week_offset, count(*) AS n_active
        |        FROM uo GROUP BY cohort, week_offset),
        |cs AS (SELECT cohort, count(*) AS cohort_size FROM ua GROUP BY cohort)
        |SELECT ret.cohort AS cohort_day, CAST(week_offset AS BIGINT) AS week_offset,
        |  n_active, cohort_size,
        |  floor(n_active * 1000000.0 / cohort_size) / 1000000.0 AS retention
        |FROM ret JOIN cs ON cs.cohort = ret.cohort""".stripMargin) { (s, d) =>
      val wk = Tables.events(s, d)
        .select(col("user_id"), expr("cast(ts as date)").as("w"))
      val ua = wk.groupBy("user_id").agg(min("w").as("cohort"))
      val act = wk.distinct()
      val uo = act.join(ua.withColumnRenamed("user_id", "u_id"),
          col("user_id") === col("u_id"))
        .select(col("user_id"), col("cohort"),
          expr("cast(datediff(w, cohort) div 7 as bigint)").as("week_offset"))
        .distinct()
      val ret = uo.groupBy("cohort", "week_offset")
        .agg(count(lit(1)).as("n_active"))
      val cs = ua.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
      ret.join(cs.withColumnRenamed("cohort", "c_cohort"),
          col("cohort") === col("c_cohort"))
        .select(col("cohort").as("cohort_day"), col("week_offset"),
          col("n_active"), col("cohort_size"),
          expr("floor(n_active * 1000000.0D / cohort_size) / 1000000.0D").as("retention"))
    },

    // ── Event-transition mining (top Markov bigrams) ───────────────────
    // The behavior-mining aggregate: which consecutive event-type
    // transitions dominate the stream. Per-user lead() over (ts,
    // event_id) pairs each event with its successor — the window
    // partition is one user's history, bounded — then a
    // map-side-combined (src, dst) count; the transition matrix is
    // |types|² rows, so the final ranking window runs over an
    // aggregate-sized relation (25 rows here), not the stream. Top-10
    // with the (n DESC, src, dst) tiebreak is deterministic on both
    // engines.
    Q(
      "q92_event_transitions",
      """WITH t AS (SELECT event_type AS src,
        |             lead(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS dst
        |           FROM events),
        |c AS (SELECT src, dst, count(*) AS n FROM t
        |      WHERE dst IS NOT NULL GROUP BY src, dst)
        |SELECT rank, src, dst, n FROM (
        |  SELECT src, dst, n, row_number() OVER (ORDER BY n DESC, src, dst) AS rank
        |  FROM c)
        |WHERE rank <= 10""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables.events(s, d)
        .select(col("event_type").as("src"),
          lead("event_type", 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("src"), col("dst"))
        .limit(10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("src"), col("dst"))))
        .select("rank", "src", "dst", "n")
    },

    // ── Conversion-latency distribution (the funnel's companion) ───────
    // How long the view→click step takes for users who made it: count,
    // min/max/mean in raw microseconds (pure BIGINT — epoch-µs
    // differences), and interpolated p50/p90 in seconds via the exact
    // percentile machinery (µs ARE micro-units of seconds, so q43's
    // sorted-array pctl applies verbatim, floor-truncated to the µs).
    // Latencies are one value per converting user; the global sorted
    // array is the exact form — at extreme user counts the
    // approx_percentile sketch is the scale path (q63's documented
    // trade). Reuses q84's step relations, so the latency always
    // measures the same funnel the conversion report counts.
    Q(
      "q93_conversion_latency",
      s"""WITH $funnelStepsDuck,
         |lat AS (SELECT epoch_us(u2.t) - epoch_us(u1.t) AS us
         |        FROM u2 JOIN u1 ON u1.user_id = u2.user_id),
         |arr_t AS (SELECT list_sort(list(us)) AS arr,
         |            count(*) AS n, min(us) AS min_us, max(us) AS max_us,
         |            CAST(sum(us) AS BIGINT) // count(*) AS mean_us
         |          FROM lat)
         |SELECT n, min_us, max_us, mean_us,
         |  ${Statistics.pctlDuck("0.5")} AS p50_s,
         |  ${Statistics.pctlDuck("0.9")} AS p90_s
         |FROM arr_t""".stripMargin) { (s, d) =>
      val (u1, u2, _) = funnelSteps(s, d)
      u2.select(col("user_id").as("u2_id"), col("t").as("t2"))
        .join(u1, col("user_id") === col("u2_id"))
        .select(expr("unix_micros(t2) - unix_micros(t)").as("us"))
        .agg(
          sort_array(collect_list("us")).as("arr"),
          count(lit(1)).as("n"),
          min("us").as("min_us"), max("us").as("max_us"),
          expr("sum(us) div count(1)").as("mean_us"))
        .select(col("n"), col("min_us"), col("max_us"), col("mean_us"),
          expr(Statistics.pctlSpark("0.5")).as("p50_s"),
          expr(Statistics.pctlSpark("0.9")).as("p90_s"))
    },

    // ── Range (interval) join via time-bucket equi-prejoin ─────────────
    // Shipments falling inside each of 10 fixed 30-day campaign
    // windows. The naive plan for a pure range predicate is a nested
    // loop (every row × every window); instead both sides map to
    // 30-day epoch buckets — a window overlaps ≤ 2 buckets, a shipment
    // exactly 1 — so the join becomes an EQUI-join on bucket (hash
    // join, broadcast here since windows are tiny; shuffle-hash when
    // both sides are large) followed by the exact BETWEEN filter on the
    // survivors. That is the 100 TB interval-join shape: O(n) bucket
    // probes instead of O(n·windows) comparisons, and it degrades
    // gracefully to big-big (shuffle both sides on bucket) when the
    // window table stops fitting in a broadcast. PlanShapeSpec asserts
    // no BroadcastNestedLoopJoin survives in the plan.
    Q(
      "q97_range_join",
      s"""SELECT w.window_id, count(*) AS n_items,
         |  ${Portable.qsum("l.l_quantity", 2)} AS qty_sum
         |FROM lineitem l
         |JOIN (SELECT i AS window_id,
         |        TIMESTAMP '1995-01-01' + to_days((90 * i)::INT) AS ws
         |      FROM range(10) t(i)) w
         |  ON l.l_shipdate >= w.ws AND l.l_shipdate < w.ws + to_days(30)
         |GROUP BY w.window_id""".stripMargin) { (s, d) =>
      // epoch-day buckets, 30 days wide; `div` keeps the math integral
      val bucket = "datediff(cast(%s as date), date'1970-01-01') div 30"
      val wins = s.range(10).select(
        col("id").as("window_id"),
        expr("cast(date_add(date'1995-01-01', cast(id * 90 as int)) as timestamp)").as("ws"))
        .withColumn("we", expr("ws + interval 30 days"))
        // a 30-day window spans at most 2 buckets: its start's and its
        // last included day's ([ws, we) half-open → last day is ws+29)
        .withColumn("bkt", explode(expr(
          s"sequence(${bucket.format("ws")}, (datediff(cast(ws as date), date'1970-01-01') + 29) div 30)")))
      Tables.lineitem(s, d)
        .select(col("l_shipdate"), col("l_quantity"))
        .withColumn("bkt", expr(bucket.format("l_shipdate")))
        .join(wins, "bkt")
        .where(col("l_shipdate") >= col("ws") && col("l_shipdate") < col("we"))
        .groupBy("window_id")
        .agg(
          count(lit(1)).as("n_items"),
          expr(Portable.qsum("l_quantity", 2)).as("qty_sum"))
    },

    // ── SCD2 dimension history from an event stream ────────────────────
    // The warehouse's slowly-changing-dimension builder: collapse each
    // user's event stream into versioned attribute rows — one row per
    // run of a stable attribute (the value tier), with
    // [valid_from, valid_to) effective ranges, NULL valid_to marking
    // the current version. The reference's star ETL only upserts
    // current rows (anti-join, J1/J2); SCD2 is what it would need the
    // moment anyone asks "what tier was this user in LAST month".
    // Shape: gaps-and-islands — one keyed exchange for the change-flag
    // window, the run groupBy reuses that partitioning, then a
    // versions-sized lead() window closes the ranges. All state is
    // per-user version counts (tiny), never raw history.
    Q(
      "q103_scd2_history",
      """WITH t AS (SELECT user_id, ts, event_id,
        |             coalesce(CAST(floor(value / 25.0) AS BIGINT), -1) AS tier
        |           FROM events),
        |f AS (SELECT user_id, ts, event_id, tier,
        |        CASE WHEN lag(tier) OVER w IS NULL
        |               OR lag(tier) OVER w <> tier THEN 1 ELSE 0 END AS chg
        |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |v AS (SELECT user_id, tier,
        |        (sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id))::BIGINT
        |          AS version,
        |        ts
        |      FROM f),
        |runs AS (SELECT user_id, version, tier,
        |           min(ts) AS valid_from, count(*) AS n_events
        |         FROM v GROUP BY user_id, version, tier)
        |SELECT user_id, version, tier, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
        |  CASE WHEN lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
        |         IS NULL THEN 1 ELSE 0 END AS is_current,
        |  n_events
        |FROM runs""".stripMargin) { (s, d) =>
      val byU = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val byVer = Window.partitionBy("user_id").orderBy("version")
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("coalesce(CAST(floor(value / 25.0D) AS BIGINT), -1L)").as("tier"))
        .withColumn("chg",
          when(lag("tier", 1).over(byU).isNull ||
            lag("tier", 1).over(byU) =!= col("tier"), 1).otherwise(0))
        .withColumn("version", sum("chg").over(byU))
        .groupBy("user_id", "version", "tier")
        .agg(min("ts").as("valid_from"), count(lit(1)).as("n_events"))
        .withColumn("valid_to", lead("valid_from", 1).over(byVer))
        .select(col("user_id"), col("version"), col("tier"), col("valid_from"),
          col("valid_to"),
          when(col("valid_to").isNull, 1).otherwise(0).as("is_current"),
          col("n_events"))
    },

    // ── Regular-grid resampling with LOCF (feature-store alignment) ────
    // Irregular sensor/event series → each user's values sampled onto
    // an hourly grid with last-observation-carried-forward — the
    // alignment step before any model-feature join (regular grids join
    // by equality; raw event times need per-row as-of probes). Shape:
    // the grid generates from each user's OWN [min, max] span (one
    // pre-aggregated row per user exploded into grid points — no
    // corpus-sized cross join against a global calendar), then ONE
    // union + keyed sort-window pass carries values onto grid rows, the
    // same single-exchange pattern as the as-of join (q45). Grid rows
    // order AFTER readings at the same instant (g = 1 tiebreak), so a
    // reading exactly on the hour is visible to that hour's grid point.
    // Values pass through raw — no arithmetic, exact on both engines.
    Q(
      "q106_resample_locf",
      """WITH b AS (SELECT user_id, min(ts) AS t0, max(ts) AS t1
        |           FROM events GROUP BY user_id),
        |grid AS (SELECT user_id,
        |           unnest(generate_series(date_trunc('hour', t0),
        |                                  date_trunc('hour', t1),
        |                                  INTERVAL 1 HOUR)) AS ts
        |         FROM b),
        |u AS (SELECT user_id, ts, 0 AS g, event_id, value FROM events
        |      UNION ALL
        |      SELECT user_id, ts, 1, NULL, NULL FROM grid),
        |w AS (SELECT user_id, ts, g,
        |        last_value(value IGNORE NULLS) OVER (
        |          PARTITION BY user_id ORDER BY ts, g, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        |      FROM u)
        |SELECT user_id, ts AS hour_ts, v FROM w WHERE g = 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select("user_id", "ts", "event_id", "value")
      val grid = ev.groupBy("user_id").agg(min("ts").as("t0"), max("ts").as("t1"))
        .select(col("user_id"), explode(expr(
          "sequence(date_trunc('hour', t0), date_trunc('hour', t1), interval 1 hour)"))
          .as("ts"))
      val unioned = ev.select(col("user_id"), col("ts"), lit(0).as("g"),
          col("event_id"), col("value"))
        .unionAll(grid.select(col("user_id"), col("ts"), lit(1).as("g"),
          lit(null).cast("bigint").as("event_id"),
          lit(null).cast("double").as("value")))
      unioned
        .withColumn("v", last(col("value"), ignoreNulls = true).over(
          Window.partitionBy("user_id").orderBy("ts", "g", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .where(col("g") === 1)
        .select(col("user_id"), col("ts").as("hour_ts"), col("v"))
    },

    // ── Multi-touch (linear) attribution with exact-sum credits ────────
    // Each purchase's credit splits equally across the user's clicks in
    // the preceding day — the "linear" attribution model — with the
    // integer remainder going to the MOST RECENT click (largest-
    // remainder discipline, q89's trick), so every purchase's credits
    // sum to exactly 10⁶ ppm BY CONSTRUCTION: attribution reports that
    // don't reconcile are worse than none. Shape: purchases join
    // clicks on the USER equi-key (the time bound is a post-filter —
    // per-user fan-out is session-sized, no bucketing needed), the
    // per-purchase touch count and recency rank come from one window
    // over the joined pairs, and the final rollup buckets credit by
    // click day. Everything is integer ppm.
    Q(
      "q122_attribution",
      """WITH p AS (SELECT user_id, ts AS pt, event_id AS pid FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS ct, event_id AS cid FROM events
        |      WHERE event_type = 'click'),
        |touch AS (SELECT p.user_id, p.pt, p.pid, c.ct,
        |            CAST(count(*) OVER w AS BIGINT) AS k,
        |            CAST(row_number() OVER (PARTITION BY p.pid
        |                   ORDER BY c.ct DESC, c.cid DESC) AS BIGINT) AS rn
        |          FROM p JOIN c ON c.user_id = p.user_id
        |            AND c.ct < p.pt AND c.ct >= p.pt - INTERVAL 1 DAY
        |          WINDOW w AS (PARTITION BY p.pid)),
        |credit AS (SELECT CAST(date_trunc('day', ct) AS DATE) AS click_day,
        |             1000000 // k + CASE WHEN rn = 1
        |               THEN 1000000 % k ELSE 0 END AS ppm
        |           FROM touch)
        |SELECT click_day, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(ppm) AS BIGINT) AS credit_ppm
        |FROM credit GROUP BY click_day""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("pt"),
          col("event_id").as("pid"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("ts").as("ct"),
          col("event_id").as("cid"))
      val byPurchase = Window.partitionBy("pid")
      p.join(c, col("c_uid") === col("p_uid") &&
          col("ct") < col("pt") && expr("ct >= pt - INTERVAL 1 DAY"))
        .withColumn("k", count(lit(1)).over(byPurchase))
        .withColumn("rn", row_number().over(
          byPurchase.orderBy(col("ct").desc, col("cid").desc)).cast("long"))
        .select(
          date_trunc("day", col("ct")).cast("date").as("click_day"),
          expr("1000000 div k + CASE WHEN rn = 1 THEN 1000000 % k ELSE 0 END")
            .as("ppm"))
        .groupBy("click_day")
        .agg(count(lit(1)).as("n_touches"),
          expr("CAST(sum(ppm) AS BIGINT)").as("credit_ppm"))
    },

    // ── Market-basket association rules (support / confidence / lift) ──
    // Which activities co-occur in a user-day "basket"? The classic
    // mining triple over (user, day) baskets: support(a,b),
    // confidence(a→b) = s(ab)/s(a), lift = s(ab)·N/(s(a)·s(b)) — all
    // integer ppm off basket counts. Scale shape: baskets reduce to
    // DISTINCT (basket, item) presence bits (corpus touched once);
    // within-basket pairs fan out at ≤ |itemset|²/2 per basket — with
    // a bounded item domain (event types here; top-K SKUs in retail)
    // the pair relation stays ~|baskets|-sized. Both directions emit
    // (a→b and b→a confidence differ); item-count sides are tiny
    // aggregates joined hint-free.
    Q(
      "q133_basket_rules",
      """WITH items AS (SELECT DISTINCT user_id,
        |                 CAST(date_trunc('day', ts) AS DATE) AS day,
        |                 event_type AS item
        |               FROM events),
        |nb AS (SELECT CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS n
        |       FROM items),
        |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM items
        |       GROUP BY item),
        |pc AS (SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS c_ab
        |       FROM items x JOIN items y
        |         ON x.user_id = y.user_id AND x.day = y.day AND x.item <> y.item
        |       GROUP BY 1, 2)
        |SELECT a, b, c_ab,
        |  CAST(c_ab * 1000000 // nb.n AS BIGINT) AS support_ppm,
        |  CAST(c_ab * 1000000 // ia.c AS BIGINT) AS confidence_ppm,
        |  CAST(floor(((CAST(c_ab AS DOUBLE) * CAST(nb.n AS DOUBLE))
        |    / (CAST(ia.c AS DOUBLE) * CAST(ib.c AS DOUBLE))) * 1000000.0) AS BIGINT)
        |    AS lift_ppm
        |FROM pc
        |JOIN ic ia ON ia.item = a
        |JOIN ic ib ON ib.item = b, nb""".stripMargin) { (s, d) =>
      val items = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"),
          col("event_type").as("item"))
        .distinct()
        .transform(CacheScope.scoped) // presence bits feed basket count, item counts, pairs
      val nb = items.select("user_id", "day").distinct()
        .agg(count(lit(1)).as("n"))
      val ic = items.groupBy("item").agg(count(lit(1)).as("c"))
      val pc = items.as("x")
        .join(items.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.day") === col("y.day") && col("x.item") =!= col("y.item"))
        .groupBy(col("x.item").as("a"), col("y.item").as("b"))
        .agg(count(lit(1)).as("c_ab"))
      pc.join(ic.select(col("item").as("a"), col("c").as("ca")), "a")
        .join(ic.select(col("item").as("b"), col("c").as("cb")), "b")
        .crossJoin(broadcast(nb))
        .select(col("a"), col("b"), col("c_ab"),
          // support/confidence stay integer: c_ab·10⁶ ≤ n·10⁶ fits
          // BIGINT while n ≤ 9.2e12 baskets. Lift's c_ab·n·10⁶ does
          // NOT (n² term), so it routes through DOUBLE — exact int64
          // casts below 2⁵³, identical correctly-rounded op order on
          // both engines, floor at the end (same fix as q119).
          expr("c_ab * 1000000 div n").as("support_ppm"),
          expr("c_ab * 1000000 div ca").as("confidence_ppm"),
          expr("CAST(floor(((CAST(c_ab AS DOUBLE) * CAST(n AS DOUBLE))" +
            " / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))) * 1000000.0D) AS BIGINT)")
            .as("lift_ppm"))
    },

    // ── Path-to-purchase mining (purchase-anchored 3-step paths) ───────
    // What sequences actually precede a purchase? Each purchase is
    // annotated with its user's two prior event types (lag() over the
    // per-user ordered stream — bounded partitions, no self-join) and
    // the 3-step path string counts roll up to the top 10. The path
    // alphabet is |types|³-bounded, so everything after the per-user
    // window is a tiny aggregate; q92's transition matrix is the
    // 1-step marginal of this. Purchases with <2 prior events keep a
    // '-' placeholder — start-of-history is a signal (cold-start
    // conversions), not a NULL to drop.
    Q(
      "q135_purchase_paths",
      """WITH seq AS (SELECT user_id, event_type, ts, event_id,
        |               lag(event_type, 1, '-') OVER w AS p1,
        |               lag(event_type, 2, '-') OVER w AS p2
        |             FROM events
        |             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |paths AS (SELECT p2 || '>' || p1 || '>' || event_type AS path
        |          FROM seq WHERE event_type = 'purchase'),
        |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM paths GROUP BY path)
        |SELECT path, n, CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rank
        |FROM c ORDER BY n DESC, path LIMIT 10""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("p1", lag(col("event_type"), 1, "-").over(w))
        .withColumn("p2", lag(col("event_type"), 2, "-").over(w))
        .filter(col("event_type") === "purchase")
        .select(concat_ws(">", col("p2"), col("p1"), col("event_type")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("path"))).cast("long"))
        .select("path", "n", "rank")
    },

    // ── Cohort LTV curves (cumulative value by cohort age) ─────────────
    // q85's retention grid with VALUE accumulated instead of presence
    // counted: users cohort by first-seen week, their micro-unit value
    // sums bucket by weeks-since-first-seen, and a cumulative window
    // over the cohort × age GRID (≤ weeks² rows) yields each cohort's
    // lifetime-value curve — the payback chart. Per-user firsts and
    // the (cohort, age) sums are combine-reduced single passes; the
    // cumulative window never sees event rows.
    Q(
      "q136_cohort_ltv",
      s"""WITH f AS (SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS d0
         |           FROM events GROUP BY user_id),
         |w AS (SELECT e.user_id,
         |        CAST((CAST(date_trunc('day', e.ts) AS DATE) - f.d0) // 7 AS BIGINT) AS age_w,
         |        CAST((f.d0 - DATE '2024-01-01') // 7 AS BIGINT) AS cohort_w,
         |        ${Portable.qval("e.value")} AS qv
         |      FROM events e JOIN f ON f.user_id = e.user_id
         |      WHERE e.value IS NOT NULL),
         |g AS (SELECT cohort_w, age_w, CAST(sum(qv) AS BIGINT) AS sv,
         |        CAST(count(*) AS BIGINT) AS n
         |      FROM w GROUP BY cohort_w, age_w)
         |SELECT cohort_w, age_w, n, ${Portable.qscale("sv", 2)} AS week_value,
         |  ${Portable.qscale(
            """CAST(sum(sv) OVER (PARTITION BY cohort_w ORDER BY age_w
              |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"""
              .stripMargin, 2)} AS cum_value
         |FROM g""".stripMargin) { (s, d) =>
      val f = Tables.events(s, d).groupBy("user_id")
        .agg(expr("min(cast(date_trunc('day', ts) as date))").as("d0"))
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .join(f, "user_id")
        .select(
          expr("cast(datediff(cast(date_trunc('day', ts) as date), d0) div 7 as bigint)")
            .as("age_w"),
          expr("cast(datediff(d0, date'2024-01-01') div 7 as bigint)").as("cohort_w"),
          expr(Portable.qval("value")).as("qv"))
        .groupBy("cohort_w", "age_w")
        .agg(expr("CAST(sum(qv) AS BIGINT)").as("sv"), count(lit(1)).as("n"))
        .withColumn("cum", sum("sv").over(
          Window.partitionBy("cohort_w").orderBy("age_w")
            .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .select(col("cohort_w"), col("age_w"), col("n"),
          expr(Portable.qscale("sv", 2)).as("week_value"),
          expr(Portable.qscale("cum", 2)).as("cum_value"))
    })
}
