package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ext.Portable

/** Relational operator inventory from SURVEY.md §2 (scans, filters,
  * joins, aggregates, windows, scalar functions), exercised over the
  * driver's TPC-H-ish star schema.
  *
  * Scale notes (100 TB stance): every query is a declarative plan over a
  * pruned parquet scan — filters/projections push down; dims
  * (region/nation/customer/supplier/part) are broadcast so the only
  * shuffles are the aggregation exchanges on already-reduced data; no
  * collect()-driven logic anywhere.
  */
object CoreQueries {

  val all: Seq[Q] = Seq(
    // ── A-series flagship: TPC-H Q1-shaped pricing summary ─────────────
    // SURVEY §2.4 A2/A5/A9 (counts, avgs, sums) in one pass; partial
    // aggregation map-side, one shuffle on (returnflag, linestatus).
    // Money/quantity sums compare via Portable.qsum/qavg (fixed-point
    // integer micro-units): double-sum accumulation order is
    // engine-specific, so round(sum(double)) only matched while no
    // group landed on a rounding boundary.
    Q(
      "q01_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Portable.qsum("l_quantity", 2)}                              AS sum_qty,
         |  ${Portable.qsum("l_extendedprice", 2)}                         AS sum_base_price,
         |  ${Portable.qsum("l_extendedprice * (1 - l_discount)", 2)}      AS sum_disc_price,
         |  ${Portable.qavg("l_quantity", 4)}                              AS avg_qty,
         |  ${Portable.qavg("l_extendedprice", 4)}                         AS avg_price,
         |  ${Portable.qavg("l_discount", 6)}                              AS avg_disc,
         |  count(*)                                                       AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          expr(Portable.qsum("l_quantity", 2)).as("sum_qty"),
          expr(Portable.qsum("l_extendedprice", 2)).as("sum_base_price"),
          expr(Portable.qsum("l_extendedprice * (1 - l_discount)", 2)).as("sum_disc_price"),
          expr(Portable.qavg("l_quantity", 4)).as("avg_qty"),
          expr(Portable.qavg("l_extendedprice", 4)).as("avg_price"),
          expr(Portable.qavg("l_discount", 6)).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // ── J3: multi-way star join resolving through broadcast dims ───────
    Q(
      "q02_star_join_revenue",
      s"""SELECT r_name,
         |  ${Portable.qsum("l_extendedprice * (1 - l_discount)", 2)} AS revenue,
         |  count(DISTINCT o_orderkey)                                AS n_orders
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey  = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name""".stripMargin) { (s, d) =>
      // Pre-aggregate lineitem per order BEFORE the orders join: the
      // join key is the grouping key, so revenue sums compose and
      // `count(DISTINCT o_orderkey)` over joined rows ≡ `count(*)` over
      // one-row-per-order input. This removes the countDistinct Expand
      // + second full-width exchange of the joined rows — at 100× scale
      // the difference between shuffling lineitem twice and once. The
      // two-level sum is EXACT vs the oracle's one-level sum because
      // revenue accumulates as integer micro-units (Portable.qval) —
      // quantized sums compose under any grouping; float sums don't.
      val perOrder = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(expr(s"sum(${Portable.qval("l_extendedprice * (1 - l_discount)")})").as("order_rev_q"))
      perOrder
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          expr(Portable.qresum("order_rev_q", 2)).as("revenue"),
          count(lit(1)).as("n_orders"))
    },

    // ── J1: single-column anti-join (NOT EXISTS ≡ left_anti) ───────────
    Q(
      "q03_anti_join_new_dims",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
    },

    // ── Semi join (EXISTS) ──────────────────────────────────────────────
    Q(
      "q04_semi_join_active",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d)
          .join(
            Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_mktsegment")
    },

    // ── P9: incremental high-watermark filter ──────────────────────────
    Q(
      "q05_incremental_filter",
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem WHERE l_shipdate > TIMESTAMP '1995-06-01 00:00:00'
        |GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1995-06-01").cast("timestamp"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    },

    // ── A1: MAX scalar aggregate (watermark read) ──────────────────────
    Q(
      "q06_max_watermark",
      "SELECT max(o_orderdate) AS max_full_date FROM orders") { (s, d) =>
      Tables.orders(s, d).agg(max("o_orderdate").as("max_full_date"))
    },

    // ── A3: SELECT DISTINCT multi-column dedup ─────────────────────────
    Q(
      "q07_distinct_dims",
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer") { (s, d) =>
      Tables.customer(s, d).select("c_nationkey", "c_mktsegment").distinct()
    },

    // ── F1: dim_time attribute extraction ──────────────────────────────
    Q(
      "q08_dim_time",
      """SELECT DISTINCT o_orderdate AS full_date,
        |  year(o_orderdate) AS year, month(o_orderdate) AS month,
        |  day(o_orderdate) AS day, hour(o_orderdate) AS hour,
        |  minute(o_orderdate) AS minute
        |FROM orders WHERE o_orderdate IS NOT NULL""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate").isNotNull)
        .select(
          col("o_orderdate").as("full_date"),
          year(col("o_orderdate")).as("year"),
          month(col("o_orderdate")).as("month"),
          dayofmonth(col("o_orderdate")).as("day"),
          hour(col("o_orderdate")).as("hour"),
          minute(col("o_orderdate")).as("minute"))
        .distinct()
    },

    // ── §2.5/§4: surrogate-key generation (IDENTITY → row_number) ──────
    Q(
      "q09_surrogate_keys",
      """SELECT c_nationkey,
        |  row_number() OVER (ORDER BY c_nationkey) AS surrogate_key
        |FROM (SELECT DISTINCT c_nationkey FROM customer)""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select("c_nationkey").distinct()
        .withColumn("surrogate_key",
          row_number().over(Window.orderBy("c_nationkey")))
    },

    // ── A10: share-of-total window ─────────────────────────────────────
    Q(
      "q10_share_of_total",
      """SELECT o_orderpriority, n, round(n * 1.0 / sum(n) OVER (), 6) AS share
        |FROM (SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1)""".stripMargin) {
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
          .withColumn("share",
            round(col("n") * lit(1.0) / sum("n").over(Window.partitionBy()), 6))
    },

    // ── §2.5: ORDER BY + LIMIT (top-k, deterministic tie-break) ────────
    Q(
      "q11_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },

    // ── J2: multi-condition anti-join ──────────────────────────────────
    Q(
      "q12_multicol_anti_join",
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND l_shipdate <= o_orderdate)
        |GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      Tables.lineitem(s, d)
        .join(o,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") <= col("o_orderdate"),
          "left_anti")
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    },

    // ── F2–F6: scalar function projection ──────────────────────────────
    Q(
      "q14_scalar_functions",
      """SELECT o_orderkey,
        |  round(o_totalprice, 1)                         AS price_r,
        |  round(abs(o_totalprice - 100000.0), 2)         AS absdiff,
        |  concat(o_orderstatus, '-', o_orderpriority)    AS tag,
        |  substr(o_orderpriority, 1, 1)                  AS prio_code,
        |  CAST(floor(o_totalprice) AS BIGINT)            AS price_floor
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        round(col("o_totalprice"), 1).as("price_r"),
        round(abs(col("o_totalprice") - lit(100000.0)), 2).as("absdiff"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        floor(col("o_totalprice")).cast("bigint").as("price_floor"))
    },

    // ── CDC MERGE: apply a change batch onto a dimension snapshot ──────
    // The MERGE INTO semantics the warehouse's incremental load needs
    // once rows UPDATE rather than only append (the reference's
    // anti-join upsert, J1/J2, only handles inserts): snapshot = state
    // through Jan 20, changes = the next day's batch, merged per key by
    // full-outer join + precedence — matched keys combine additively
    // (counts/sums add, last_ts takes the max), unmatched-right keys
    // insert, unmatched-left keys carry forward. The op tag is the
    // audit column a real MERGE writes to its log. Scale shape: both
    // sides pre-aggregate to one row per key BEFORE the join (the
    // exchange carries dimension-sized state, not events), and the
    // changes side of a daily batch is the small side — AQE broadcasts
    // it. State is all integer/timestamp, so merged rows hash-exact.
    Q(
      "q109_cdc_merge",
      s"""WITH snap AS (SELECT user_id, count(*) AS n_events,
         |                CAST(sum(${Portable.qval("value")}) AS BIGINT) AS sv,
         |                max(ts) AS last_ts
         |              FROM events WHERE ts < TIMESTAMP '2024-01-21'
         |              GROUP BY user_id),
         |delta AS (SELECT user_id, count(*) AS n_events,
         |            CAST(sum(${Portable.qval("value")}) AS BIGINT) AS sv,
         |            max(ts) AS last_ts
         |          FROM events
         |          WHERE ts >= TIMESTAMP '2024-01-21'
         |            AND ts < TIMESTAMP '2024-01-22'
         |          GROUP BY user_id)
         |SELECT coalesce(s.user_id, c.user_id) AS user_id,
         |  CASE WHEN s.user_id IS NULL THEN 'insert'
         |       WHEN c.user_id IS NULL THEN 'keep'
         |       ELSE 'update' END AS op,
         |  coalesce(s.n_events, 0) + coalesce(c.n_events, 0) AS n_events,
         |  ${Portable.qscale("coalesce(s.sv, 0) + coalesce(c.sv, 0)", 2)} AS value_sum,
         |  greatest(coalesce(s.last_ts, c.last_ts),
         |           coalesce(c.last_ts, s.last_ts)) AS last_ts
         |FROM snap s FULL OUTER JOIN delta c ON c.user_id = s.user_id""".stripMargin) { (s, d) =>
      def state(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("user_id").agg(
          count(lit(1)).as("n_events"),
          expr(s"CAST(sum(${Portable.qval("value")}) AS BIGINT)").as("sv"),
          max("ts").as("last_ts"))
      val ev = Tables.events(s, d)
      val snap = state(ev.filter(col("ts") < lit("2024-01-21").cast("timestamp")))
        .toDF("s_uid", "s_n", "s_sv", "s_ts")
      val delta = state(ev.filter(
          col("ts") >= lit("2024-01-21").cast("timestamp") &&
            col("ts") < lit("2024-01-22").cast("timestamp")))
        .toDF("c_uid", "c_n", "c_sv", "c_ts")
      snap.join(delta, col("c_uid") === col("s_uid"), "full_outer")
        .select(
          coalesce(col("s_uid"), col("c_uid")).as("user_id"),
          when(col("s_uid").isNull, "insert")
            .when(col("c_uid").isNull, "keep")
            .otherwise("update").as("op"),
          (coalesce(col("s_n"), lit(0L)) + coalesce(col("c_n"), lit(0L)))
            .as("n_events"),
          expr(Portable.qscale("coalesce(s_sv, 0L) + coalesce(c_sv, 0L)", 2))
            .as("value_sum"),
          greatest(coalesce(col("s_ts"), col("c_ts")),
            coalesce(col("c_ts"), col("s_ts"))).as("last_ts"))
    },

    // ── Bag set-ops: INTERSECT ALL / EXCEPT ALL (§2.5) ─────────────────
    // Multiplicity-preserving reconciliation of two halves of the
    // month: the (user, type) activity BAG common to both halves
    // (min(c1, c2) copies — a user with 3 early clicks and 2 late ones
    // contributes 2, where plain INTERSECT would say 1) and the bag
    // left over from the first half (c1 − c2 copies). Spark plans both
    // as ONE combined count aggregate per key + a replicate generator —
    // the exchange carries (key, c1, c2) rows, never the event stream
    // twice. The final per-key count collapses the replication for a
    // compact result but keeps the multiplicity visible.
    Q(
      "q110_set_ops",
      """WITH w1 AS (SELECT user_id, event_type FROM events
        |            WHERE ts < TIMESTAMP '2024-01-15'),
        |w2 AS (SELECT user_id, event_type FROM events
        |       WHERE ts >= TIMESTAMP '2024-01-15'),
        |com AS (SELECT * FROM w1 INTERSECT ALL SELECT * FROM w2),
        |only1 AS (SELECT * FROM w1 EXCEPT ALL SELECT * FROM w2)
        |SELECT 'common' AS side, user_id, event_type, count(*) AS n
        |FROM com GROUP BY user_id, event_type
        |UNION ALL
        |SELECT 'w1_only', user_id, event_type, count(*)
        |FROM only1 GROUP BY user_id, event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
      val cut = lit("2024-01-15").cast("timestamp")
      val w1 = ev.filter(col("ts") < cut).drop("ts")
      val w2 = ev.filter(col("ts") >= cut).drop("ts")
      def counted(df: org.apache.spark.sql.DataFrame, side: String) =
        df.groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
          .select(lit(side).as("side"), col("user_id"), col("event_type"), col("n"))
      counted(w1.intersectAll(w2), "common")
        .unionAll(counted(w1.exceptAll(w2), "w1_only"))
    },

    // ── Ranking-function surface: rank / dense_rank / percent_rank /
    //    cume_dist over per-type leaderboards (§2.5) ────────────────────
    // The remaining window verbs in one leaderboard: users ranked per
    // event type by exact integer activity (count, then micro-unit
    // value sum, then user_id — a total order, so every rank function
    // is deterministic). Scale shape: the window runs over the
    // (type × user) AGGREGATE — combine-reduced before the exchange —
    // never raw events, and the rank filter keeps the output to each
    // type's top 15. percent_rank/cume_dist divide exact integers once
    // (correctly-rounded IEEE, engine-exact); ranks themselves are
    // integer. rank vs dense_rank vs row_number differences are pinned
    // by construction (ties impossible → all three agree; the oracle
    // equality IS the tie-freeness proof).
    Q(
      "q111_rank_functions",
      s"""WITH a AS (SELECT event_type, user_id, count(*) AS n,
         |             CAST(sum(${Portable.qval("value")}) AS BIGINT) AS sv
         |           FROM events GROUP BY event_type, user_id)
         |SELECT event_type, user_id, n, rk, drk,
         |  floor(prk * 1000000.0) / 1000000.0 AS pct_rank,
         |  floor(cd * 1000000.0) / 1000000.0 AS cume
         |FROM (SELECT event_type, user_id, n,
         |        rank() OVER w AS rk,
         |        dense_rank() OVER w AS drk,
         |        percent_rank() OVER w AS prk,
         |        cume_dist() OVER w AS cd
         |      FROM a
         |      WINDOW w AS (PARTITION BY event_type
         |                   ORDER BY n DESC, sv DESC, user_id))
         |WHERE rk <= 15""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type")
        .orderBy(col("n").desc, col("sv").desc, col("user_id"))
      Tables.events(s, d)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("n"),
          expr(s"CAST(sum(${Portable.qval("value")}) AS BIGINT)").as("sv"))
        .select(col("event_type"), col("user_id"), col("n"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          percent_rank().over(w).as("prk"),
          cume_dist().over(w).as("cd"))
        .where(col("rk") <= 15)
        .select(col("event_type"), col("user_id"), col("n"), col("rk"), col("drk"),
          expr("floor(prk * 1000000.0D) / 1000000.0D").as("pct_rank"),
          expr("floor(cd * 1000000.0D) / 1000000.0D").as("cume"))
    },

    // ── SQL-text interface: the spark.sql() entry path ─────────────────
    // Every other registered query declares its plan through the
    // DataFrame API; a user of the engine equally gets the SQL string
    // surface — temp views over the canonical loaders + one
    // `spark.sql(...)` call compiling to the SAME Catalyst plan (same
    // pushdown, same broadcast dims, same combine-reduced aggregate).
    // The query itself is the classic revenue-by-nation star rollup:
    // dims broadcast, one aggregation exchange of micro-unit integers.
    Q(
      "q120_sql_interface",
      s"""SELECT n.n_name AS nation, count(*) AS n_orders,
         |  ${Portable.qsum("l.l_extendedprice * (1.0 - l.l_discount)", 2)} AS revenue
         |FROM lineitem l
         |JOIN orders o ON o.o_orderkey = l.l_orderkey
         |JOIN customer c ON c.c_custkey = o.o_custkey
         |JOIN nation n ON n.n_nationkey = c.c_nationkey
         |GROUP BY n.n_name""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      Tables.nation(s, d).createOrReplaceTempView("v_nation")
      s.sql(
        s"""SELECT n.n_name AS nation, count(*) AS n_orders,
           |  ${Portable.qsum("l.l_extendedprice * (1.0D - l.l_discount)", 2)} AS revenue
           |FROM v_lineitem l
           |JOIN v_orders o ON o.o_orderkey = l.l_orderkey
           |JOIN v_customer c ON c.c_custkey = o.o_custkey
           |JOIN v_nation n ON n.n_nationkey = c.c_nationkey
           |GROUP BY n.n_name""".stripMargin)
    },

    // ── Revenue bridge: period-over-period change, decomposed ──────────
    // WHY did revenue move between 1996 and 1997? The FP&A bridge:
    // each customer's two period totals classify them as new /
    // churned / expansion / contraction (or flat), and the per-class
    // contribution sums RECONCILE to the total delta BY CONSTRUCTION
    // — every customer's (cur − prev) lands in exactly one class, so
    // the bridge explains 100% of the movement (an attribution report
    // that doesn't reconcile is worse than none; same discipline as
    // q89/q122). Shape: one order scan produces both period sums as
    // conditional micro-unit aggregates per customer (no self-join),
    // then a classes-sized rollup.
    Q(
      "q144_revenue_bridge", {
        val p1 = "o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'"
        val p2 = "o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'"
        s"""WITH c AS (SELECT o_custkey,
           |             CAST(coalesce(sum(CASE WHEN $p1
           |               THEN ${Portable.qval("o_totalprice")} END), 0) AS BIGINT) AS prev,
           |             CAST(coalesce(sum(CASE WHEN $p2
           |               THEN ${Portable.qval("o_totalprice")} END), 0) AS BIGINT) AS cur
           |           FROM orders
           |           WHERE ($p1) OR ($p2)
           |           GROUP BY o_custkey)
           |SELECT CASE WHEN prev = 0 THEN 'new'
           |            WHEN cur = 0 THEN 'churned'
           |            WHEN cur > prev THEN 'expansion'
           |            WHEN cur < prev THEN 'contraction'
           |            ELSE 'flat' END AS class,
           |  CAST(count(*) AS BIGINT) AS n_customers,
           |  ${Portable.qscale("CAST(sum(cur - prev) AS BIGINT)", 2)} AS delta_value
           |FROM c GROUP BY 1""".stripMargin
      }) { (s, d) =>
      val p1 = "o_orderdate >= timestamp'1996-01-01' AND o_orderdate < timestamp'1997-01-01'"
      val p2 = "o_orderdate >= timestamp'1997-01-01' AND o_orderdate < timestamp'1998-01-01'"
      Tables.orders(s, d)
        .where(expr(s"($p1) OR ($p2)"))
        .groupBy("o_custkey")
        .agg(
          expr(s"CAST(coalesce(sum(CASE WHEN $p1 THEN ${Portable.qval("o_totalprice")} END), 0L) AS BIGINT)")
            .as("prev"),
          expr(s"CAST(coalesce(sum(CASE WHEN $p2 THEN ${Portable.qval("o_totalprice")} END), 0L) AS BIGINT)")
            .as("cur"))
        .groupBy(expr("CASE WHEN prev = 0 THEN 'new'" +
          " WHEN cur = 0 THEN 'churned'" +
          " WHEN cur > prev THEN 'expansion'" +
          " WHEN cur < prev THEN 'contraction'" +
          " ELSE 'flat' END").as("class"))
        .agg(
          count(lit(1)).as("n_customers"),
          expr(Portable.qscale("CAST(sum(cur - prev) AS BIGINT)", 2)).as("delta_value"))
    },

    // ── Forgone-revenue scan (the TPC-H Q6 shape) ──────────────────────
    // "How much revenue did last year's small-order discounts cost?" —
    // the canonical selective-scan aggregate: three pushable range
    // predicates, two columns read, one scalar out. The POINT is the
    // plan: every predicate reaches the parquet scan (PushedFilters),
    // ReadSchema carries only the four touched columns, and the single
    // partial-agg scalar means the exchange moves one row per task —
    // the query a columnar engine should execute at I/O speed. Product
    // terms quantize per ROW (price·discount is one correctly-rounded
    // double op on identical inputs) and sum as micro-unit integers.
    Q(
      "q145_forgone_revenue",
      s"""SELECT count(*) AS n_lines,
         |  ${Portable.qsum("l_extendedprice * l_discount", 2)} AS forgone
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          count(lit(1)).as("n_lines"),
          expr(Portable.qsum("l_extendedprice * l_discount", 2)).as("forgone"))
    })
}
