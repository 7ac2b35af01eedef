package graft.ext

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Dataset-statistics operators a training-data pipeline runs over its
  * corpus: exact percentile profiles per group and multi-level ROLLUP
  * totals (the dashboard's drill-down shape). Both are single-exchange
  * aggregation plans.
  *
  * Percentiles here are the *exact* linear-interpolated definition
  * (Spark `percentile` ≡ DuckDB `quantile_cont`, index p·(n−1)) so the
  * oracle comparison is exact; at 100 TB the drop-in scale path is
  * `approx_percentile` (t-digest sketch, mergeable map-side) — same
  * query shape, bounded memory, documented divergence from the exact
  * value.
  */
object Statistics {

  val all: Seq[Q] = Seq(
    // ── Exact percentile profile per group ─────────────────────────────
    Q(
      "q43_percentile_profile",
      """SELECT event_type,
        |  floor(quantile_cont(value, 0.5) * 1000000.0) / 1000000.0  AS p50,
        |  floor(quantile_cont(value, 0.95) * 1000000.0) / 1000000.0 AS p95,
        |  floor(quantile_cont(value, 0.99) * 1000000.0) / 1000000.0 AS p99,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          expr("floor(percentile(value, 0.5D) * 1000000.0D) / 1000000.0D").as("p50"),
          expr("floor(percentile(value, 0.95D) * 1000000.0D) / 1000000.0D").as("p95"),
          expr("floor(percentile(value, 0.99D) * 1000000.0D) / 1000000.0D").as("p99"),
          count(lit(1)).as("n"))
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
    })
}
