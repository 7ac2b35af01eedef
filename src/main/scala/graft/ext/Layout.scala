package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustered data layout (Z-order) for scan pruning.
  *
  * Parquet readers skip row groups / files whose column min-max stats
  * exclude the predicate. A layout sorted on ONE column gives tight
  * stats for that column only; interleaving the bits of several
  * quantized columns into one Morton (Z-order) value and range-
  * partitioning + sorting on it gives every participating column
  * LOCALLY NARROW ranges per file — so a slicer on any dimension (or
  * any combination) prunes most files from the scan. This is the
  * data-skipping layout the dashboard's location×time slicers (q48)
  * want at 100 TB: the same `WHERE` clause touches O(selectivity) of
  * the lake instead of all of it, before a single executor spins up.
  *
  * Everything here is a pure column expression (codegen'd bit
  * twiddles — no UDF, no HOF loop) plus vanilla
  * `repartitionByRange().sortWithinPartitions()`, so the write is one
  * range-exchange over the data being laid out: exactly what a
  * periodic OPTIMIZE/compaction job can afford. `repartitionByRange`
  * samples the z-value distribution, so output files are balanced even
  * when the dimensions are skewed.
  *
  * Reference anchor: the reference stores its lake partitioned only by
  * status/date (glue_etl.py:61-67); this is the finer-grained layout
  * its dashboard slicers would need once a partition no longer fits a
  * scan budget. Verified in LayoutSpec: per-file bounding boxes shrink
  * ~an order of magnitude vs the natural layout, and a point-range
  * predicate's candidate file set (the min-max pruning proxy) drops
  * proportionally.
  */
object Layout {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit value (the classic interleave-by-magic-masks twiddle; each
    * step is one shift, one OR, one AND — all whole-stage codegen).
    */
  private def spread16(c: Column): Column = {
    // mask first: bits ≥ 16 would otherwise alias into the interleave
    // and silently garble the curve (files still write "successfully",
    // pruning just stops working) — masking makes the documented
    // 16-bit contract total, at zero cost inside codegen
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two dimensions, 16 bits each (callers quantize
    * wider domains down to 16 bits first — rank or range-scale; the
    * z-curve only needs ORDER, not exact values). Bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1.
    */
  def zvalue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Quantize an arbitrary numeric column onto the 16-bit z-grid given
    * its (lo, hi) domain — linear scale, clamped. Domain bounds come
    * from table stats or a cheap agg; exactness is irrelevant (layout
    * quality degrades gracefully if the domain drifts).
    */
  def quantize16(c: Column, lo: Double, hi: Double): Column = {
    val scaled = (c.cast("double") - lit(lo)) / lit(hi - lo) * lit(65535.0)
    least(greatest(floor(scaled).cast("long"), lit(0L)), lit(65535L))
  }

  /** Write-side layout: range-partition on the z-value into `numFiles`
    * balanced output tasks and sort within each, so every parquet file
    * covers one tight z-range — which is what makes per-file min-max
    * stats selective on BOTH dimensions. The z column itself is dropped
    * (it is derivable; storing it is optional denormalization).
    */
  def clusterByZ(
      df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    // fail fast instead of silently replacing-then-dropping a caller's
    // _z column (e.g. a kept z-value from a previous layout pass)
    require(!df.columns.contains("_z"),
      "input already has a _z column; rename it before clusterByZ")
    val z = df.withColumn("_z", zvalue2(a, b))
    z.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  val all: Seq[graft.Q] = Seq(
    // ── Compaction planner (OPTIMIZE's decision step) ──────────────────
    // The small-files problem, planned from METADATA: per-day partition
    // stats roll into merge groups of ≥ ~1000 rows by assigning each
    // day to bucket ⌊cum_before / 1000⌋ over the day-ordered cumulative
    // count — adjacent small partitions coalesce, already-large ones
    // stand alone, and the plan emits per-group evidence (day span,
    // rows, member count) a maintenance job executes file-by-file.
    // Everything runs on the PARTITION-STATS relation (one row per
    // day — the corpus is touched once for the stats aggregate), the
    // same cumulative-window discipline as q60's packing and q105's
    // CDF bins. At 100 TB the stats come from the metastore/manifests
    // for free; the plan cost stays days-sized either way.
    graft.Q(
      "q123_compaction_plan",
      """WITH parts AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |                 CAST(count(*) AS BIGINT) AS rows
        |               FROM events GROUP BY 1),
        |cum AS (SELECT day, rows,
        |          CAST(coalesce(sum(rows) OVER (ORDER BY day
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |               AS BIGINT) AS cb
        |        FROM parts)
        |SELECT CAST(cb // 1000 AS BIGINT) AS group_id,
        |  CAST(count(*) AS BIGINT) AS n_parts,
        |  min(day) AS from_day, max(day) AS to_day,
        |  CAST(sum(rows) AS BIGINT) AS group_rows
        |FROM cum GROUP BY cb // 1000""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      graft.Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("rows"))
        .withColumn("cb", coalesce(sum("rows").over(
          Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .groupBy(expr("cb div 1000").as("group_id"))
        .agg(
          count(lit(1)).as("n_parts"),
          min("day").as("from_day"), max("day").as("to_day"),
          sum("rows").as("group_rows"))
    })
}
