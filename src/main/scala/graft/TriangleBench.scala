package graft

import org.apache.spark.sql.functions._

/** Measured demonstration of the q108 degree-orientation claim
  * (SCALE.md §1): under ID orientation, a hub whose neighbors straddle
  * its id enumerates in(hub)×out(hub) wedge pairs in ONE sort-merge
  * key group — a single reducer's quadratic cross product (Suri &
  * Vassilvitskii's "last reducer") — while degree orientation points
  * every hub edge INTO the hub (highest degree), so the hub centers no
  * wedges at all and the same triangles enumerate from its low-degree
  * neighbors.
  *
  * `runMain graft.TriangleBench [hubDeg]` builds a synthetic canonical
  * pair list — a hub at id 10⁶ with hubDeg/2 neighbors below and above
  * the hub id (the id-form's worst case), plus 200 disjoint 6-cliques
  * (3,000 real triangles, so both forms produce checkable output) —
  * runs BOTH enumerations, asserts identical per-doc counts (a full
  * outer join over the two per-doc count relations, zero mismatching
  * rows — not just equal totals, which two different distributions
  * could fake; r11 ADVICE), and prints one JSON line per form: wall
  * seconds and the wedge count the orientation admits. Evidence lines
  * land in STREAM_r{N}.jsonl.
  */
object TriangleBench {
  def main(args: Array[String]): Unit = {
    val hubDeg = args.lift(0).map(_.toInt).getOrElse(20000)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val hub = 1000000L
    val below = (1L to hubDeg / 2L).map(i => (i, hub))
    val above = (1L to hubDeg / 2L).map(i => (hub, hub + i))
    val cliques = for {
      c <- 0L until 200L
      base = 2000000L + c * 10
      a <- 0L until 6L
      b <- (a + 1) until 6L
    } yield (base + a, base + b)
    val pairs = (below ++ above ++ cliques).toDF("a", "b")
      .repartition(64).transform(CacheScope.scoped)
    pairs.count() // materialize outside the timings

    def counts(tri: org.apache.spark.sql.DataFrame) =
      tri.groupBy("doc_id").agg(count(lit(1)).as("n"))

    // id-oriented (the pre-r11 q108 form, verbatim shape)
    def byId = {
      val tri = pairs.as("p1")
        .join(pairs.as("p2"), col("p2.a") === col("p1.b"))
        .join(pairs.as("p3"),
          col("p3.a") === col("p1.a") && col("p3.b") === col("p2.b"))
        .select(col("p1.a").as("x"), col("p1.b").as("y"), col("p2.b").as("z"))
      tri.select(col("x").as("doc_id"))
        .unionAll(tri.select(col("y")))
        .unionAll(tri.select(col("z")))
    }

    // persist the per-doc counts so the timed total-sum action (which
    // drives the full enumeration) and the untimed per-doc equality
    // check below share one enumeration instead of running it twice
    def time(f: => org.apache.spark.sql.DataFrame)
        : (Double, Long, org.apache.spark.sql.DataFrame) = {
      val c = counts(f).persist()
      val t0 = System.nanoTime()
      val n = c.agg(sum("n")).head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, n, c)
    }

    val (degSec, degN, degC) = time(graft.ext.Clustering.trianglesByDegree(pairs))
    val (idSec, idN, idC) = time(byId)
    require(degN == idN, s"corner-count mismatch: $degN vs $idN")
    // per-doc equality, not just equal totals: full outer join the two
    // count relations and demand zero mismatching rows (r11 ADVICE —
    // two different per-doc distributions can share a total)
    val mismatches = degC.as("d")
      .join(idC.as("i"), col("d.doc_id") === col("i.doc_id"), "full")
      .filter(coalesce(col("d.n"), lit(-1L)) =!= coalesce(col("i.n"), lit(-1L)))
      .count()
    require(mismatches == 0L, s"per-doc triangle-count mismatch on $mismatches docs")
    degC.unpersist(); idC.unpersist()
    val wedgesId = (hubDeg.toLong / 2) * (hubDeg / 2) + 200L * 6 * 10 // in×out at hub + clique wedges (bounded)
    // "timing" field (r12 ADVICE): since r12 the timed action aggregates
    // over a freshly persist()ed counts relation, so cache
    // materialization cost is INCLUDED in "sec" — both forms pay it
    // equally (the A/B stays fair), but the figure is not strictly
    // comparable to pre-r12 triangle_bench lines, which timed the
    // aggregation alone.
    println(f"""{"metric":"triangle_bench","form":"degree-oriented","hub_deg":$hubDeg,"sec":$degSec%.2f,"triangle_corners":$degN,"hub_wedges":0,"timing":"includes-counts-persist-since-r12"}""")
    println(f"""{"metric":"triangle_bench","form":"id-oriented","hub_deg":$hubDeg,"sec":$idSec%.2f,"triangle_corners":$idN,"hub_wedges":$wedgesId,"timing":"includes-counts-persist-since-r12"}""")
    spark.stop()
  }
}
