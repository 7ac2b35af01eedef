package graft

import org.apache.spark.sql.functions._

import graft.etl.StarSchema

/** A/B for the surrogate-key formulations (r8 VERDICT ask #6):
  * `runMain graft.SurrogateBench <sfDir> [rdd|df|both] [repeats]`
  * times [[StarSchema.orderedIds]] (rdd.zipWithIndex) against
  * [[StarSchema.orderedIdsDF]] (Tungsten-native offset add) over a
  * dim-shaped projection of the scaled events table — distinct
  * (user_id, event_type) plus a value payload, the cardinality shape
  * a real dim upsert feeds through orderedIds. Prints one JSON line
  * per (form, repeat); the min per form is the comparison number
  * (same contention-robust estimator as Bench).
  */
object SurrogateBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args.lift(1).getOrElse("both")
    val repeats = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // dim candidates: one row per distinct (user_id, event_type) — at
    // x100 of sf0.1 this is ~1M rows; the payload column makes row
    // width realistic (dims carry attributes, not just keys)
    val candidates = Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type")
      .agg(max("value").as("max_value"), count(lit(1)).as("n_events"))
    val n = candidates.count()

    def run(form: String): Unit = (1 to repeats).foreach { i =>
      val t0 = System.nanoTime()
      val keyed =
        if (form == "rdd")
          StarSchema.orderedIds(candidates, "sk", Seq("user_id", "event_type"), 0L)
        else
          StarSchema.orderedIdsDF(candidates, "sk", Seq("user_id", "event_type"), 0L)
      val mx = keyed.agg(max("sk")).head.getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      CacheScope.drain(); spark.catalog.clearCache()
      require(mx == n, s"$form ids not contiguous: max=$mx n=$n")
      println(s"""{"metric":"surrogate_bench","form":"$form","rows":$n,"repeat":$i,"sec":${f"$dt%.2f"}}""")
    }
    if (mode == "both" || mode == "rdd") run("rdd")
    if (mode == "both" || mode == "df") run("df")
    spark.stop()
  }
}
