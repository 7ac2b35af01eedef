package graft

import org.apache.spark.sql.SparkSession

/** Host-speed calibration shared by the measurement mains (Scale's
  * soak, StreamBench's ingest figure — r11 verdict ask #3 wants the
  * ingest line stamped too): run a fixed subset of cheap,
  * fixed-overhead-dominated sf0.1 registry queries min-of-3, and
  * report median / the r9-clean anchor. Every measurement line that
  * carries `host_speed_vs_clean_r9` divides by this before being
  * compared across rounds, so host-window drift (±25% across sessions)
  * stops masquerading as code trend.
  *
  * Contract (r11 ADVICE, both items): failed repeats are EXCLUDED from
  * a query's min; a query with zero successful repeats poisons the
  * stamp to -2.0 loudly (a near-zero failure wall must never enter the
  * median); and the calibration block pins `spark.sql.shuffle
  * .partitions` to the BENCH default (cores-sized — the config the r9
  * anchor was measured under) and restores the caller's setting after,
  * so partition-count config bias can't contaminate the ratio.
  */
object HostCal {
  /** 15 cheap events/dimension queries (no documents-table pair
    * machinery) — the fixed calibration subset.
    */
  val calQueries: Seq[String] = Seq(
    "q01_pricing_summary", "q02_star_join_revenue", "q04_semi_join_active",
    "q06_max_watermark", "q08_dim_time", "q09_surrogate_keys",
    "q10_share_of_total", "q11_topk_orders", "q12_multicol_anti_join",
    "q20_avg_tiles", "q21_count_by_type", "q110_set_ops",
    "q111_rank_functions", "q128_weekly_heatmap", "q130_column_profile")

  /** median of [[calQueries]] in BENCH_CLEAN_r9.json (q08_dim_time). */
  val CalAnchorR9Sec = 0.187150264

  val calDir = "/root/testdata/sf0.1"

  /** True when the calibration inputs exist and the env hasn't turned
    * it off (SPARK_GRAFT_HOSTCAL=0).
    */
  def enabled: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_HOSTCAL", "1") == "1" &&
      new java.io.File(calDir).isDirectory

  /** Warm the calibration queries once on the tiny SF (uncounted) so
    * the measured block is execution, not JIT/codegen compilation.
    */
  def warm(spark: SparkSession, warmDir: String = "/root/testdata/sf0.001"): Unit =
    calQueries.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      CacheScope.drain(); spark.catalog.clearCache()
    }

  /** The stamp: median-of-mins over [[calQueries]] (min-of-3 each,
    * failures excluded) divided by [[CalAnchorR9Sec]]; -1.0 when
    * disabled, -2.0 when any cal query failed every repeat.
    * `nCores` = the cores-sized partition count the anchor was
    * measured under; `restorePartitions` = the caller's shuffle
    * setting, reinstated after the block.
    */
  def measure(spark: SparkSession, nCores: Int, restorePartitions: String): Double = {
    if (!enabled) return -1.0
    spark.conf.set("spark.sql.shuffle.partitions", nCores.toString)
    val times = calQueries.map { n =>
      val good = (1 to 3).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(n)(spark, calDir)
            .write.format("noop").mode("overwrite").save(); true }
          catch { case ex: Throwable =>
            System.err.println(s"[hostcal] cal $n failed: ${ex.getClass.getSimpleName}")
            false }
        val dt = (System.nanoTime() - t0) / 1e9
        CacheScope.drain(); spark.catalog.clearCache()
        if (ok) Some(dt) else None
      }
      n -> good
    }
    spark.conf.set("spark.sql.shuffle.partitions", restorePartitions)
    val dead = times.collect { case (n, g) if g.isEmpty => n }
    if (dead.nonEmpty) {
      System.err.println(s"[hostcal] host calibration POISONED — cal queries with zero successful repeats: ${dead.mkString(",")}")
      -2.0
    } else {
      val mins = times.map(_._2.min).sorted
      mins(mins.size / 2) / CalAnchorR9Sec
    }
  }
}
