package graft

import org.apache.spark.sql.SparkSession

/** One place to build the engine's SparkSession so every entry point
  * (Verify, Bench, Smoke, tests) runs with identical semantics.
  *
  * Session-wide flags set here rather than inside loaders (keeps loader
  * behavior call-order independent):
  *  - `spark.sql.legacy.parquet.nanosAsLong`: earlier testdata
  *    generations carried `events.ts` as TIMESTAMP(NANOS), which
  *    Spark's parquet reader has no timestamp type for; this public
  *    flag reads such nanos as a plain long (truncated to µs in
  *    [[Tables.events]]). Harmless for the current timestamp[us] data —
  *    kept so the type-adaptive loader still works if the driver ever
  *    regenerates back to nanos.
  *  - UTC session time zone: all reference timestamps are UTC
  *    (ISO-8601 + "Z", `Producer /producer.py:357`), and the DuckDB
  *    oracle compares in UTC.
  *  - AQE on with a 32 MB advisory partition size: at bench scale it
  *    coalesces the fixed shuffle-partition count down to the data; on
  *    a real cluster it re-plans skew joins at runtime.
  */
object GraftSession {
  def local(cpus: String): SparkSession = {
    // "*" is valid for the master but not as a shuffle-partition count
    val nShuffle =
      if (cpus == "*") Runtime.getRuntime.availableProcessors().toString else cpus
    // SPARK_GRAFT_MASTER overrides the master URL — the scale-proof
    // path: `local-cluster[4,8,8192]` runs REAL separate executor JVMs
    // (standalone-mode workers under SPARK_HOME) with real
    // serialization, network-path exchanges, and per-executor heaps —
    // the regime a single-process local[n] can't exercise (closure
    // capture, broadcast transport, task-result limits). Executors
    // boot from SPARK_HOME's jars, so only our compiled classes need
    // shipping: extraClassPath defaults to this class's code source
    // (target/scala-2.13/classes under sbt).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
    val builder =
      if (master.startsWith("local-cluster")) builder0
        .config("spark.executor.extraClassPath", sys.env.getOrElse(
          "SPARK_GRAFT_EXEC_CP",
          new java.io.File(getClass.getProtectionDomain.getCodeSource
            .getLocation.toURI).getAbsolutePath))
        // standalone executors default to 1g regardless of the worker
        // memory in the master string; size the executor heap to the
        // worker's grant (local-cluster[4,8,8192] → ≤8g per executor)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "6g"))
      else builder0
    val spark = builder
      // Codegen class cache (STATIC conf — only effective here, before
      // the session exists; r16 opt round): the default cache holds 100
      // generated classes, and a 177-query registry emits far more
      // WholeStageCodegen/expression spans than that, so back-to-back
      // queries (and Bench's in-JVM repeats) evicted and re-compiled
      // the same Janino sources every run — pure fixed overhead at any
      // scale (compilation happens on the driver/executor regardless of
      // data size). 4096 entries keeps every registry span resident;
      // the cache stores compiled classes, so the cost is a few tens of
      // MB of metaspace, not data memory.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.shuffle.partitions", nShuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate() may have returned a PRE-EXISTING session (shell,
    // notebook) whose builder configs were silently ignored. The
    // semantics-bearing settings above are all runtime SQL confs, so
    // re-assert them on whatever session came back; the kernels are
    // registered imperatively for the same reason (the extensions hook
    // only fires for sessions built with it).
    Seq(
      "spark.sql.shuffle.partitions" -> nShuffle,
      "spark.sql.session.timeZone" -> "UTC",
      "spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32m"
    ).foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)
    spark
  }
}
