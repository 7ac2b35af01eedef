package graft.stream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.state.StateStore

/** Ordered teardown for sessions that ran RocksDB-backed stateful
  * queries (SCALE.md §2, commit 1ad1c06): after the 10M changelog
  * soak completed, `spark.stop()` SIGSEGV'd 16 s later inside
  * RocksDB's native `LoggerJniCallback` — the provider close raced
  * JVM shutdown while a native background thread (compaction/flush
  * logging through the JNI logger) was still alive. The fix is
  * sequencing, not configuration: stop every streaming query first
  * (no new store loads), then `StateStore.stop()` — which halts the
  * maintenance task and closes every loaded provider (and its
  * RocksDB + JNI logger) while the JVM is still fully alive — and
  * only then `spark.stop()`. TeardownProbe + RocksDBTeardownSpec
  * regression-test this path in a forked JVM (a SIGSEGV there is an
  * exit code, not a killed test suite).
  */
object OrderlyShutdown {
  def stop(spark: SparkSession): Unit = {
    spark.streams.active.foreach { q =>
      try q.stop() catch { case _: Throwable => () }
    }
    // closes loaded state-store providers (RocksDB handles + native
    // loggers) on a live JVM, before SparkContext teardown
    try StateStore.stop() catch { case _: Throwable => () }
    spark.stop()
  }
}
