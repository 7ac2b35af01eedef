package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}

import org.apache.spark.sql.streaming._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the transformWithState value-state SCHEMA-EVOLUTION story
  * the Throttle doc claims (r8 ADVICE): widening a state case class
  * (the round-8 `TwsThrottleState` 2→3-field change) breaks restart
  * from a pre-change checkpoint under the default UnsafeRow state
  * encoding, and works under Avro
  * (`spark.sql.streaming.stateStore.encodingFormat=avro`), which the
  * in-repo tws drivers now set. Both directions are pinned on a REAL
  * checkpoint round-trip: run V1 (2-field state), stop, restart the
  * same checkpoint with V2 (3-field state), assert state carried over
  * (avro) or the restart fails with the engine's schema-incompatibility
  * error (unsaferow).
  */
object StateEvolutionSpec {
  // top-level (object-nested) so Catalyst can instantiate the encoders
  // without an outer-instance scope
  case class EvoIn(key: String, eventTime: Timestamp)
  case class EvoOut(key: String, total: Long)
  case class StateV1(count: Long)
  // The widened form. The new field is nullable (Option): Avro schema
  // evolution fills absent fields with their default, which exists
  // only for nullable columns — the same constraint a production
  // state migration must respect.
  case class StateV2(count: Long, lastSeenMs: Option[Long])

  class CountV1 extends StatefulProcessor[String, EvoIn, EvoOut] {
    @transient private var st: ValueState[StateV1] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[StateV1](
        "evo", Encoders.product[StateV1], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[EvoIn],
        timerValues: TimerValues): Iterator[EvoOut] = {
      val c = (if (st.exists()) st.get().count else 0L) + rows.size
      st.update(StateV1(c))
      Iterator(EvoOut(key, c))
    }
  }

  class CountV2 extends StatefulProcessor[String, EvoIn, EvoOut] {
    @transient private var st: ValueState[StateV2] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[StateV2](
        "evo", Encoders.product[StateV2], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[EvoIn],
        timerValues: TimerValues): Iterator[EvoOut] = {
      val seq = rows.toSeq
      val c = (if (st.exists()) st.get().count else 0L) + seq.size
      st.update(StateV2(c, Some(seq.map(_.eventTime.getTime).max)))
      Iterator(EvoOut(key, c))
    }
  }
}

class StateEvolutionSpec extends AnyFunSuite {
  import StateEvolutionSpec._

  private val t0 = 1704067200000L

  /** Runs one AvailableNow pass of `proc` over whatever new files are
    * in `src`, recovering from `checkpoint` (file source + file sink —
    * the memory sink refuses checkpoint recovery), and returns the
    * latest emitted total per key across the whole output dir. */
  private def runBatch(
      proc: StatefulProcessor[String, EvoIn, EvoOut],
      root: String, at: Long): Map[String, Long] = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(EvoIn("a", new Timestamp(at)), EvoIn("b", new Timestamp(at)))
      .toDS().write.mode("append").parquet(s"$root/src")
    val q = spark.readStream
      .schema("key STRING, eventTime TIMESTAMP")
      .parquet(s"$root/src")
      .as[EvoIn]
      .withWatermark("eventTime", "10 minutes")
      .groupByKey(_.key)
      .transformWithState(proc, TimeMode.None(), OutputMode.Append())
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow())
      .outputMode("append").start()
    try q.awaitTermination(60000L)
    finally q.stop()
    spark.read.parquet(s"$root/out").as[EvoOut].collect()
      .groupBy(_.key).map { case (k, os) => k -> os.map(_.total).max }
  }

  private def withStateConf(encoding: String)(body: => Unit): Unit = {
    val spark = TestSpark.spark
    val keys = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.encodingFormat" -> encoding)
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("avro encoding: widened state restarts from the V1 checkpoint") {
    withStateConf("avro") {
      val root = Files.createTempDirectory("graft_evo_avro").toString
      val r1 = runBatch(new CountV1, root, t0)
      assert(r1 === Map("a" -> 1L, "b" -> 1L))
      // restart the SAME checkpoint with the 3-field state: counts must
      // continue from the V1-written rows (2), not reset (1)
      val r2 = runBatch(new CountV2, root, t0 + 60000L)
      assert(r2 === Map("a" -> 2L, "b" -> 2L),
        s"V1 state did not survive the widening restart: $r2")
    }
  }

  test("unsaferow encoding: the same restart fails with a schema-incompatibility error") {
    withStateConf("unsaferow") {
      val root = Files.createTempDirectory("graft_evo_usr").toString
      val r1 = runBatch(new CountV1, root, t0)
      assert(r1 === Map("a" -> 1L, "b" -> 1L))
      val e = intercept[Exception] {
        runBatch(new CountV2, root, t0 + 60000L)
      }
      // the engine refuses loudly (STATE_STORE_* schema error), it does
      // not corrupt or silently reset state — walk the cause chain for
      // the schema-evolution marker
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => s"${t.getClass.getName}: ${t.getMessage}")
        .mkString("\n")
      assert(
        msgs.contains("STATE_STORE") || msgs.toLowerCase.contains("schema"),
        s"expected a state-schema incompatibility, got:\n$msgs")
    }
  }
}
