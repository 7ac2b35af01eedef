package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.stream.Throttle
import graft.stream.Throttle.{Occurrence, ThrottleState}

/** Throttle state machine (`Lambda/lamda.py:246-283`): 5-min interval
  * suppression, CRITICAL bypass, consecutive-count threshold — unit
  * (pure step), batch Dataset, and Structured Streaming (MemoryStream,
  * state across micro-batches with event-time TTL).
  */
class ThrottleSpec extends AnyFunSuite {

  private val t0 = Timestamp.valueOf("2025-08-09 12:00:00").getTime
  private def min(n: Int): Long = n * 60 * 1000L

  test("first occurrence sends (threshold = 1, lamda.py:271-283)") {
    val (st, fire) = Throttle.step(ThrottleState(-1L, 0), "HIGH", t0)
    assert(fire && st === ThrottleState(t0, 0))
  }

  test("re-fire within 5 min is suppressed without touching count (lamda.py:264-269)") {
    val (st, fire) = Throttle.step(ThrottleState(t0, 0), "HIGH", t0 + min(1))
    assert(!fire && st === ThrottleState(t0, 0))
  }

  test("re-fire after the interval sends again") {
    val (st, fire) = Throttle.step(ThrottleState(t0, 0), "HIGH", t0 + min(6))
    assert(fire && st === ThrottleState(t0 + min(6), 0))
  }

  test("CRITICAL bypasses throttling and stamps lastSent without resetting count (lamda.py:257-261)") {
    val (st, fire) = Throttle.step(ThrottleState(t0, 3), "CRITICAL", t0 + min(1))
    assert(fire && st === ThrottleState(t0 + min(1), 3))
  }

  test("higher threshold requires consecutive occurrences") {
    val s0 = ThrottleState(-1L, 0)
    val (s1, f1) = Throttle.step(s0, "HIGH", t0, threshold = 3)
    val (s2, f2) = Throttle.step(s1, "HIGH", t0 + min(6), threshold = 3)
    val (s3, f3) = Throttle.step(s2, "HIGH", t0 + min(12), threshold = 3)
    assert(!f1 && !f2 && f3 && s3 === ThrottleState(t0 + min(12), 0))
  }

  private def occ(atMs: Long, key: String = "loc_1|High Temperature",
      priority: String = "HIGH"): Occurrence = {
    val Array(loc, tpe) = key.split('|')
    Occurrence(loc, tpe, priority, "d", s"evt_$atMs", new Timestamp(atMs))
  }

  test("batch Dataset: t, t+1min, t+6min → sent at t and t+6min (FIXTURES throttle_sequence)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val sent = Throttle(Seq(
      occ(t0), occ(t0 + min(1)), occ(t0 + min(6)),
      occ(t0 + min(1), key = "loc_2|High Temperature") // independent key
    ).toDS()).collect().map(s => (s.locId, s.sentTime.getTime)).sortBy(_._2)
    assert(sent.toList === List(
      ("loc_1", t0), ("loc_2", t0 + min(1)), ("loc_1", t0 + min(6))))
  }

  test("batch path: pre-sorted in the exchange — one shuffle, one sort, order-free input") {
    val spark = TestSpark.spark
    import spark.implicits._
    // deliberately out of event-time order: the exchange-aligned
    // secondary sort must restore it (the lazy processor's monotonicity
    // guard throws if Spark ever re-sorts by key only)
    val sent = Throttle(Seq(
      occ(t0 + min(6)), occ(t0), occ(t0 + min(1)),
      occ(t0 + min(1), key = "loc_2|High Temperature")).toDS())
    val rows = sent.collect().map(s => (s.locId, s.sentTime.getTime)).sortBy(_._2)
    assert(rows.toList === List(
      ("loc_1", t0), ("loc_2", t0 + min(1)), ("loc_1", t0 + min(6))))
    // the group operator must reuse our repartition+sort, not add its
    // own (AQE prints the initial plan too — count the final plan only)
    val plan = sent.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.linesIterator.count(_.contains("ShuffleQueryStage")) === 1, plan)
    assert(plan.linesIterator.count(_.contains(" Sort [")) === 1, plan)
  }

  test("streaming: state persists across micro-batches with event-time watermark") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Occurrence]
    val q = Throttle(input.toDS().withWatermark("eventTime", "10 minutes"))
      .writeStream.format("memory").queryName("throttle_sent")
      .outputMode("append").start()
    try {
      input.addData(occ(t0))
      q.processAllAvailable()
      input.addData(occ(t0 + min(1))) // suppressed by state from batch 1
      q.processAllAvailable()
      input.addData(occ(t0 + min(6))) // past the interval → sends
      q.processAllAvailable()
      val sent = spark.table("throttle_sent")
        .collect().map(_.getAs[Timestamp]("sentTime").getTime).sorted.toList
      assert(sent === List(t0, t0 + min(6)))
    } finally q.stop()
  }

  test("transformWithState: same contract on the Spark 4 arbitrary-state API") {
    // The successor API (SPARK-40434): CRITICAL bypass + interval
    // suppression + cross-micro-batch state, on the RocksDB store it
    // requires. Same fixtures as the fMGWS path above.
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Occurrence]
      val q = Throttle.transformWithState(
          input.toDS().withWatermark("eventTime", "10 minutes"))
        .writeStream.format("memory").queryName("throttle_tws")
        .outputMode("append").start()
      try {
        input.addData(occ(t0)) // first occurrence → sends, stamps t0
        q.processAllAvailable()
        input.addData(occ(t0 + min(1))) // 1 min since t0 → suppressed
        input.addData(occ(t0 + min(2), priority = "CRITICAL")) // bypass, stamps t0+2
        q.processAllAvailable()
        input.addData(occ(t0 + min(6))) // 4 min since t0+2 → suppressed
        input.addData(occ(t0 + min(8))) // 6 min since t0+2 → sends
        q.processAllAvailable()
        val sent = spark.table("throttle_tws")
          .collect().map(_.getAs[Timestamp]("sentTime").getTime).sorted.toList
        assert(sent === List(t0, t0 + min(2), t0 + min(8)))
        // the state operator really ran on RocksDB
        val metrics = q.recentProgress.flatMap(_.stateOperators)
          .flatMap(_.customMetrics.keySet().toArray(Array.empty[String]))
        assert(metrics.exists(_.startsWith("rocksdb")),
          s"no rocksdb state metrics in progress: ${metrics.toSet}")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState: coalesced TTL timers age state out (clear + re-arm paths)") {
    // The TTL is output-invisible by design (it only bounds state), so
    // this asserts on the engine's own numRowsTotal. Sequence drives
    // BOTH expiry-handler branches: key A is seen twice (t0, t0+50min),
    // so its first timer (armed at t0+1h from the first sighting) fires
    // while the watermark is still short of the moved horizon — the
    // RE-ARM path — and the re-armed timer later clears it, while B and
    // C age out through the plain clear path. Bulk evidence for the same
    // invariant (629,200-row plateau over a 10M-key space) is the
    // StateBench soak in SCALE.md §2.
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Occurrence]
      val q = Throttle.transformWithState(
          input.toDS().withWatermark("eventTime", "10 minutes"))
        .writeStream.format("memory").queryName("throttle_tws_ttl")
        .outputMode("append").start()
      try {
        def addAndProcess(o: Occurrence): Unit = {
          input.addData(o); q.processAllAvailable()
        }
        addAndProcess(occ(t0)) // A: arms timer at t0+1h
        addAndProcess(occ(t0 + min(50))) // A again: horizon moves to t0+110min (timer untouched)
        addAndProcess(occ(t0 + min(85), key = "loc_C|High Temperature")) // C; watermark after this batch = 75min
        addAndProcess(occ(t0 + min(180), key = "loc_B|High Temperature")) // batch runs at wm 75min: A's t0+60min timer fires, horizon 110min > 75 → RE-ARM at 110min
        addAndProcess(occ(t0 + min(300), key = "loc_D|High Temperature")) // wm 170min: A's re-armed 110min timer fires → clear; C (horizon 145min) clears
        addAndProcess(occ(t0 + min(360), key = "loc_E|High Temperature")) // wm 290min: B (horizon 240min) clears
        // threshold = 1 and every send is ≥ 5 min after the key's last:
        // all six occurrences send regardless of TTL (output-invariant)
        assert(spark.table("throttle_tws_ttl").count() === 6)
        // live state after the E batch: D + E only — A (via the re-arm
        // path: fired at 75min, re-armed to 110min, cleared at 170min)
        // and B, C (plain clear path) aged out
        val rows = q.recentProgress.reverse
          .flatMap(_.stateOperators.headOption).headOption
          .map(_.numRowsTotal)
        assert(rows.contains(2L), s"live state rows: $rows")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
