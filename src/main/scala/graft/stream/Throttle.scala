package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key stateful alert throttling — the reference's
  * `check_and_send_alert` (`Lambda/lamda.py:246-283`, SURVEY.md §2.7
  * ST2/ST3), the one genuinely stateful operator in the pipeline.
  *
  * Key = (loc_id, alert_type); state = {lastSent, consecutiveCount}.
  * Semantics per the reference:
  *  - CRITICAL priority bypasses throttling entirely and stamps
  *    lastSent (the consecutive count is NOT reset — lamda.py:257-261).
  *  - otherwise, an occurrence within ALERT_INTERVAL of lastSent is
  *    suppressed without touching the count (lamda.py:264-269).
  *  - otherwise the count increments; at CONSECUTIVE_RECORDS_THRESHOLD
  *    the alert sends, lastSent stamps, count resets (lamda.py:271-283).
  *
  * DIVERGENCES (documented, SURVEY §7.4):
  *  - "now" is the occurrence's event time, not wall clock
  *    (datetime.utcnow, lamda.py:250) — deterministic and replayable;
  *    occurrences are processed in event-time order per key.
  *  - state TTL is an *event-time* timeout: a key's state expires once
  *    the stream's watermark passes 1h beyond its last occurrence —
  *    deterministic/replayable (timeout depends only on data times),
  *    unlike the reference's probabilistic wall-clock sweep
  *    (lamda.py:401-416). Streaming callers must therefore set
  *    `withWatermark` on the event-time column before [[apply]].
  *
  * At 100 TB the state is bounded by key cardinality × fixed state size
  * and Spark shards it by key across executors; the TTL keeps it from
  * accumulating dead keys.
  */
object Throttle {

  val AlertIntervalMs: Long = 5 * 60 * 1000L // lamda.py:20
  val ConsecutiveThreshold: Int = 1 // lamda.py:21
  val StateTtlMs: Long = 60 * 60 * 1000L // lamda.py:408

  case class Occurrence(
      locId: String,
      alertType: String,
      priority: String,
      description: String,
      eventId: String,
      eventTime: Timestamp)

  case class ThrottleState(lastSentMs: Long, consecutive: Int)

  case class Sent(
      locId: String,
      alertType: String,
      priority: String,
      description: String,
      eventId: String,
      eventTime: Timestamp,
      sentTime: Timestamp)

  /** Pure state machine for one occurrence: (state, sent?). */
  def step(
      st: ThrottleState,
      priority: String,
      nowMs: Long,
      interval: Long = AlertIntervalMs,
      threshold: Int = ConsecutiveThreshold): (ThrottleState, Boolean) = {
    if (priority == "CRITICAL") {
      (st.copy(lastSentMs = nowMs), true)
    } else if (st.lastSentMs >= 0 && nowMs - st.lastSentMs < interval) {
      (st, false)
    } else {
      val count = st.consecutive + 1
      if (count >= threshold)
        (ThrottleState(nowMs, 0), true)
      else
        (st.copy(consecutive = count), false)
    }
  }

  /** Streaming-memory group processor: CONSUMES LAZILY, requiring the
    * iterator to arrive event-time-ascending — it never materializes
    * the group, so a key holding millions of batch rows processes in
    * O(1) memory. State commit rides the iterator's tail (Spark
    * commits GroupState when the returned iterator completes), and a
    * monotonicity guard turns a violated sort contract into a loud
    * error instead of silently-wrong throttling.
    */
  def processGroupSorted(
      key: (String, String),
      occurrences: Iterator[Occurrence],
      state: GroupState[ThrottleState]): Iterator[Sent] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var st = state.getOption.getOrElse(ThrottleState(-1L, 0))
      var lastMs = Long.MinValue
      val sent = occurrences.flatMap { occ =>
        val nowMs = occ.eventTime.getTime
        require(nowMs >= lastMs,
          s"Throttle occurrences for key $key are not event-time-sorted " +
            s"($nowMs after $lastMs); use apply()/the sorting wrapper")
        lastMs = nowMs
        val (next, fire) = step(st, occ.priority, nowMs)
        st = next
        if (fire)
          Some(Sent(occ.locId, occ.alertType, occ.priority, occ.description,
            occ.eventId, occ.eventTime, new Timestamp(nowMs)))
        else None
      }
      // Runs once, after the last occurrence is consumed: commit state
      // and stamp the deterministic event-time TTL (expire when the
      // watermark passes 1h beyond this key's newest occurrence).
      // Inert in batch mode (no watermark — setTimeoutTimestamp throws).
      sent ++ {
        state.update(st)
        if (lastMs != Long.MinValue) {
          try state.setTimeoutTimestamp(lastMs + StateTtlMs)
          catch { case _: UnsupportedOperationException => () }
        }
        Iterator.empty
      }
    }
  }

  /** Unsorted-delivery group processor: sorts the group in memory, then
    * delegates. This is the STREAMING path — Spark's stateful shuffle
    * re-sorts only on the grouping key (arbitrary within-key order), so
    * the in-group sort is required for the event-time-deterministic
    * contract; group size there is bounded by the micro-batch trigger,
    * not stream history. The scale risk is giant BATCHES (AvailableNow
    * catch-up, foreachBatch) — those take [[apply]]'s batch branch,
    * which pre-sorts in the exchange and streams lazily instead.
    */
  def processGroup(
      key: (String, String),
      occurrences: Iterator[Occurrence],
      state: GroupState[ThrottleState]): Iterator[Sent] =
    if (state.hasTimedOut) processGroupSorted(key, occurrences, state)
    else processGroupSorted(key,
      occurrences.toSeq.sortBy(_.eventTime.getTime).iterator, state)

  /** Apply the throttle to an occurrence stream or batch Dataset.
    * Streaming callers set `withWatermark("eventTime", …)` upstream so
    * the event-time TTL can fire.
    *
    * Batch uses an exchange-aligned secondary sort: repartition on the
    * grouping columns (satisfies the group operator's required
    * distribution, so no second exchange) and sort within partitions by
    * (key, eventTime) — a (key) prefix of that ordering satisfies the
    * operator's required sort, so Spark inserts none and the group
    * iterator arrives time-ordered for the lazy O(1)-memory processor.
    * Streaming can't use this (its stateful shuffle owns partitioning
    * and re-sorts by key only), so it sorts per group — bounded by the
    * trigger interval.
    */
  def apply(ds: Dataset[Occurrence]): Dataset[Sent] = {
    implicit val stEnc = Encoders.product[ThrottleState]
    implicit val outEnc = Encoders.product[Sent]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val occEnc = Encoders.product[Occurrence]
    if (ds.isStreaming) {
      ds.groupByKey(o => (o.locId, o.alertType))
        .flatMapGroupsWithState(
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
          processGroup)
    } else {
      import org.apache.spark.sql.functions.col
      ds.repartition(col("locId"), col("alertType"))
        .sortWithinPartitions(col("locId"), col("alertType"), col("eventTime"))
        .groupBy(col("locId"), col("alertType"))
        .as[(String, String), Occurrence]
        .flatMapGroupsWithState(
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
          processGroupSorted)
    }
  }

  /** [[ThrottleState]] plus the key's newest occurrence — the TTL
    * anchor the timer-coalescing logic below re-arms against. Private
    * to the transformWithState path — the fMGWS path keeps the 2-field
    * state (its single timeout slot lives outside the state row). A
    * live state row IMPLIES an outstanding timer (armed at row
    * creation; the expiry handler either clears both or re-arms), so
    * no armed flag is stored. NOTE: this widened the value-state
    * schema vs the pre-round-8 2-field row. Under the DEFAULT
    * UnsafeRow state encoding a transformWithState query cannot
    * restart from a checkpoint written before such a change (the row
    * format rejects added fields) — so the in-repo tws drivers set
    * `spark.sql.streaming.stateStore.encodingFormat=avro`, whose
    * encoder supports additive schema evolution (nullable/defaulted
    * new fields); StateEvolutionSpec proves a 2-field→3-field restart
    * round-trip on a real checkpoint under both encodings (avro
    * restarts; unsaferow fails with the expected
    * STATE_STORE_* schema-incompatibility error).
    */
  case class TwsThrottleState(
      lastSentMs: Long, consecutive: Int, lastSeenMs: Long)

  /** The same state machine on Spark 4's `transformWithState` — the
    * arbitrary-stateful-processing API that supersedes
    * flatMapGroupsWithState (SPARK-40434; SURVEY §2.7 ST2 names it).
    * What it buys at scale: typed composable state on the RocksDB
    * store (which transformWithState requires — keyed state spills to
    * executor-local disk instead of the heap) and explicit per-key
    * timers, which make the event-time TTL a first-class timer instead
    * of fMGWS's single timeout slot.
    *
    * TTL timers are COALESCED, not slid: the first occurrence arms one
    * timer at (occurrence + 1h); later occurrences only update
    * `lastSeenMs` in the value state; when the timer fires, the handler
    * clears the state if the watermark really passed
    * (lastSeen + 1h) and otherwise re-arms at that horizon. Observable
    * behavior is identical to sliding the timer forward per batch
    * (state lives until the watermark passes 1h beyond the newest
    * occurrence) at amortized O(1) point reads/writes per key. The
    * slide-forward formulation (listTimers + deleteTimer + registerTimer
    * per key per batch) is quadratic on RocksDB at scale: listTimers is
    * a prefix SCAN, and per-key delete+re-register fills the timer
    * column family with tombstones every seek must step over — the 10M
    * StateBench soak measured its batches degrading from 4 s (125k
    * fresh keys/batch) to 175–514 s (625k fresh keys/batch) before this
    * rewrite (SCALE.md §2).
    *
    * Same contract as [[apply]]'s streaming path, spec'd by the same
    * fixtures in ThrottleSpec: CRITICAL bypass, 5-min suppression
    * across micro-batches, per-key independence, event-time TTL 1h
    * past the key's newest occurrence.
    */
  class ThrottleProcessor extends StatefulProcessor[(String, String), Occurrence, Sent] {
    @transient private var st: ValueState[TwsThrottleState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // no store-level TTL: expiry is the explicit event-time timer
      // below (store TTL is processing-time — not replayable)
      st = getHandle.getValueState[TwsThrottleState](
        "throttle", Encoders.product[TwsThrottleState], TTLConfig.NONE)

    override def handleInputRows(
        key: (String, String),
        rows: Iterator[Occurrence],
        timerValues: TimerValues): Iterator[Sent] = {
      val exists = st.exists()
      val prev =
        if (exists) st.get() else TwsThrottleState(-1L, 0, Long.MinValue)
      var s = ThrottleState(prev.lastSentMs, prev.consecutive)
      // micro-batch group: bounded by the trigger, sorted in memory
      // (the stateful shuffle delivers arbitrary within-key order)
      var lastMs = Long.MinValue
      val sent = rows.toSeq.sortBy(_.eventTime.getTime).flatMap { occ =>
        val nowMs = occ.eventTime.getTime
        lastMs = nowMs
        val (next, fire) = step(s, occ.priority, nowMs)
        s = next
        if (fire)
          Some(Sent(occ.locId, occ.alertType, occ.priority, occ.description,
            occ.eventId, occ.eventTime, new Timestamp(nowMs)))
        else None
      }
      val lastSeen = math.max(prev.lastSeenMs, lastMs)
      // live row ⟺ outstanding timer, so arm only on row creation —
      // and WRITE only when the invariant can hold: a new key whose
      // row iterator was empty (lastSeen stays MinValue) gets neither
      // a timer nor a state row, else the row would leak forever
      // (r8 ADVICE: the old code wrote the row unconditionally while
      // the timer guard skipped arming)
      if (lastSeen != Long.MinValue) {
        if (!exists) getHandle.registerTimer(lastSeen + StateTtlMs)
        st.update(TwsThrottleState(s.lastSentMs, s.consecutive, lastSeen))
      }
      sent.iterator
    }

    override def handleExpiredTimer(
        key: (String, String),
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Sent] = {
      if (st.exists()) {
        val horizon = st.get().lastSeenMs + StateTtlMs
        // the watermark is ≥ the fired timer's expiry; judging staleness
        // against it (not the expiry) clears a key whose horizon the
        // watermark already passed without one more timer hop
        val wmMs = math.max(
          timerValues.getCurrentWatermarkInMs(),
          expiredTimerInfo.getExpiryTimeInMs())
        if (horizon <= wmMs) st.clear()
        else
          // newer occurrences arrived since this timer was armed:
          // push the single timer out to the current TTL horizon
          // (state row untouched — it already carries lastSeenMs)
          getHandle.registerTimer(horizon)
      }
      Iterator.empty
    }
  }

  /** [[apply]] via [[ThrottleProcessor]]. Streaming only
    * (TimeMode.EventTime needs an upstream watermark), and the session
    * must run the RocksDB state store provider.
    */
  def transformWithState(ds: Dataset[Occurrence]): Dataset[Sent] = {
    implicit val outEnc = Encoders.product[Sent]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    ds.groupByKey(o => (o.locId, o.alertType))
      .transformWithState(new ThrottleProcessor, TimeMode.EventTime(), OutputMode.Append())
  }
}
