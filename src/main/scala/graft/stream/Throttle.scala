package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  def processGroup(
      key: (String, String),
      occurrences: Iterator[Occurrence],
      state: GroupState[ThrottleState]): Iterator[Sent] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val occs = occurrences.toSeq.sortBy(_.eventTime.getTime)
      var st = state.getOption.getOrElse(ThrottleState(-1L, 0))
      val sent = occs.flatMap { occ =>
        val nowMs = occ.eventTime.getTime
        val (next, fire) = step(st, occ.priority, nowMs)
        st = next
        if (fire)
          Some(Sent(occ.locId, occ.alertType, occ.priority, occ.description,
            occ.eventId, occ.eventTime, new Timestamp(nowMs)))
        else None
      }
      state.update(st)
      // Deterministic event-time TTL: expire when the watermark passes
      // 1h beyond this key's newest occurrence. Inert in batch mode
      // (no watermark — setTimeoutTimestamp throws there).
      try state.setTimeoutTimestamp(occs.last.eventTime.getTime + StateTtlMs)
      catch { case _: UnsupportedOperationException => () }
      sent.iterator
    }
  }

  /** Apply the throttle to an occurrence stream (or batch Dataset —
    * same code path, timeouts inert). Streaming callers set
    * `withWatermark("eventTime", …)` upstream so the event-time TTL
    * can fire.
    */
  def apply(ds: Dataset[Occurrence]): Dataset[Sent] = {
    implicit val stEnc = Encoders.product[ThrottleState]
    implicit val outEnc = Encoders.product[Sent]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    ds.groupByKey(o => (o.locId, o.alertType))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        processGroup)
  }
}
