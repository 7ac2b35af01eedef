package graft.stream

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, MapState, ValueState}

/** Streaming heavy hitters — bounded-memory top-item tracking over an
  * unbounded stream, the always-on form of the batch boilerplate/
  * vocabulary queries (q56/q64): "which tokens/ids are suddenly
  * dominating this feed" without ever holding the feed's distinct set.
  *
  * Algorithm: Misra-Gries summaries (Misra & Gries 1982) with the
  * mergeable-summaries batch merge (Agarwal et al., PODS'12): per key,
  * keep ≤ k counters; each micro-batch folds its items into an
  * in-memory count map, merges it with the stored summary by adding
  * matching counters, then subtracts the (k+1)-th largest merged count
  * from every counter and keeps the strictly-positive ones — the
  * classic MG decrement applied wholesale, which preserves the
  * guarantee: every estimate UNDERCOUNTS its true frequency by at most
  * N/(k+1) (N = items seen for that key), so any item with true
  * frequency > N/(k+1) is guaranteed present. Deterministic: the
  * subtraction is uniform, so iteration order never matters.
  *
  * State per key is ≤ k+1 small entries (a MapState of counters + a
  * ValueState total) REGARDLESS of stream cardinality — that is the
  * 100 TB contract, and why this is a `transformWithState` op on the
  * RocksDB store rather than a windowed aggregation: a groupBy(token)
  * over a high-cardinality stream shuffles and stores the distinct
  * set; this never materializes it anywhere.
  *
  * Each micro-batch APPENDS its post-merge snapshot (≤ k rows per key:
  * item, conservative estimate, items-processed, error bound) — a
  * monitor reads the latest batch; rows carry `n_seen` so readers can
  * tell snapshots apart.
  */
object HeavyHitters {

  /** One tracked counter in a batch's snapshot. `est` is the MG
    * estimate (true count − at most `err_bound`); `n_seen` is the
    * key's total items so far (the snapshot version).
    */
  final case class Hitter(
      key: String,
      item: String,
      est: Long,
      n_seen: Long,
      err_bound: Long)

  class Processor(k: Int)
      extends StatefulProcessor[String, (String, String), Hitter] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      total = getHandle.getValueState[Long](
        "total", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, String)],
        timerValues: TimerValues): Iterator[Hitter] = {
      // fold the batch locally (bounded by the batch's distinct items,
      // which the trigger bounds), then merge once with the ≤ k stored
      // counters — O(m log m) per batch instead of MG's O(k) per item
      val batch = mutable.HashMap.empty[String, Long]
      var n = 0L
      rows.foreach { case (_, item) =>
        batch.update(item, batch.getOrElse(item, 0L) + 1L)
        n += 1L
      }
      val merged = mutable.HashMap.empty[String, Long]
      counts.iterator().foreach { case (t, c) => merged.update(t, c) }
      batch.foreach { case (t, c) =>
        merged.update(t, merged.getOrElse(t, 0L) + c)
      }
      if (merged.size > k) {
        // subtract the (k+1)-th largest from all, keep > 0 (≤ k remain;
        // ties at the boundary die together — deterministic)
        val kth = merged.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        val dead = merged.collect { case (t, c) if c - kth <= 0 => t }
        dead.foreach(merged.remove)
        merged.mapValuesInPlace((_, c) => c - kth)
      }
      val nSeen = (if (total.exists()) total.get() else 0L) + n
      total.update(nSeen)
      counts.clear()
      merged.foreach { case (t, c) => counts.updateValue(t, c) }
      val bound = nSeen / (k + 1)
      merged.toSeq.sortBy { case (t, c) => (-c, t) }
        .map { case (t, c) => Hitter(key, t, c, nSeen, bound) }
        .iterator
    }
  }

  /** Track the top-≤k items per key over `ds` = (key, item) pairs.
    * Streaming only; the session must run the RocksDB state store
    * provider (a `transformWithState` requirement).
    */
  def apply(ds: Dataset[(String, String)], k: Int = 16): Dataset[Hitter] = {
    implicit val outEnc = Encoders.product[Hitter]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_._1)
      .transformWithState(new Processor(k), TimeMode.None(), OutputMode.Append())
  }
}
