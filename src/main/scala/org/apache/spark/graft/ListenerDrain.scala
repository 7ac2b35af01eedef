package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for metric attribution.
  *
  * `graft.Scale` attributes shuffle/spill bytes to queries by resetting
  * shared counters between runs; task-end events post to the listener
  * bus ASYNCHRONOUSLY, so without a drain a straggler from query N (or
  * from warmup) lands after the reset and pollutes query N+1's numbers.
  * The precise wait — `LiveListenerBus.waitUntilEmpty` — is
  * `private[spark]`, hence this one-method shim in the spark package
  * (compile-time access only; no internals are modified). Replaces the
  * old bounded `Thread.sleep(500)` heuristic, which was a race by
  * construction.
  */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
