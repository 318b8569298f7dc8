package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`, so the one legitimate
  * consumer in this repo — Bench's straggler-metric listener, which must
  * observe every task-end event before reading its max — reaches it
  * through this accessor placed in the `org.apache.spark` namespace.
  * Nothing else in the engine uses (or should use) this trapdoor; a fixed
  * `Thread.sleep` was the alternative and under-reports on loaded hosts.
  */
object ListenerDrain {
  /** Block until the async listener bus has dispatched every queued event,
    * or `timeoutMs` elapses (best-effort on timeout — the caller's metric
    * then reflects whatever was delivered, same as the old sleep).
    */
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
