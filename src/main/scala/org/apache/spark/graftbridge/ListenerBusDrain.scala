package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Deterministic flush of the async listener bus, for per-key metric
  * attribution in [[graft.Bench]].
  *
  * `SparkContext.listenerBus` / `LiveListenerBus.waitUntilEmpty` are
  * `private[spark]` (they exist for exactly this purpose — Spark's own
  * test suites call them before asserting on listener state), so this
  * one-method bridge lives under `org.apache.spark`. Without the flush,
  * a TaskEnd-summing listener races the bus: `count()` returns when the
  * job completes, but the task-metric events may still sit in the queue,
  * and snapshot-diff attribution would bleed one key's tail CPU into the
  * next key. Polling the listener's own counters can't close the race
  * either — a jobs-started == jobs-ended check can be satisfied by a
  * PREFIX of the queue while later jobs' events are still in flight. */
object ListenerBusDrain {
  /** Blocks until every queued listener event is dispatched, or
    * `timeoutMs` elapses (returns false on timeout — callers degrade to
    * slightly-misattributed metrics rather than failing the bench). */
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
