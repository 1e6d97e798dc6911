package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for the stress-probe telemetry
  * (ADVICE r17): `LiveListenerBus.waitUntilEmpty` is `private[spark]`,
  * so the one place that needs stage-completion events flushed before
  * reading its counters reaches it through this package-located shim —
  * the same org.apache.spark-package convention as the native
  * expressions in `org.apache.spark.sql.graft`. A fixed post-run sleep
  * only bounds bus lag probabilistically; under load the bus can lag
  * past any fixed pause and bleed run N's stage events into run N+1's
  * shuffle/peak counters. Draining until the queues are empty is exact.
  *
  * r18 ADVICE: the zero-arg `waitUntilEmpty()` throws after Spark's
  * internal 10 s default — exactly the heavy-backlog condition the
  * drain exists for would abort the whole probe sweep mid-run. The
  * shim therefore takes a generous explicit bound and reports timeout
  * as `false` instead of throwing; the caller records the run as
  * drain-timed-out (counters possibly under-read) rather than crashing.
  */
object ListenerDrain {
  /** @return true when the bus drained within `timeoutMillis`; false on
    *         timeout (events may still be in flight). */
  def drain(sc: SparkContext, timeoutMillis: Long = 120000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
