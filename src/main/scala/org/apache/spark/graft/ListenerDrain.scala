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
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
