package org.apache.spark.graftbus

import org.apache.spark.SparkContext

/** Compile-checked access to the `private[spark]` listener bus: the
  * measurement tools (QueryMetrics) must drain queued task-end events
  * before reading their counters, and `LiveListenerBus.waitUntilEmpty`
  * is the API Spark's own test harness uses for exactly that. A fixed
  * `Thread.sleep` is a race — under load, late events are lost and the
  * task/shuffle/CPU counters undercount (r14 ADVICE item). This shim
  * lives under `org.apache.spark` solely to reach the package-private
  * member; it contains no other logic.
  */
object ListenerBusDrain {
  /** Block until every queued listener event has been delivered (or the
    * timeout passes — bounded so a wedged bus cannot hang the tool). */
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
