package org.apache.spark

/** Narrow bridge into `private[spark]` scheduler internals: the bench
  * needs to drain the listener bus between queries so per-query metric
  * deltas are attributed to the right query. Everything else stays on the
  * public API.
  */
object GraftSparkInternals {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
