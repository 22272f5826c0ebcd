package org.apache.spark

/** Narrow bridge into `private[spark]` scheduler internals: the bench
  * needs to drain the listener bus between queries so per-query metric
  * deltas are attributed to the right query. Everything else stays on the
  * public API.
  */
object GraftSparkInternals {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)

  /** Set a key on the context's LIVE SparkConf (`sc.conf` is
    * private[spark]; `getConf` hands back a defensive clone, useless for
    * configuring a service that reads the live conf at start — the
    * Spark Connect binding port, here).
    */
  def setContextConf(sc: SparkContext, key: String, value: String): Unit = {
    sc.conf.set(key, value)
    ()
  }
}
