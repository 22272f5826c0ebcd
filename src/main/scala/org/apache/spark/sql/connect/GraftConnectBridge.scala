package org.apache.spark.sql.connect

import org.apache.spark.SparkContext

/** Narrow bridge into `private[connect]` members of Spark's Connect
  * service singleton: graft's ConnectEndpoint needs start/stop and the
  * bound port; everything else stays on the public API.
  */
object GraftConnectBridge {
  def start(sc: SparkContext): Unit =
    service.SparkConnectService.start(sc)

  def stop(): Unit =
    service.SparkConnectService.stop(None, None)

  def started: Boolean = service.SparkConnectService.started

  def boundPort: Int = service.SparkConnectService.localPort
}
