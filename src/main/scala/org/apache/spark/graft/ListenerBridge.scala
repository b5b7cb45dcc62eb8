package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus flush — needed because
  * `QueryExecutionListener` events are delivered asynchronously, and a
  * caller reading captured metrics right after an action would race the
  * bus.
  */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
