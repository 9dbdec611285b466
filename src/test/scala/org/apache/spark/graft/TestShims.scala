package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge to `private[spark]` listener-bus draining, needed to
  * read task metrics deterministically after a job completes.
  */
object TestShims {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
