package org.apache.spark

/** Minimal private-API bridge (the GraftSqlBridge pattern): Bench's
  * per-query shuffle-byte accounting needs the listener bus DRAINED
  * before reading its counters — `SparkListener` events post
  * asynchronously, so a snapshot taken right after an action could
  * miss the final stages' metrics. `LiveListenerBus.waitUntilEmpty`
  * is `private[spark]`; this object re-exports it, nothing else. The
  * same drain-before-assert idiom Spark's own TestUtils uses.
  */
object GraftListenerBridge {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
