package org.apache.spark.graftprobe

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for specs that assert on
  * SparkListener-collected task metrics. `SparkContext.listenerBus` is
  * `private[spark]`, hence this accessor's package — the same bridge
  * pattern as `org.apache.spark.sql.graftbridge`. Replaces sleep-based
  * quiescence polling, which undercounts whenever the async bus lags
  * past the poll window on a loaded box. */
object ListenerDrain {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
