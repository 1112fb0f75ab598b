package org.apache.spark.sql

/** TEST-ONLY access widener: `sharedState` (and so the CacheManager) is
  * `private[sql]`, but the cache-hygiene gate needs to assert that
  * session-lived operators register NO cached tables they never release.
  * One forwarder, test classpath only.
  */
object GraftTestInterop {
  def cacheIsEmpty(s: SparkSession): Boolean =
    s.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
