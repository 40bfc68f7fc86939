package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** Bridge to the session's private[sql] stable UUID — the correct identity
  * for per-session caches (`System.identityHashCode` can collide across
  * sessions and survives session restarts that reuse addresses).
  */
object SessionBridge {
  def uuid(spark: SparkSession): String = spark match {
    case s: org.apache.spark.sql.classic.SparkSession => s.sessionUUID
    case other => "sess-" + System.identityHashCode(other).toHexString
  }

  /** True iff the dataset's plan is already in the CacheManager — the
    * authoritative "is cached" check: correct across sessions and after
    * `clearCache()`, where any caller-side guard set goes stale.
    */
  def isCached(df: org.apache.spark.sql.Dataset[_]): Boolean = df match {
    case d: org.apache.spark.sql.classic.Dataset[_] =>
      d.sparkSession.sharedState.cacheManager.lookupCachedData(d).isDefined
    case _ => false
  }
}
