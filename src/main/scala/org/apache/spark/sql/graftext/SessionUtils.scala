// Same private[sql]-bridge rationale as CosineSimilarityExpr.
package org.apache.spark.sql.graftext

import org.apache.spark.sql.SparkSession

/** Bridge for `SparkSession.sessionUUID` (private[sql]) — the unique,
  * stable per-session key graft's plan caches use (identity hashes can
  * be reused after a stopped session is GC'd).
  */
object SessionUtils {
  def uuid(s: SparkSession): String =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
}
