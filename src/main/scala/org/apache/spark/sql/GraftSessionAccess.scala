package org.apache.spark.sql

/** Accessor for `SparkSession.cloneSession()` (which is `private[sql]`).
  *
  * The SQL facade needs a parse-scoped conf window
  * (`spark.sql.ansi.doubleQuotedIdentifiers`, per-query `sqlTimeZone`)
  * without mutating session-wide conf: a clone shares the SparkContext,
  * catalog and temp views but owns an independent SQLConf, so setting the
  * parse confs on the clone cannot leak to concurrent direct `spark.sql`
  * users of the original session.
  */
object GraftSessionAccess {
  def cloneSession(s: SparkSession): SparkSession = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.cloneSession()
    case other => other // non-classic implementations: no clone available
  }
}
