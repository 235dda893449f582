package graft.functions

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Registry of tables that carry Druid MULTI-VALUE STRING dimensions
  * (columns tagged `druid.mv` in their schema metadata). The SQL facade
  * consults it to apply MVD-only dialect at zero cost to everything
  * else: grouping by an MVD (or an expression over one) EXPLODES into
  * one group per element in the reference's groupBy engine — a row with
  * ["b","c"] contributes to groups b AND c, a null row to the null
  * group (Druid docs "Grouping on multi-value dimensions";
  * CalciteMultiValueStringQueryTest grids). Queries that never touch a
  * registered table skip the probe entirely.
  *
  * Two scopes: [[register]] is PROCESS-GLOBAL (the single-session driver
  * harness's contract), while [[registerScoped]] keys on the owning
  * SparkSession's identity — a multi-tenant host registering tenant A's
  * MVD tables against tenant A's session leaks nothing into tenant B's
  * (the reference's analog: per-DruidSchema segment metadata, not a
  * process singleton). Reads consult the caller's scope plus global.
  */
object MvdTables {
  private val global = TrieMap[String, Boolean]()
  // (session identity, table) — newSession()/cloneSession() get fresh scopes
  private val scoped = TrieMap[(String, String), Boolean]()

  private def sid(s: SparkSession): String =
    System.identityHashCode(s).toHexString

  def register(table: String): Unit = global.put(table.toLowerCase, true)

  def registerScoped(spark: SparkSession, table: String): Unit =
    scoped.put((sid(spark), table.toLowerCase), true)

  /** Drop every registration owned by this session (tenant teardown). */
  def clearScope(spark: SparkSession): Unit = {
    val id = sid(spark)
    scoped.keys.filter(_._1 == id).foreach(scoped.remove)
  }

  def isMvdTable(table: String): Boolean = {
    val lc = table.toLowerCase
    global.contains(lc) || SparkSession.getActiveSession.exists(s =>
      scoped.contains((sid(s), lc)))
  }

  def isMvdTable(spark: SparkSession, table: String): Boolean = {
    val lc = table.toLowerCase
    global.contains(lc) || scoped.contains((sid(spark), lc))
  }

  def any: Boolean =
    global.nonEmpty || (scoped.nonEmpty &&
      SparkSession.getActiveSession.exists { s =>
        val id = sid(s); scoped.keysIterator.exists(_._1 == id)
      })
}
