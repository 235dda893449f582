package graft.functions

import scala.collection.concurrent.TrieMap

/** Registry of tables that carry Druid MULTI-VALUE STRING dimensions
  * (columns tagged `druid.mv` in their schema metadata). The SQL facade
  * consults it to apply MVD-only dialect at zero cost to everything
  * else: grouping by an MVD (or an expression over one) EXPLODES into
  * one group per element in the reference's groupBy engine — a row with
  * ["b","c"] contributes to groups b AND c, a null row to the null
  * group (Druid docs "Grouping on multi-value dimensions";
  * CalciteMultiValueStringQueryTest grids). Queries that never touch a
  * registered table skip the probe entirely.
  */
object MvdTables {
  private val tables = TrieMap[String, Boolean]()

  def register(table: String): Unit = tables.put(table.toLowerCase, true)
  def isMvdTable(table: String): Boolean = tables.contains(table.toLowerCase)
  def any: Boolean = tables.nonEmpty
}
