package graft.tools

/** Dev utility: print the DuckDB oracle SQL for a gate (the same text
  * Verify dumps into oracle_sql.json) so it can be piped into DuckDB
  * while authoring two-dialect gates.
  */
object DumpOracle {
  def main(a: Array[String]): Unit =
    println("GRAFT_ORACLE_START\n" + graft.SparkEntry.oracleSql(a(0)) +
      "\nGRAFT_ORACLE_END")
}
