package graft
object DbgQ {
  def main(args: Array[String]): Unit = {
    val sql = """SELECT CAST(TIMESTAMP '2020-01-01 00:00:00'
                  + INTERVAL '2' QUARTER(2) AS STRING) AS t2"""
    println("=====>")
    println(graft.api.SqlApi.rewriteSql(sql))
    println("<=====")
  }
}
