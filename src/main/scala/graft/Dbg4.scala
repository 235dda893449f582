package graft
import org.apache.spark.sql.SparkSession
object Dbg4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.DruidFunctions.register(spark)
    val sql = graft.api.SqlApi.rewriteSql(
      """SELECT TO_JSON_STRING('a"b\c') AS str_esc""")
    println("rewritten: [" + sql + "]")
    val v = spark.sql(sql).head().getString(0)
    println("value: [" + v + "] len=" + v.length)
    spark.stop()
  }
}
