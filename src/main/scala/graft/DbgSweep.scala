package graft
import org.apache.spark.sql.SparkSession
import scala.io.Source
object DbgSweep {
  def norm(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => if (b) "true" else "false"
    case s: scala.collection.Seq[_] =>
      s.map(e => if (e == null) "null" else e.toString).mkString("[", ", ", "]")
    case d: Double => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15)
        { val l = d.toLong; if (l == d) s"$l.0" else d.toString } else d.toString
    case x => x.toString
  }
  def close(a: String, b: String): Boolean = {
    if (a == b) return true
    if (b.isEmpty && a == "NULL") return true
    if (a.isEmpty && b == "NULL") return true
    try { return math.abs(a.toDouble - b.toDouble) < 1e-9 * math.max(1.0, math.abs(b.toDouble)) }
    catch { case _: Throwable => }
    // druid prints doubles like 1.0 where long 1 etc
    false
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.DruidFunctions.register(spark)
    GraftExtensions.register(spark)
    var n = 0; var skip = 0; var ok = 0; var bad = 0
    for (line <- Source.fromFile("/tmp/literal_cases.tsv", "UTF-8").getLines()) {
      val parts = line.split("\t", -1)
      if (parts.length == 4) {
        val Array(f, tid, expr, expected) = parts
        n += 1
        try {
          val sql = graft.api.SqlApi.calciteLiteralEscape(
            graft.api.SqlApi.rewriteSql(s"SELECT $expr AS c"))
          val row = spark.sql(sql).head()
          val got = if (row.isNullAt(0)) "NULL" else norm(row.get(0))
          if (close(got, expected)) ok += 1
          else { bad += 1; println(s"MISMATCH\t$f\t$tid\t$expr\tgot=[$got]\texp=[$expected]") }
        } catch { case _: Throwable => skip += 1 }
      }
    }
    println(s"SWEEP total=$n resolved_ok=$ok mismatch=$bad skipped=$skip")
    spark.stop()
  }
}
