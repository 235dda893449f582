/** Dump .explain("formatted") for the given gates to plans/r20/<name>_<tag>.txt.
  * Usage: runMain DumpPlans <tag> <gate1,gate2,...>
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val Array(tag, names) = args
    graft.pipeline.CacheScope.retainAll = true
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("plans")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    new java.io.File("plans/r20").mkdirs()
    names.split(",").foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r20/${n}_$tag.txt"), txt)
        println(s"dumped $n")
      } catch { case e: Throwable =>
        println(s"FAILED $n: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
