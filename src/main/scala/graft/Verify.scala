package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // harness cache lifecycle: retain pipeline persists and release with
    // clearCache after each gate — the auto-release listener unpersists
    // by plan equivalence and would race the next (equivalent) run
    graft.pipeline.CacheScope.retainAll = true
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // harness guard: the driver's pandas oracle compare sorts and
        // hashes every cell — ARRAY/STRUCT/MAP output columns crash it
        // (r19's one red gate). Fail LOUDLY at dump time instead: gates
        // must project hashable scalars (ARRAY_TO_STRING the arrays).
        val nonScalar = df.schema.fields.filter(f => f.dataType match {
          case _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.StructType |
               _: org.apache.spark.sql.types.MapType => true
          case _ => false
        })
        require(nonScalar.isEmpty,
          s"gate $name outputs non-scalar columns " +
            nonScalar.map(f => s"${f.name}:${f.dataType.simpleString}")
              .mkString("[", ", ", "]") +
            " — the driver oracle compare cannot hash these; wrap in" +
            " ARRAY_TO_STRING/TO_JSON in BOTH the gate and the oracle SQL")
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release the pipeline operators' persisted fan-out intermediates
      // between gates — cached blocks must not accumulate across the run
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
