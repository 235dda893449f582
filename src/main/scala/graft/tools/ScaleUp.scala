package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-proof data generator: replicate an sf directory N× with
  * consistently shifted keys, so every foreign-key relationship (and thus
  * every join/aggregate plan) is preserved while cardinality grows N-fold.
  * Used to demonstrate the bench suite above the largest driver-provided
  * scale factor (SCALING.md's 10× check); writes only under /tmp.
  *
  * Shifting rule: for copy i, every key column k becomes k + i·(max(k)+1)
  * computed on the source table that OWNS the key, so orders.o_custkey and
  * customer.c_custkey shift by the same stride and joins keep exactly N×
  * the original match count. region/nation (25/5 rows, broadcast-side
  * geography) are copied unshifted, like real scale-up: dimensions that
  * are genuinely fixed-cardinality stay fixed.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(name: String): DataFrame = graft.Tables.load(spark, src, name)

    // key-owning table → stride per key domain
    def stride(df: DataFrame, col: String): Long =
      df.agg(max(col)).head().getLong(0) + 1L

    val strides = Map(
      "orderkey" -> stride(load("orders"), "o_orderkey"),
      "custkey"  -> stride(load("customer"), "c_custkey"),
      "partkey"  -> stride(load("part"), "p_partkey"),
      "suppkey"  -> stride(load("supplier"), "s_suppkey"),
      "eventid"  -> stride(load("events"), "event_id"),
      "userid"   -> stride(load("events"), "user_id"),
      "docid"    -> stride(load("documents"), "doc_id"),
      "embid"    -> stride(load("embeddings"), "vec_id"))

    /** N copies with the given (column → key domain) shifts. */
    def replicate(df: DataFrame, shifts: Map[String, String]): DataFrame = {
      val copyIdx = explode(sequence(lit(0), lit(copies - 1)))
      val withIdx = df.withColumn("__copy", copyIdx)
      shifts.foldLeft(withIdx) { case (d, (c, domain)) =>
        d.withColumn(c, col(c) + col("__copy") * lit(strides(domain)))
      }.drop("__copy")
    }

    val jobs: Seq[(String, DataFrame)] = Seq(
      "region"   -> load("region"),
      "nation"   -> load("nation"),
      "customer" -> replicate(load("customer"), Map("c_custkey" -> "custkey")),
      "supplier" -> replicate(load("supplier"), Map("s_suppkey" -> "suppkey")),
      "part"     -> replicate(load("part"), Map("p_partkey" -> "partkey")),
      "orders"   -> replicate(load("orders"),
        Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey")),
      "lineitem" -> replicate(load("lineitem"),
        Map("l_orderkey" -> "orderkey", "l_partkey" -> "partkey",
            "l_suppkey" -> "suppkey")),
      "events"   -> replicate(load("events"),
        Map("event_id" -> "eventid", "user_id" -> "userid")),
      "documents" -> replicate(load("documents"), Map("doc_id" -> "docid")),
      "embeddings" -> replicate(load("embeddings"), Map("vec_id" -> "embid")))

    jobs.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
