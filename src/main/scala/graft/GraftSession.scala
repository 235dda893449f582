package graft

import org.apache.spark.sql.SparkSession

import graft.functions.{DruidFunctions, LookupRegistry, TypedAggregators}

/** One-call session factory: a SparkSession wired with everything the engine
  * registers — Catalyst extensions (sketch functions + the approximate-
  * count-distinct rule), reference-named SQL functions, typed UDAFs, and the
  * lookup SQL surface. The entry point a user migrating from the reference
  * starts from.
  */
object GraftSession {

  def create(master: String = "local[*]",
             shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    attach(spark)
    spark
  }

  /** Register the engine's function surface on an existing session (used
    * when the driver constructs the session — extensions can't be injected
    * post-hoc, but every function can).
    */
  def attach(spark: SparkSession): Unit = {
    DruidFunctions.register(spark)
    TypedAggregators.register(spark)
    LookupRegistry.registerSql(spark)
    GraftExtensions.register(spark)
  }
}
