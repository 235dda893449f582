package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.DruidFunctions

/** The reference engine's native query family re-expressed as DataFrame
  * builders (reference enumeration: `query/Query.java:76-86` — scan,
  * timeseries, topN, groupBy, timeBoundary, search, segmentMetadata,
  * dataSourceMetadata, windowOperator, union).
  *
  * Each builder declares a logical plan with the DataFrame API and lets
  * Catalyst/Tungsten pick the physical strategy — filters and projections push
  * into the parquet scan, aggregation is two-phase (partial map-side combine +
  * final merge) exactly like the reference's data-node/broker split
  * (`AggregatorFactory.getCombiningFactory` → Spark partial/final agg).
  */
object NativeQueries {

  /** Scan query (`query/scan/ScanQuery.java:61`): raw row retrieval with
    * projection, filter, optional time ordering, limit/offset. The filter and
    * column list reach the parquet reader (PushedFilters / ReadSchema), which
    * is what made the reference's per-segment scan fast — at 100 TB this is
    * the difference between reading 2 columns and reading 15.
    */
  def scan(df: DataFrame, columns: Seq[String], filter: Option[Column] = None,
           orderBy: Seq[Column] = Nil, limit: Option[Int] = None,
           offset: Int = 0): DataFrame = {
    var out = filter.fold(df)(df.filter)
    out = out.select(columns.map(col): _*)
    if (orderBy.nonEmpty) out = out.orderBy(orderBy: _*)
    if (offset > 0) out = out.offset(offset)
    limit.fold(out)(out.limit)
  }

  /** Timeseries query (`query/timeseries/TimeseriesQuery.java:59`): bucket by
    * a time granularity, aggregate, optionally zero-fill empty buckets
    * (skipEmptyBuckets=false is the reference default — SURVEY.md §7.4.8).
    *
    * Zero-fill generates the bucket sequence with `sequence()` (a single tiny
    * 1-row -> explode plan, broadcast-joined against the aggregate — no
    * shuffle added) rather than collecting to the driver.
    */
  def timeseries(df: DataFrame, timeCol: String, period: String,
                 aggs: Seq[Column], filter: Option[Column] = None,
                 zeroFill: Option[(String, String)] = None,
                 descending: Boolean = false): DataFrame = {
    val base = filter.fold(df)(df.filter)
    val bucket = DruidFunctions.timeFloor(col(timeCol), period).as("bucket")
    val agged = base.groupBy(bucket).agg(aggs.head, aggs.tail: _*)
    val filled = zeroFill match {
      case None => agged
      case Some((start, end)) =>
        val spark = df.sparkSession
        val buckets = spark.range(1).select(
          explode(sequence(
            lit(start).cast("timestamp"), lit(end).cast("timestamp"),
            expr(periodToInterval(period)))).as("bucket"))
        // aggregate side is already small (one row per bucket); broadcast it
        buckets.join(broadcast(agged), Seq("bucket"), "left")
    }
    filled.orderBy(if (descending) col("bucket").desc else col("bucket").asc)
  }

  private def periodToInterval(period: String): String = period match {
    case "P1Y"  => "interval 1 year"
    case "P3M"  => "interval 3 month"
    case "P1M"  => "interval 1 month"
    case "P1W"  => "interval 7 day"
    case "P1D"  => "interval 1 day"
    case "PT1H" => "interval 1 hour"
    case "PT1M" => "interval 1 minute"
    case "PT1S" => "interval 1 second"
    case p      => s"interval ${DruidFunctions.periodMicros(p)} microsecond"
  }

  /** TopN query (`query/topn/TopNQuery.java:52`): grouped aggregate on one
    * dimension, ordered by a metric, first K. The reference computes an
    * *approximate* per-segment top-1000 then merges; Spark's exact
    * `TakeOrderedAndProject` after partial aggregation is both correct and
    * scale-safe (K rows per partition flow to the driver, not the full
    * aggregate), so we return exact results — an accepted superset
    * (SURVEY.md §2.7).
    */
  def topN(df: DataFrame, dimension: Column, aggs: Seq[Column],
           metric: String, k: Int, filter: Option[Column] = None,
           tiebreak: Seq[Column] = Nil, ascending: Boolean = false): DataFrame = {
    val base = filter.fold(df)(df.filter)
    val metricOrder = if (ascending) col(metric).asc else col(metric).desc
    base.groupBy(dimension).agg(aggs.head, aggs.tail: _*)
      .orderBy(metricOrder +: tiebreak: _*)
      .limit(k)
  }

  /** GroupBy query (`query/groupby/GroupByQuery.java`) with the reference's
    * post-processing spec: HAVING (`having/DimFilterHavingSpec.java`) and
    * order/limit/offset (`orderby/DefaultLimitSpec.java:71`).
    */
  def groupBy(df: DataFrame, dims: Seq[Column], aggs: Seq[Column],
              filter: Option[Column] = None, having: Option[Column] = None,
              orderBy: Seq[Column] = Nil, limit: Option[Int] = None,
              offset: Int = 0): DataFrame = {
    val base = filter.fold(df)(df.filter)
    var out = base.groupBy(dims: _*).agg(aggs.head, aggs.tail: _*)
    out = having.fold(out)(out.filter)
    if (orderBy.nonEmpty) out = out.orderBy(orderBy: _*)
    if (offset > 0) out = out.offset(offset)
    limit.fold(out)(out.limit)
  }

  /** timeBoundary (`query/timeboundary/TimeBoundaryQuery.java:47`): min/max of
    * the time column. Parquet footer stats make this a metadata-only scan in
    * practice (no row materialization beyond one column).
    */
  def timeBoundary(df: DataFrame, timeCol: String): DataFrame =
    df.agg(min(col(timeCol)).as("min_time"), max(col(timeCol)).as("max_time"))

  /** dataSourceMetadata (`query/datasourcemetadata/DataSourceMetadataQuery
    * .java:43`): latest ingested timestamp + basic size facts.
    */
  def dataSourceMetadata(df: DataFrame, timeCol: String): DataFrame =
    df.agg(count(lit(1)).as("num_rows"), max(col(timeCol)).as("max_ingested_time"))

  /** Search query (`query/search/SearchQuery.java:45`): find dimension VALUES
    * matching a predicate across several dimensions, with per-value counts.
    * One pass per dimension, unioned — each pass is a pruned single-column
    * scan + partial agg, the Spark analog of the reference's
    * UseIndexesStrategy over per-value bitmaps.
    */
  def search(df: DataFrame, dims: Seq[String], contains: String,
             caseSensitive: Boolean = false): DataFrame = {
    val needle = if (caseSensitive) lit(contains) else lit(contains.toLowerCase)
    dims.map { d =>
      val v = if (caseSensitive) col(d) else lower(col(d))
      df.filter(v.contains(needle))
        .groupBy(lit(d).as("dimension"), col(d).cast("string").as("value"))
        .agg(count(lit(1)).as("cnt"))
    }.reduce(_ unionAll _).orderBy(col("dimension"), col("value"))
  }

  /** segmentMetadata analog (`query/metadata/.../SegmentMetadataQuery.java:49`):
    * per-column cardinality/null-count analysis of a table.
    */
  def segmentMetadata(df: DataFrame, columns: Seq[String]): DataFrame =
    columns.map { c =>
      df.agg(
        lit(c).as("column"),
        count(col(c)).as("non_null"),
        count_distinct(col(c)).as("cardinality"))
        .select(col("column"), col("non_null"), col("cardinality"))
    }.reduce(_ unionAll _).orderBy(col("column"))

  /** Unnest datasource (`query/UnnestDataSource.java:44`): lateral explode of
    * an array (or reference multi-value) column.
    */
  def unnest(df: DataFrame, arrayCol: Column, as: String): DataFrame =
    df.withColumn(as, explode(arrayCol))
}
