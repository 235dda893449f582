package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.DruidFunctions

/** Batch ingestion + segment management (reference: `IndexMergerV9.java:75`
  * segment writes, SQL `INSERT … PARTITIONED BY … CLUSTERED BY`
  * (`DruidSqlInsert.java:39`), rollup at ingest
  * (`OnheapIncrementalIndex.java:84`), auto-compaction
  * (`coordinator/duty/CompactSegments.java`), and per-segment aggregate
  * projections (`AggregateProjectionMetadata.java`)).
  */
object Ingest {

  /** INSERT … PARTITIONED BY <gran> CLUSTERED BY <cols>: time-chunk
    * partitioned parquet with rows sorted within partitions on the cluster
    * key, so min/max column stats make later filters on those keys prune
    * row groups. HOUR granularity lands as `__hour=yyyy-MM-dd-HH` chunk
    * dirs (the reference's hour segments); DAY and coarser land as
    * `__day=` dirs — a coarser segment granularity over a day-dir layout
    * stays prune-correct, it just splits each logical chunk into days.
    */
  def writeSegments(df: DataFrame, path: String, timeCol: String,
                    clusterBy: Seq[String], gran: String = "DAY"): Unit = {
    val (partCol, partExpr) = segmentPartition(timeCol, gran)
    df.withColumn(partCol, partExpr)
      .repartition(col(partCol))
      .sortWithinPartitions((partCol +: clusterBy).map(col): _*)
      .write.mode("overwrite").partitionBy(partCol).parquet(path)
  }

  /** Segment-granularity partition column: HOUR chunks get their own
    * column name so hour and day layouts can never be silently mixed in
    * one datasource directory.
    */
  private[graft] def segmentPartition(timeCol: String,
      gran: String): (String, Column) = gran.toUpperCase match {
    case "HOUR" => ("__hour", date_format(col(timeCol), "yyyy-MM-dd-HH"))
    case _      => ("__day", to_date(col(timeCol)))
  }

  /** Rollup at ingest (the reference's pre-aggregation of rows with equal
    * (truncated time, dims)): one groupBy on write. `metrics` are
    * (outputName, aggColumn) pairs, which must be re-aggregatable
    * (sum/count/min/max) for queries over the rollup to compose.
    */
  def rollup(df: DataFrame, timeCol: String, period: String,
             dims: Seq[String], metrics: Seq[(String, Column)]): DataFrame =
    df.groupBy((DruidFunctions.timeFloor(col(timeCol), period).as("__bucket")
      +: dims.map(col)): _*)
      .agg(metrics.head._2.as(metrics.head._1),
        metrics.tail.map { case (n, c) => c.as(n) }: _*)

  /** Bucketed segment write (reference CLUSTERED BY hash shard specs —
    * `timeline/partition/HashBasedNumberedShardSpec.java` — which co-locate
    * rows with equal keys in the same segment so joins/groupBys on the key
    * avoid data movement). Spark mapping: a bucketed table. Two tables
    * bucketed on their join key into the same bucket count join with NO
    * shuffle on either side — at 100 TB this turns every repeated fact-fact
    * join on the key into a local merge per bucket. `path` keeps the data
    * external (no warehouse copy); the catalog entry carries the bucket
    * metadata reads need.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    numBuckets: Int, bucketCol: String,
                    sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(numBuckets, bucketCol)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** REPLACE INTO … OVERWRITE ALL (reference SQL REPLACE,
    * `sql/.../parser/DruidSqlReplace.java`): the whole datasource is
    * atomically superseded by the query result.
    */
  def replaceAll(df: DataFrame, path: String, timeCol: String,
                 clusterBy: Seq[String] = Nil, gran: String = "DAY"): Unit =
    writeSegments(df, path, timeCol, clusterBy, gran)

  /** REPLACE INTO … OVERWRITE WHERE &lt;time interval&gt; (reference MSQ
    * REPLACE into time chunks, `DruidSqlReplace.java` +
    * `multi-stage-query/.../indexing/destination/DataSourceMSQDestination`
    * replaceTimeChunks): existing day segments inside [start, end) are
    * dropped and replaced by the query result; data outside the interval is
    * untouched. Matching the reference's contract:
    *   - the interval must align to the PARTITIONED BY granularity (day
    *     here) — misaligned bounds are rejected up front;
    *   - result rows outside the interval abort the ingest (the reference's
    *     InsertTimeOutOfBoundsFault), enforced per-row in-flight via
    *     assert_true — no extra validation pass over the data;
    *   - interval days that receive no new rows end up empty (dropped), not
    *     left with stale data — dynamic partition overwrite only rewrites
    *     days present in the result, so stale uncovered days are removed by
    *     comparing the bounded per-day file listing before and after.
    */
  def replaceWhere(df: DataFrame, path: String, timeCol: String,
                   startDay: String, endDay: String,
                   clusterBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val start = java.time.LocalDate.parse(startDay)
    val end = java.time.LocalDate.parse(endDay)
    require(start.isBefore(end), s"empty interval [$startDay, $endDay)")
    val days = start.toEpochDay.until(end.toEpochDay)
      .map(java.time.LocalDate.ofEpochDay).map(_.toString)
    require(days.size <= 100000, "interval too wide for per-day replace")

    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def dayDir(d: String) = new org.apache.hadoop.fs.Path(path, s"__day=$d")
    def files(d: String): Set[String] = {
      val p = dayDir(d)
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(_.getPath.getName).toSet
    }
    val before = days.map(d => d -> files(d)).toMap

    // reference InsertTimeOutOfBoundsFault: rows outside the OVERWRITE
    // WHERE interval abort the write. The assert is folded into the kept
    // partition column (assert_true yields NULL on success) so column
    // pruning cannot drop the per-row check
    val day = to_date(col(timeCol))
    val inBounds =
      day >= lit(startDay).cast("date") && day < lit(endDay).cast("date")
    val bounded = df.withColumn("__day",
      when(assert_true(inBounds, lit(
        s"REPLACE row outside OVERWRITE WHERE interval [$startDay, $endDay)"))
        .isNull, day))
    bounded.repartition(col("__day"))
      .sortWithinPartitions(("__day" +: clusterBy).map(col): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__day").parquet(path)

    // drop interval days the result did not cover (dynamic overwrite leaves
    // them untouched; the reference drops the whole replaced time chunk)
    days.foreach { d =>
      val now = files(d)
      if (now.nonEmpty && now == before(d)) fs.delete(dayDir(d), true)
    }
  }

  /** Kill task (reference `indexing-service/.../task/KillUnusedSegmentsTask`
    * / `DELETE /druid/coordinator/v1/datasources/{ds}/intervals/{interval}`):
    * drop the day segments inside [startDay, endDay). Directory-level
    * deletes — cost proportional to the interval, the data never scans.
    */
  def dropSegments(spark: SparkSession, path: String,
                   startDay: String, endDay: String): Int = {
    val start = java.time.LocalDate.parse(startDay)
    val end = java.time.LocalDate.parse(endDay)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    var dropped = 0
    var d = start
    while (d.isBefore(end)) {
      val p = new org.apache.hadoop.fs.Path(path, s"__day=$d")
      if (fs.exists(p)) { fs.delete(p, true); dropped += 1 }
      d = d.plusDays(1)
    }
    dropped
  }

  /** The auto-compaction DUTY (reference coordinator `CompactSegments.java`
    * with `NewestSegmentFirstPolicy.java`): scan a partition-dir-per-chunk
    * warehouse, newest chunks first, and compact ONLY the fragmented ones —
    * strictly more files than ceil(total/targetBytes) would need. Chunks
    * already at the target layout are skipped, so repeated runs are
    * idempotent no-ops (the reference tracks this via compaction state on
    * segments; here the file layout itself is the state). Each selected
    * chunk is rewritten with a narrow `coalesce` into a staging dir OUTSIDE
    * the scanned root, then swapped in with checked delete+rename — no
    * shuffle, the 100-TB-safe shape for small-file consolidation (a
    * transactional table format makes the swap atomic in production).
    *
    * @return the compacted partition paths (newest first)
    */
  def autoCompact(spark: SparkSession, root: String, targetBytes: Long,
                  maxChunks: Int = Int.MaxValue): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) return Seq.empty
    val chunks = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .sortBy(_.getPath.getName)(Ordering[String].reverse) // newest first
    val fragmented = chunks.flatMap { c =>
      val files = fs.listStatus(c.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      val total = files.map(_.getLen).sum
      val targetFiles = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
      // fragmented = strictly more files than the target layout needs —
      // selecting on average size alone would re-rewrite every
      // multi-target-size chunk forever (never idempotent)
      if (files.length > targetFiles) Some((c.getPath, targetFiles))
      else None
    }
    fragmented.take(maxChunks).map { case (p, nFiles) =>
      // staging dir OUTSIDE the scanned root: a tmp dir inside it would be
      // picked up by concurrent reads of the root (and by the next duty
      // run) as a chunk of its own
      val tmp = new org.apache.hadoop.fs.Path(
        rootPath.getParent, s".compacting__${rootPath.getName}__${p.getName}")
      fs.delete(tmp, true)
      spark.read.parquet(p.toString).coalesce(nFiles)
        .write.mode("overwrite").parquet(tmp.toString)
      if (!fs.delete(p, true))
        throw new java.io.IOException(s"autoCompact: failed to remove $p")
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(
          s"autoCompact: rename $tmp -> $p failed; compacted data is at $tmp")
      p.toString
    }
  }

  /** Retention rules (reference coordinator `RunRules.java` with
    * `loadByPeriod`/`dropForever` rules, `docs/operations/rule-configuration.md`):
    * keep the newest `keepDays` day-chunks as of `asOfDay`, drop everything
    * older. Metadata-only: decides from directory names, deletes whole
    * chunks — never reads data. Returns dropped chunk paths.
    */
  def applyRetention(spark: SparkSession, root: String, keepDays: Int,
                     asOfDay: String): Seq[String] = {
    require(keepDays > 0, s"keepDays must be positive, got $keepDays")
    val cutoff = java.time.LocalDate.parse(asOfDay).minusDays(keepDays - 1L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) return Seq.empty
    fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__day="))
      .filter { s =>
        val day = s.getPath.getName.stripPrefix("__day=")
        try java.time.LocalDate.parse(day).isBefore(cutoff)
        catch { case _: java.time.format.DateTimeParseException => false }
      }
      .sortBy(_.getPath.getName)
      .map { s => fs.delete(s.getPath, true); s.getPath.toString }
  }

  /** Auto-compaction: rewrite a (possibly many-small-files) table into
    * ~targetRowsPerFile files per partition — the reference coordinator's
    * CompactSegments duty as a batch job.
    */
  def compact(spark: SparkSession, path: String, targetRowsPerFile: Long): Unit = {
    val df = spark.read.parquet(path)
    val tmp = path.stripSuffix("/") + "__compacting"
    // single pass: REBALANCE lets AQE coalesce/split the shuffle into
    // advisory-sized partitions and maxRecordsPerFile caps rows per file —
    // no exact pre-count (which would read the whole input twice at scale)
    df.hint("rebalance")
      .write.option("maxRecordsPerFile", targetRowsPerFile)
      .mode("overwrite").parquet(tmp)
    // atomic-ish swap (real deployments use a transactional table format)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
  }

  /** EXPORT (reference MSQ `EXPORT ... INTO extern(...)`,
    * `sql/.../parser/DruidSqlInsert.java` export path): write a query
    * result to external files in the requested format. Coalesced to
    * `numFiles` so the export lands as a few well-sized files rather than
    * one per shuffle partition.
    */
  def export(df: DataFrame, path: String, format: String = "csv",
             numFiles: Int = 1): Unit = {
    val w = df.coalesce(numFiles).write.mode("overwrite")
    format match {
      case "csv"     => w.option("header", "true").csv(path)
      case "json"    => w.json(path)
      case "parquet" => w.parquet(path)
      case "orc"     => w.orc(path)
      case other => throw new IllegalArgumentException(s"unsupported export format: $other")
    }
  }

  /** Nested-column shredding at ingest (reference COMPLEX&lt;json&gt; columns:
    * `processing/.../nested/NestedDataColumnSerializer.java` discovers each
    * nested field and stores it as a real column with its own dictionary and
    * indexes). Spark mapping: infer a union schema for the JSON string
    * column from a bounded sample (`spark.read.json` merges object shapes
    * across rows), then `from_json` into a typed struct — written to
    * parquet, every nested field becomes a true leaf column with min/max
    * stats, predicate pushdown, and column pruning, which is exactly the
    * capability the reference's nested columns buy at scale.
    *
    * The sample is bounded (driver holds `sampleRows` JSON strings, not the
    * table); production pipelines with contracted schemas pass `schema`
    * explicitly and skip inference entirely.
    */
  def shredJson(df: DataFrame, jsonCol: String, shreddedCol: String,
                sampleRows: Int = 1000,
                schema: Option[org.apache.spark.sql.types.DataType] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val inferred = schema.getOrElse {
      val sample = df.select(col(jsonCol)).na.drop()
        .limit(sampleRows).as[String].collect()
      spark.read.json(sample.toSeq.toDS()).schema
    }
    df.withColumn(shreddedCol, from_json(col(jsonCol), inferred))
  }

  /** Ingest-time flattenSpec (reference `JSONPathSpec`/`FlattenSpec` —
    * `processing/.../data/input/impl/JSONPathSpec.java`, exercised by the
    * qaJsonCols `ingest_flatten_spec`/`ingest_schmdisc_flatten_spec`
    * suites): explicit JSONPath-addressed fields become named columns,
    * and `useFieldDiscovery` additionally surfaces every top-level
    * primitive not already claimed by an explicit field. Values land as
    * strings, matching the reference's default string-dimension ingest;
    * missing paths are NULL. Pure projections — codegen'd, no shuffle.
    *
    * Field spec: (name, path) with path in `get_json_object` syntax
    * (`$.a.b[0]` — the reference's "path" type; a bare `$.name` is its
    * "root" type).
    */
  def flattenJson(df: DataFrame, jsonCol: String,
                  fields: Seq[(String, String)],
                  useFieldDiscovery: Boolean = false,
                  sampleRows: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // an extracted field must not overwrite an input column — the
    // reference errors on flattenSpec names colliding with existing
    // dimensions, and silently clobbering jsonCol itself would corrupt
    // every later extraction in the fold
    val existing = df.columns.toSet
    fields.find(f => existing.contains(f._1)).foreach { case (name, _) =>
      throw new IllegalArgumentException(
        s"flattenSpec field '$name' collides with an existing column")
    }
    // duplicate names within the spec would silently overwrite each other
    // in the fold below (last wins) — the reference errors on them
    fields.groupBy(_._1).collectFirst { case (name, fs) if fs.size > 1 =>
      throw new IllegalArgumentException(
        s"flattenSpec field '$name' is defined ${fs.size} times")
    }
    val discovered: Seq[(String, String)] =
      if (!useFieldDiscovery) Nil
      else {
        val sample = df.select(col(jsonCol)).na.drop()
          .limit(sampleRows).as[String].collect()
        // discovery must not clobber either explicit fields OR columns the
        // DataFrame already has (a top-level JSON key named like an input
        // column would silently replace real data)
        val claimed = fields.map(_._1).toSet ++ existing
        spark.read.json(sample.toSeq.toDS()).schema.fields.toSeq
          .filter(f => f.dataType match {
            case _: org.apache.spark.sql.types.StructType => false
            case _: org.apache.spark.sql.types.ArrayType  => false
            case _                                        => true
          })
          // building "$.<key>" from a raw discovered key breaks for keys
          // containing JSONPath metacharacters (dots/brackets/spaces/
          // quotes): get_json_object would parse them as path structure
          // and silently yield NULL columns — address those as $['key']
          // (bracket-notation, which get_json_object accepts), and skip
          // keys embedding a single quote (not expressible in either form)
          .filter(f => !f.name.contains("'"))
          .map { f =>
            val safe = f.name.forall(c => c.isLetterOrDigit || c == '_')
            f.name -> (if (safe) s"$$.${f.name}" else s"$$['${f.name}']")
          }
          .filterNot(f => claimed.contains(f._1))
      }
    (fields ++ discovered).foldLeft(df) { case (d, (name, path)) =>
      d.withColumn(name, get_json_object(col(jsonCol), path))
    }
  }
}

/** Aggregate-projection catalog (reference `AggregateProjectionMetadata`):
  * pre-rolled-up tables registered against their base table; queries built
  * through [[ProjectionCatalog.timeseries]] are transparently rerouted to
  * the narrowest registered projection that can answer them — the reference
  * picks projections per-segment at cursor time, we pick per-query at plan
  * time. Reroute correctness requires the projection's metrics to be
  * re-aggregatable partials (sums/counts/min/max).
  */
object ProjectionCatalog {
  case class Projection(baseTable: String, period: String, dims: Set[String],
                        metrics: Set[String], df: DataFrame)

  private val projections =
    scala.collection.concurrent.TrieMap[String, Projection]()

  def register(name: String, p: Projection): Unit = projections.put(name, p)
  def clear(): Unit = projections.clear()

  /** Can `p` answer a query at `period` grouping by `dims` over `metrics`?
    * Needs: same-or-finer granularity that nests evenly, and a superset of
    * dims+metrics.
    */
  private[graft] def covers(p: Projection, baseTable: String, period: String,
                                dims: Seq[String], metrics: Seq[String]): Boolean =
    p.baseTable == baseTable &&
      dims.toSet.subsetOf(p.dims) && metrics.toSet.subsetOf(p.metrics) &&
      nests(p.period, period)

  private def nests(finer: String, coarser: String): Boolean =
    (finer == coarser) || {
      val calendarOrder = Seq("PT1S", "PT1M", "PT1H", "P1D", "P1M", "P3M", "P1Y")
      val fi = calendarOrder.indexOf(finer)
      val ci = calendarOrder.indexOf(coarser)
      if (fi >= 0 && ci >= 0) fi <= ci
      else try {
        DruidFunctions.periodMicros(coarser) % DruidFunctions.periodMicros(finer) == 0
      } catch { case _: IllegalArgumentException => false }
    }

  /** Timeseries over `base`, rerouted to a registered projection when one
    * covers the ask. `metrics` are (outName, baseColumn) pairs where outName
    * is the projection's partial-sum column (COUNT re-aggregates as the SUM
    * of the rollup's count column).
    */
  def timeseries(base: DataFrame, baseTable: String, timeCol: String,
                 period: String, dims: Seq[String],
                 metrics: Seq[(String, String)]): DataFrame = {
    val outNames = metrics.map(_._1)
    val hit = projections.values.find(
      covers(_, baseTable, period, dims, outNames))
    hit match {
      case Some(p) =>
        // re-aggregate the stored partials at the coarser bucket
        p.df.groupBy((DruidFunctions.timeFloor(col("__bucket"), period)
          .as("bucket") +: dims.map(col)): _*)
          .agg(sum(col(outNames.head)).as(outNames.head),
            outNames.tail.map(m => sum(col(m)).as(m)): _*)
      case None =>
        base.groupBy((DruidFunctions.timeFloor(col(timeCol), period)
          .as("bucket") +: dims.map(col)): _*)
          .agg(sum(col(metrics.head._2)).as(metrics.head._1),
            metrics.tail.map { case (o, b) => sum(col(b)).as(o) }: _*)
    }
  }
}
