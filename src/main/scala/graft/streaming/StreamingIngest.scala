package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming ingest (reference: Kafka/Kinesis supervisors →
  * `SeekableStreamIndexTaskRunner.java:150` → realtime incremental index →
  * segment handoff).
  *
  * Spark mapping (SURVEY.md §2.10): Structured Streaming source → optional
  * rollup aggregation at a query granularity (the reference's only stateful
  * op) → sink. Exactly-once comes from checkpointed offsets + idempotent
  * sink (foreachBatch txn on Delta in production; parquet-append here).
  * Late data lands in old time buckets naturally — the same semantics as the
  * reference's lateMessageRejectionPeriod-less default.
  */
object StreamingIngest {

  /** File-based streaming source over a parquet path (stands in for Kafka in
    * this container; swap `readStream.format("kafka")` in production).
    */
  def source(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Rollup at ingest (reference `OnheapIncrementalIndex.java:84`): truncate
    * event time to the query granularity, pre-aggregate dims. Tumbling window
    * == reference granularity buckets; watermark bounds state.
    */
  def rollup(stream: DataFrame, timeCol: String, granularity: String,
             dims: Seq[String], watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(timeCol, watermark)
      .groupBy((window(col(timeCol), granularity).getField("start").as("bucket")
        +: dims.map(col)): _*)
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Checkpointed parquet sink: source offsets are committed in the
    * checkpoint atomically with batch completion, so a restarted query
    * resumes after the last durable batch instead of re-ingesting —
    * the engine's analog of the reference committing Kafka offsets with the
    * segment publish (`SequenceMetadata.java`). Production targets a
    * transactional table format; the contract (checkpoint + idempotent
    * append) is the same.
    */
  def startSink(stream: DataFrame, outPath: String,
                checkpointPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming exact dedup: drop events whose key was already seen, with
    * the dedup state bounded by the watermark (keys older than the
    * watermark are evicted — without it state grows forever at corpus
    * scale). The streaming analog of `pipeline/Dedup.exact`, and the
    * standard guard against at-least-once upstream delivery (e.g. Kafka
    * producer retries).
    */
  def dedup(stream: DataFrame, timeCol: String, keyCols: Seq[String],
            watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Queryable-in-flight ingestion — the reference's StreamAppenderator
    * (`server/.../realtime/appenderator/StreamAppenderator.java:119`), where
    * a query scatters over BOTH realtime (ingested, not yet handed off) and
    * historical (published) segments.
    *
    * Two storage tiers: every micro-batch lands in `stagingPath` inside
    * foreachBatch — queryable the moment the batch completes, before any
    * handoff — and [[publish]] later moves staged files into the committed
    * table (the handoff/publish step). [[view]] unions the tiers, so a
    * reader sees each row exactly once at every point in the lifecycle.
    * Both tiers are distributed parquet: no driver-side buffering, so the
    * in-flight tier scales with the cluster exactly like the committed one
    * (the reference holds realtime rows in node-local incremental indexes —
    * same shape, executor-written files instead of heap).
    */
  object Appenderator {

    /** Start ingesting a stream into the staging tier. Batch replays after
      * restart overwrite their own `batch=<id>` directory, keeping the
      * staging tier idempotent (exactly-once on top of checkpointed
      * offsets, like the reference committing offsets with the segment).
      */
    def start(stream: DataFrame, stagingPath: String, checkpointPath: String)
        : org.apache.spark.sql.streaming.StreamingQuery =
      stream.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.write.mode("overwrite").parquet(s"$stagingPath/batch=$id")
          ()
        }
        .option("checkpointLocation", checkpointPath)
        .trigger(Trigger.AvailableNow())
        .start()

    private def readIfExists(spark: SparkSession, path: String,
                             schema: StructType): DataFrame = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        spark.read.schema(schema).parquet(s"$path/*")
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

    /** The realtime+historical scatter: committed ∪ staged, each row seen
      * exactly once whichever side of the handoff it is on.
      */
    def view(spark: SparkSession, committedPath: String, stagingPath: String,
             schema: StructType): DataFrame =
      readIfExists(spark, committedPath, schema)
        .unionByName(readIfExists(spark, stagingPath, schema))

    /** Segment handoff: move every staged batch into the committed table
      * and clear staging — a metadata/file operation, no data rewrite
      * (the reference's handoff also just republishes the built segment).
      */
    def publish(spark: SparkSession, stagingPath: String,
                committedPath: String): Unit = {
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = org.apache.hadoop.fs.FileSystem.get(conf)
      val staging = new org.apache.hadoop.fs.Path(stagingPath)
      val committed = new org.apache.hadoop.fs.Path(committedPath)
      if (!fs.exists(committed)) { fs.mkdirs(committed); () }
      if (fs.exists(staging)) {
        fs.listStatus(staging).foreach { batchDir =>
          fs.listStatus(batchDir.getPath)
            .filter(_.getPath.getName.endsWith(".parquet"))
            .foreach { f =>
              fs.rename(f.getPath, new org.apache.hadoop.fs.Path(committed,
                s"${batchDir.getPath.getName}-${f.getPath.getName}"))
            }
        }
        fs.delete(staging, true)
        ()
      }
    }
  }

  /** Reference lateMessageRejectionPeriod / earlyMessageRejectionPeriod
    * (`SeekableStreamSupervisorIOConfig`): drop records whose event time
    * falls outside [processing time − late, processing time + early] at
    * READ time. Deliberately processing-time-relative (that is the
    * reference contract): a replayed backlog is rejected, which is the
    * point — it protects realtime segments from ancient data.
    */
  def rejectOutOfPeriod(stream: DataFrame, timeCol: String,
                        latePeriod: Option[String],
                        earlyPeriod: Option[String]): DataFrame = {
    val lateOk = latePeriod.map(p =>
      col(timeCol) >= current_timestamp() - expr(s"INTERVAL $p"))
    val earlyOk = earlyPeriod.map(p =>
      col(timeCol) <= current_timestamp() + expr(s"INTERVAL $p"))
    (lateOk.toSeq ++ earlyOk.toSeq).reduceOption(_ && _)
      .map(stream.filter).getOrElse(stream)
  }

  /** One emitted session: a maximal run of events for `key` with no
    * inter-event gap exceeding the threshold.
    */
  case class Session(key: String, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long)

  // public: Dataset encoders generate bytecode that constructs these from
  // outside the enclosing object, so they cannot be private
  case class SessionEvent(key: String, ts: java.sql.Timestamp)
  case class OpenSession(startMs: Long, lastMs: Long, n: Long)

  /** Streaming sessionization — the custom-state op the built-in windowed
    * aggregates cannot express (session bounds depend on the DATA, not a
    * fixed grid): `flatMapGroupsWithState` keeps one `OpenSession` per key,
    * closes it when a later event arrives past the inactivity gap, and an
    * event-time timeout flushes idle sessions once the watermark passes
    * `last + gap`. State is O(keys) regardless of event volume, and the
    * watermark bounds it — the shape that survives a 1000-executor stream.
    *
    * Returns append-mode rows of [[Session]].
    */
  def sessionize(stream: DataFrame, timeCol: String, keyCol: String,
                 gapMinutes: Int = 30,
                 watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val typed = stream
      .select(col(keyCol).cast("string").as("key"),
        col(timeCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[SessionEvent]
    typed.groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, events, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: flush
            val s = state.get
            state.remove()
            Iterator.single(Session(key,
              new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs), s.n))
          } else {
            // events within a batch arrive unordered; sessionize in time order
            val sorted = events.map(_.ts.getTime).toArray.sorted
            var open = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { t =>
              open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  open = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
                case Some(s) =>
                  closed += Session(key, new java.sql.Timestamp(s.startMs),
                    new java.sql.Timestamp(s.lastMs), s.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.iterator
          }
      }.toDF()
  }

  /** Run a bounded micro-batch pass to completion over a prepared streaming
    * DataFrame and return the rolled-up result as a batch DataFrame (memory
    * sink — used by tests and the correctness gate; production writes Delta).
    */
  /** Ingest-time transform + lookup enrichment (the reference's
    * transformSpec with `lookup()` — applied per row by the indexing task
    * before rows reach the incremental index): a stream-static join against
    * a dimension snapshot. The static side is explicitly broadcast, so each
    * micro-batch probes a per-executor hash map — no stream shuffle, no
    * streaming state — which is the only shape that holds when the stream
    * side is 100 TB/day and the lookup is a few MB.
    */
  def enrich(stream: DataFrame, dim: DataFrame,
             joinExpr: Column, joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), joinExpr, joinType)

  /** Stream-stream INTERVAL join — funnel attribution (click → purchase
    * within a horizon), a Spark Structured Streaming capability beyond the
    * reference's stream model (its joins are stream × broadcast only).
    * Both sides carry watermarks; the time-range predicate
    * `left.time <= right.time < left.time + horizon` bounds the join state,
    * so Spark evicts buffered rows once the watermark passes
    * `time + horizon` — O(in-horizon rows) state, not O(stream). At 100 TB
    * rates the state is horizon-bounded per key and the join shuffles both
    * sides on the key once, exactly like the batch equi-join it must equal
    * on closed data (StreamingSpec pins that equality).
    *
    * @param left       the triggering stream (e.g. clicks)
    * @param right      the outcome stream (e.g. purchases)
    * @param keyCol     equi-join key on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param horizon    attribution window, e.g. "30 minutes"
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTime: String, rightTime: String,
                   horizon: String): DataFrame = {
    val l = left.withWatermark(leftTime, horizon).alias("l")
    val r = right.withWatermark(rightTime, horizon).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTime") >= col(s"l.$leftTime") &&
        col(s"r.$rightTime") < col(s"l.$leftTime") + expr(s"INTERVAL $horizon"))
  }

  /** Bounded one-pass micro-batch run of the standard rollup (memory sink,
    * AvailableNow), returning the rolled-up table for oracle comparison.
    */
  def runBounded(spark: SparkSession, stream: DataFrame,
                 timeCol: String, granularity: String, dims: Seq[String],
                 queryName: String): DataFrame =
    runBoundedAgg(spark, rollup(stream, timeCol, granularity, dims), queryName)

  /** Bounded one-pass run of an already-built streaming aggregate (memory
    * sink, AvailableNow): the harness for gates that compose their own
    * enrich/transform before the rollup.
    */
  def runBoundedAgg(spark: SparkSession, agg: DataFrame,
                    queryName: String): DataFrame = {
    // stateful streaming opens one state store per shuffle partition per
    // micro-batch; for a bounded single-batch pass 32 store inits are pure
    // overhead — run the stateful stage narrow, restore the session conf
    // after (a long-lived production query sizes this to key cardinality)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
