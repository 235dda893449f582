package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

case class StreamE(user_id: Long, tsMillis: Long)
case class StreamSession(user_id: Long, n: Int, startMillis: Long, endMillis: Long)

/** Structured Streaming coverage (SURVEY.md §2.10): granularity rollup
  * equals the batch result, sliding windows work, and stateful
  * sessionization via flatMapGroupsWithState (a Spark extra beyond the
  * reference's ingest-rollup-only model).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def eventsStream = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    Tables.normalizeTs(
      StreamingIngest.source(spark, s"$dir/events*.parquet", schema))
  }

  test("streaming rollup equals batch rollup") {
    spark.sparkContext.setLogLevel("ERROR")
    val streamed = StreamingIngest.runBounded(spark, eventsStream,
      "ts", "1 hour", Seq("event_type"), "stream_spec_rollup")
      .select("bucket", "event_type", "n")
    val batch = Tables.load(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-static enrich equals batch join and broadcasts the dim") {
    spark.sparkContext.setLogLevel("ERROR")
    val dim = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val stream = eventsStream.withColumn("nk", pmod(col("user_id"), lit(25)))
    val enriched = StreamingIngest.enrich(stream, dim,
      col("nk") === col("n_nationkey"))
    val streamed = StreamingIngest.runBoundedAgg(spark,
      StreamingIngest.rollup(enriched, "ts", "1 day", Seq("n_name")),
      "stream_spec_enrich").select("bucket", "n_name", "n")
    val batch = Tables.load(spark, dir, "events")
      .withColumn("nk", pmod(col("user_id"), lit(25)))
      .join(dim, col("nk") === col("n_nationkey"), "left")
      .groupBy(date_trunc("day", col("ts")).as("bucket"), col("n_name"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // the join itself must be broadcast — the stream side never shuffles
    // to co-locate with the dimension (the raw logical plan carries the
    // hint; optimized/executed plans can't be forced on a streaming DF)
    val plan = enriched.queryExecution.logical.toString
    assert(plan.toLowerCase.contains("hint"),
      s"dim side must carry a broadcast hint:\n$plan")
  }

  test("supervisor lifecycle: submit/suspend/resume is exactly-once across restarts") {
    import graft.streaming.Supervisors
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sup").toString
    val srcDir = s"$root/src"; val outDir = s"$root/out"; val ck = s"$root/ck"
    new java.io.File(srcDir).mkdirs()
    def writeBatch(name: String, rows: Seq[(String, String, Double)]): Unit =
      rows.toDF("tss", "event_type", "value")
        .selectExpr("CAST(tss AS TIMESTAMP) AS ts", "event_type", "value")
        .repartition(1).write.parquet(s"$srcDir/$name")
    val fileA = Seq(
      ("2024-01-01 00:05:00", "click", 1.0), ("2024-01-01 00:10:00", "view", 2.0),
      ("2024-01-01 01:05:00", "click", 3.0), ("2024-01-01 02:05:00", "view", 4.0))
    writeBatch("a", fileA)

    val schema = spark.read.parquet(s"$srcDir/a").schema
    val spec = Supervisors.SupervisorSpec("sup1", s"$srcDir/*/*.parquet",
      schema, "ts", "1 hour", Seq("event_type"), outDir, ck)
    val st0 = Supervisors.submit(spark, spec)
    assert(st0.state == Supervisors.Running)
    Supervisors.awaitDrained("sup1")
    val st1 = Supervisors.suspend("sup1")
    assert(st1.state == Supervisors.Suspended)
    // a suspended supervisor still appears in sys.supervisors
    val sysRow = graft.operators.Metadata.supervisors(spark)
      .filter(col("supervisor_id") === "sup1").collect()
    assert(sysRow.length == 1 && sysRow(0).getAs[Boolean]("suspended"),
      sysRow.mkString(","))

    // new data lands while suspended; its timestamps push the watermark
    // past every file-A bucket, so those buckets must emit exactly once
    writeBatch("b", Seq(("2024-01-01 05:00:00", "click", 5.0)))
    assert(Supervisors.resume(spark, "sup1").state == Supervisors.Running)
    Supervisors.awaitDrained("sup1")
    Supervisors.suspend("sup1")
    writeBatch("c", Seq(("2024-01-01 07:00:00", "view", 6.0)))
    Supervisors.resume(spark, "sup1")
    Supervisors.awaitDrained("sup1")
    assert(Supervisors.list().contains("sup1"))
    Supervisors.terminate("sup1")
    assert(!Supervisors.list().contains("sup1"))

    val out = spark.read.parquet(outDir)
    // exactly-once: a replayed batch after resume would duplicate buckets
    val dups = out.groupBy("bucket", "event_type").count().filter(col("count") > 1)
    assert(dups.isEmpty, "duplicate (bucket, dim) rows — resume replayed data")
    // completeness: every file-A bucket is closed by the later watermark
    // and must be present with the batch-exact aggregate
    val emitted = out.select(date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss"),
      col("event_type"), col("n"), col("sum_value")).as[(String, String, Long, Double)]
      .collect().toSet
    assert(emitted.contains(("2024-01-01 00:00:00", "click", 1L, 1.0)), emitted.toString)
    assert(emitted.contains(("2024-01-01 00:00:00", "view", 1L, 2.0)))
    assert(emitted.contains(("2024-01-01 01:00:00", "click", 1L, 3.0)))
    assert(emitted.contains(("2024-01-01 02:00:00", "view", 1L, 4.0)))
  }

  test("supervisor batchesCompleted does not double-count across suspend/resume") {
    // batchId is checkpoint-scoped and CONTINUES across suspend/resume, so
    // a supervisor that banks the cumulative counter at each suspend and
    // adds the live counter on top reports ~2x after one cycle. The true
    // count is the checkpoint's own offset ledger: one offsets/<batchId>
    // file per committed batch.
    import graft.streaming.Supervisors
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_supbc").toString
    val srcDir = s"$root/src"; new java.io.File(srcDir).mkdirs()
    def writeBatch(name: String, ts: String, v: Double): Unit =
      Seq((ts, "click", v)).toDF("tss", "event_type", "value")
        .selectExpr("CAST(tss AS TIMESTAMP) AS ts", "event_type", "value")
        .repartition(1).write.parquet(s"$srcDir/$name")
    writeBatch("a", "2024-01-01 00:05:00", 1.0)
    val schema = spark.read.parquet(s"$srcDir/a").schema
    val spec = Supervisors.SupervisorSpec("supbc", s"$srcDir/*/*.parquet",
      schema, "ts", "1 hour", Seq("event_type"), s"$root/out", s"$root/ck")
    Supervisors.submit(spark, spec)
    Supervisors.awaitDrained("supbc")
    val afterFirst = Supervisors.suspend("supbc").batchesCompleted
    writeBatch("b", "2024-01-01 05:00:00", 2.0)
    Supervisors.resume(spark, "supbc")
    Supervisors.awaitDrained("supbc")
    val afterSecond = Supervisors.suspend("supbc").batchesCompleted
    Supervisors.terminate("supbc")
    def ledger: Long = new java.io.File(s"$root/ck/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit)).toLong
    assert(afterSecond == ledger,
      s"batchesCompleted $afterSecond != checkpoint ledger $ledger " +
        s"(first-cycle count was $afterFirst — a 2x value means the " +
        "cumulative batchId was re-banked on resume)")
    assert(afterSecond >= afterFirst)
  }

  test("stream-stream interval join equals the batch join on closed data") {
    // funnel attribution: purchases within 30 minutes of a click by the
    // same user. On a fully-drained bounded input the streaming interval
    // join must produce exactly the batch join's matches.
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    def writeSide(name: String, rows: Seq[(Long, String)]): String = {
      val p = s"$root/$name"
      rows.toDF("user_id", "tss")
        .selectExpr("user_id", "CAST(tss AS TIMESTAMP) AS ts")
        .repartition(1).write.parquet(p)
      p
    }
    val clicks = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"),
      (2L, "2024-01-01 10:05:00"), (3L, "2024-01-01 10:10:00"))
    val purchases = Seq(
      (1L, "2024-01-01 10:20:00"),  // within 30m of click 1a only
      (1L, "2024-01-01 11:29:59"),  // within 30m of click 1b
      (2L, "2024-01-01 10:35:00"),  // exactly at 10:05+30m → EXCLUDED
      (2L, "2024-01-01 10:34:59"),  // inside
      (4L, "2024-01-01 10:00:00"))  // no matching click key
    val cp = writeSide("clicks", clicks)
    val pp = writeSide("purch", purchases)
    val cs = spark.readStream.schema(spark.read.parquet(cp).schema).parquet(cp)
      .withColumnRenamed("ts", "click_ts")
    val ps = spark.readStream.schema(spark.read.parquet(pp).schema).parquet(pp)
      .withColumnRenamed("ts", "purchase_ts")
    val joined = StreamingIngest.intervalJoin(cs, ps, "user_id",
      "click_ts", "purchase_ts", "30 minutes")
      .select(col("l.user_id").as("user_id"), col("click_ts"), col("purchase_ts"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ssj_out")
    val cb = spark.read.parquet(cp).withColumnRenamed("ts", "click_ts").alias("l")
    val pb = spark.read.parquet(pp).withColumnRenamed("ts", "purchase_ts").alias("r")
    val batch = cb.join(pb,
      col("l.user_id") === col("r.user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 30 minutes"))
      .select(col("l.user_id").as("user_id"), col("click_ts"), col("purchase_ts"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"streamed=${streamed.collect().mkString(";")} batch=${batch.collect().mkString(";")}")
    // the expected match set, explicitly: 3 attributed pairs (1@10:20,
    // 1@11:29:59, 2@10:34:59 — the exact-boundary 2@10:35:00 is excluded)
    assert(streamed.count() == 3)
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    // events replayed twice (same files via a 2-path glob is not possible
    // here, so duplicate by unioning the stream with itself per batch is
    // not either) — instead dedup the raw stream on event_id: already
    // unique, so row count must equal the batch count; then dedup on
    // user_id, which must collapse to the distinct user count
    val byEvent = StreamingIngest.dedup(eventsStream, "ts", Seq("event_id"))
    val q1 = byEvent.writeStream.format("memory").queryName("dedup_ev")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q1.processAllAvailable(); q1.stop()
    val byUser = StreamingIngest.dedup(eventsStream, "ts", Seq("user_id"),
      watermark = "30 days")
    val q2 = byUser.writeStream.format("memory").queryName("dedup_user")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    val batch = Tables.load(spark, dir, "events")
    assert(spark.table("dedup_ev").count() == batch.count())
    assert(spark.table("dedup_user").count() ==
      batch.select("user_id").distinct().count())
  }

  test("sliding window aggregation (Spark extra beyond tumbling rollup)") {
    val agg = eventsStream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("stream_spec_sliding").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("stream_spec_sliding")
    // each event lands in exactly 2 sliding windows
    val total = rows.agg(sum("n")).head().getLong(0)
    assert(total == 2000L, s"total $total")
  }

  test("checkpointed sink is exactly-once across restarts") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val q1 = StreamingIngest.startSink(eventsStream, out, ckpt)
    q1.awaitTermination()
    assert(spark.read.parquet(out).count() == 1000)
    // "restart": same source + same checkpoint → offsets already committed,
    // nothing is re-ingested
    val q2 = StreamingIngest.startSink(eventsStream, out, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 1000)
  }

  test("appenderator: in-flight rows are queryable before handoff") {
    import StreamingIngest.Appenderator
    val staging = java.nio.file.Files.createTempDirectory("graft_stage").toString + "/s"
    val committed = java.nio.file.Files.createTempDirectory("graft_commit").toString + "/c"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_app_ckpt").toString
    val schema = Tables.load(spark, dir, "events").schema

    // ingest: rows land in staging — no publish/handoff has happened
    val q = Appenderator.start(eventsStream, staging, ckpt)
    q.awaitTermination()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(committed)))
    // the realtime+historical scatter view sees the in-flight rows NOW
    val mid = Appenderator.view(spark, committed, staging, schema)
    assert(mid.count() == 1000)

    // handoff: staged batches move to the committed table; the view is
    // unchanged (each row exactly once, now from the historical side)
    Appenderator.publish(spark, staging, committed)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(staging)))
    val after = Appenderator.view(spark, committed, staging, schema)
    assert(after.count() == 1000)
    assert(spark.read.parquet(committed).count() == 1000)

    // restart replay with the same checkpoint re-ingests nothing
    val q2 = Appenderator.start(eventsStream, staging, ckpt)
    q2.awaitTermination()
    assert(Appenderator.view(spark, committed, staging, schema).count() == 1000)
  }

  test("stateful sessionization via flatMapGroupsWithState") {
    import spark.implicits._
    val ds: Dataset[StreamE] = eventsStream
      .select(col("user_id"), (unix_micros(col("ts")).cast("long") / lit(1000L)).cast("long").as("tsMillis"))
      .as[StreamE]

    def fn(user: Long, events: Iterator[StreamE],
           state: GroupState[List[Long]]): Iterator[StreamSession] = {
      val all = (state.getOption.getOrElse(Nil) ++ events.map(_.tsMillis)).sorted
      // 30-minute gap closes a session
      val sessions = all.foldLeft(List.empty[List[Long]]) {
        case (acc, t) if acc.nonEmpty && t - acc.head.head <= 30 * 60 * 1000 =>
          (t :: acc.head) :: acc.tail
        case (acc, t) => List(t) :: acc
      }
      state.update(Nil)
      sessions.reverseIterator.map(s =>
        StreamSession(user, s.size, s.min, s.max))
    }

    val q = ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_spec_sessions").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("stream_spec_sessions")
    assert(sessions.count() > 0)
    // sessions must cover every event exactly once
    assert(sessions.agg(sum("n")).head().getLong(0) == 1000L)
  }

  test("StreamingIngest.sessionize closes sessions on gap and watermark timeout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val stream = graft.streaming.StreamingIngest.sessionize(
      in.toDF().toDF("k", "t"), "t", "k", gapMinutes = 30, watermark = "1 minutes")
    // default micro-batch trigger: AvailableNow would stop after the data
    // present at start, never seeing the second batch
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("lib_sessions").start()
    // batch 1: user a has two bursts separated by >30min (first closes
    // in-batch), user b one burst
    in.addData(("a", ts(0)), ("a", ts(10)), ("a", ts(60)), ("b", ts(5)))
    q.processAllAvailable()
    // batch 2: event far in the future advances the watermark past every
    // open session's last + gap → the timeout flushes a's second burst and b
    in.addData(("c", ts(10000)))
    q.processAllAvailable()
    q.stop()
    val done = spark.table("lib_sessions")
      .select("key", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    assert(done.contains(("a", ts(0), ts(10), 2L)), s"in-batch close: $done")
    assert(done.contains(("a", ts(60), ts(60), 1L)), s"timeout flush: $done")
    assert(done.contains(("b", ts(5), ts(5), 1L)), s"timeout flush b: $done")
  }

  test("rejectOutOfPeriod drops events outside the processing-time window") {
    import spark.implicits._
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val ancient = new java.sql.Timestamp(System.currentTimeMillis() - 86400000L * 30)
    val future = new java.sql.Timestamp(System.currentTimeMillis() + 86400000L * 30)
    val df = Seq(("ok", now), ("late", ancient), ("early", future)).toDF("k", "t")
    val kept = graft.streaming.StreamingIngest.rejectOutOfPeriod(
      df, "t", latePeriod = Some("7 DAYS"), earlyPeriod = Some("1 HOURS"))
      .select("k").collect().map(_.getString(0)).toSet
    assert(kept == Set("ok"))
    // one-sided: only the late bound enforced
    val lateOnly = graft.streaming.StreamingIngest.rejectOutOfPeriod(
      df, "t", latePeriod = Some("7 DAYS"), earlyPeriod = None)
      .select("k").collect().map(_.getString(0)).toSet
    assert(lateOnly == Set("ok", "early"))
  }
}
