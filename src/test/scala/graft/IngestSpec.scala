package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ingest, ProjectionCatalog}

/** Segment writes (partitioned + clustered), compaction, rollup at ingest,
  * and aggregate-projection rerouting.
  */
class IngestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("writeSegments partitions by day and prunes on read") {
    spark.sparkContext.setLogLevel("ERROR")
    val out = Files.createTempDirectory("graft_seg").toString
    Ingest.writeSegments(Tables.load(spark, dir, "events"), out, "ts",
      clusterBy = Seq("user_id"))
    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    val pruned = back.filter(col("__day") === "2024-01-01")
    // partition pruning: only the matching day's directory is scanned
    val scanned = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(!scanned.contains("PartitionFilters: []"))
  }

  test("compact rewrites to the target file count") {
    val out = Files.createTempDirectory("graft_cmp").toString
    Tables.load(spark, dir, "orders").repartition(16)
      .write.mode("overwrite").parquet(out)
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet")) == 16)
    Ingest.compact(spark, out, targetRowsPerFile = 1000)
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 2, s"expected 2 files (1500 rows / 1000), got $files")
    assert(spark.read.parquet(out).count() == 1500)
  }

  test("rollup pre-aggregates and projection reroute matches base query") {
    val events = Tables.load(spark, dir, "events")
    // hourly rollup projection with count + sum partials
    val proj = Ingest.rollup(events, "ts", "PT1H", Seq("event_type"),
      Seq("n" -> count(lit(1)), "sum_value" -> sum(col("value"))))
    ProjectionCatalog.clear()
    ProjectionCatalog.register("events_hourly", ProjectionCatalog.Projection(
      "events", "PT1H", Set("event_type"), Set("n", "sum_value"), proj))

    // P1D query groups the PT1H partials — must equal direct aggregation
    // round the double sums: partials re-aggregate in a different addition
    // order, so bit-exact equality is not expected
    val rerouted = ProjectionCatalog.timeseries(events, "events", "ts", "P1D",
      Seq("event_type"), Seq("n" -> "n", "sum_value" -> "value"))
      .withColumn("sum_value", round(col("sum_value"), 6))
    val direct = events
      .groupBy(date_trunc("day", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
    assert(rerouted.exceptAll(direct).isEmpty && direct.exceptAll(rerouted).isEmpty)

    // narrower granularity than the projection → falls back to base
    // (sum metrics only: a COUNT partial has no base column to sum)
    val fallback = ProjectionCatalog.timeseries(events, "events", "ts", "PT1M",
      Seq("event_type"), Seq("sum_value" -> "value"))
    assert(fallback.columns.toSeq == Seq("bucket", "event_type", "sum_value"))
    assert(fallback.count() > 900) // minute buckets ≈ one per event at sf0.001
  }

  test("export writes a query result to external files and reads back") {
    val out = Files.createTempDirectory("graft_export").toString
    val result = Tables.load(spark, dir, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    Ingest.export(result, s"$out/csv", "csv")
    Ingest.export(result, s"$out/parquet", "parquet")
    val back = spark.read.option("header", "true").csv(s"$out/csv")
    assert(back.count() == result.count())
    // coalesced to one data file
    assert(new java.io.File(s"$out/csv").listFiles()
      .count(_.getName.endsWith(".csv")) == 1)
    assert(spark.read.parquet(s"$out/parquet").count() == result.count())
    intercept[IllegalArgumentException](Ingest.export(result, out, "avro"))
  }

  test("projection coverage logic") {
    import graft.operators.ProjectionCatalog.{covers, Projection}
    val p = Projection("events", "PT1H", Set("a", "b"), Set("n"), null)
    assert(covers(p, "events", "P1D", Seq("a"), Seq("n")))
    assert(covers(p, "events", "PT6H", Seq("a", "b"), Seq("n")))
    assert(!covers(p, "events", "PT1M", Seq("a"), Seq("n")))    // finer ask
    assert(!covers(p, "events", "P1D", Seq("c"), Seq("n")))     // missing dim
    assert(!covers(p, "other", "P1D", Seq("a"), Seq("n")))      // wrong table
    assert(!covers(p, "events", "PT90M", Seq("a"), Seq("n")))   // non-nesting
  }

  test("shredJson infers a union schema and types nested leaves") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"a": 1, "b": "x"}"""),
      (2L, """{"a": 2, "c": {"d": 3.5}}"""),
      (3L, null.asInstanceOf[String])).toDF("id", "js")
    val out = graft.operators.Ingest.shredJson(df, "js", "j")
    val t = out.schema("j").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(t.fieldNames.toSet == Set("a", "b", "c"))
    val rows = out.select("id", "j.a", "j.c.d").orderBy("id").collect()
    assert(rows(0).getLong(1) == 1L && rows(0).isNullAt(2))
    assert(rows(1).getLong(1) == 2L && rows(1).getDouble(2) == 3.5)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("flattenJson: explicit JSONPath fields + top-level field discovery") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"a": 1, "b": "x", "nest": {"d": "deep"}, "arr": [10, 20]}"""),
      (2L, """{"a": 2, "e": true, "nest": {"d": "deep2"}, "arr": [30]}"""),
      (3L, null.asInstanceOf[String])).toDF("id", "js")
    val out = graft.operators.Ingest.flattenJson(df, "js",
      fields = Seq("deep_d" -> "$.nest.d", "first_arr" -> "$.arr[0]",
        "a" -> "$.a"),
      useFieldDiscovery = true)
    // discovery surfaces top-level primitives (b, e) but not objects/
    // arrays (nest, arr), and does not re-add the claimed 'a'
    assert(out.columns.toSet ==
      Set("id", "js", "deep_d", "first_arr", "a", "b", "e"))
    val rows = out.orderBy("id").collect()
    def s(r: org.apache.spark.sql.Row, c: String): String = {
      val i = out.columns.indexOf(c)
      if (r.isNullAt(i)) null else r.getString(i)
    }
    assert(s(rows(0), "deep_d") == "deep" && s(rows(0), "first_arr") == "10")
    assert(s(rows(0), "a") == "1" && s(rows(0), "b") == "x" &&
      s(rows(0), "e") == null)
    assert(s(rows(1), "deep_d") == "deep2" && s(rows(1), "first_arr") == "30")
    assert(s(rows(1), "e") == "true" && s(rows(1), "b") == null)
    assert(s(rows(2), "deep_d") == null && s(rows(2), "a") == null)
  }

  test("flattenJson: dotted discovered keys use bracket paths; duplicate spec names rejected") {
    import spark.implicits._
    // a top-level key containing a dot would, as "$.a.b", address a NESTED
    // path and silently yield NULL — bracket notation addresses it exactly
    val df = Seq(
      (1L, """{"a.b": "dotted", "c d": "spaced", "plain": "p"}""")).toDF("id", "js")
    val out = graft.operators.Ingest.flattenJson(df, "js", fields = Nil,
      useFieldDiscovery = true)
    val r = out.head()
    def s(c: String): String = r.getString(out.columns.indexOf(c))
    assert(s("a.b") == "dotted", out.columns.mkString(","))
    assert(s("c d") == "spaced")
    assert(s("plain") == "p")
    // duplicate names in the explicit field list: error, not last-wins
    val err = intercept[IllegalArgumentException] {
      graft.operators.Ingest.flattenJson(df, "js",
        fields = Seq("x" -> "$.plain", "x" -> "$['a.b']"))
    }
    assert(err.getMessage.contains("defined 2 times"))
  }

  test("PARTITIONED BY HOUR lands hour-chunk dirs; OVERWRITE WHERE rejects it") {
    import spark.implicits._
    val df = Seq(
      ("2024-01-10 05:10:00", 1L), ("2024-01-10 05:50:00", 2L),
      ("2024-01-10 06:05:00", 3L), ("2024-01-11 23:59:00", 4L))
      .toDF("t", "v")
      .select(to_timestamp($"t").as("__time"), $"v")
    val loc = s"${System.getProperty("java.io.tmpdir")}/graft_hour_spec"
    graft.operators.Ingest.replaceAll(df, loc, "__time", Nil, gran = "HOUR")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(loc))
      .map(_.getPath.getName).filter(_.startsWith("__hour=")).sorted
    assert(dirs.toSeq == Seq("__hour=2024-01-10-05", "__hour=2024-01-10-06",
      "__hour=2024-01-11-23"))
    val back = spark.read.parquet(loc)
    assert(back.count() == 4)
    val oneChunk = back.filter($"__hour" === "2024-01-10-05")
    assert(oneChunk.count() == 2)
    // chunk filters must prune at the partition level (the 100-TB point of
    // hour segments: an hour-range query reads only its chunk dirs)
    val plan = oneChunk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []"),
      "expected a partition-level filter on __hour")
    // the parser carries the granularity through
    val ing = graft.api.SqlApi.ingestTarget(
      "INSERT INTO t SELECT 1 PARTITIONED BY HOUR").get
    assert(ing.granularity == "HOUR")
    // per-chunk replace stays a day-layout operation — the real API path
    // must reject OVERWRITE WHERE + HOUR before writing anything
    val ex = intercept[IllegalArgumentException] {
      graft.api.SqlApi.run(spark, dir, """{
        "query": "REPLACE INTO graft_hour_reject OVERWRITE WHERE __time >= TIMESTAMP '2024-01-10' AND __time < TIMESTAMP '2024-01-11' SELECT ts AS __time FROM events PARTITIONED BY HOUR"
      }""")
    }
    assert(ex.getMessage.contains("OVERWRITE ALL"))
  }

  test("replaceWhere swaps interval days, drops uncovered days, keeps the rest") {
    val out = Files.createTempDirectory("graft_repl").toString
    val ev = Tables.load(spark, dir, "events")
    Ingest.writeSegments(ev, out, "ts", clusterBy = Seq("user_id"))
    val beforeOutside = spark.read.parquet(out)
      .filter(col("__day") === "2024-01-10").count()

    // replacement covers only 01-05; 01-06 is inside the interval but gets
    // no rows → its old data must be dropped, not left stale
    val repl = ev.filter(to_date(col("ts")) === "2024-01-05")
      .withColumn("value", col("value") * 2)
    Ingest.replaceWhere(repl, out, "ts", "2024-01-05", "2024-01-07")

    val back = spark.read.parquet(out)
    assert(back.filter(col("__day") === "2024-01-06").count() == 0)
    assert(back.filter(col("__day") === "2024-01-10").count() == beforeOutside)
    val origSum = ev.filter(to_date(col("ts")) === "2024-01-05")
      .agg(sum("value")).head.getDouble(0)
    val newSum = back.filter(col("__day") === "2024-01-05")
      .agg(sum("value")).head.getDouble(0)
    assert(math.abs(newSum - 2 * origSum) < 1e-6)
  }

  test("dropSegments deletes exactly the interval's day directories") {
    val out = Files.createTempDirectory("graft_kill").toString
    val ev = Tables.load(spark, dir, "events")
    Ingest.writeSegments(ev, out, "ts", Nil)
    val before = spark.read.parquet(out).count()
    val inRange = spark.read.parquet(out)
      .filter(col("__day") >= "2024-01-03" && col("__day") < "2024-01-06")
      .count()
    val dropped = Ingest.dropSegments(spark, out, "2024-01-03", "2024-01-06")
    assert(dropped == 3)
    assert(spark.read.parquet(out).count() == before - inRange)
  }

  test("httpLines fetches URIs in parallel on executors, with basic auth") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, body: String, needAuth: Boolean): Unit =
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val ok = !needAuth || Option(
            ex.getRequestHeaders.getFirst("Authorization"))
            .exists(_.startsWith("Basic "))
          val bytes = (if (ok) body else "denied").getBytes("UTF-8")
          ex.sendResponseHeaders(if (ok) 200 else 401, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
      })
    serve("/a.csv", "k,v\n1,x\n2,y", needAuth = false)
    serve("/b.csv", "k,v\n3,z", needAuth = false)
    serve("/auth.csv", "k,v\n9,s", needAuth = true)
    server.start()
    try {
      val port = server.getAddress.getPort
      val lines = graft.sources.Sources.httpLines(spark,
        Seq(s"http://127.0.0.1:$port/a.csv", s"http://127.0.0.1:$port/b.csv"))
      val df = spark.read.option("header", "true").csv(lines)
      assert(df.count() == 3)
      assert(df.columns.toSeq == Seq("k", "v"))
      val authed = graft.sources.Sources.httpLines(spark,
        Seq(s"http://127.0.0.1:$port/auth.csv"),
        basicAuth = Some(("user", "pass")))
      assert(spark.read.option("header", "true").csv(authed)
        .head().getString(1) == "s")
    } finally server.stop(0)
  }

  test("replaceWhere rejects rows outside the OVERWRITE WHERE interval") {
    val out = Files.createTempDirectory("graft_repl_oob").toString
    val ev = Tables.load(spark, dir, "events")
    Ingest.writeSegments(ev.filter(to_date(col("ts")) < "2024-01-08"), out, "ts", Nil)
    val oob = ev.filter(to_date(col("ts")) === "2024-01-10")
    val ex = intercept[Exception] {
      Ingest.replaceWhere(oob, out, "ts", "2024-01-05", "2024-01-07")
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + chain(t.getCause)
    assert(chain(ex).contains("outside OVERWRITE WHERE"))
  }

  test("autoCompact: fragmented chunks compact newest-first, good chunks untouched, idempotent") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_ac").toString
    // two fragmented day chunks (8 small files each) + one already-compact
    val df = spark.range(1000).select(col("id"),
      (col("id") % 7).as("k"))
    df.repartition(8).write.parquet(s"$root/__day=2024-01-01")
    df.repartition(8).write.parquet(s"$root/__day=2024-01-02")
    df.coalesce(1).write.parquet(s"$root/__day=2024-01-03")
    def files(day: String): Int =
      new java.io.File(s"$root/__day=$day").listFiles()
        .count(_.getName.endsWith(".parquet"))
    assert(files("2024-01-01") == 8 && files("2024-01-03") == 1)

    val compacted = graft.operators.Ingest.autoCompact(
      spark, root, targetBytes = 512L * 1024 * 1024)
    // newest-first policy order; the single-file chunk was skipped
    assert(compacted.map(_.split("=").last) == Seq("2024-01-02", "2024-01-01"))
    assert(files("2024-01-01") == 1 && files("2024-01-02") == 1)
    // data preserved
    assert(spark.read.parquet(s"$root/__day=2024-01-01").count() == 1000)
    assert(spark.read.parquet(root).agg(sum("id")).head().getLong(0) ==
      3 * (999L * 1000 / 2))
    // second run: nothing fragmented remains
    assert(graft.operators.Ingest.autoCompact(spark, root, 512L * 1024 * 1024).isEmpty)

    // multi-file target layouts are ALSO idempotent: a chunk compacted to
    // ceil(total/target) > 1 files must not be re-selected forever
    val root2 = java.nio.file.Files.createTempDirectory("graft_ac2").toString
    df.repartition(8).write.parquet(s"$root2/__day=2024-02-01")
    val total = new java.io.File(s"$root2/__day=2024-02-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val target = total / 2 + 1 // forces a 2-file target layout
    assert(graft.operators.Ingest.autoCompact(spark, root2, target).size == 1)
    val nAfter = new java.io.File(s"$root2/__day=2024-02-01").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nAfter == 2, s"expected 2-file layout, got $nAfter")
    assert(graft.operators.Ingest.autoCompact(spark, root2, target).isEmpty,
      "second run must be a no-op at the multi-file target layout")
  }

  test("applyRetention drops only day chunks older than the keep window") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_ret").toString
    val df = spark.range(10).toDF("id")
    Seq("2024-01-01", "2024-01-05", "2024-01-09", "2024-01-10").foreach(d =>
      df.write.parquet(s"$root/__day=$d"))
    // non-day dirs are never touched
    df.write.parquet(s"$root/__other=x")
    val dropped = graft.operators.Ingest.applyRetention(
      spark, root, keepDays = 6, asOfDay = "2024-01-10")
    // cutoff = 2024-01-05: the 01-01 chunk drops, 01-05 (== cutoff) stays
    assert(dropped.map(_.split("=").last) == Seq("2024-01-01"))
    val left = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(left == Set("__day=2024-01-05", "__day=2024-01-09",
      "__day=2024-01-10", "__other=x"))
    // idempotent
    assert(graft.operators.Ingest.applyRetention(
      spark, root, 6, "2024-01-10").isEmpty)
  }
}
