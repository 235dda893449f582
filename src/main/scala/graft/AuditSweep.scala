package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession

/** Corpus-diff audit harness: replays reference quidem testcases over the
  * inline fixture tables against this engine and diffs the result grids.
  *
  * Input: JSON lines from `tools/extract_table_cases.py`
  * (`{file, tid, query, cols, rows}` — the query text and the expected
  * mysql-format result table of a `!ok` testcase). The fixtures are the
  * same inline VALUES relations the QaSuites gates use (QaSuites
  * sparkTestArray / sparkTestUnnest), registered as temp views.
  *
  * Usage: `sbt "runMain graft.AuditSweep /tmp/table_cases.jsonl"`.
  * Prints one MISMATCH line per diff (capped) and a summary; queries that
  * fail to parse/execute are counted per error class for manual triage —
  * a corpus spelling the engine rejects is itself a finding.
  *
  * Comparison is ORDER-INSENSITIVE (sorted row multisets) unless the
  * query has a top-level ORDER BY, and numerically tolerant on
  * float-parseable cells. Druid's mysql output prints NULL as the empty
  * cell, booleans as true/false, and arrays as `[a, b]` (ARRAY columns)
  * or `["a","b"]` (MV/VARCHAR arrays in some suites) — both accepted.
  */
object AuditSweep {

  private def viewSql(prelude: String, name: String): String = {
    val inner = prelude.trim.stripPrefix(name + " AS (").stripSuffix(")")
    s"CREATE OR REPLACE TEMPORARY VIEW $name AS $inner"
  }

  // non-null only during the LOS_ANGELES session phase (sequential)
  @volatile private var renderZone: java.time.ZoneId = null

  private def normCell(v: Any): String = v match {
    case null => ""
    case b: Boolean => if (b) "true" else "false"
    case s: scala.collection.Seq[_] =>
      s.map(e => if (e == null) "null" else normCell(e)).mkString("[", ", ", "]")
    case ts: java.sql.Timestamp =>
      // fixed 3-digit millis render — Timestamp.toString trims zeros
      // ('02:02:20.48'), which defeats both exact matches against the
      // corpus's always-3-digit cells and the epoch-millis lenient rule
      // (wikipediaScanWindow). The zone is the session's render zone
      // during the LOS_ANGELES phase (sqlTimeZone wall-clock —
      // testTimeseriesLosAngelesViaQueryContext pins LA midnight), UTC
      // otherwise.
      val zone = if (renderZone ne null) renderZone
        else java.time.ZoneOffset.UTC
      java.time.LocalDateTime.ofInstant(ts.toInstant, zone).format(
        java.time.format.DateTimeFormatter.ofPattern(
          "yyyy-MM-dd HH:mm:ss.SSS"))
    // Druid has no DATE output type — CAST(x AS DATE) renders as the
    // midnight timestamp (testTimeseriesUsingCastAsDate pins
    // '2000-01-01 00:00:00.000' cells)
    case d: java.sql.Date => s"$d 00:00:00.000"
    case d: Double => fmtDouble(d)
    // FLOAT prints at float precision (Druid renders FLOAT columns as
    // their Float.toString — 0.1, not 0.10000000149011612)
    case f: Float =>
      if (f == f.floor && math.abs(f) < 1e15f) s"${f.toLong}.0" else f.toString
    case x => x.toString
  }

  private def fmtDouble(d: Double): String =
    if (d.isNaN || d.isInfinite) d.toString
    else if (d == d.floor && math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  /** Cell match level: 2 = exact text, 1 = lenient (numeric tolerance,
    * quote/separator-insensitive array prints, trailing-.000 timestamps),
    * 0 = no match. Lenient matches are COUNTED SEPARATELY in the summary so
    * tolerance can't silently absorb real formatting divergences.
    */
  private def cellMatch(got: String, exp: String): Int = {
    if (got == exp) return 2
    val g = got.replace("\"", ""); val e = exp.replace("\"", "")
    if (g == e) return 1
    if (g.replace(", ", ",") == e.replace(", ", ",")) return 1
    try {
      val gd = got.toDouble; val ed = exp.toDouble
      if (math.abs(gd - ed) <= 1e-6 * math.max(1.0, math.abs(ed))) return 1
    } catch { case _: Throwable => }
    // timestamp with/without trailing .000
    if (g.stripSuffix(".000") == e.stripSuffix(".000")) return 1
    // the Java-coded corpus pins TIMESTAMP cells as raw epoch millis
    // (BaseCalciteQueryTest rows carry timestamp(...) longs) — a rendered
    // timestamp matching the millis value is the same instant
    if (e.matches("-?\\d{9,}") &&
        g.matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{3}")) {
      try {
        val ms = java.time.LocalDateTime.parse(g.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        if (ms == e.toLong) return 1
      } catch { case _: Throwable => }
    }
    // Druid renders a SINGLE-ELEMENT multi-value string unwrapped and an
    // EMPTY multi-value as the empty cell (the documented MV-rendering
    // divergence) — count as lenient, not exact
    if (g == "[" + e + "]" || e == "[" + g + "]") return 1
    if ((g == "[]" && e.isEmpty) || (e == "[]" && g.isEmpty)) return 1
    0
  }

  /** qaWin's `test_win` (768 rows) and qaJsonCols funcs_and_sql's
    * `test_json_cols` (4 rows) from the extract_fixture_data.py dumps —
    * typed per the reference ingest specs (qaWin/ingest.json: string dims +
    * session_length long + iso timestamp; funcs_and_sql/ingest.json: auto
    * scalars with strict-boolean LONG s_bool, nested data as compact JSON
    * text per the engine's nested-as-STRING convention).
    */
  private def registerWinAndJsonFixtures(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val winPath = "/tmp/test_win.jsonl"
    if (new java.io.File(winPath).exists()) {
      spark.read.schema(
        "timestamp STRING, session STRING, number STRING, client_ip STRING, " +
        "language ARRAY<STRING>, adblock_list STRING, app_version STRING, " +
        "path STRING, loaded_image STRING, referrer STRING, " +
        "referrer_host STRING, server_ip STRING, screen STRING, " +
        "window STRING, session_length BIGINT, timezone STRING, " +
        "timezone_offset STRING")
        .json(winPath)
        .withColumn("__time", to_timestamp(col("timestamp")))
        .drop("timestamp")
        .createOrReplaceTempView("test_win")
    } else println(s"WARN no $winPath — run tools/extract_fixture_data.py")
    val jsonPath = "/tmp/test_json_cols.jsonl"
    if (new java.io.File(jsonPath).exists()) {
      spark.read.schema(
        "timestamp STRING, s_str STRING, s_num_int BIGINT, " +
        "s_num_float DOUBLE, s_bool BIGINT, s_null STRING, " +
        "c_empty_obj STRING, c_empty_array STRING, " +
        "c_empty_obj_nested STRING, c_empty_array_nested STRING, " +
        "c1 STRING, c2 STRING")
        .json(jsonPath)
        .withColumn("__time", to_timestamp(col("timestamp")))
        .drop("timestamp")
        .select("__time", "s_str", "s_num_int", "s_num_float", "s_bool",
          "s_null", "c_empty_obj", "c_empty_array", "c_empty_obj_nested",
          "c_empty_array_nested", "c1", "c2")
        // the base name stays stable; the ingest-variant phases
        // re-register test_json_cols per variant shape on top of it
        .createOrReplaceTempView("test_json_cols_base")
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW test_json_cols AS " +
        "SELECT * FROM test_json_cols_base")
    } else println(s"WARN no $jsonPath — run tools/extract_fixture_data.py")
  }

  /** qaTpch (8 pipe-delimited .tbl.gz, TPC-H tiny) and qaSsb (norm star
    * schema + denorm wide table) fixtures, typed per the reference ingest
    * specs (qaTpch/ingest_*.json: long keys + double amounts, string
    * dates, constant __time 2025-01-01; qaSsb norm/ingest.*.json: all-long
    * measures, constant __time 2010-01-01; denorm/ingest.ssb_denorm.json:
    * __time parsed from order_date MM/dd/yyyy). The .tbl rows end with a
    * trailing delimiter — a sacrificial trailing column absorbs it.
    */
  private def registerTpchSsbFixtures(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.{expr, to_timestamp, col}
    val base = "/root/reference/sql/src/test/quidem/qatests"
    if (!new java.io.File(base).exists()) {
      println(s"WARN no $base — qaTpch/qaSsb phases will error"); return
    }
    def reg(name: String, path: String, schema: String,
            trailing: Boolean = true): org.apache.spark.sql.DataFrame = {
      val full = if (trailing) schema + ", _trail STRING" else schema
      val df = spark.read.schema(full)
        .option("sep", "|").option("header", "false").csv(path)
      val d2 = if (trailing) df.drop("_trail") else df
      d2.createOrReplaceTempView(name); d2
    }
    val tpch = Map(
      "customer" -> ("c_custkey BIGINT, c_name STRING, c_address STRING, " +
        "c_nationkey BIGINT, c_phone STRING, c_acctbal DOUBLE, " +
        "c_mktsegment STRING, c_comment STRING"),
      "lineitem" -> ("l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, " +
        "l_linenumber BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE, " +
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, " +
        "l_linestatus STRING, l_shipdate STRING, l_commitdate STRING, " +
        "l_receiptdate STRING, l_shipinstruct STRING, l_shipmode STRING, " +
        "l_comment STRING"),
      "nation" -> "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, n_comment STRING",
      "orders" -> ("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
        "o_totalprice DOUBLE, o_orderdate STRING, o_orderpriority STRING, " +
        "o_clerk STRING, o_shippriority BIGINT, o_comment STRING"),
      "part" -> ("p_partkey BIGINT, p_name STRING, p_mfgr STRING, " +
        "p_brand STRING, p_type STRING, p_size BIGINT, p_container STRING, " +
        "p_retailprice DOUBLE, p_comment STRING"),
      "partsupp" -> ("ps_partkey BIGINT, ps_suppkey BIGINT, " +
        "ps_availqty BIGINT, ps_supplycost DOUBLE, ps_comment STRING"),
      "region" -> "r_regionkey BIGINT, r_name STRING, r_comment STRING",
      "supplier" -> ("s_suppkey BIGINT, s_name STRING, s_address STRING, " +
        "s_nationkey BIGINT, s_phone STRING, s_acctbal FLOAT, s_comment STRING"))
    tpch.foreach { case (t, schema) =>
      reg(t, s"$base/qaTpch/data/$t.tbl.gz", schema)
        .withColumn("__time", expr("timestamp'2025-01-01 00:00:00'"))
        .createOrReplaceTempView(t)
    }
    val ssbNorm = Map(
      "customer" -> ("c_custkey BIGINT, c_name STRING, c_address STRING, " +
        "c_city STRING, c_nation STRING, c_region STRING, c_phone STRING, " +
        "c_mktsegment STRING"),
      "date" -> ("d_datekey BIGINT, d_date STRING, d_dayofweek STRING, " +
        "d_month STRING, d_year BIGINT, d_yearmonthnum BIGINT, " +
        "d_yearmonth STRING, d_daynuminweek BIGINT, d_daynuminmonth BIGINT, " +
        "d_daynuminyear BIGINT, d_monthnuminyear BIGINT, " +
        "d_weeknuminyear BIGINT, d_sellingseason STRING, " +
        "d_lastdayinweekfl BIGINT, d_lastdayinmonthfl BIGINT, " +
        "d_holidayfl BIGINT, d_weekdayfl BIGINT"),
      "lineorder" -> ("lo_orderkey BIGINT, lo_linenumber BIGINT, " +
        "lo_custkey BIGINT, lo_partkey BIGINT, lo_suppkey BIGINT, " +
        "lo_orderdate BIGINT, lo_orderpriority STRING, " +
        "lo_shippriority STRING, lo_quantity BIGINT, " +
        "lo_extendedprice BIGINT, lo_ordtotalprice BIGINT, " +
        "lo_discount BIGINT, lo_revenue BIGINT, lo_supplycost BIGINT, " +
        "lo_tax BIGINT, lo_commitdate BIGINT, lo_shipmode STRING"),
      "part" -> ("p_partkey BIGINT, p_name STRING, p_mfgr STRING, " +
        "p_category STRING, p_brand1 STRING, p_color STRING, " +
        "p_type STRING, p_size BIGINT, p_container STRING"),
      "supplier" -> ("s_suppkey BIGINT, s_name STRING, s_address STRING, " +
        "s_city STRING, s_nation STRING, s_region STRING, s_phone STRING"))
    ssbNorm.foreach { case (t, schema) =>
      reg(s"ssb_norm_$t", s"$base/qaSsb/norm/data/$t.tbl.gz", schema)
        .withColumn("__time", expr("timestamp'2010-01-01 00:00:00'"))
        .createOrReplaceTempView(s"ssb_norm_$t")
    }
    val denormCols = Seq(
      "lo_orderkey BIGINT", "lo_linenumber BIGINT", "lo_custkey BIGINT",
      "lo_partkey BIGINT", "lo_suppkey BIGINT", "lo_orderdate BIGINT",
      "lo_orderpriority STRING", "lo_shippriority STRING",
      "lo_quantity BIGINT", "lo_extendedprice BIGINT",
      "lo_ordtotalprice BIGINT", "lo_discount BIGINT", "lo_revenue BIGINT",
      "lo_supplycost BIGINT", "lo_tax BIGINT", "lo_commitdate BIGINT",
      "lo_shipmode STRING",
      "c_custkey BIGINT", "c_name STRING", "c_address STRING",
      "c_city STRING", "c_nation STRING", "c_region STRING",
      "c_phone STRING", "c_mktsegment STRING",
      "s_suppkey BIGINT", "s_name STRING", "s_address STRING",
      "s_city STRING", "s_nation STRING", "s_region STRING",
      "s_phone STRING",
      "p_partkey BIGINT", "p_name STRING", "p_mfgr STRING",
      "p_category STRING", "p_brand1 STRING", "p_color STRING",
      "p_type STRING", "p_size BIGINT", "p_container STRING",
      "d_datekey BIGINT", "d_date STRING", "d_dayofweek STRING",
      "d_month STRING", "d_year BIGINT", "d_yearmonthnum BIGINT",
      "d_yearmonth STRING", "d_daynuminweek BIGINT",
      "d_daynuminmonth BIGINT", "d_daynuminyear BIGINT",
      "d_monthnuminyear BIGINT", "d_weeknuminyear BIGINT",
      "d_sellingseason STRING", "d_lastdayinweekfl BIGINT",
      "d_lastdayinmonthfl BIGINT", "d_holidayfl BIGINT",
      "d_weekdayfl BIGINT", "order_date STRING").mkString(", ")
    reg("ssb_denorm", s"$base/qaSsb/denorm/data/ssb.tsv.gz", denormCols,
        trailing = false)
      .withColumn("__time", to_timestamp(col("order_date"), "MM/dd/yyyy"))
      .drop("order_date")
      .createOrReplaceTempView("ssb_denorm")
  }

  /** The standard Calcite test datasets (TestDataBuilder RAW_ROWS1 /
    * NumFoo.getRawRows / LookylooModule) backing the
    * DecoupledPlanningCalcite*QueryTest quidem tree: `foo` (6 rows, MV
    * dim2/dim3 with the []-ingests-as-NULL convention, count metric cnt,
    * FLOAT m1 + DOUBLE m2), `numfoo` (the same rows plus dim4-dim6 and
    * nullable typed dbl/f/l columns), the `druid.*` qualified spellings,
    * and the `lookup.lookyloo` joinable (also registered as an engine
    * lookup for the LOOKUP() call sites).
    */
  private def registerCalciteFixtures(spark: SparkSession): Unit = {
    val fooRows =
      """(TIMESTAMP'2000-01-01 00:00:00', '', array('a'), array('a','b')),
         (TIMESTAMP'2000-01-02 00:00:00', '10.1', CAST(NULL AS ARRAY<STRING>), array('b','c')),
         (TIMESTAMP'2000-01-03 00:00:00', '2', array(''), array('d')),
         (TIMESTAMP'2001-01-01 00:00:00', '1', array('a'), array('')),
         (TIMESTAMP'2001-01-02 00:00:00', 'def', array('abc'), CAST(NULL AS ARRAY<STRING>)),
         (TIMESTAMP'2001-01-03 00:00:00', 'abc', CAST(NULL AS ARRAY<STRING>), CAST(NULL AS ARRAY<STRING>))"""
    // dim2/dim3 carry the druid.mv tag: MV STRING columns are VARCHAR in
    // the reference (scalar functions apply per element) where TRUE ARRAY
    // columns reject them — the tag is how the engine keeps both
    val mvMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("druid.mv", true).build()
    import org.apache.spark.sql.functions.col
    spark.sql(
      s"""SELECT __time, dim1, dim2, dim3, 1L AS cnt,
                 CAST(row_number() OVER (ORDER BY __time) AS FLOAT) AS m1,
                 CAST(row_number() OVER (ORDER BY __time) AS DOUBLE) AS m2,
                 CASE dim1 WHEN '' THEN '"AQAAAEAAAA=="'
                   WHEN '10.1' THEN '"AQAAAQAAAAHNBA=="'
                   WHEN '2' THEN '"AQAAAQAAAAOzAg=="'
                   WHEN '1' THEN '"AQAAAQAAAAFREA=="'
                   WHEN 'def' THEN '"AQAAAQAAAACyEA=="'
                   WHEN 'abc' THEN '"AQAAAQAAAAEkAQ=="' END AS unique_dim1
          FROM VALUES $fooRows AS t(__time, dim1, dim2, dim3)""")
      .withColumn("dim2", col("dim2").as("dim2", mvMeta))
      .withColumn("dim3", col("dim3").as("dim3", mvMeta))
      // single partition in segment (__time) order: the reference's ANY/
      // EARLIEST aggregators read rows in segment order, and the test
      // grids pin first-row values (testAnyAggregatorsOnHeapNumericNulls)
      .orderBy("__time").coalesce(1)
      .createOrReplaceTempView("foo")
    // segment (__time) order, single partition — see the foo note
    spark.sql(
      s"""SELECT f.__time, f.dim1, f.dim2, f.dim3, n.dim4, n.dim5, n.dim6,
                 n.dbl1, n.dbl2, n.f1, n.f2, n.l1, n.l2,
                 f.cnt, f.m1, f.m2
          FROM foo f JOIN VALUES
            ('', 'a', 'aa', '1', 1.0D, CAST(NULL AS DOUBLE),
             CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT), 7L, CAST(NULL AS BIGINT)),
            ('10.1', 'a', 'ab', '2', 1.7D, 1.7D,
             CAST(0.1 AS FLOAT), CAST(0.1 AS FLOAT), 325323L, 325323L),
            ('2', 'a', 'ba', '3', 0.0D, 0.0D,
             CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT), 0L, 0L),
            ('1', 'b', 'ad', '4', CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             CAST(NULL AS FLOAT), CAST(NULL AS FLOAT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
            ('def', 'b', 'aa', '5', CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             CAST(NULL AS FLOAT), CAST(NULL AS FLOAT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
            ('abc', 'b', 'ab', '6', CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             CAST(NULL AS FLOAT), CAST(NULL AS FLOAT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))
            AS n(k, dim4, dim5, dim6, dbl1, dbl2, f1, f2, l1, l2)
          ON f.dim1 = n.k""")
      .orderBy("__time").coalesce(1)
      .createOrReplaceTempView("numfoo")
    // qualified spellings live in real catalog databases; the in-memory
    // catalog forgets tables between runs but the warehouse files remain,
    // so clear the location first
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(): Unit
    }
    rmrf(new java.io.File("/tmp/sweep_warehouse"))
    spark.sql("CREATE DATABASE IF NOT EXISTS druid")
    spark.sql("CREATE DATABASE IF NOT EXISTS lookup")
    spark.table("foo").write.mode("overwrite").saveAsTable("druid.foo")
    spark.table("numfoo").write.mode("overwrite").saveAsTable("druid.numfoo")
    // the broadcast GlobalTableDataSource carries the numfoo rows
    // (CalciteTests.BROADCAST_DATASOURCE; the join grids count 9 = 3×3
    // per dim4 against numfoo)
    spark.table("numfoo").createOrReplaceTempView("broadcast")
    spark.table("numfoo").write.mode("overwrite")
      .saveAsTable("druid.broadcast")
    val looky = Map("a" -> "xa", "abc" -> "xabc",
      "nosuchkey" -> "mysteryvalue", "6" -> "x6")
    import spark.implicits._
    looky.toSeq.toDF("k", "v").write.mode("overwrite")
      .saveAsTable("lookup.lookyloo")
    graft.functions.LookupRegistry.register("lookyloo", looky)
    // LookylooModule's sibling lookups: the injective one-to-one map on
    // dim1 and the chainable map over lookyloo's values
    graft.functions.LookupRegistry.register("lookyloo121", Map(
      "" -> "x", "10.1" -> "x10.1", "2" -> "x2", "1" -> "x1",
      "def" -> "xdef", "abc" -> "xabc"))
    graft.functions.LookupRegistry.register("lookyloo-chain", Map(
      "xa" -> "za", "xabc" -> "zabc", "x6" -> "z6"))
    // the SQL LOOKUP() call sites need the registry-backed function
    graft.functions.LookupRegistry.registerSql(spark)
    // foo/numfoo carry druid.mv-tagged MVDs (dim2/dim3): grouping on them
    // explodes per element in the reference — register so the facade's
    // MVD groupBy dialect fires for these tables only
    Seq("foo", "numfoo", "broadcast", "druid.foo", "druid.numfoo",
      "druid.broadcast").foreach(graft.functions.MvdTables.register)
  }

  /** CalciteNestedDataQueryTest's six datasources (reference:
    * sql/src/test/java/.../CalciteNestedDataQueryTest.java:104-161 and
    * processing test resources). Nested columns follow the engine's
    * nested-as-STRING convention: compact JSON text, so a raw SELECT
    * renders exactly the reference's COMPLEX<json> output (scalar strings
    * keep their JSON quotes — `"hello"`), JSON_VALUE/JSON_QUERY walk the
    * text, and text ordering matches the reference's grouping order.
    *
    *  - `nested` = RAW_ROWS (7 docs, auto-typed scalars + nest/nester).
    *  - `nested_mix`/`nested_mix_2` = the same rows ingested as TWO
    *    segments (scalar-typed vs auto-typed scalar columns — the cell
    *    values are identical, so both tables are the 7 rows duplicated).
    *  - `arrays` = nested-array-test-data.json (14 docs): single-type
    *    arrays ingest as typed ARRAY columns; the variant array ingests
    *    as per-row stringified elements; nested arrays/objects as JSON.
    *  - `all_auto`/`all_auto_realtime` = nested-all-types-test-data.json
    *    (7 docs): booleans land LONG 1/0, mixed scalar+object columns
    *    land COMPLEX<json> (string values render quoted), mixed
    *    scalar+array variants render scalars bare and arrays as JSON.
    */
  private def registerNestedFixtures(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.{col, expr, lit, to_timestamp}
    // every column of these AUTO-typed tables carries the druid.autojson
    // tag: JSON functions read the specialized-field semantics
    // (single-element arrays unwrap, scalars wrap under array RETURNING,
    // negative indexes resolve — JsonWalk.valueTyped)
    val autoMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("druid.autojson", true).build()
    def tagAll(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      df.select(df.columns.map(c =>
        col("`" + c + "`").as(c, autoMeta)): _*)
    // nested columns read from the raw file keep the file's whitespace;
    // the reference renders COMPLEX<json> COMPACT — re-serialize
    def compact(c: String): String = s"json_query(`$c`, '$$') AS `$c`"
    val nestedRows =
      """(TIMESTAMP'2000-01-01 00:00:00', 'aaa', 'zzz',
          '{"mixed":1,"mixed2":"1","x":100,"y":2.02,"z":"300"}',
          '{"array":["a","b"],"n":{"x":"hello"}}', 5L),
         (TIMESTAMP'2000-01-01 00:00:00', 'bbb', CAST(NULL AS STRING),
          CAST(NULL AS STRING), '"hello"', 4L),
         (TIMESTAMP'2000-01-01 00:00:00', 'ccc', '10',
          '{"mixed":1.1,"mixed2":1,"x":200,"y":3.03,"z":"abcdef"}',
          CAST(NULL AS STRING), 3L),
         (TIMESTAMP'2000-01-01 00:00:00', 'ddd', 'yyy',
          CAST(NULL AS STRING), CAST(NULL AS STRING), 2L),
         (TIMESTAMP'2000-01-01 00:00:00', 'eee', CAST(NULL AS STRING),
          CAST(NULL AS STRING), CAST(NULL AS STRING), 1L),
         (TIMESTAMP'2000-01-02 00:00:00', 'aaa', CAST(NULL AS STRING),
          '{"mixed2":1.1,"x":100,"y":2.02,"z":"400"}',
          '{"array":["a","b"],"n":{"x":1}}', 5L),
         (TIMESTAMP'2000-01-02 00:00:00', 'ddd', CAST(NULL AS STRING),
          CAST(NULL AS STRING), '2', 2L)"""
    tagAll(spark.sql(
      s"""SELECT __time, string, nest, nester, long, string_sparse, 1L AS cnt
          FROM VALUES $nestedRows
            AS t(__time, string, string_sparse, nest, nester, long)""")
      .orderBy("__time").coalesce(1))
      .createOrReplaceTempView("nested")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW nested_mix AS
      SELECT * FROM nested UNION ALL SELECT * FROM nested""")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW nested_mix_2 AS
      SELECT * FROM nested_mix""")
    val res = "/root/reference/processing/src/test/resources"
    // quote a scalar cell of a COMPLEX<json> column back to JSON text
    // (objects/arrays/numbers pass through; bare strings gain quotes)
    def jsonify(c: String): String =
      s"""CASE WHEN $c IS NULL THEN NULL
               WHEN $c RLIKE '^(-?[0-9][0-9.]*|\\\\{.*|\\\\[.*)$$' THEN $c
               ELSE concat('"', $c, '"') END AS $c"""
    if (new java.io.File(s"$res/nested-array-test-data.json").exists()) {
      spark.read.schema(
        "timestamp STRING, arrayString ARRAY<STRING>, " +
        "arrayStringNulls ARRAY<STRING>, arrayLong ARRAY<BIGINT>, " +
        "arrayLongNulls ARRAY<BIGINT>, arrayDouble ARRAY<DOUBLE>, " +
        "arrayDoubleNulls ARRAY<DOUBLE>, arrayVariant ARRAY<STRING>, " +
        "arrayNoType ARRAY<STRING>, arrayNestedLong STRING, " +
        "arrayObject STRING")
        .json(s"$res/nested-array-test-data.json")
        .withColumn("__time", to_timestamp(col("timestamp")))
        .drop("timestamp").withColumn("cnt", lit(1L))
        .withColumn("arrayNestedLong", expr("json_query(arrayNestedLong, '$')"))
        .withColumn("arrayObject", expr("json_query(arrayObject, '$')"))
        .select("__time", "arrayString", "arrayStringNulls", "arrayLong",
          "arrayLongNulls", "arrayDouble", "arrayDoubleNulls",
          "arrayVariant", "arrayNoType", "arrayNestedLong", "arrayObject",
          "cnt")
        .orderBy("__time").coalesce(1)
        .transform(tagAll)
        .createOrReplaceTempView("arrays")
    } else println(s"WARN no $res/nested-array-test-data.json")
    if (new java.io.File(s"$res/nested-all-types-test-data.json").exists()) {
      spark.read.schema(
        "timestamp STRING, str STRING, long BIGINT, double DOUBLE, " +
        "bool BOOLEAN, variant STRING, variantNumeric DOUBLE, " +
        "variantEmptyObj STRING, variantEmtpyArray STRING, " +
        "variantWithArrays STRING, obj STRING, complexObj STRING, " +
        "arrayString ARRAY<STRING>, arrayStringNulls ARRAY<STRING>, " +
        "arrayLong ARRAY<BIGINT>, arrayLongNulls ARRAY<BIGINT>, " +
        "arrayDouble ARRAY<DOUBLE>, arrayDoubleNulls ARRAY<DOUBLE>, " +
        "arrayVariant ARRAY<STRING>, arrayBool ARRAY<BOOLEAN>, " +
        "arrayNestedLong STRING, arrayObject STRING, `null` STRING, " +
        "cstr STRING, clong BIGINT, cdouble DOUBLE, cObj STRING, " +
        "cstringArray ARRAY<STRING>, cLongArray ARRAY<BIGINT>, " +
        "cDoubleArray ARRAY<DOUBLE>, cEmptyArray STRING, " +
        "cEmptyObj STRING, cNullArray STRING, cEmptyObjectArray STRING, " +
        "cObjectArray STRING")
        .json(s"$res/nested-all-types-test-data.json")
        .withColumn("__time", to_timestamp(col("timestamp")))
        .drop("timestamp")
        .withColumn("bool", expr("CAST(bool AS BIGINT)"))
        .withColumn("arrayBool",
          expr("transform(arrayBool, b -> CAST(b AS BIGINT))"))
        .withColumn("variantEmptyObj", expr(jsonify("variantEmptyObj")))
        .withColumn("obj", expr("json_query(obj, '$')"))
        .withColumn("complexObj", expr("json_query(complexObj, '$')"))
        .withColumn("arrayNestedLong", expr("json_query(arrayNestedLong, '$')"))
        .withColumn("arrayObject", expr("json_query(arrayObject, '$')"))
        .withColumn("cObj", expr("json_query(cObj, '$')"))
        .withColumn("cEmptyObjectArray",
          expr("json_query(cEmptyObjectArray, '$')"))
        .withColumn("cObjectArray", expr("json_query(cObjectArray, '$')"))
        .withColumn("cNullArray", expr("json_query(cNullArray, '$')"))
        .withColumn("cEmptyArray", expr("json_query(cEmptyArray, '$')"))
        // variant scalar-or-array columns: scalars stay BARE text, only
        // the array rows re-serialize compact
        .withColumn("variantWithArrays", expr(
          "CASE WHEN variantWithArrays RLIKE '^\\\\[' " +
          "THEN json_query(variantWithArrays, '$') ELSE variantWithArrays END"))
        .withColumn("variantEmtpyArray", expr(
          "CASE WHEN variantEmtpyArray RLIKE '^\\\\[' " +
          "THEN json_query(variantEmtpyArray, '$') ELSE variantEmtpyArray END"))
        .withColumn("cnt", lit(1L))
        .select("__time", "str", "long", "double", "bool", "variant",
          "variantNumeric", "variantEmptyObj", "variantEmtpyArray",
          "variantWithArrays", "obj", "complexObj", "arrayString",
          "arrayStringNulls", "arrayLong", "arrayLongNulls", "arrayDouble",
          "arrayDoubleNulls", "arrayVariant", "arrayBool",
          "arrayNestedLong", "arrayObject", "null", "cstr", "clong",
          "cdouble", "cObj", "cstringArray", "cLongArray", "cDoubleArray",
          "cEmptyArray", "cEmptyObj", "cNullArray", "cEmptyObjectArray",
          "cObjectArray", "cnt")
        .orderBy("__time").coalesce(1)
        .transform(tagAll)
        .createOrReplaceTempView("all_auto")
      spark.sql("""CREATE OR REPLACE TEMPORARY VIEW all_auto_realtime AS
        SELECT * FROM all_auto""")
    } else println(s"WARN no $res/nested-all-types-test-data.json")
    Seq("nested", "nested_mix", "nested_mix_2", "arrays", "all_auto",
        "all_auto_realtime").foreach { t =>
      spark.table(t).write.mode("overwrite").saveAsTable(s"druid.$t")
      // ARRAY_TO_MV(col) groupings over these tables explode per element
      // (the MVD groupBy dialect keys on the relation being registered)
      graft.functions.MvdTables.register(t)
      graft.functions.MvdTables.register(s"druid.$t")
    }
  }

  /** The wikipedia sampled-day fixture (TestIndex
    * .makeWikipediaIncrementalIndex: wikiticker-2015-09-12-sampled
    * .json.gz, rollup=false, 16 string dims — booleans ingest as
    * 'true'/'false' strings, metroCode as number text — plus long
    * delta/added/deleted; no count metric). `wikipedia_first_last`
    * re-ingests with rollup=true and first/last metrics over `added`/
    * `comment` keyed by __time (TestDataBuilder
    * .makeWikipediaIndexWithAggregation); with millisecond timestamps the
    * rollup groups are singletons, so first=last=the row value.
    */
  /** The LAST TestDataBuilder datasources (round 20): foo2 / foo4 /
    * lotsocolumns / larry / visits / forbiddenDatasource plus the `view`
    * schema's SQL views and the INFORMATION_SCHEMA tables — reference:
    * `sql/src/test/java/org/apache/druid/sql/calcite/util/
    * TestDataBuilder.java:433-560,737-935` (row sets + index schemas),
    * `SqlTestFramework.java:685-731` (view bodies),
    * `server/.../util/datasets/Larry.java` (larry rows).
    *
    * Modeling notes, all from the reference's ingest conventions:
    * multi-value cells SORT with duplicates retained and nulls first
    * (DimensionSchema default MultiValueHandling.SORTED_ARRAY); an empty
    * MV list ingests as the null row; default-schema dims are STRINGs
    * (lotsocolumns' met* columns are string dimensions); metrics missing
    * from a row aggregate to NULL under SQL-compatible nulls; view
    * bodies are hand-translated to Spark SQL with Druid's semantics
    * (dim2 = 'a' on an MVD → any-element match; SUBSTRING of '' → NULL;
    * bview's mock-clock CURRENT_TIMESTAMP — the test framework pins
    * 2000-01-01T00Z — folds to its constant).
    */
  private def registerRound20Fixtures(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.col
    val mvMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("druid.mv", true).build()
    // foo2 (DATASOURCE2, INDEX_SCHEMA_DIFFERENT_DIM3_M1_TYPES): dim3 is a
    // LONG dim, m1 a LONG sum; m2 has no input field -> NULL
    spark.sql(
      """SELECT TIMESTAMP'2000-01-01 00:00:00' AS __time, dim1, dim2,
                dim3, 1L AS cnt, m1, CAST(NULL AS DOUBLE) AS m2
         FROM VALUES
           ('דרואיד', 'he', 10L, 1L), ('druid', 'en', 11L, 1L),
           ('друид', 'ru', 12L, 1L) AS t(dim1, dim2, dim3, m1)""")
      .orderBy("dim3").coalesce(1).createOrReplaceTempView("foo2")
    // foo4 (ROWS1_WITH_FULL_TIMESTAMP under INDEX_SCHEMA)
    spark.sql(
      """SELECT * FROM VALUES
           (TIMESTAMP'2000-01-01 10:51:45.695', '', array('a'),
            array('a','b'), 1L, CAST(1.0 AS FLOAT), 1.0D),
           (TIMESTAMP'2000-01-18 10:51:45.695', '10.1',
            CAST(NULL AS ARRAY<STRING>), array('b','c'), 1L,
            CAST(2.0 AS FLOAT), 2.0D)
         AS t(__time, dim1, dim2, dim3, cnt, m1, m2)""")
      .withColumn("dim2", col("dim2").as("dim2", mvMeta))
      .withColumn("dim3", col("dim3").as("dim3", mvMeta))
      .orderBy("__time").coalesce(1).createOrReplaceTempView("foo4")
    // lotsocolumns (DATASOURCE5): every dim a default-schema STRING, MVs
    // sorted-with-duplicates, the count metric named `count`;
    // __time = millis 1576306800000
    spark.sql(
      """SELECT timestamp_millis(1576306800000) AS __time, *, 1L AS `count`
         FROM VALUES
           ('0', array('Baz','Baz','Hello','World'),
            array(CAST(NULL AS STRING),'Apple','Orange'),
            array('1','2','3','4','5','6','7','8'),
            '0', '0', '74416', '27', '5000.0', '147.0', '0', '372'),
           ('8', array('Baz','World','ㅑ ㅓ ㅕ ㅗ ㅛ ㅜ ㅠ ㅡ ㅣ'),
            array(CAST(NULL AS STRING),'Corundum','Xylophone'),
            CAST(NULL AS ARRAY<STRING>),
            '8', CAST(NULL AS STRING), '50515', '9', '4999.0', '25.0',
            '8', '252')
         AS t(dimHyperUnique, dimMultivalEnumerated, dimMultivalEnumerated2,
              dimMultivalSequentialWithNulls, dimSequential,
              dimSequentialHalfNull, dimUniform, dimZipf, metFloatNormal,
              metFloatZipf, metLongSequential, metLongUniform)""")
      .withColumn("dimMultivalEnumerated",
        col("dimMultivalEnumerated").as("dimMultivalEnumerated", mvMeta))
      .withColumn("dimMultivalEnumerated2",
        col("dimMultivalEnumerated2").as("dimMultivalEnumerated2", mvMeta))
      .withColumn("dimMultivalSequentialWithNulls",
        col("dimMultivalSequentialWithNulls")
          .as("dimMultivalSequentialWithNulls", mvMeta))
      .orderBy("dimHyperUnique").coalesce(1)
      .createOrReplaceTempView("lotsocolumns")
    // larry (Larry.java): an MVD and an auto-typed LONG array over the
    // same per-row object — [] and [null] are both the NULL MV (an MV of
    // only nulls ingests as the null row: testMvToArrayResults expects
    // mv_to_array(mv) = null for BOTH) but the REAL []/[null] arrays
    spark.sql(
      """SELECT TIMESTAMP'2000-01-01 00:00:00' AS __time, label, mv,
                11L AS l1, l_arr, 1L AS cnt
         FROM VALUES
           ('[]', CAST(NULL AS ARRAY<STRING>), array()),
           ('[null]', CAST(NULL AS ARRAY<STRING>),
            array(CAST(NULL AS BIGINT))),
           ('[1]', array('1'), array(1L)),
           ('[2,3]', array('2','3'), array(2L, 3L)),
           ('null', CAST(NULL AS ARRAY<STRING>), CAST(NULL AS ARRAY<BIGINT>))
         AS t(label, mv, l_arr)""")
      .withColumn("mv", col("mv").cast("array<string>").as("mv", mvMeta))
      .withColumn("l_arr", col("l_arr").cast("array<bigint>"))
      .coalesce(1).createOrReplaceTempView("larry")
    // visits (USERVISITDATASOURCE under INDEX_SCHEMA: m1/m2 have no
    // input fields -> NULL)
    spark.sql(
      """SELECT to_timestamp(t) AS __time, user, country, city, 1L AS cnt,
                CAST(NULL AS FLOAT) AS m1, CAST(NULL AS DOUBLE) AS m2
         FROM VALUES
           ('2021-01-01 01:00:00', 'alice', 'canada', 'A'),
           ('2021-01-01 02:00:00', 'alice', 'canada', 'B'),
           ('2021-01-01 03:00:00', 'bob', 'canada', 'A'),
           ('2021-01-01 04:00:00', 'alice', 'India', 'Y'),
           ('2021-01-02 01:00:00', 'alice', 'canada', 'A'),
           ('2021-01-02 02:00:00', 'bob', 'canada', 'A'),
           ('2021-01-02 03:00:00', 'foo', 'canada', 'B'),
           ('2021-01-02 04:00:00', 'bar', 'canada', 'B'),
           ('2021-01-02 05:00:00', 'alice', 'India', 'X'),
           ('2021-01-02 06:00:00', 'bob', 'India', 'X'),
           ('2021-01-02 07:00:00', 'foo', 'India', 'X'),
           ('2021-01-03 01:00:00', 'foo', 'USA', 'M')
         AS t(t, user, country, city)""")
      .orderBy("__time").coalesce(1).createOrReplaceTempView("visits")
    // forbiddenDatasource (FORBIDDEN_ROWS; the sweep replays the
    // SUPER_USER grids — authorization itself is the facade's concern)
    spark.sql(
      """SELECT * FROM VALUES
           (TIMESTAMP'2000-01-01 00:00:00', 'forbidden', 'abcd', 1L,
            CAST(9999.0 AS FLOAT), CAST(NULL AS DOUBLE),
            '"AQAAAQAAAALFBA=="'),
           (TIMESTAMP'2000-01-02 00:00:00', 'forbidden', 'a', 1L,
            CAST(1234.0 AS FLOAT), CAST(NULL AS DOUBLE),
            '"AQAAAQAAAALFBA=="')
         AS t(__time, dim1, dim2, cnt, m1, m2, unique_dim1)""")
      .orderBy("__time").coalesce(1)
      .createOrReplaceTempView("forbiddenDatasource")
    Seq("foo2", "foo4", "lotsocolumns", "larry", "visits",
      "forbiddenDatasource").foreach { t =>
      spark.table(t).write.mode("overwrite").saveAsTable(s"druid.$t")
      graft.functions.MvdTables.register(t)
      graft.functions.MvdTables.register(s"druid.$t")
    }
    // the `view` schema (SqlTestFramework.populateViews) — bodies
    // translated to Spark SQL with the Druid semantics noted above;
    // persistent views must reference catalog tables, not temp views
    spark.sql("CREATE DATABASE IF NOT EXISTS view")
    spark.sql("""CREATE OR REPLACE VIEW view.aview AS
      SELECT NULLIF(SUBSTRING(dim1, 1, 1), '') AS dim1_firstchar
      FROM druid.foo WHERE array_contains(dim2, 'a')""")
    spark.sql("""CREATE OR REPLACE VIEW view.bview AS
      SELECT COUNT(*) AS cnt FROM druid.foo
      WHERE __time >= TIMESTAMP'2000-01-02 00:00:00'
        AND __time < TIMESTAMP'2002-01-01 00:00:00'""")
    spark.sql("""CREATE OR REPLACE VIEW view.cview AS
      SELECT NULLIF(SUBSTRING(bar.dim1, 1, 1), '') AS dim1_firstchar,
             bar.dim2 AS dim2, dnf.l2 AS l2
      FROM (SELECT * FROM druid.foo WHERE array_contains(dim2, 'a')) bar
      INNER JOIN druid.numfoo dnf ON bar.dim2 = dnf.dim2""")
    spark.sql("""CREATE OR REPLACE VIEW view.dview AS
      SELECT NULLIF(SUBSTRING(dim1, 1, 1), '') AS numfoo
      FROM druid.foo WHERE array_contains(dim2, 'a')""")
    spark.sql("""CREATE OR REPLACE VIEW view.forbiddenView AS
      SELECT __time, NULLIF(SUBSTRING(dim1, 1, 1), '') AS dim1_firstchar,
             dim2
      FROM druid.foo WHERE array_contains(dim2, 'a')""")
    graft.functions.MvdTables.register("view.forbiddenView")
    graft.functions.MvdTables.register("view.cview")
    // INFORMATION_SCHEMA over the sweep session's own catalog state —
    // schema set and type names per the reference's InformationSchema
    // (MVDs report VARCHAR, __time is non-null, hll columns report their
    // ingest-time COMPLEX type)
    registerSweepInformationSchema(spark)
  }

  private def registerSweepInformationSchema(spark: SparkSession): Unit = {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS information_schema")
    Seq("lookup", "view", "druid", "sys", "INFORMATION_SCHEMA")
      .map(s => ("druid", s, ""))
      .toDF("CATALOG_NAME", "SCHEMA_NAME", "SCHEMA_OWNER")
      .write.mode("overwrite").saveAsTable("information_schema.schemata")
    def druidType(f: org.apache.spark.sql.types.StructField): String =
      f.dataType match {
        case _ if f.name.startsWith("unique_dim1") => "COMPLEX<hyperUnique>"
        case org.apache.spark.sql.types.StringType => "VARCHAR"
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, _) => "VARCHAR"
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, _) => "BIGINT ARRAY"
        case org.apache.spark.sql.types.LongType => "BIGINT"
        case org.apache.spark.sql.types.FloatType => "FLOAT"
        case org.apache.spark.sql.types.DoubleType => "DOUBLE"
        case org.apache.spark.sql.types.TimestampType => "TIMESTAMP"
        case other => other.sql
      }
    val cols = Seq("druid", "view").flatMap { db =>
      spark.catalog.listTables(db).collect().toSeq
        .filterNot(_.isTemporary).flatMap { t =>
        spark.table(s"$db.${t.name}").schema.fields.zipWithIndex.map {
          case (f, i) =>
            (db, t.name, f.name, i + 1L,
              if (f.name == "__time") "NO" else "YES", druidType(f))
        }
      }
    }
    cols.toDF("TABLE_SCHEMA", "TABLE_NAME", "COLUMN_NAME",
      "ORDINAL_POSITION", "IS_NULLABLE", "DATA_TYPE")
      .write.mode("overwrite").saveAsTable("information_schema.columns")
    // ROUTINES from the session function registry (the engine's own
    // Metadata builder), names uppercased like the reference's
    graft.operators.Metadata.informationSchemaRoutines(spark)
      .selectExpr("routine_catalog AS ROUTINE_CATALOG",
        "'INFORMATION_SCHEMA' AS ROUTINE_SCHEMA",
        "upper(routine_name) AS ROUTINE_NAME",
        "routine_type AS ROUTINE_TYPE",
        "is_aggregator AS IS_AGGREGATOR",
        "signatures AS SIGNATURES")
      .write.mode("overwrite").saveAsTable("information_schema.routines")
  }

  private def registerWikipediaFixtures(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val gz = "/root/reference/processing/src/test/resources/wikipedia/" +
      "wikiticker-2015-09-12-sampled.json.gz"
    if (!new java.io.File(gz).exists()) { println(s"WARN no $gz"); return }
    val dims = Seq("channel", "cityName", "comment", "countryIsoCode",
      "countryName", "isAnonymous", "isMinor", "isNew", "isRobot",
      "isUnpatrolled", "metroCode", "namespace", "page", "regionIsoCode",
      "regionName", "user")
    val df = spark.read.schema(
      "time STRING, " + dims.map(_ + " STRING").mkString(", ") +
      ", delta BIGINT, added BIGINT, deleted BIGINT")
      .json(gz)
      .withColumn("__time", to_timestamp(col("time"))).drop("time")
      .select(("__time" +: dims) ++ Seq("delta", "added", "deleted") map col: _*)
    df.createOrReplaceTempView("wikipedia")
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW wikipedia_first_last AS
      SELECT __time, ${dims.mkString(", ")},
             first(added) AS long_last_added, first(added) AS long_first_added,
             CAST(first(added) AS FLOAT) AS float_last_added,
             CAST(first(added) AS FLOAT) AS float_first_added,
             CAST(first(added) AS DOUBLE) AS double_last_added,
             CAST(first(added) AS DOUBLE) AS double_first_added,
             first(comment) AS string_first_added,
             first(comment) AS string_last_added
      FROM wikipedia GROUP BY __time, ${dims.mkString(", ")}""")
    Seq("wikipedia", "wikipedia_first_last").foreach { t =>
      spark.table(t).write.mode("overwrite").saveAsTable(s"druid.$t")
    }
  }

  /** Result order is only guaranteed by an ORDER BY at paren depth 0 — an
    * ORDER BY inside an OVER clause or subquery doesn't order the result
    * (the old whole-text regex made every windowed query "ordered" and
    * flagged pure row-order differences as mismatches).
    */
  private[graft] def hasTopLevelOrderBy(q: String): Boolean = {
    val s = q.toUpperCase
    var depth = 0; var i = 0; var found = false
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'O' if depth == 0 && s.regionMatches(i, "ORDER", 0, 5) &&
            (i == 0 || !s.charAt(i - 1).isLetterOrDigit) =>
          val rest = s.substring(i + 5)
          if (rest.matches("(?s)\\s+BY\\b.*")) found = true
        case _ =>
      }
      i += 1
    }
    found
  }

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/table_cases.jsonl")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/sweep_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.DruidFunctions.register(spark)
    GraftExtensions.register(spark)
    // the reference auto-types the all-null a_null array LONG (qaArray
    // ops_funcs ingest: [null,null,null] with "auto" typing), so lhs-typed
    // coercions null out appended/prepended strings — mv_prepend('A',
    // a_null) = [null,null,null,null] (ops_funcs_mv_funcs A1_B10_C13_D1).
    // The QaSuites gate fixture keeps VARCHAR typing for its DuckDB-oracle
    // batteries; the sweep replays against the reference's typing.
    spark.sql(viewSql(QaSuites.sparkTestArray.replace(
      "array(CAST(NULL AS STRING), NULL, NULL)",
      "array(CAST(NULL AS BIGINT), NULL, NULL)")
      .replace("test_array AS (", "test_array_base AS ("), "test_array_base"))
    // the reference's qaArray ingest adds 14 transform-derived scalar
    // columns (t_*_scalar1 = json_value(a_*, '$[0]'), t_*_scalar2 =
    // json_value(a_nested, '$[k][0]'); qaArray/sql/ingest.json
    // transformSpec) — the ingest_* corpus counts and filters them. The
    // boolean doc values render 'true'/'false' (the doc array is JSON
    // booleans; json_value stringifies), a_bool here is the LONG-ingested
    // array, so scalar1 maps 1→'true'/0→'false'.
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW test_array_full AS
      SELECT *,
        CASE element_at(a_bool, 1) WHEN 1 THEN 'true' WHEN 0 THEN 'false'
          END AS t_bool_scalar1,
        json_value(a_nested, '$[0][0]') AS t_bool_scalar2,
        element_at(a_int, 1) AS t_int_scalar1,
        json_value(a_nested, '$[1][0]') AS t_int_scalar2,
        element_at(a_float, 1) AS t_float_scalar1,
        json_value(a_nested, '$[2][0]') AS t_float_scalar2,
        element_at(a_str, 1) AS t_str_scalar1,
        json_value(a_nested, '$[3][0]') AS t_str_scalar2,
        CAST(NULL AS STRING) AS t_null_scalar1,
        json_value(a_nested, '$[4][0]') AS t_null_scalar2,
        CAST(NULL AS STRING) AS t_empty_scalar1,
        json_value(a_nested, '$[5][0]') AS t_empty_scalar2,
        element_at(a_mixed, 1) AS t_mixed_scalar1,
        json_value(a_nested, '$[6][0]') AS t_mixed_scalar2,
        1L AS cnt
      FROM test_array_base""")
    spark.sql(
      "CREATE OR REPLACE TEMPORARY VIEW test_array AS " +
        "SELECT * FROM test_array_full")
    // the reference's qaUnnest/array ingest carries an always-null s_null
    // dim between s_int and the arrays (qaUnnest/array/ingest.json) —
    // star expansion must produce it in position
    spark.sql(viewSql(QaSuites.sparkTestUnnest
      .replace("test_unnest AS (", "test_unnest_base AS ("),
      "test_unnest_base"))
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW test_unnest AS
      SELECT __time, s_int, CAST(NULL AS STRING) AS s_null, a_bool, a_int,
             a_float, a_str, a_null, a_empty, a_mixed, a_nested
      FROM test_unnest_base""")
    spark.sql(viewSql(QaSuites.sparkTestAggFuncs, "test_agg_funcs"))
    registerWinAndJsonFixtures(spark)
    registerTpchSsbFixtures(spark)

    import org.json4s._
    import org.json4s.jackson.JsonMethods
    case class Case(file: String, tid: String, query: String,
                    rows: Seq[Seq[String]], phase: String,
                    expectError: Boolean = false, errClass: String = "",
                    outerLimit: Int = 0)
    // phase = which fixture registration a case replays against. The same
    // query text carries DIFFERENT expected grids across ingest variants
    // (rollup=true dedupes the 4-row fixture to 2 rows with cnt=2), so
    // dedup is per-phase, not global.
    def phaseOf(dataset: String, q: String): String = dataset match {
      case "hashed_rollup_true" | "range_rollup_true" |
           "schmdisc_dynamic_rollup_true" => "rollup"
      // qaJsonCols ingest/* variants: grouped by the SHAPE the ingest
      // spec produces — rollup=false (4 rows), rollup=true (2), the
      // flatten-spec c1/c2 rewrite, and the schemaless scalar-only view.
      // TSV variants parse_json every column back, so their logical
      // content equals the JSON variants of the same rollup shape.
      case "jsoncols_schmless_json" => "jc_schmless"
      case "jsoncols_schmless_tsv" => "jc_schmless_tsv"
      case "jsoncols_flatten_spec" | "jsoncols_schmdisc_flatten_spec" =>
        "jc_flatten"
      case "jsoncols_dynamic_rollup_false" |
           "jsoncols_schmdisc_hashed_rollup_false" |
           "jsoncols_schmdisc_range_rollup_false" |
           "jsoncols_schmdisc_and_transform_spec" => "jc_false"
      case d if d.startsWith("jsoncols_") => "jc_true"
      case "calcite" => "calcite"
      case "calcite_la" => "calcite_la"
      case _ if q.contains("c_mv") => "mv"
      case _ => "main"
    }
    val seen = scala.collection.mutable.HashSet.empty[String]
    val cases = scala.io.Source.fromFile(path, "UTF-8").getLines().flatMap {
      line =>
        val j = JsonMethods.parse(line)
        val q = (j \ "query") match { case JString(s) => s; case _ => "" }
        def str(f: String) = (j \ f) match {
          case JString(s) => s; case _ => "" }
        val phase = phaseOf(str("dataset"), q)
        if (q.isEmpty || !seen.add(phase + "\u0000" + q)) None
        else {
          val rows = (j \ "rows") match {
            case JArray(rs) => rs.map {
              case JArray(cs) => cs.map {
                case JString(c) => c; case _ => "" }
              case _ => Nil
            }
            case _ => Nil
          }
          val expectErr = (j \ "expect_error") match {
            case JBool(b) => b; case _ => false }
          // sqlOuterLimit context (OUTER_LIMIT_CONTEXT pins 2): a hard
          // head on the FINAL result, applied after the outer sort
          val outerLimit = (j \ "outer_limit") match {
            case JInt(n) => n.toInt; case _ => 0 }
          Some(Case(str("file"), str("tid"), q, rows,
            if (expectErr) "calcite_err" else phase,
            expectError = expectErr, errClass = str("err_class"),
            outerLimit = outerLimit))
        }
    }.toVector

    val nOk = new AtomicInteger; val nBad = new AtomicInteger
    val nLenient = new AtomicInteger
    // rejection-parity: expected-error cases the engine instead RUNS —
    // deliberate capability extensions count separately from failures
    val nExtension = new AtomicInteger
    val errs = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val errExample = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val mism = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val lenient = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val errAll = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // the MV corpus reuses the test_unnest NAME with the c_mv_* column
    // set, and the rollup=true ingest variants reuse the test_array NAME
    // with the deduped table — each runs as its own phase against the
    // re-registered fixture view
    val mvCases = cases.filter(_.phase == "mv")
    val calciteCases = cases.filter(_.phase == "calcite")
    val errCases = cases.filter(_.phase == "calcite_err")
    val laCases = cases.filter(_.phase == "calcite_la")
    val rollupCases = cases.filter(_.phase == "rollup")
    val jcCases = cases.filter(_.phase.startsWith("jc_"))
      .groupBy(_.phase)
    val arrCases = cases.filter(_.phase == "main")
    def runPhase(phase: Vector[Case]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    phase.foreach { c =>
      pool.submit(new Runnable { def run(): Unit = {
        try {
          // corpus text is CALCITE dialect: string literals do NOT process
          // backslash escapes ('110\|' is a 4-char regex), where Spark's
          // parser would eat the backslash — double them like the facade
          // does (string_agg_long_test001 A22 pins the difference)
          val df0 = api.SqlApi.runSql(spark,
            api.SqlApi.calciteLiteralEscape(c.query))
          val df = if (c.outerLimit > 0) df0.limit(c.outerLimit) else df0
          val got = df.collect().map(_.toSeq.map(normCell)).toSeq
          if (c.expectError) {
            // the reference rejects this query; the engine ran it
            if (c.errClass == "capability") {
              nExtension.incrementAndGet()
              lenient.add(s"EXTENSION\t${c.file}\t${c.tid}" +
                s"\t${c.query.take(160)}\trows=${got.size}")
            } else {
              nBad.incrementAndGet()
              mism.add(s"MISSED-REJECT\t${c.file}\t${c.tid}" +
                s"\t${c.query.take(200)}\trows=${got.size}")
            }
            return
          }
          val ordered = hasTopLevelOrderBy(c.query)
          // grid match level: min over cells (0 = mismatch, 1 = lenient
          // match somewhere, 2 = every cell exact)
          def rowsEq(g: Seq[Seq[String]], e: Seq[Seq[String]]): Int =
            if (g.size != e.size) 0
            else g.zip(e).foldLeft(2) { case (acc, (gr, er)) =>
              if (acc == 0 || gr.size != er.size) 0
              else gr.zip(er).foldLeft(acc)((a, p) =>
                math.min(a, cellMatch(p._1, p._2)))
            }
          // unordered compares sort by NORMALIZED cells (quotes stripped,
          // ", " collapsed) so print-format-only differences — Spark's
          // `[a, b]` vs Druid's `["a","b"]` — can't misalign the rows that
          // cellMatch would then accept leniently
          def normKey(r: Seq[String]): String =
            r.map { c0 =>
              val c = c0.replace("\"", "").replace(", ", ",")
              // align the MV-rendering lenience: a single-element or
              // empty array print sorts with its unwrapped form so the
              // row pairing reaches cellMatch
              if (c.startsWith("[") && c.endsWith("]") &&
                  !c.substring(1, c.length - 1).contains(","))
                c.substring(1, c.length - 1)
              else c
            }.mkString(" ")
          val lvl =
            if (ordered) rowsEq(got, c.rows)
            else rowsEq(got.sortBy(normKey), c.rows.sortBy(normKey))
          def oneLine(t: String): String =
            t.replace('\n', ' ').replace('\t', ' ')
          if (lvl == 2) nOk.incrementAndGet()
          else if (lvl == 1) {
            nLenient.incrementAndGet()
            lenient.add(s"LENIENT\t${c.file}\t${c.tid}\t${oneLine(c.query.take(160))}" +
              s"\tgot=${got.take(2).map(_.mkString("|")).mkString(";")}" +
              s"\texp=${c.rows.take(2).map(_.mkString("|")).mkString(";")}")
          }
          else {
            nBad.incrementAndGet()
            // dump SORTED rows when the compare was unordered, so got/exp
            // align positionally and the first differing row is the real one
            val (gd, ed) =
              if (ordered) (got, c.rows)
              else (got.sortBy(normKey), c.rows.sortBy(normKey))
            val firstDiff = gd.zip(ed).indexWhere { case (gr, er) =>
              gr.size != er.size || gr.zip(er).exists(p => cellMatch(p._1, p._2) == 0)
            }
            mism.add(s"MISMATCH\t${c.file}\t${c.tid}\t${oneLine(c.query.take(200))}" +
              s"\tnGot=${gd.size}\tnExp=${ed.size}\tdiffRow=$firstDiff" +
              s"\tgot=${gd.slice(math.max(0, firstDiff), firstDiff + 3).map(_.mkString("|")).mkString(";")}" +
              s"\texp=${ed.slice(math.max(0, firstDiff), firstDiff + 3).map(_.mkString("|")).mkString(";")}")
          }
        } catch {
          case ex: Throwable if c.expectError =>
            // rejection parity: the engine throws where the reference
            // throws — record the reason class for the register
            nOk.incrementAndGet()
            lenient.add(s"REJECTED\t${c.file}\t${c.tid}" +
              s"\t${ex.getClass.getSimpleName}: " +
              Option(ex.getMessage).getOrElse("").linesIterator
                .nextOption().getOrElse("").take(120))
          case ex: Throwable =>
            val key = ex.getClass.getSimpleName + ": " +
              Option(ex.getMessage).getOrElse("null")
                .linesIterator.nextOption().getOrElse("").take(140)
            errs.merge(key, 1, (a, b) => a + b)
            errExample.putIfAbsent(key, c.query.take(400))
            errAll.add(s"ERROR\t${c.file}\t${c.tid}\t${key.take(120)}" +
              s"\t${c.query.take(300)}")
        }
      }})
    }
    pool.shutdown()
    pool.awaitTermination(120, java.util.concurrent.TimeUnit.MINUTES)
    }
    runPhase(arrCases)
    if (calciteCases.nonEmpty || errCases.nonEmpty || laCases.nonEmpty) {
      registerCalciteFixtures(spark)
      registerNestedFixtures(spark)
      registerWikipediaFixtures(spark)
      registerRound20Fixtures(spark)
      runPhase(calciteCases)
      runPhase(errCases)
      // LOS_ANGELES session-context cases: the fixtures hold absolute
      // instants, the session zone only changes query-time rendering and
      // calendar grouping — exactly the reference's sqlTimeZone contract
      if (laCases.nonEmpty) {
        val TzKey = "spark.sql.session.timeZone"
        val prevTz = spark.conf.get(TzKey)
        spark.conf.set(TzKey, "America/Los_Angeles")
        renderZone = java.time.ZoneId.of("America/Los_Angeles")
        try runPhase(laCases)
        finally { spark.conf.set(TzKey, prevTz); renderZone = null }
      }
    }
    // rollup=true ingest variants (qaArray ingest_hashed/range_rollup_true,
    // schmdisc_dynamic_rollup_true): same dims + transforms, but ingestion
    // GROUPS identical rows — the 4-row fixture dedupes to 2 with the
    // count metric cnt accumulating 2 per surviving row
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW test_array AS
      SELECT __time, a_bool, a_int, a_float, a_str, a_null, a_empty,
             a_mixed, a_nested,
             t_bool_scalar1, t_bool_scalar2, t_int_scalar1, t_int_scalar2,
             t_float_scalar1, t_float_scalar2, t_str_scalar1, t_str_scalar2,
             t_null_scalar1, t_null_scalar2, t_empty_scalar1,
             t_empty_scalar2, t_mixed_scalar1, t_mixed_scalar2,
             count(*) AS cnt
      FROM test_array_full
      GROUP BY __time, a_bool, a_int, a_float, a_str, a_null, a_empty,
               a_mixed, a_nested,
               t_bool_scalar1, t_bool_scalar2, t_int_scalar1, t_int_scalar2,
               t_float_scalar1, t_float_scalar2, t_str_scalar1,
               t_str_scalar2, t_null_scalar1, t_null_scalar2,
               t_empty_scalar1, t_empty_scalar2, t_mixed_scalar1,
               t_mixed_scalar2""")
    runPhase(rollupCases)
    // ---- qaJsonCols ingest/* variant phases ----------------------------
    // the ingest specs add 15 transform-derived t_* columns (json_query
    // extracts + a json_object combine; ingest_dynamic_rollup_false.json)
    // and the rollup count metric; built through the facade so the
    // json_object KEY/VALUE dialect resolves
    if (jcCases.nonEmpty) {
      // scalar-targeting transforms auto-type in the reference (VARCHAR/
      // LONG/DOUBLE per the JSON value; booleans land as LONG 1/0), and
      // t_new embeds the c1/c2 DOCUMENTS — spelled textually because the
      // engine's nested-as-STRING representation would otherwise quote
      // them as strings
      val tCols = """
        json_query(c1, '$.a_obj') AS t_obj,
        json_query(c1, '$.a_array[0]') AS t_array,
        json_value(s_str, '$.') AS t_str1,
        CAST(json_value(s_num_int, '$.') AS BIGINT) AS t_num_int1,
        CAST(json_value(s_num_float, '$.') AS DOUBLE) AS t_num_float1,
        CAST(json_value(s_bool, '$.') AS BIGINT) AS t_bool1,
        json_value(s_null, '$.') AS t_null1,
        json_query(c_empty_array_nested, '$[0]') AS t_empty_obj,
        json_query(c_empty_obj_nested, '$.o2') AS t_empty_array,
        json_value(c1, '$.a_str') AS t_str2,
        CAST(json_value(c1, '$.a_obj.a_num_int') AS BIGINT) AS t_num_int2,
        CAST(json_value(c1, '$.a_array[0].a_num_float') AS DOUBLE)
          AS t_num_float2,
        CASE WHEN json_value(c1, '$.a_array[1].a_bool') IN ('true', '1')
          THEN 1L WHEN json_value(c1, '$.a_array[1].a_bool')
          IN ('false', '0') THEN 0L END AS t_bool2,
        json_value(c1, '$.a_null') AS t_null2,
        '{"c1":' || coalesce(c1, 'null') || ',"c2":' ||
          coalesce(c2, 'null') || '}' AS t_new"""
      api.SqlApi.runSql(spark,
        s"SELECT *, $tCols, 1L AS cnt FROM test_json_cols_base")
        .createOrReplaceTempView("test_json_cols_full")
      def jcPhase(key: String)(registerFixture: => Unit): Unit =
        jcCases.get(key).foreach { cs => registerFixture; runPhase(cs) }
      jcPhase("jc_false") {
        spark.sql("CREATE OR REPLACE TEMPORARY VIEW test_json_cols AS " +
          "SELECT * FROM test_json_cols_full")
      }
      jcPhase("jc_true") {
        // rollup=true ingestion groups the 2×-duplicated docs: 2 rows,
        // cnt accumulates 2
        spark.sql("""CREATE OR REPLACE TEMPORARY VIEW test_json_cols AS
          SELECT * EXCEPT(cnt), count(*) AS cnt FROM test_json_cols_full
          GROUP BY ALL""")
      }
      jcPhase("jc_flatten") {
        // flattenSpec rewrites c1 → .c1.a_obj and c2 → .c2.a_array[0]
        // BEFORE the transforms (ingest_flatten_spec.json), rollup=true
        api.SqlApi.runSql(spark,
          s"""SELECT * EXCEPT(cnt), count(*) AS cnt FROM (
                SELECT *, $tCols, 1L AS cnt FROM (
                  SELECT __time, s_str, s_num_int, s_num_float, s_bool,
                         s_null, c_empty_obj, c_empty_array,
                         c_empty_obj_nested, c_empty_array_nested,
                         json_query(c1, '$$.a_obj') AS c1,
                         json_query(c2, '$$.a_array[0]') AS c2
                  FROM test_json_cols_base))
              GROUP BY ALL""")
          .createOrReplaceTempView("test_json_cols")
      }
      jcPhase("jc_schmless") {
        // schemaless ingest: every scalar lands as its RAW STRING
        // ('true', not the auto-typed 1), nested objects render as Java
        // Map.toString ('{o1={}, o2=[], o3=null}'), nested arrays become
        // MVs of stringified elements SORTED nulls-first
        // ([null, '[]', '{}'] — the ingest MV value sort); rollup=true
        spark.sql("""CREATE OR REPLACE TEMPORARY VIEW test_json_cols AS
          SELECT __time, CAST(s_str AS STRING) AS s_str,
                 CAST(s_num_int AS STRING) AS s_num_int,
                 CAST(s_num_float AS STRING) AS s_num_float,
                 CASE s_bool WHEN 1 THEN 'true' WHEN 0 THEN 'false'
                   END AS s_bool,
                 CAST(s_null AS STRING) AS s_null,
                 c_empty_obj, c_empty_array,
                 CASE WHEN c_empty_obj_nested IS NOT NULL
                   THEN '{o1={}, o2=[], o3=null}' END AS c_empty_obj_nested,
                 CASE WHEN c_empty_array_nested IS NOT NULL
                   THEN array(CAST(NULL AS STRING), '[]', '{}')
                   END AS c_empty_array_nested,
                 c1, c2, count(*) AS cnt
          FROM test_json_cols_base GROUP BY ALL""")
      }
      jcPhase("jc_schmless_tsv") {
        // schemaless TSV: every cell stays its RAW text — nested columns
        // keep their compact JSON spelling as plain STRINGs; rollup=true
        spark.sql("""CREATE OR REPLACE TEMPORARY VIEW test_json_cols AS
          SELECT __time, CAST(s_str AS STRING) AS s_str,
                 CAST(s_num_int AS STRING) AS s_num_int,
                 CAST(s_num_float AS STRING) AS s_num_float,
                 CASE s_bool WHEN 1 THEN 'true' WHEN 0 THEN 'false'
                   END AS s_bool,
                 CAST(s_null AS STRING) AS s_null,
                 c_empty_obj, c_empty_array, c_empty_obj_nested,
                 c_empty_array_nested, c1, c2, count(*) AS cnt
          FROM test_json_cols_base GROUP BY ALL""")
      }
    }
    // Druid ingests a NULL or EMPTY multi-value string as a single-null MV
    // (the documented MV-ingestion rule): unnest over the *_row fixtures
    // yields one NULL-element row per such row (mv_sql_order_by A5_B2:
    // the null group counts 5 = 3 null elements + the null row + the
    // empty row). The engine gate fixture keeps NULL/[] for its
    // DuckDB-oracle batteries; the sweep replays the reference ingest.
    spark.sql(viewSql(QaSuites.sparkTestMv
      .replace("CAST(NULL AS ARRAY<STRING>)", "array(CAST(NULL AS STRING))")
      .replace("CAST(array() AS ARRAY<STRING>)",
        "array(CAST(NULL AS STRING))"), "test_unnest"))
    runPhase(mvCases)
    // full diff lists go to a file (the console caps would hide the tail);
    // console keeps the first 200 for a quick look
    val out = new java.io.PrintWriter("/tmp/sweep_mismatches.tsv", "UTF-8")
    mism.forEach(m => out.println(m))
    lenient.forEach(m => out.println(m))
    errAll.forEach(m => out.println(m))
    out.close()
    mism.stream().limit(200).forEach(m => println(m))
    lenient.stream().limit(50).forEach(m => println(m))
    println(s"AUDIT total=${cases.size} exact=${nOk.get} " +
      s"lenient=${nLenient.get} mismatch=${nBad.get} " +
      s"errored=${errs.values().stream().mapToInt(_.intValue).sum} " +
      s"extensions=${nExtension.get}")
    println("full diff list: /tmp/sweep_mismatches.tsv")
    import scala.jdk.CollectionConverters._
    errs.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, v) =>
      println(s"ERRCLASS\t$v\t$k\tEG: ${errExample.getOrDefault(k, "")}")
    }
    spark.stop()
  }
}
