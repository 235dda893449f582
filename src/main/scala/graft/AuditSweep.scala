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

  private def normCell(v: Any): String = v match {
    case null => ""
    case b: Boolean => if (b) "true" else "false"
    case s: scala.collection.Seq[_] =>
      s.map(e => if (e == null) "null" else normCell(e)).mkString("[", ", ", "]")
    case ts: java.sql.Timestamp =>
      val s = ts.toString // 2022-01-01 00:00:00.0
      if (s.matches(".*\\.\\d$")) s + "00" else s
    case d: Double => fmtDouble(d)
    case f: Float => fmtDouble(f.toDouble)
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
    // Druid renders a SINGLE-ELEMENT multi-value string unwrapped (the
    // documented MV-rendering divergence) — count as lenient, not exact
    if (g == "[" + e + "]" || e == "[" + g + "]") return 1
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
        .createOrReplaceTempView("test_json_cols")
    } else println(s"WARN no $jsonPath — run tools/extract_fixture_data.py")
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
      "array(CAST(NULL AS BIGINT), NULL, NULL)"), "test_array"))
    spark.sql(viewSql(QaSuites.sparkTestUnnest, "test_unnest"))
    spark.sql(viewSql(QaSuites.sparkTestAggFuncs, "test_agg_funcs"))
    registerWinAndJsonFixtures(spark)

    import org.json4s._
    import org.json4s.jackson.JsonMethods
    case class Case(file: String, tid: String, query: String,
                    rows: Seq[Seq[String]])
    val seen = scala.collection.mutable.HashSet.empty[String]
    val cases = scala.io.Source.fromFile(path, "UTF-8").getLines().flatMap {
      line =>
        val j = JsonMethods.parse(line)
        val q = (j \ "query") match { case JString(s) => s; case _ => "" }
        if (q.isEmpty || !seen.add(q)) None
        else {
          val rows = (j \ "rows") match {
            case JArray(rs) => rs.map {
              case JArray(cs) => cs.map {
                case JString(c) => c; case _ => "" }
              case _ => Nil
            }
            case _ => Nil
          }
          def str(f: String) = (j \ f) match {
            case JString(s) => s; case _ => "" }
          Some(Case(str("file"), str("tid"), q, rows))
        }
    }.toVector

    val nOk = new AtomicInteger; val nBad = new AtomicInteger
    val nLenient = new AtomicInteger
    val errs = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val errExample = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val mism = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val lenient = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // the MV corpus reuses the test_unnest NAME with the c_mv_* column
    // set — run it as a second phase against the MV fixture view
    val (mvCases, arrCases) = cases.partition(_.query.contains("c_mv"))
    def runPhase(phase: Vector[Case]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    phase.foreach { c =>
      pool.submit(new Runnable { def run(): Unit = {
        try {
          // corpus text is CALCITE dialect: string literals do NOT process
          // backslash escapes ('110\|' is a 4-char regex), where Spark's
          // parser would eat the backslash — double them like the facade
          // does (string_agg_long_test001 A22 pins the difference)
          val df = api.SqlApi.runSql(spark,
            api.SqlApi.calciteLiteralEscape(c.query))
          val got = df.collect().map(_.toSeq.map(normCell)).toSeq
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
            r.map(_.replace("\"", "").replace(", ", ",")).mkString(" ")
          val lvl =
            if (ordered) rowsEq(got, c.rows)
            else rowsEq(got.sortBy(normKey), c.rows.sortBy(normKey))
          if (lvl == 2) nOk.incrementAndGet()
          else if (lvl == 1) {
            nLenient.incrementAndGet()
            lenient.add(s"LENIENT\t${c.file}\t${c.tid}\t${c.query.take(160)}" +
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
            mism.add(s"MISMATCH\t${c.file}\t${c.tid}\t${c.query.take(200)}" +
              s"\tnGot=${gd.size}\tnExp=${ed.size}\tdiffRow=$firstDiff" +
              s"\tgot=${gd.slice(math.max(0, firstDiff), firstDiff + 3).map(_.mkString("|")).mkString(";")}" +
              s"\texp=${ed.slice(math.max(0, firstDiff), firstDiff + 3).map(_.mkString("|")).mkString(";")}")
          }
        } catch {
          case ex: Throwable =>
            val key = ex.getClass.getSimpleName + ": " +
              Option(ex.getMessage).getOrElse("null")
                .linesIterator.nextOption().getOrElse("").take(140)
            errs.merge(key, 1, (a, b) => a + b)
            errExample.putIfAbsent(key, c.query.take(400))
        }
      }})
    }
    pool.shutdown()
    pool.awaitTermination(120, java.util.concurrent.TimeUnit.MINUTES)
    }
    runPhase(arrCases)
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
    out.close()
    mism.stream().limit(200).forEach(m => println(m))
    lenient.stream().limit(50).forEach(m => println(m))
    println(s"AUDIT total=${cases.size} exact=${nOk.get} " +
      s"lenient=${nLenient.get} mismatch=${nBad.get} " +
      s"errored=${errs.values().stream().mapToInt(_.intValue).sum}")
    println("full diff list: /tmp/sweep_mismatches.tsv")
    import scala.jdk.CollectionConverters._
    errs.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, v) =>
      println(s"ERRCLASS\t$v\t$k\tEG: ${errExample.getOrDefault(k, "")}")
    }
    spark.stop()
  }
}
