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

  /** Cell equality: exact, numeric-tolerant, quote-insensitive for array
    * prints, and empty==NULL.
    */
  private def cellEq(got: String, exp: String): Boolean = {
    if (got == exp) return true
    val g = got.replace("\"", ""); val e = exp.replace("\"", "")
    if (g == e) return true
    if (g.replace(", ", ",") == e.replace(", ", ",")) return true
    try {
      val gd = got.toDouble; val ed = exp.toDouble
      return math.abs(gd - ed) <= 1e-6 * math.max(1.0, math.abs(ed))
    } catch { case _: Throwable => }
    // timestamp with/without trailing .000
    if (g.stripSuffix(".000") == e.stripSuffix(".000")) return true
    false
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
    spark.sql(viewSql(QaSuites.sparkTestArray, "test_array"))
    spark.sql(viewSql(QaSuites.sparkTestUnnest, "test_unnest"))

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
    val errs = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val errExample = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val mism = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // the MV corpus reuses the test_unnest NAME with the c_mv_* column
    // set — run it as a second phase against the MV fixture view
    val (mvCases, arrCases) = cases.partition(_.query.contains("c_mv"))
    def runPhase(phase: Vector[Case]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    phase.foreach { c =>
      pool.submit(new Runnable { def run(): Unit = {
        try {
          val df = api.SqlApi.runSql(spark, c.query)
          val got = df.collect().map(_.toSeq.map(normCell)).toSeq
          val ordered = "(?is).*\\bORDER\\s+BY\\b.*".r.matches(c.query)
          def rowsEq(g: Seq[Seq[String]], e: Seq[Seq[String]]): Boolean =
            g.size == e.size && g.zip(e).forall { case (gr, er) =>
              gr.size == er.size && gr.zip(er).forall(p => cellEq(p._1, p._2))
            }
          val fullEq =
            if (ordered) rowsEq(got, c.rows)
            else rowsEq(got.sortBy(_.mkString(" ")),
                        c.rows.sortBy(_.mkString(" ")))
          if (fullEq) nOk.incrementAndGet()
          else {
            nBad.incrementAndGet()
            if (mism.size < 200)
              mism.add(s"MISMATCH\t${c.file}\t${c.tid}\t${c.query.take(160)}" +
                s"\tgot=${got.take(3).map(_.mkString("|")).mkString(";")}" +
                s"\texp=${c.rows.take(3).map(_.mkString("|")).mkString(";")}")
          }
        } catch {
          case ex: Throwable =>
            val key = ex.getClass.getSimpleName + ": " +
              Option(ex.getMessage).getOrElse("null")
                .linesIterator.nextOption().getOrElse("").take(80)
            errs.merge(key, 1, (a, b) => a + b)
            errExample.putIfAbsent(key, c.query.take(200))
        }
      }})
    }
    pool.shutdown()
    pool.awaitTermination(120, java.util.concurrent.TimeUnit.MINUTES)
    }
    runPhase(arrCases)
    spark.sql(viewSql(QaSuites.sparkTestMv, "test_unnest"))
    runPhase(mvCases)
    mism.forEach(m => println(m))
    println(s"AUDIT total=${cases.size} ok=${nOk.get} mismatch=${nBad.get} " +
      s"errored=${errs.values().stream().mapToInt(_.intValue).sum}")
    import scala.jdk.CollectionConverters._
    errs.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, v) =>
      println(s"ERRCLASS\t$v\t$k\tEG: ${errExample.getOrDefault(k, "")}")
    }
    spark.stop()
  }
}
