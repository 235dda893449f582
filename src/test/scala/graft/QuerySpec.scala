package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Runs every SparkEntry query against sf0.001 and sanity-checks shape.
  * (Value-level correctness is gated by the DuckDB oracle compare —
  * tools/check.py at sf0.01; this spec catches runtime regressions fast.)
  */
class QuerySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  // every query must run and (except pair-mining queries and
  // ultra-selective TPC-H/SSB filters that may legitimately be empty at
  // tiny scale) return rows
  private val mayBeEmpty = Set("q_dedup_minhash", "q_dedup_simhash",
    "q_dedup_ngram_jaccard", "q_embed_ann_lsh",
    "q_tpch_q11", "q_tpch_q20", "q_ssb_q3_3")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      spark.sparkContext.setLogLevel("ERROR")
      val df = fn(spark, dir)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("no duplicate gate names in the SparkEntry source") {
    // a Map literal silently keeps only the LAST binding for a repeated
    // key, so a re-added gate name would shadow the original and its plan
    // pins without any compile error — scan the source for duplicates
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val defs = """"(q_[a-z0-9_]+)" -> \(\(s, dir\)""".r
      .findAllMatchIn(src).map(_.group(1)).toSeq
    val dups = defs.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate gate definitions: $dups")
    // the oracle map shadows the same way: each gate name may be bound at
    // most twice in the whole file (once in queries, once in oracleSql)
    val all = """"(q_[a-z0-9_]+)" ->""".r
      .findAllMatchIn(src).map(_.group(1)).toSeq
    val overBound = all.groupBy(identity).filter(_._2.size > 2).keys
    assert(overBound.isEmpty, s"gate names bound more than twice: $overBound")
  }
}
