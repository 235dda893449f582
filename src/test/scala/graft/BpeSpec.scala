package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins pipeline.Bpe against the hand-computed classic-BPE trace of a toy
  * corpus (Sennrich-style: most frequent adjacent pair merges first, ties
  * break lexicographically, application is single-pass left-to-right).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("train follows the classic BPE trace with deterministic tie-breaks") {
    import spark.implicits._
    val docs = Seq((1L, "the cat the hat"), (2L, "the thin cat"),
      (3L, "that hat")).toDF("doc_id", "text")
    // pair counts round 0: (a,t)=5 (cat,hat,that), (t,h)=5 (the x3, thin,
    // that), tie -> lexicographic 'a' < 't'; then (t,h)=5; then the
    // finished words in frequency/tie order
    assert(pipeline.Bpe.train(docs, "text", 5) ==
      Seq(("a", "t"), ("t", "h"), ("th", "e"), ("c", "at"), ("h", "at")))
  }

  test("tokenCounts applies merges to distinct words and sums per doc") {
    import spark.implicits._
    val docs = Seq((1L, "the cat the hat"), (2L, "the thin cat"),
      (3L, "that hat")).toDF("doc_id", "text")
    val merges = pipeline.Bpe.train(docs, "text", 5)
    val rows = pipeline.Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc1: the+cat+the+hat all single tokens; doc2: thin -> th,i,n (3);
    // doc3: that -> th,at (2), hat -> 1
    assert(rows == Seq((1L, 4L, 4L), (2L, 3L, 5L), (3L, 2L, 3L)))
  }

  test("merge application is single-pass left-to-right on repeats") {
    import spark.implicits._
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    // round 1: (a,a) count 4 -> merge; "a a a" -> "aa a" (not "a aa");
    // round 2: (aa,a) count 2 -> merge -> single symbol
    val merges = pipeline.Bpe.train(docs, "text", 2)
    assert(merges == Seq(("a", "a"), ("aa", "a")))
    val counts = pipeline.Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(counts == Seq((2L, 2L)))
  }

  test("fewer possible merges than requested terminates cleanly") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = pipeline.Bpe.train(docs, "text", 10)
    assert(merges == Seq(("a", "b")))
  }
}
