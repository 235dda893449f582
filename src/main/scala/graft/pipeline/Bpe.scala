package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding utilities for training-data token
  * budgeting (the reference has whitespace-level counting only; subword
  * counts are what LLM data pipelines budget by — compare
  * `processing/.../segment` row-count stats, druid.tex corpus sizing).
  *
  * The trainer is the classic BPE loop (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units")
  * expressed relationally:
  *
  *  - the corpus is collapsed ONCE to a (word, freq) vocabulary — the only
  *    corpus-sized shuffle; every training round after that runs on the
  *    vocabulary, which is orders of magnitude smaller than the corpus
  *    (the standard BPE trick, and the reason this scales to 100 TB:
  *    round cost is O(|vocab|), not O(corpus))
  *  - each round: one pair-count aggregate over adjacent symbol pairs +
  *    a LIMIT-1 argmax to the driver (a bounded, deterministic collect);
  *    ties break on (count DESC, left ASC, right ASC) so the merge table
  *    is a pure function of the corpus
  *  - a merge (a, b) is applied by literal string replace of " a b " with
  *    " ab " on the space-delimited symbol string — left-to-right
  *    non-overlapping, exactly BPE's single-pass greedy application (and
  *    exactly reproducible in any engine with literal replace semantics)
  */
object Bpe {

  /** Whitespace word vocabulary: one hash aggregate over the corpus. */
  def vocabulary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(split(col(textCol), "\\s+"),
        t => length(t) > 0)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial symbolization: the word as space-joined characters. */
  private def symbolize(word: Column): Column =
    array_join(split(word, ""), " ")

  /** One merge applied to a space-delimited symbol string. */
  private def applyMerge(s: Column, a: String, b: String): Column =
    trim(replace(concat(lit(" "), s, lit(" ")),
      lit(s" $a $b "), lit(s" $a$b ")))

  /** Train `numMerges` BPE merges over the corpus; returns the merge table
    * in application order. Deterministic: ties on pair count break
    * lexicographically.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int)
      : Seq[(String, String)] = {
    // Each round's argmax is the round's ONLY job: it materializes the
    // current vocab's checkpoint as a side effect (lazy localCheckpoint
    // caches on first computation; the job-end doCheckpoint pass fills any
    // partitions the LIMIT short-circuited), so the previous round's blocks
    // can be dropped right after — the eager `count()` materialization this
    // replaces doubled the per-round job count for no extra information
    // (measured ~40% of train time at 10 merges). localCheckpoint rather
    // than persist: it TRUNCATES lineage, so round i's plan is one replace
    // over round i-1's stored blocks instead of an i-deep replace chain
    // re-optimized every round. Releases go through
    // Bridge.unpersistCheckpointBlocks: Dataset.unpersist() only talks to
    // the CacheManager and is a NO-OP for checkpoint blocks (RDD-level
    // persists), which otherwise wait for driver GC + ContextCleaner and
    // accumulate across a long session (r20 advice).
    var vocab = vocabulary(df, textCol)
      .select(col("word"), col("freq"), symbolize(col("word")).as("s"))
      .localCheckpoint(false)
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    for (_ <- 0 until numMerges) {
      val top = vocab
        .filter(size(split(col("s"), " ")) >= 2)
        .select(col("freq"), split(col("s"), " ").as("syms"))
        .select(col("freq"),
          explode(sequence(lit(0), size(col("syms")) - 2)).as("i"),
          col("syms"))
        .select(element_at(col("syms"), col("i") + 1).as("a"),
          element_at(col("syms"), col("i") + 2).as("b"), col("freq"))
        .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      // vocab's checkpoint is now fully materialized and lineage-truncated:
      // the parent checkpoint it was computed from (one literal replace
      // behind) is dead weight and never read again — release its blocks
      prev.foreach(org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpointBlocks)
      prev = None
      if (top.nonEmpty) {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = vocab
          .select(col("word"), col("freq"),
            applyMerge(col("s"), a, b).as("s"))
          .localCheckpoint(false)
        prev = Some(vocab)
        vocab = next
      }
    }
    // neither the final vocab nor its parent is ever read again: callers
    // only consume the merge TABLE (encode/tokenCounts re-derive symbol
    // strings from it) — drop both rounds' checkpoint blocks deterministically
    prev.foreach(org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpointBlocks)
    org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpointBlocks(vocab)
    merges.toList
  }

  /** Symbol string of a word under a trained merge table (codegen'd chain
    * of literal replaces — no UDF).
    */
  def encode(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbolize(word)) { case (s, (a, b)) =>
      applyMerge(s, a, b)
    }

  /** Per-document whitespace and BPE token counts under `merges`.
    *
    * Scale shape: the corpus explodes to (id, word) once, the DISTINCT
    * words encode once (vocabulary-sized projection), and one join +
    * hash aggregate produce the counts — the merge chain never runs
    * per-occurrence, only per distinct word.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val words = df.select(col(idCol),
      explode(filter(split(col(textCol), "\\s+"),
        t => length(t) > 0)).as("word"))
    val encoded = words.select(col("word")).distinct()
      .select(col("word"),
        size(split(encode(col("word"), merges), " ")).cast("long")
          .as("n_sub"))
    words.join(encoded, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens_ws"),
        sum(col("n_sub")).as("n_tokens_bpe"))
      .select(col(idCol), col("n_tokens_ws").cast("long").as("n_tokens_ws"),
        col("n_tokens_bpe").cast("long").as("n_tokens_bpe"))
  }
}
