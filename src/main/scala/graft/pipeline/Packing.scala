package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for LLM training-data preparation: lay all documents'
  * tokens on one global tape (in a stable document order) and cut it into
  * fixed-size training sequences — the standard concat-then-split packing
  * step (documents straddle sequence boundaries; no padding waste). Each
  * document gets its (sequence id, offset) assignment from the global token
  * prefix sum.
  *
  * The prefix sum is the interesting distributed piece: a naive
  * `Window.orderBy(...)` with no partitioning moves the WHOLE corpus to one
  * task. [[withPrefixSum]] instead runs the classic two-phase scan — range
  * partition by the order key, per-partition totals (one tiny driver
  * collect of numPartitions longs), exclusive per-partition offsets
  * broadcast back as a literal map, then a per-partition window cumsum. Each
  * task only ever sorts its own range; at 100 TB the only global state is
  * one long per partition.
  */
object Packing {

  /** Exclusive prefix sum of `valueCol` under the total order of `orderCol`
    * (which must be unique — ties across a range-partition boundary would
    * make the tie order, and therefore the sums, nondeterministic).
    * Adds `outCol` = sum of `valueCol` over all STRICTLY PRECEDING rows.
    */
  def withPrefixSum(df: DataFrame, orderCol: String, valueCol: Column,
                    outCol: String, numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    // persist: the ranged table feeds the totals pass AND the final cumsum
    // localCheckpoint, NOT persist: the partition ids are NONDETERMINISTIC
    // on recompute (repartitionByRange re-samples boundaries), so the
    // offsets collected below must pin THIS materialization — a released
    // or lost cache block recomputing through lineage would silently
    // misalign the cumsum. Checkpoint blocks are ContextCleaner-scoped
    // (freed when the caller drops the result), so no session-level leak.
    val ranged = df
      .repartitionByRange(parts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", valueCol.cast("long"))
      .localCheckpoint()
    // phase 1: per-partition totals — numPartitions rows to the driver
    val totals = ranged.groupBy(col("__pid")).agg(sum(col("__v")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive scan over partition ids → each partition's global offset
    var acc = 0L
    val offsets = totals.map { case (pid, t) =>
      val entry = pid -> acc; acc += t; entry
    }
    val offsetExpr = typedlit(offsets.toMap)
    // phase 2: within-partition exclusive cumsum + broadcast offset
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn(outCol,
        coalesce(sum(col("__v")).over(w), lit(0L)) +
          coalesce(offsetExpr.getItem(col("__pid")), lit(0L)))
      .drop("__pid", "__v")
  }

  /** Pack documents into fixed-`maxTokens` training sequences by global
    * token offset (concat-then-split; stable under `idCol` order).
    *
    * @return (idCol, n_tokens, seq_id, seq_offset) — the document's token
    *         count, the training sequence its FIRST token lands in, and the
    *         offset within that sequence
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    maxTokens: Int, numPartitions: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val withTok = df.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    withPrefixSum(withTok, idCol, col("n_tokens"), "start_tok",
      numPartitions)
      .select(col(idCol), col("n_tokens"),
        floor(col("start_tok") / lit(maxTokens.toDouble)).cast("long")
          .as("seq_id"),
        (col("start_tok") % maxTokens).as("seq_offset"))
  }
}
