package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join surface (reference: `segment/join/HashJoinEngine.java:35`,
  * `JoinDataSource.java`, MSQ `SortMergeJoinFrameProcessor.java:105`).
  *
  * The reference's native engine only does broadcast-hash joins (the right
  * side is always a hashed, fully materialized `Joinable`); big-big joins go
  * through MSQ's shuffle sort-merge. Spark has both natively — we expose
  * intent-named helpers so call sites document which plan they expect, and the
  * broadcast hint keeps the optimizer honest when the dim table's size
  * estimate is off (a 100 TB fact table must never be shuffled against a
  * 25-row dimension).
  */
object Joins {

  /** Broadcast-hash join: dimension side replicated to every executor —
    * the reference's GlobalTableDataSource / JoinableFactory path.
    */
  def broadcastJoin(fact: DataFrame, dim: DataFrame, cond: Column,
                    joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim), cond, joinType)

  /** Shuffle sort-merge join for big-big (reference: MSQ sortMerge algorithm,
    * `query/JoinAlgorithm.java:30`).
    */
  def sortMergeJoin(left: DataFrame, right: DataFrame, cond: Column,
                    joinType: String = "inner"): DataFrame =
    left.hint("merge").join(right.hint("merge"), cond, joinType)

  /** Semi/anti joins — the reference plans SQL `IN`/`EXISTS` subqueries into
    * these (`sql/.../DruidJoinQueryRel.java`).
    */
  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** Lookup join (reference `query/LookupDataSource.java:38`): a bounded
    * key→value table used as a map. Implemented as a broadcast join rather
    * than a driver-collected literal so the lookup can be arbitrarily "small"
    * (up to the broadcast threshold) without ever touching the driver.
    */
  def lookupJoin(fact: DataFrame, lookup: DataFrame, factKey: Column,
                 lookupKey: Column, lookupValue: Column,
                 as: String): DataFrame =
    fact.join(broadcast(lookup.select(lookupKey.as("__lk"), lookupValue.as(as))),
      factKey === col("__lk"), "left").drop("__lk")
}
