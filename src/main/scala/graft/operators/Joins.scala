package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** As-of join: for every left row, the latest right row with
    * rightTime <= leftTime in the same key group — the canonical
    * point-in-time enrichment operator, which neither the reference nor
    * Spark SQL has natively.
    *
    * Implemented as tagged union + one window pass (`last(..., ignoreNulls)`
    * over rows-preceding): a single shuffle on (key), sorted once — no
    * per-row probing, no broadcast requirement, so it scales to big×big.
    * Right rows sort before left rows at equal timestamps, giving inclusive
    * (<=) semantics.
    *
    * @param rightCols right-side columns to carry (prefixed output names)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val payload = struct(rightCols.map(col): _*)
    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1)).withColumn("__payload",
        lit(null).cast(right.select(payload).schema.head.dataType))
    val r = right.select((col(keyCol) +: col(rightTime).as("__t") +:
      lit(0).as("__is_left") +: Seq(payload.as("__payload"))): _*)
    val unioned = l.select((left.columns.map(col) :+ col("__t") :+
      col("__is_left") :+ col("__payload")): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__match",
      last(col("__payload"), ignoreNulls = true).over(w))
    val out = carried.filter(col("__is_left") === 1)
    rightCols.zipWithIndex.foldLeft(out) { case (acc, (c, _)) =>
      acc.withColumn(prefix + c, col("__match").getField(c))
    }.drop("__t", "__is_left", "__payload", "__match")
  }

  /** Range join: match rows to the (broadcastable) interval table containing
    * their point — band/bucket classification. Plans as a broadcast
    * nested-loop with the range predicate, which is the right physical shape
    * when the interval side is small; a big-big range join would pre-bucket
    * both sides on interval grid cells first.
    */
  def rangeJoin(points: DataFrame, ranges: DataFrame, point: Column,
                lo: Column, hi: Column, joinType: String = "inner"): DataFrame =
    points.join(broadcast(ranges), point >= lo && point < hi, joinType)

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

  /** Pairwise-candidate join with a BOUNDED build side — the join shape
    * behind every blocked dedup/similarity verify step (probe × build on a
    * low-cardinality block key).
    *
    * Broadcasting the build side is the fast plan while it fits in memory,
    * but in a corpus-scale self-join the build side IS the corpus and an
    * unconditional broadcast OOMs (executors hold the whole table). So the
    * broadcast is size-gated on Catalyst's estimate of the build plan
    * against the session broadcast threshold — the same statistic Spark's
    * own join planning uses. Over the threshold, both sides shuffle on
    * (keys, salt): the probe salted by a high-cardinality column, the build
    * replicated `salts` ways, so a handful of hot block keys still spread
    * over the cluster instead of melting one reducer (the manual form of
    * AQE's skew split, fixed in the plan up front). With `keys` empty this
    * degrades to a salt-partitioned block-nested-loop cross product — the
    * shuffle-safe shape of an exact all-pairs comparison.
    *
    * Reference analog: the native engine broadcast-hash-joins bounded
    * `Joinable`s only; big-big joins route through MSQ's shuffle sort-merge
    * (`multi-stage-query/.../SortMergeJoinFrameProcessor.java:105`).
    *
    * @param mode "auto" (size-gate, default), "broadcast", "shuffle"
    */
  def boundedBlockJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                       saltBy: Column, salts: Int = 0,
                       mode: String = "auto"): DataFrame = {
    val spark = probe.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val broadcastOk = mode match {
      case "broadcast" => true
      case "shuffle"   => false
      case "auto" =>
        val raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
        val threshold =
          if (raw.matches("-?[0-9]+")) raw.toLong
          else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
        threshold > 0 &&
          build.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold
      case other => throw new IllegalArgumentException(s"bad join mode: $other")
    }
    if (broadcastOk)
      // round-robin the probe: block keys are low-cardinality, so without
      // the spread a key-partitioned probe collapses to a few tasks
      probe.repartition(par).join(broadcast(build), keys)
    else {
      val n = if (salts > 0) salts else par
      val l = probe.withColumn("__salt", pmod(xxhash64(saltBy), lit(n.toLong)))
      val r = build.withColumn("__salt",
        explode(sequence(lit(0L), lit(n.toLong - 1))))
      // merge hint: without it Catalyst's own stats would flip the salted
      // join right back to a broadcast when the build side LOOKS small —
      // shuffle mode exists precisely for when that estimate can't be trusted
      l.hint("merge").join(r.hint("merge"), keys :+ "__salt").drop("__salt")
    }
  }

  /** Salted equi-join for skewed keys: the skewed (left) side gets a
    * deterministic salt derived from a high-cardinality column, the right
    * side is replicated once per salt, and the join key becomes
    * (key, salt) — a hot key's rows now spread over `salts` reducers
    * instead of melting one. This is the manual form of what AQE's
    * skew-join split does at runtime; use it when the skew is KNOWN (a
    * hot tenant, a null-heavy key) and you want the plan fixed up front.
    * Inner/left joins only (each left row keeps exactly one salt).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBy: Column, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val l = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
