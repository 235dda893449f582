package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (beyond the reference,
  * alongside dedup/similarity/text analysis): reproducible keep/split
  * decisions from a multiplicative hash of a key column — the same rows come
  * out on every engine, every run, every cluster size, unlike `rand()`.
  * Numeric keys use Knuth's multiplicative hash over 2^32; string keys go
  * through xxhash64 first.
  */
object Sampling {

  /** Uniform [0, 1) hash of a NUMERIC key column (Knuth multiplicative hash
    * over 2^32). Callers with a string/arbitrary key must use
    * [[unitHashAny]] — `cast("long")` on a non-numeric key yields null (or
    * an ANSI error), which would silently empty the sample. The
    * DataFrame-level entry points below dispatch on the key's resolved type
    * so either key kind just works.
    */
  def unitHash(key: Column): Column = {
    val asLong = key.cast("long")
    pmod(asLong * lit(2654435761L), lit(4294967296L)) / lit(4294967296.0)
  }

  /** Uniform [0, 1) hash for arbitrary (incl. string) keys via xxhash64. */
  def unitHashAny(key: Column): Column =
    pmod(xxhash64(key), lit(4294967296L)) / lit(4294967296.0)

  /** Type-dispatched unit hash: numeric keys take the multiplicative path
    * (cross-engine reproducible arithmetic), everything else hashes the raw
    * value with xxhash64. Resolves the key against `df`'s schema — the only
    * place the input type is actually known.
    */
  private def unitHashFor(df: DataFrame, keyCol: String): Column =
    df.select(col(keyCol)).schema.head.dataType match {
      case _: org.apache.spark.sql.types.NumericType => unitHash(col(keyCol))
      case _ => unitHashAny(col(keyCol))
    }

  /** Keep ~`rate` of rows, deterministically by key. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(unitHashFor(df, keyCol) < lit(rate))

  /** Per-key quota cap — the Dolma/C4-style "cap documents per domain"
    * pass that keeps any one crawl host from dominating the training mix:
    * keep at most `maxPerKey` rows per key, chosen deterministically by
    * `orderCols`. One shuffle on the key (the window's partitioning);
    * row_number short-circuits per partition, so at 100 TB the cost is the
    * one key-shuffle regardless of how skewed the biggest domain is.
    */
  def capPerKey(df: DataFrame, keyCol: String, maxPerKey: Int,
                orderCols: Seq[String]): DataFrame = {
    require(maxPerKey >= 1, s"maxPerKey must be >= 1, got $maxPerKey")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    df.withColumn("__cap_rn", row_number().over(w))
      .filter(col("__cap_rn") <= maxPerKey)
      .drop("__cap_rn")
  }

  /** Stratified sampling: per-stratum keep rates (dataset mixing — e.g.
    * downsample web crawl to 10%, keep all code). Strata absent from
    * `rates` fall back to `defaultRate`.
    */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 rates: Map[String, Double],
                 defaultRate: Double = 0.0): DataFrame = {
    val rate = coalesce(
      typedlit(rates).getItem(col(strataCol)), lit(defaultRate))
    df.filter(unitHashFor(df, keyCol) < rate)
  }

  /** Temperature-scaled mixture sampling — the standard multilingual /
    * multi-source training-mix reweighting: the sampling distribution over
    * strata is q_s ∝ p_s^alpha, so per-stratum keep rates scale with
    * size^(alpha-1). alpha = 1 reduces to a uniform `rate`; alpha = 0
    * equalizes rows per stratum; 0 < alpha < 1 upsamples tail strata
    * relative to head strata. Rates derive from ONE tiny per-stratum count
    * aggregate (|strata| rows to the driver — scale-safe), are rounded to
    * 6 dp so both engines agree bit-for-bit at the hash threshold, and are
    * applied as the same deterministic unit-hash filter as [[stratified]].
    * Rows in strata absent from the rate table (impossible here, by
    * construction) would drop; rates above 1 simply keep everything.
    */
  def temperatureSample(df: DataFrame, keyCol: String, strataCol: String,
                        alpha: Double, rate: Double): DataFrame = {
    val sizes = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__c"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).sortBy(_._1)
    require(sizes.nonEmpty, "temperatureSample needs a non-empty input")
    val n = sizes.map(_._2).sum.toDouble
    val denom = sizes.map { case (_, c) => math.pow(c.toDouble, alpha) }.sum
    val rates = sizes.map { case (s, c) =>
      val r = rate * n / denom * math.pow(c.toDouble, alpha - 1)
      s -> BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    df.filter(unitHashFor(df, keyCol) <
      coalesce(typedlit(rates).getItem(col(strataCol)), lit(0.0)))
  }

  /** Assign each row to a named split by cumulative weight — train/val/test
    * partitioning that is stable under re-runs and data growth (a row's
    * split never changes when other rows are added).
    */
  def split(df: DataFrame, keyCol: String,
            weights: Seq[(String, Double)],
            splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val h = unitHashFor(df, keyCol)
    val cumulative = weights.scanLeft(0.0)(_ + _._2).tail
    // nested CASE from the highest bound down: h < c1 -> w1, else h < c2 -> w2…
    val assigned = weights.zip(cumulative).reverse
      .foldLeft(lit(weights.last._1)) { case (acc, ((name, _), hi)) =>
        when(h < lit(hi), lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, assigned)
  }
}
