package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DruidFunctions

/** Query-level post-processing decorators (reference
  * `query/PostProcessingOperator.java`): transforms applied to a finished
  * query result before it is returned. Plain DataFrame → DataFrame
  * functions here — they compose onto any query plan and stay inside
  * Catalyst (no collect, no driver loop).
  */
object PostProcessing {

  /** Timewarp (reference `query/TimewarpOperator.java:45`): answer "now"
    * queries from an older, complete period — run the underlying query over
    * the interval shifted back by `period` × `n`, then shift the result
    * timestamps forward again so the caller sees current-looking buckets.
    *
    * `warped` is the query built over the shifted interval; this decorator
    * restores the public time axis. Pure projection — zero extra shuffles.
    */
  def timewarp(warped: DataFrame, timeCol: String, period: String, n: Int): DataFrame =
    warped.withColumn(timeCol,
      DruidFunctions.timeShift(col(timeCol), period, n))

  /** Row-transform decorator (reference post-processing chain): apply a set
    * of column rewrites to a finished result.
    */
  def transformColumns(df: DataFrame, rewrites: (String, Column)*): DataFrame =
    rewrites.foldLeft(df) { case (acc, (name, c)) => acc.withColumn(name, c) }
}
