package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import graft.functions.DruidFunctions

/** Window-operator helpers (reference `query/operator/window/` processors).
  *
  * Spark covers ROWS and value-RANGE frames natively; the reference's RANGE
  * frames behave like SQL GROUPS frames (`WindowFrame.java:41` — peers
  * grouped by order-key value). Spark has no GROUPS mode, so
  * [[groupsBetween]] emulates it: dense_rank over the order key turns peer
  * groups into consecutive integers, and a value-RANGE frame over that rank
  * is exactly a GROUPS frame.
  */
object Windows {

  /** A (partition, order) spec whose frame counts PEER GROUPS, not rows.
    * Returns the frame column to aggregate over: use as
    * `agg.over(groupsBetween(df, part, ord, lo, hi))` via the returned spec
    * applied to a dense_rank-augmented DataFrame.
    */
  def withGroupsFrame(df: DataFrame, partitionBy: Seq[Column], orderBy: Column,
                      agg: Column => Column, valueCol: Column,
                      lo: Long, hi: Long, as: String): DataFrame = {
    val rankSpec = Window.partitionBy(partitionBy: _*).orderBy(orderBy)
    val withRank = df.withColumn("__grp", dense_rank().over(rankSpec))
    val frame = Window.partitionBy(partitionBy: _*).orderBy(col("__grp"))
      .rangeBetween(lo, hi)
    withRank.withColumn(as, agg(valueCol).over(frame)).drop("__grp")
  }

  /** Timezone-anchored time floor for fixed-offset zones (reference
    * `PeriodGranularity` with a timeZone): shift into the zone, floor,
    * shift back. Offsets like "+05:30" / "-08:00".
    */
  def timeFloorTz(ts: Column, period: String, offset: String): Column = {
    val sign = if (offset.startsWith("-")) -1 else 1
    val Array(h, m) = offset.stripPrefix("+").stripPrefix("-").split(":")
    val micros = sign * (h.toLong * 3600 + m.toLong * 60) * 1000000L
    val shifted = timestamp_micros(unix_micros(ts) + lit(micros))
    timestamp_micros(
      unix_micros(DruidFunctions.timeFloor(shifted, period)) - lit(micros))
  }

  /** Named-zone time floor, DST-correct (reference `PeriodGranularity` with
    * a region timeZone like America/New_York): floor in the zone's WALL
    * CLOCK, then map the local bucket start back to an instant.
    * from/to_utc_timestamp apply the zone's rules per instant, so buckets
    * spanning a DST transition come out 23h/25h long with shifting UTC
    * edges — exactly the reference's Joda bucketing, where a fixed offset
    * would misassign every row between the old and new offsets.
    */
  def timeFloorZone(ts: Column, period: String, zone: String): Column =
    to_utc_timestamp(
      DruidFunctions.timeFloor(from_utc_timestamp(ts, zone), period), zone)
}
