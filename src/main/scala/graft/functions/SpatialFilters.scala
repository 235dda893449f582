package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial dim filters (reference `query/filter/SpatialDimFilter.java` /
  * `segment/filter/SpatialFilter.java`: rectangular, radius, and polygon
  * bounds over spatial dimensions). The reference indexes points in an
  * r-tree; in Spark the same predicates are plain column expressions, and at
  * scale the pruning comes from clustering the table on a space-filling-ish
  * key (e.g. geohash prefix) so min/max stats skip row groups.
  */
object SpatialFilters {

  /** Rectangular bound: point within [minX, maxX] × [minY, maxY]. */
  def rectangular(x: Column, y: Column, minX: Double, minY: Double,
                  maxX: Double, maxY: Double): Column =
    x >= minX && x <= maxX && y >= minY && y <= maxY

  /** Radius bound: Euclidean distance from (cx, cy) <= r. */
  def radius(x: Column, y: Column, cx: Double, cy: Double, r: Double): Column =
    (x - cx) * (x - cx) + (y - cy) * (y - cy) <= r * r

  /** Polygon bound via ray casting: odd number of edge crossings on the ray
    * to +inf X. Vertices are compile-time constants, so the test unrolls
    * into a fixed boolean expression (codegen'd, no UDF).
    */
  def polygon(x: Column, y: Column, vertices: Seq[(Double, Double)]): Column = {
    require(vertices.size >= 3, "polygon needs >= 3 vertices")
    val edges = vertices.zip(vertices.tail :+ vertices.head)
    val crossings = edges.map { case ((x1, y1), (x2, y2)) =>
      // edge straddles the horizontal line through y AND the intersection
      // point lies right of x
      val straddles = (lit(y1) > y) =!= (lit(y2) > y)
      val xIntersect =
        lit(x1) + (y - lit(y1)) / lit(y2 - y1) * lit(x2 - x1)
      when(straddles && xIntersect > x, 1).otherwise(0)
    }
    crossings.reduce(_ + _) % 2 === 1
  }

  /** Cheap geohash-like clustering key (interleaved integer lat/long
    * buckets) for CLUSTERED BY writes of spatial tables.
    */
  def spatialKey(x: Column, y: Column, buckets: Int = 1024): Column = {
    val bx = least(greatest(((x + 180.0) / 360.0 * buckets).cast("long"), lit(0L)),
      lit(buckets - 1L))
    val by = least(greatest(((y + 90.0) / 180.0 * buckets).cast("long"), lit(0L)),
      lit(buckets - 1L))
    bx * buckets + by
  }
}
