package graft.functions.sketches

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Fixed-buckets histogram quantile — the reference's
  * `extensions-core/histogram/.../FixedBucketsHistogram.java` +
  * `FixedBucketsHistogramQuantileSqlAggFunction` (SQL
  * `APPROX_QUANTILE_FIXED_BUCKETS(expr, prob, numBuckets, lower, upper
  * [, outlierHandlingMode])`): `numBuckets` equal-width buckets over
  * `[lowerLimit, upperLimit)`; the quantile interpolates linearly inside the
  * bucket where the target rank falls.
  *
  * Outlier modes (reference `OutlierHandlingMode`):
  *  - `ignore`: out-of-range values are dropped;
  *  - `clip`: clamped into the extreme buckets;
  *  - `overflow`: counted in separate outlier tallies that shift ranks but
  *    hold no value mass (quantiles landing there return the range edge).
  *
  * Fixed-size buffer (numBuckets longs + 3 tallies), so a 100-bucket
  * histogram costs 824 bytes per group regardless of input size — safe to
  * fan out across thousands of groups on a large cluster.
  */
object FixedBuckets {
  final class Buffer(val numBuckets: Int, val lower: Double, val upper: Double) {
    val counts = new Array[Long](numBuckets)
    var lowerOutliers: Long = 0L
    var upperOutliers: Long = 0L
    var total: Long = 0L
    def width: Double = (upper - lower) / numBuckets

    def add(v: Double, mode: String): Unit = mode match {
      case "ignore" =>
        if (v >= lower && v < upper) addIn(v)
        else if (v == upper) { counts(numBuckets - 1) += 1; total += 1 }
      case "clip" =>
        val c = math.min(math.max(v, lower), math.nextDown(upper))
        addIn(c)
      case "overflow" =>
        if (v < lower) { lowerOutliers += 1; total += 1 }
        else if (v >= upper) { upperOutliers += 1; total += 1 }
        else addIn(v)
      case m => throw new IllegalArgumentException(s"unknown outlier mode: $m")
    }

    private def addIn(v: Double): Unit = {
      val idx = math.min(((v - lower) / width).toInt, numBuckets - 1)
      counts(idx) += 1
      total += 1
    }

    def mergeFrom(o: Buffer): Unit = {
      var i = 0
      while (i < numBuckets) { counts(i) += o.counts(i); i += 1 }
      lowerOutliers += o.lowerOutliers
      upperOutliers += o.upperOutliers
      total += o.total
    }

    /** Linear interpolation inside the bucket holding rank = prob·total. */
    def quantile(prob: Double): Double = {
      if (total == 0) return Double.NaN
      val target = prob * total
      if (target < lowerOutliers) return lower
      var cum = lowerOutliers.toDouble
      var i = 0
      while (i < numBuckets) {
        val c = counts(i)
        if (c > 0 && target <= cum + c) {
          val frac = (target - cum) / c
          return lower + (i + frac) * width
        }
        cum += c
        i += 1
      }
      upper
    }
  }

  def serialize(b: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 8 + 8 * 3 + 8 * b.numBuckets)
    bb.putInt(b.numBuckets); bb.putDouble(b.lower); bb.putDouble(b.upper)
    bb.putLong(b.lowerOutliers); bb.putLong(b.upperOutliers); bb.putLong(b.total)
    b.counts.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Buffer(bb.getInt, bb.getDouble, bb.getDouble)
    b.lowerOutliers = bb.getLong; b.upperOutliers = bb.getLong; b.total = bb.getLong
    var i = 0
    while (i < b.numBuckets) { b.counts(i) = bb.getLong; i += 1 }
    b
  }
}

/** Aggregate evaluating directly to the requested quantile (DOUBLE), the
  * shape the reference's SQL aggregator exposes.
  */
case class FixedBucketsQuantileAgg(
    child: Expression,
    prob: Double,
    numBuckets: Int,
    lower: Double,
    upper: Double,
    mode: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FixedBuckets.Buffer] with UnaryLike[Expression] {

  require(numBuckets > 0, "numBuckets must be positive")
  require(upper > lower, "upperLimit must exceed lowerLimit")
  require(prob >= 0.0 && prob <= 1.0, "probability must be in [0, 1]")

  override def createAggregationBuffer(): FixedBuckets.Buffer =
    new FixedBuckets.Buffer(numBuckets, lower, upper)

  override def update(buf: FixedBuckets.Buffer, input: InternalRow): FixedBuckets.Buffer = {
    child.eval(input) match {
      case null => ()
      case d: Double => buf.add(d, mode)
      case f: Float  => buf.add(f.toDouble, mode)
      case l: Long   => buf.add(l.toDouble, mode)
      case i: Int    => buf.add(i.toDouble, mode)
      case s: Short  => buf.add(s.toDouble, mode)
      case b: Byte   => buf.add(b.toDouble, mode)
      case d: org.apache.spark.sql.types.Decimal => buf.add(d.toDouble, mode)
      case o => throw new IllegalArgumentException(
        s"approx_quantile_fixed_buckets over non-numeric input: ${o.getClass}")
    }
    buf
  }

  override def merge(a: FixedBuckets.Buffer, b: FixedBuckets.Buffer): FixedBuckets.Buffer = {
    a.mergeFrom(b); a
  }

  override def eval(buf: FixedBuckets.Buffer): Any = {
    val q = buf.quantile(prob)
    if (q.isNaN) null else q
  }

  override def serialize(buf: FixedBuckets.Buffer): Array[Byte] =
    FixedBuckets.serialize(buf)
  override def deserialize(bytes: Array[Byte]): FixedBuckets.Buffer =
    FixedBuckets.deserialize(bytes)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "approx_quantile_fixed_buckets"

  override def withNewMutableAggBufferOffset(n: Int): FixedBucketsQuantileAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FixedBucketsQuantileAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): FixedBucketsQuantileAgg =
    copy(child = c)
}
