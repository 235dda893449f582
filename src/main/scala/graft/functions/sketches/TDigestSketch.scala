package graft.functions.sketches

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Merging t-digest — the analog of the reference's tdigestsketch extension
  * (`extensions-contrib/tdigestsketch/.../TDigestSketchAggregatorFactory.java`:
  * mergeable binary sketch column + TDIGEST_QUANTILE post-aggregator).
  * Published algorithm: Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests" (2019), the merging variant.
  *
  * Centroids are (mean, weight) pairs kept sorted by mean; an incoming batch
  * buffers raw points and periodically merges. The k1 scale function
  * k(q) = δ/2π · asin(2q−1) bounds each centroid's quantile span to one k
  * unit, which concentrates small centroids at q≈0 and q≈1 — constant
  * relative accuracy at the tails, where quantile queries matter most
  * (the property KLL's uniform guarantee lacks).
  *
  * Scale shape: a digest is O(δ) centroids regardless of n, so a 100-TB
  * column folds to ~1 KB per group; merge is concatenation + one merging
  * pass, so partial aggregation before the exchange works exactly like any
  * built-in agg — the shuffle moves digests, never raw values.
  */
object TDigest {
  val DefaultCompression = 100.0

  final class Buffer(val compression: Double) {
    // sorted merged centroids
    var means: ArrayBuffer[Double] = ArrayBuffer.empty
    var weights: ArrayBuffer[Double] = ArrayBuffer.empty
    // unmerged raw points
    val pending: ArrayBuffer[Double] = ArrayBuffer.empty
    var n: Long = 0L
    var minV: Double = Double.PositiveInfinity
    var maxV: Double = Double.NegativeInfinity

    private def pendingCap: Int = math.max(64, (4 * compression).toInt)

    def add(v: Double): Unit = {
      pending += v; n += 1
      if (v < minV) minV = v
      if (v > maxV) maxV = v
      if (pending.length >= pendingCap) compress()
    }

    def mergeFrom(o: Buffer): Unit = {
      // raw points added before this merge carry implicit weight 1; make the
      // parallel weight buffer explicit before mixing in weighted centroids
      if (pendingW.isEmpty && pending.nonEmpty)
        pending.foreach(_ => pendingW += 1.0)
      var i = 0
      while (i < o.means.length) {
        pending += o.means(i)
        // fold the other digest's centroids in as weighted points: stash
        // weight via parallel arrays during compress
        pendingW += o.weights(i)
        i += 1
      }
      // o.pending are raw weight-1 points
      o.pending.foreach { v => pending += v; pendingW += 1.0 }
      n += o.n
      if (o.minV < minV) minV = o.minV
      if (o.maxV > maxV) maxV = o.maxV
      compress()
    }

    // parallel weights for `pending`; empty ⇒ all weight 1 (the raw-add path
    // avoids the second buffer entirely)
    private val pendingW: ArrayBuffer[Double] = ArrayBuffer.empty

    private def k(q: Double): Double =
      compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)
    private def kInv(x: Double): Double =
      (math.sin(2.0 * math.Pi * x / compression) + 1.0) / 2.0

    def compress(): Unit = {
      if (pending.isEmpty) return
      val m = means.length + pending.length
      val ms = new Array[Double](m)
      val ws = new Array[Double](m)
      var i = 0
      while (i < means.length) { ms(i) = means(i); ws(i) = weights(i); i += 1 }
      var j = 0
      while (j < pending.length) {
        ms(i) = pending(j)
        ws(i) = if (pendingW.isEmpty) 1.0 else pendingW(j)
        i += 1; j += 1
      }
      pending.clear(); pendingW.clear()
      // sort (mean, weight) pairs by mean
      val sorted = Array.range(0, m).sortBy(ms(_))
      val total = ws.sum
      means = ArrayBuffer.empty
      weights = ArrayBuffer.empty
      var curMean = ms(sorted(0))
      var curW = ws(sorted(0))
      var wSoFar = 0.0
      var limit = total * kInv(k(0.0) + 1.0)
      i = 1
      while (i < m) {
        val mi = ms(sorted(i)); val wi = ws(sorted(i))
        if (wSoFar + curW + wi <= limit) {
          // merge into current centroid (weighted mean)
          curMean = (curMean * curW + mi * wi) / (curW + wi)
          curW += wi
        } else {
          means += curMean; weights += curW
          wSoFar += curW
          limit = total * kInv(k(wSoFar / total) + 1.0)
          curMean = mi; curW = wi
        }
        i += 1
      }
      means += curMean; weights += curW
    }

    def quantile(q: Double): Double = {
      require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")
      compress()
      if (n == 0) return Double.NaN
      if (q <= 0.0) return minV
      if (q >= 1.0) return maxV
      val m = means.length
      if (m == 1) return means(0)
      val total = weights.sum
      val target = q * total
      // centroids sit at the midpoint of their weight span; linear
      // interpolation between successive midpoints, exact min/max at ends
      var cum = 0.0
      var i = 0
      while (i < m) {
        val mid = cum + weights(i) / 2.0
        if (target <= mid) {
          if (i == 0) {
            val lo = minV; val t = target / mid
            return lo + t * (means(0) - lo)
          }
          val prevMid = cum - weights(i - 1) / 2.0
          val t = (target - prevMid) / (mid - prevMid)
          return means(i - 1) + t * (means(i) - means(i - 1))
        }
        cum += weights(i); i += 1
      }
      val lastMid = total - weights(m - 1) / 2.0
      val t = (target - lastMid) / (total - lastMid)
      means(m - 1) + t * (maxV - means(m - 1))
    }

    /** Estimated rank of `v` in [0, 1]. */
    def cdf(v: Double): Double = {
      compress()
      if (n == 0) return Double.NaN
      if (v < minV) return 0.0
      if (v >= maxV) return 1.0
      val m = means.length
      val total = weights.sum
      var cum = 0.0
      var i = 0
      while (i < m) {
        if (v < means(i)) {
          if (i == 0) {
            // between min and first centroid midpoint
            val span = means(0) - minV
            val frac = if (span <= 0) 0.0 else (v - minV) / span
            return frac * (weights(0) / 2.0) / total
          }
          val prevMid = cum - weights(i - 1) / 2.0
          val mid = cum + weights(i) / 2.0
          val frac = (v - means(i - 1)) / (means(i) - means(i - 1))
          return (prevMid + frac * (mid - prevMid)) / total
        }
        cum += weights(i); i += 1
      }
      val lastMid = total - weights(m - 1) / 2.0
      val span = maxV - means(m - 1)
      val frac = if (span <= 0) 1.0 else (v - means(m - 1)) / span
      (lastMid + frac * (total - lastMid)) / total
    }
  }

  def serialize(b: Buffer): Array[Byte] = {
    b.compress()
    val m = b.means.length
    val bb = ByteBuffer.allocate(8 + 8 + 16 + 4 + m * 16)
    bb.putDouble(b.compression); bb.putLong(b.n)
    bb.putDouble(b.minV); bb.putDouble(b.maxV)
    bb.putInt(m)
    var i = 0
    while (i < m) { bb.putDouble(b.means(i)); bb.putDouble(b.weights(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Buffer(bb.getDouble)
    b.n = bb.getLong
    b.minV = bb.getDouble
    b.maxV = bb.getDouble
    val m = bb.getInt
    var i = 0
    while (i < m) { b.means += bb.getDouble; b.weights += bb.getDouble; i += 1 }
    b
  }
}

/** t-digest aggregate: binary sketch out, or fold of stored sketch columns
  * (`mergeSketches`) — the reference's TDigestSketchAggregatorFactory /
  * TDigestSketchToQuantilePostAggregator split.
  */
case class TDigestSketchAgg(
    child: Expression,
    compression: Double = TDigest.DefaultCompression,
    mergeSketches: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest.Buffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): TDigest.Buffer =
    new TDigest.Buffer(compression)

  override def update(buf: TDigest.Buffer, input: InternalRow): TDigest.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeSketches)
        buf.mergeFrom(TDigest.deserialize(v.asInstanceOf[Array[Byte]]))
      else v match {
        case d: Double => buf.add(d)
        case f: Float  => buf.add(f.toDouble)
        case l: Long   => buf.add(l.toDouble)
        case i: Int    => buf.add(i.toDouble)
        case s: Short  => buf.add(s.toDouble)
        case b: Byte   => buf.add(b.toDouble)
        case d: org.apache.spark.sql.types.Decimal => buf.add(d.toDouble)
        case o => throw new IllegalArgumentException(
          s"tdigest over non-numeric input: ${o.getClass}")
      }
    }
    buf
  }

  override def merge(a: TDigest.Buffer, b: TDigest.Buffer): TDigest.Buffer = {
    a.mergeFrom(b); a
  }

  override def eval(buf: TDigest.Buffer): Any = TDigest.serialize(buf)
  override def serialize(buf: TDigest.Buffer): Array[Byte] = TDigest.serialize(buf)
  override def deserialize(bytes: Array[Byte]): TDigest.Buffer =
    TDigest.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (mergeSketches) "tdigest_merge_agg" else "tdigest_sketch_agg"

  override def withNewMutableAggBufferOffset(n: Int): TDigestSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): TDigestSketchAgg =
    copy(child = c)
}

/** Post-aggregation scalar: quantile or cdf of a serialized t-digest
  * (reference TDigestSketchToQuantilePostAggregator).
  */
case class TDigestQuery(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val s = left.eval(input); val q = right.eval(input)
    if (s == null || q == null) null
    else {
      val buf = TDigest.deserialize(s.asInstanceOf[Array[Byte]])
      val x = q match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: java.lang.Number                   => n.doubleValue()
      }
      op match {
        case "quantile" => buf.quantile(x)
        case "cdf"      => buf.cdf(x)
        case o => throw new IllegalArgumentException(s"unknown tdigest op: $o")
      }
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object TDigestSketchAgg {
  /** Build a mergeable binary t-digest of a numeric column. */
  def tdigestSketch(c: Column,
                    compression: Double = TDigest.DefaultCompression): Column =
    toCol(TDigestSketchAgg(toExpr(c), compression).toAggregateExpression())

  /** Fold a column of stored t-digests into one. */
  def tdigestMerge(c: Column): Column =
    toCol(TDigestSketchAgg(toExpr(c), mergeSketches = true)
      .toAggregateExpression())

  /** Quantile estimate from a serialized t-digest. */
  def tdigestQuantile(sketch: Column, q: Column): Column =
    toCol(TDigestQuery(toExpr(sketch), toExpr(q), "quantile"))

  /** CDF (rank in [0,1]) of a value in a serialized t-digest. */
  def tdigestCdf(sketch: Column, v: Column): Column =
    toCol(TDigestQuery(toExpr(sketch), toExpr(v), "cdf"))
}
