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

/** KLL-style streaming quantiles sketch — the analog of the reference's
  * DataSketches KLL extension (`extensions-core/datasketches/.../kll/
  * KllDoublesSketchAggregatorFactory.java`: mergeable binary sketch column +
  * quantile/rank post-aggregators). Published algorithm: Karnin, Lang,
  * Liberty, "Optimal quantile approximation in streams" (FOCS'16).
  *
  * Level i holds items of weight 2^i. When a level overflows its capacity
  * (k·(2/3)^(levels-1-i), the KLL geometric schedule), it is sorted and a
  * random half is promoted one level up, the other half discarded — each
  * survivor's doubled weight accounts for a dropped neighbor in expectation.
  * Size is O(k·log(n/k)) regardless of n, so a 100-TB column folds into a
  * few-KB buffer per group; merge is level-wise concatenation + the same
  * compaction, which is what makes the partial-aggregate shuffle shape
  * identical to any other agg.
  *
  * Unlike [[graft.functions.sketches.Kmv]]-based distinct estimates, the
  * estimate here is rank-based: quantile(q) walks the weight-cumulative
  * sorted items.
  */
object Kll {
  val DefaultK = 200

  final class Buffer(val k: Int) {
    val levels: ArrayBuffer[ArrayBuffer[Double]] =
      ArrayBuffer(ArrayBuffer.empty[Double])
    var n: Long = 0L
    // exact extremes, tracked outside the compaction (which may discard
    // them) — same as DataSketches KLL's explicit min/max items
    var minV: Double = Double.PositiveInfinity
    var maxV: Double = Double.NegativeInfinity
    // deterministic seed: keeps single-partition tests reproducible; across
    // partitions merge order already varies, so no determinism is lost
    private val rng = new java.util.Random(42)

    private def capacity(level: Int): Int =
      math.max(math.ceil(
        k * math.pow(2.0 / 3.0, levels.length - 1 - level)).toInt, 8)

    def add(v: Double): Unit = {
      levels(0) += v; n += 1
      if (v < minV) minV = v
      if (v > maxV) maxV = v
      compressIfNeeded()
    }

    def mergeFrom(other: Buffer): Unit = {
      while (levels.length < other.levels.length)
        levels += ArrayBuffer.empty[Double]
      var i = 0
      while (i < other.levels.length) {
        levels(i) ++= other.levels(i); i += 1
      }
      n += other.n
      if (other.minV < minV) minV = other.minV
      if (other.maxV > maxV) maxV = other.maxV
      compressIfNeeded()
    }

    def compressIfNeeded(): Unit = {
      var i = 0
      while (i < levels.length) {
        if (levels(i).length > capacity(i)) {
          val sorted = levels(i).toArray
          java.util.Arrays.sort(sorted)
          if (i + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
          val off = if (rng.nextBoolean()) 1 else 0
          var j = off
          while (j < sorted.length) { levels(i + 1) += sorted(j); j += 2 }
          levels(i).clear()
        }
        i += 1
      }
    }

    /** All (value, weight) pairs, sorted by value. */
    def weighted(): Array[(Double, Long)] = {
      val out = ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => out += ((v, w)))
        i += 1
      }
      out.sortBy(_._1).toArray
    }

    def quantile(q: Double): Double = {
      require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")
      if (n == 0) return Double.NaN
      if (q == 0.0) return minV
      if (q == 1.0) return maxV
      val items = weighted()
      if (items.isEmpty) return Double.NaN
      val totalW = items.iterator.map(_._2).sum
      val target = q * totalW
      var cum = 0L
      var i = 0
      while (i < items.length - 1) {
        cum += items(i)._2
        if (cum >= target) return items(i)._1
        i += 1
      }
      items.last._1
    }

    /** Estimated rank of `v` in [0, 1]: weight fraction strictly below. */
    def rank(v: Double): Double = {
      val items = weighted()
      if (items.isEmpty) return Double.NaN
      val totalW = items.iterator.map(_._2).sum
      var below = 0L
      items.foreach { case (x, w) => if (x < v) below += w }
      below.toDouble / totalW
    }
  }

  def serialize(b: Buffer): Array[Byte] = {
    val sizes = b.levels.map(_.length)
    val bb = ByteBuffer.allocate(4 + 8 + 16 + 4 + sizes.map(4 + _ * 8).sum)
    bb.putInt(b.k); bb.putLong(b.n)
    bb.putDouble(b.minV); bb.putDouble(b.maxV)
    bb.putInt(b.levels.length)
    b.levels.foreach { lvl =>
      bb.putInt(lvl.length); lvl.foreach(bb.putDouble)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Buffer(bb.getInt)
    b.n = bb.getLong
    b.minV = bb.getDouble
    b.maxV = bb.getDouble
    val numLevels = bb.getInt
    var i = 0
    while (i < numLevels) {
      if (i >= b.levels.length) b.levels += ArrayBuffer.empty[Double]
      val sz = bb.getInt
      var j = 0
      while (j < sz) { b.levels(i) += bb.getDouble; j += 1 }
      i += 1
    }
    b
  }
}

/** KLL quantiles aggregate: binary sketch out, or fold of stored sketch
  * columns (`mergeSketches`) — the reference's KllDoublesSketch agg +
  * KllDoublesSketchToQuantile post-agg split (quantiles always come from
  * the [[KllQuery]] post-aggregation).
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = Kll.DefaultK,
    mergeSketches: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.Buffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Kll.Buffer = new Kll.Buffer(k)

  override def update(buf: Kll.Buffer, input: InternalRow): Kll.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeSketches) buf.mergeFrom(Kll.deserialize(v.asInstanceOf[Array[Byte]]))
      else v match {
        case d: Double => buf.add(d)
        case f: Float  => buf.add(f.toDouble)
        case l: Long   => buf.add(l.toDouble)
        case i: Int    => buf.add(i.toDouble)
        case s: Short  => buf.add(s.toDouble)
        case b: Byte   => buf.add(b.toDouble)
        case d: org.apache.spark.sql.types.Decimal => buf.add(d.toDouble)
        case o => throw new IllegalArgumentException(
          s"kll_sketch over non-numeric input: ${o.getClass}")
      }
    }
    buf
  }

  override def merge(a: Kll.Buffer, b: Kll.Buffer): Kll.Buffer = {
    a.mergeFrom(b); a
  }

  override def eval(buf: Kll.Buffer): Any = Kll.serialize(buf)
  override def serialize(buf: Kll.Buffer): Array[Byte] = Kll.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Kll.Buffer =
    Kll.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (mergeSketches) "kll_merge_agg" else "kll_sketch_agg"

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Post-aggregation scalar: quantile or rank of a serialized KLL sketch
  * (reference KllDoublesSketchToQuantilePostAggregator /
  * ...ToRankPostAggregator).
  */
case class KllQuery(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val s = left.eval(input); val q = right.eval(input)
    if (s == null || q == null) null
    else {
      val buf = Kll.deserialize(s.asInstanceOf[Array[Byte]])
      // SQL numeric literals may arrive as Decimal/Int — accept any numeric
      val x = q match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: java.lang.Number                   => n.doubleValue()
      }
      op match {
        case "quantile" => buf.quantile(x)
        case "rank"     => buf.rank(x)
        case o => throw new IllegalArgumentException(s"unknown kll op: $o")
      }
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Distribution post-aggregations over a serialized KLL sketch — the
  * reference's KllDoublesSketchToCDFPostAggregator / ToHistogramPostAggregator
  * / getQuantiles surface (DataSketches getPMF/getCDF semantics):
  *
  *  - `cdf(splits)`: m split points → m+1 cumulative rank fractions, the
  *    last always 1.0;
  *  - `pmf(splits)`: m split points → m+1 bin mass *counts* (fraction × n,
  *    the reference's DS_HISTOGRAM convention);
  *  - `quantiles(qs)`: quantile estimate per requested rank.
  */
case class KllDistQuery(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val s = left.eval(input); val a = right.eval(input)
    if (s == null || a == null) null
    else {
      val buf = Kll.deserialize(s.asInstanceOf[Array[Byte]])
      // SQL array literals may carry DECIMAL/INT elements — convert per the
      // declared element type rather than assuming DOUBLE storage
      val ad = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val et = right.dataType.asInstanceOf[ArrayType].elementType
      val arr = Array.tabulate(ad.numElements()) { i =>
        et match {
          case DoubleType      => ad.getDouble(i)
          case FloatType       => ad.getFloat(i).toDouble
          case LongType        => ad.getLong(i).toDouble
          case IntegerType     => ad.getInt(i).toDouble
          case ShortType       => ad.getShort(i).toDouble
          case ByteType        => ad.getByte(i).toDouble
          case d: DecimalType  => ad.getDecimal(i, d.precision, d.scale).toDouble
          case o => throw new IllegalArgumentException(
            s"non-numeric split/rank array element type: $o")
        }
      }
      val out: Array[Double] = op match {
        case "cdf" => arr.map(buf.rank) :+ 1.0
        case "pmf" =>
          val cdf = arr.map(buf.rank) :+ 1.0
          val masses = new Array[Double](cdf.length)
          var i = 0
          var prev = 0.0
          while (i < cdf.length) {
            masses(i) = (cdf(i) - prev) * buf.n; prev = cdf(i); i += 1
          }
          masses
        case "quantiles" => arr.map(buf.quantile)
        case o => throw new IllegalArgumentException(s"unknown kll dist op: $o")
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object KllSketchAgg {
  /** Build a mergeable binary KLL sketch of a numeric column. */
  def kllSketch(c: Column, k: Int = Kll.DefaultK): Column =
    toCol(KllSketchAgg(toExpr(c), k).toAggregateExpression())

  /** Fold a column of stored sketches into one sketch. */
  def kllMerge(c: Column): Column =
    toCol(KllSketchAgg(toExpr(c), mergeSketches = true).toAggregateExpression())

  /** Quantile estimate from a serialized sketch. */
  def kllQuantile(sketch: Column, q: Column): Column =
    toCol(KllQuery(toExpr(sketch), toExpr(q), "quantile"))

  /** Rank estimate (fraction of mass strictly below v). */
  def kllRank(sketch: Column, v: Column): Column =
    toCol(KllQuery(toExpr(sketch), toExpr(v), "rank"))

  /** CDF: split points → m+1 cumulative rank fractions (last = 1.0). */
  def kllCdf(sketch: Column, splits: Column): Column =
    toCol(KllDistQuery(toExpr(sketch), toExpr(splits), "cdf"))

  /** Histogram: split points → m+1 estimated bin counts. */
  def kllHistogram(sketch: Column, splits: Column): Column =
    toCol(KllDistQuery(toExpr(sketch), toExpr(splits), "pmf"))

  /** Quantile estimates for an array of ranks. */
  def kllQuantiles(sketch: Column, qs: Column): Column =
    toCol(KllDistQuery(toExpr(sketch), toExpr(qs), "quantiles"))
}
