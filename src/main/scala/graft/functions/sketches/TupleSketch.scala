package graft.functions.sketches

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tuple ("array of doubles") sketch — the analog of the reference's
  * DataSketches tuple extension (`extensions-core/datasketches/.../tuple`,
  * `ArrayOfDoublesSketchAggregatorFactory`): a KMV distinct sketch over a
  * key column where each retained key carries a vector of double summaries,
  * summed per distinct key. Supports the reference's estimates: distinct
  * keys, and per-metric sum scaled to the full key population
  * (retained-sum / theta).
  *
  * Same sampling theory as [[Kmv]] (Beyer et al., SIGMOD'07); nominal
  * entries K = 4096 matches the DataSketches ArrayOfDoubles default.
  * Exact (theta = 1) below K distinct keys.
  */
object TupleKmv {
  val K = 4096

  final class Buffer {
    var numValues: Int = -1
    val map = new java.util.TreeMap[java.lang.Long, Array[Double]](
      (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

    def add(h: Long, vals: Array[Double]): Unit = {
      if (numValues == -1) numValues = vals.length
      val existing = map.get(h)
      if (existing != null) {
        var i = 0
        while (i < existing.length) { existing(i) += vals(i); i += 1 }
      } else if (map.size < K) {
        map.put(h, vals.clone()); ()
      } else if (java.lang.Long.compareUnsigned(h, map.lastKey) < 0) {
        map.put(h, vals.clone())
        map.pollLastEntry()
        ()
      }
    }

    def mergeFrom(other: Buffer): Unit = {
      val it = other.map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        add(e.getKey, e.getValue)
      }
    }
  }

  def theta(b: Buffer): Double =
    if (b.map.size < K) 1.0 else Kmv.toDoubleUnit(b.map.lastKey)

  def serialize(b: Buffer): Array[Byte] = {
    val n = b.map.size
    val nv = math.max(b.numValues, 0)
    val bb = ByteBuffer.allocate(8 + n * (8 + 8 * nv))
    bb.putInt(n); bb.putInt(nv)
    val it = b.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      e.getValue.foreach(bb.putDouble)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt; val nv = bb.getInt
    val b = new Buffer
    if (nv > 0) b.numValues = nv
    var i = 0
    while (i < n) {
      val h = bb.getLong
      val vals = Array.fill(nv)(bb.getDouble)
      b.add(h, vals)
      i += 1
    }
    b
  }

  /** Distinct-key estimate of a serialized tuple sketch. */
  def estimate(bytes: Array[Byte]): Double = {
    val b = deserialize(bytes)
    if (b.map.size < K) b.map.size.toDouble
    else (K - 1).toDouble / Kmv.toDoubleUnit(b.map.lastKey)
  }

  /** Population-scaled sum of summary column `idx` (exact below K keys). */
  def metricSum(bytes: Array[Byte], idx: Int): Double = {
    val b = deserialize(bytes)
    var s = 0.0
    val it = b.map.values().iterator()
    while (it.hasNext) s += it.next()(idx)
    s / theta(b)
  }
}

/** Tuple sketch aggregate: `key` hashed per row, `values` (ARRAY<DOUBLE>)
  * summed per distinct key. Binary sketch out; estimates via the
  * post-aggregation expressions below (mirroring the reference's
  * arrayOfDoublesSketch agg + sketch-estimate post-agg split).
  */
case class TupleSketchAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleKmv.Buffer] with BinaryLike[Expression] {

  override def createAggregationBuffer(): TupleKmv.Buffer = new TupleKmv.Buffer

  override def update(buf: TupleKmv.Buffer, input: InternalRow): TupleKmv.Buffer = {
    val k = left.eval(input)
    val v = right.eval(input)
    if (k != null && v != null) {
      val h = XxHash64Function.hash(k, left.dataType, 42L)
      buf.add(h, v.asInstanceOf[ArrayData].toDoubleArray())
    }
    buf
  }

  override def merge(a: TupleKmv.Buffer, b: TupleKmv.Buffer): TupleKmv.Buffer = {
    a.mergeFrom(b); a
  }
  override def eval(buf: TupleKmv.Buffer): Any = TupleKmv.serialize(buf)
  override def serialize(buf: TupleKmv.Buffer): Array[Byte] = TupleKmv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): TupleKmv.Buffer =
    TupleKmv.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "tuple_sketch_agg"

  override def withNewMutableAggBufferOffset(n: Int): TupleSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TupleSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Post-aggregation scalar: distinct-key estimate of a tuple sketch. */
case class TupleEstimate(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else TupleKmv.estimate(v.asInstanceOf[Array[Byte]])
  }
  override protected def withNewChildInternal(c: Expression): TupleEstimate =
    copy(child = c)
}

/** Post-aggregation scalar: population-scaled sum of summary column `idx`. */
case class TupleMetricSum(child: Expression, idx: Int)
  extends Expression with UnaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else TupleKmv.metricSum(v.asInstanceOf[Array[Byte]], idx)
  }
  override protected def withNewChildInternal(c: Expression): TupleMetricSum =
    copy(child = c)
}

object TupleSketchAgg {
  /** values must be ARRAY<DOUBLE> (wrap metrics with `array(...)`). */
  def tupleSketch(key: Column, values: Column): Column =
    toCol(TupleSketchAgg(toExpr(key), toExpr(values)).toAggregateExpression())
  def tupleEstimate(sketch: Column): Column = toCol(TupleEstimate(toExpr(sketch)))
  def tupleMetricSum(sketch: Column, idx: Int): Column =
    toCol(TupleMetricSum(toExpr(sketch), idx))
}
