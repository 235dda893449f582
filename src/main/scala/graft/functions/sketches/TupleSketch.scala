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

  // ----------------------------------------------- sketch-returning set ops
  // (reference DS_TUPLE_DOUBLES_UNION / INTERSECT / NOT —
  // `datasketches/.../tuple/ArrayOfDoublesSketchSetOpPostAggregator.java`:
  // union and intersection SUM the double summaries of keys present on both
  // sides). Like [[Kmv]], intersection/difference results carry an explicit
  // theta in a tagged layout: int count < 0 marks (−count−1) entries
  // followed by the stored theta.

  /** (sorted (hash, values) entries, numValues, theta) for either layout. */
  def entriesTheta(bytes: Array[Byte]): (Array[(Long, Array[Double])], Int, Double) = {
    val bb = ByteBuffer.wrap(bytes)
    val n0 = bb.getInt
    val tagged = n0 < 0
    val n = if (tagged) -n0 - 1 else n0
    val nv = bb.getInt
    val storedTheta = if (tagged) bb.getDouble else 1.0
    val entries = Array.fill(n) {
      val h = bb.getLong
      (h, Array.fill(nv)(bb.getDouble))
    }
    val th =
      if (tagged) storedTheta
      else if (n < K) 1.0
      else Kmv.toDoubleUnit(entries.last._1)
    (entries, nv, th)
  }

  private def serializeEntries(entries: Array[(Long, Array[Double])], nv: Int,
      theta: Double): Array[Byte] = {
    val tagged = theta < 1.0
    val bb = ByteBuffer.allocate(8 + (if (tagged) 8 else 0) + entries.length * (8 + 8 * nv))
    bb.putInt(if (tagged) -entries.length - 1 else entries.length)
    bb.putInt(nv)
    if (tagged) bb.putDouble(theta)
    entries.foreach { case (h, vals) => bb.putLong(h); vals.foreach(bb.putDouble) }
    bb.array()
  }

  private def sortUnsigned(entries: Array[(Long, Array[Double])]) =
    entries.sortWith((x, y) => java.lang.Long.compareUnsigned(x._1, y._1) < 0)

  /** Union: merge entries under the common theta, summaries summed for keys
    * on both sides, K smallest kept.
    */
  def unionSketch(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (ea, nva, ta) = entriesTheta(a); val (eb, nvb, tb) = entriesTheta(b)
    val nv = math.max(nva, nvb)
    val theta = math.min(ta, tb)
    val m = new java.util.TreeMap[java.lang.Long, Array[Double]](
      (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compareUnsigned(x, y))
    (ea ++ eb).foreach { case (h, vals) =>
      if (theta == 1.0 || Kmv.toDoubleUnit(h) < theta) {
        val ex = m.get(h)
        if (ex != null) { var i = 0; while (i < ex.length && i < vals.length) { ex(i) += vals(i); i += 1 } }
        else m.put(h, java.util.Arrays.copyOf(vals, nv))
      }
    }
    // Trimming to K must also lower theta to the (K+1)-th smallest hash —
    // otherwise n/theta underestimates whenever theta < 1.0 (mirrors
    // Kmv.unionSketch).
    while (m.size > K + 1) m.pollLastEntry()
    val finalTheta =
      if (m.size > K) Kmv.toDoubleUnit(m.pollLastEntry().getKey.longValue())
      else theta
    val out = m.entrySet().iterator()
    val arr = new Array[(Long, Array[Double])](m.size)
    var i = 0
    while (out.hasNext) { val e = out.next(); arr(i) = (e.getKey.longValue(), e.getValue); i += 1 }
    serializeEntries(arr, nv, finalTheta)
  }

  /** Intersection: common keys below the common theta, summaries summed. */
  def intersectSketch(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (ea, nva, ta) = entriesTheta(a); val (eb, nvb, tb) = entriesTheta(b)
    val nv = math.max(nva, nvb)
    val theta = math.min(ta, tb)
    val mb = eb.toMap
    val out = ea.collect {
      case (h, vals) if (theta == 1.0 || Kmv.toDoubleUnit(h) < theta) && mb.contains(h) =>
        val sum = java.util.Arrays.copyOf(vals, nv)
        val other = mb(h)
        var i = 0
        while (i < sum.length && i < other.length) { sum(i) += other(i); i += 1 }
        (h, sum)
    }
    serializeEntries(sortUnsigned(out), nv, theta)
  }

  /** A-NOT-B: keys of A below the common theta absent from B, A's summaries. */
  def notSketch(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (ea, nva, ta) = entriesTheta(a); val (eb, _, tb) = entriesTheta(b)
    val theta = math.min(ta, tb)
    val setB = eb.map(_._1).toSet
    val out = ea.filter { case (h, _) =>
      (theta == 1.0 || Kmv.toDoubleUnit(h) < theta) && !setB.contains(h) }
    serializeEntries(sortUnsigned(out), nva, theta)
  }

  /** Distinct-key estimate for either layout. */
  def estimateAny(bytes: Array[Byte]): Double = {
    val (entries, _, theta) = entriesTheta(bytes)
    if (theta == 1.0) {
      if (entries.length < K) entries.length.toDouble
      else (K - 1).toDouble / Kmv.toDoubleUnit(entries.last._1)
    } else entries.length / theta
  }

  /** Population-scaled per-metric sums for either layout (the reference's
    * DS_TUPLE_DOUBLES_METRICS_SUM_ESTIMATE returns one value per summary
    * column).
    */
  def metricsSumEstimate(bytes: Array[Byte]): Array[Double] = {
    val (entries, nv, theta) = entriesTheta(bytes)
    val sums = new Array[Double](nv)
    entries.foreach { case (_, vals) =>
      var i = 0
      while (i < sums.length && i < vals.length) { sums(i) += vals(i); i += 1 }
    }
    var i = 0
    while (i < sums.length) { sums(i) /= theta; i += 1 }
    sums
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
    if (v == null) null else TupleKmv.estimateAny(v.asInstanceOf[Array[Byte]])
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
    else {
      // empty sketch (or absent summary column) sums to 0.0, as the
      // pre-round-7 single-column path did
      val sums = TupleKmv.metricsSumEstimate(v.asInstanceOf[Array[Byte]])
      if (idx < sums.length) sums(idx) else 0.0
    }
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
