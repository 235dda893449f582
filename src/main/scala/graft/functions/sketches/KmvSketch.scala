package graft.functions.sketches

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV ("K minimum values") distinct sketch with theta-style set algebra —
  * the analog of the reference's DataSketches theta sketch extension
  * (`extensions-core/datasketches/.../theta`): union via merge, intersection
  * estimates via post-aggregation over two sketches. Published algorithm:
  * Beyer et al., "On synopses for distinct-value estimation under multiset
  * operations" (SIGMOD'07).
  *
  * A sketch is the K smallest (unsigned) 64-bit hashes seen. Estimate:
  * (K-1)/u_K where u_K is the K-th smallest hash normalized to (0,1).
  */
object Kmv {
  val K = 1024

  /** Mutable buffer: sorted set of the K smallest hashes (unsigned order). */
  final class Buffer {
    val set = new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))
    def add(h: Long): Unit = {
      if (set.size < K) { set.add(h); () }
      else if (java.lang.Long.compareUnsigned(h, set.last) < 0) {
        if (set.add(h)) set.pollLast()
        ()
      }
    }
    def mergeFrom(other: Buffer): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }
  }

  def toDoubleUnit(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  def estimateFrom(sorted: Array[Long]): Double =
    if (sorted.length < K) sorted.length.toDouble
    else (K - 1).toDouble / toDoubleUnit(sorted.last)

  def serialize(b: Buffer): Array[Byte] = {
    val arr = new Array[Long](b.set.size)
    val it = b.set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    val bb = ByteBuffer.allocate(4 + 8 * arr.length)
    bb.putInt(arr.length)
    arr.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new Buffer
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  def values(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  /** Theta-style intersection estimate over two serialized sketches:
    * theta = min of the two sketch thresholds; count common hashes < theta;
    * estimate = |common| / theta.
    */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val va = values(a); val vb = values(b)
    val thetaA = if (va.length < K) 1.0 else toDoubleUnit(va.last)
    val thetaB = if (vb.length < K) 1.0 else toDoubleUnit(vb.last)
    val theta = math.min(thetaA, thetaB)
    val setB = vb.toSet
    val common = va.count(h => toDoubleUnit(h) < theta && setB.contains(h))
    common / theta
  }

  /** Union estimate over two serialized sketches (merge then estimate). */
  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val buf = deserialize(a)
    buf.mergeFrom(deserialize(b))
    estimateFrom(values(serialize(buf)))
  }

  /** A-NOT-B estimate (reference theta sketch set difference): hashes of A
    * below the common theta that are absent from B.
    */
  def notEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val va = values(a); val vb = values(b)
    val thetaA = if (va.length < K) 1.0 else toDoubleUnit(va.last)
    val thetaB = if (vb.length < K) 1.0 else toDoubleUnit(vb.last)
    val theta = math.min(thetaA, thetaB)
    val setB = vb.toSet
    val only = va.count(h => toDoubleUnit(h) < theta && !setB.contains(h))
    only / theta
  }

  // ------------------------------------------------------- sketch-returning
  // set operations (reference THETA_SKETCH_UNION / INTERSECT / NOT return a
  // SKETCH, not an estimate — `datasketches/.../theta/SketchSetPostAggregator
  // .java`). Intersection/difference results carry an explicit theta that is
  // no longer derivable from the K-th retained hash, so they serialize in a
  // tagged form: int count < 0 marks (−count−1) hashes followed by a stored
  // theta. Plain sketches keep the original layout and stay byte-compatible.

  /** (retained hashes sorted unsigned-ascending, theta) for either layout. */
  def hashesTheta(bytes: Array[Byte]): (Array[Long], Double) = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    if (n >= 0) {
      val arr = Array.fill(n)(bb.getLong)
      (arr, if (arr.length < K) 1.0 else toDoubleUnit(arr.last))
    } else {
      val cnt = -n - 1
      val theta = bb.getDouble
      (Array.fill(cnt)(bb.getLong), theta)
    }
  }

  private def serializeTagged(hashes: Array[Long], theta: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 8 * hashes.length)
    bb.putInt(-hashes.length - 1)
    bb.putDouble(theta)
    hashes.foreach(bb.putLong)
    bb.array()
  }

  private def serializePlain(hashes: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * hashes.length)
    bb.putInt(hashes.length)
    hashes.foreach(bb.putLong)
    bb.array()
  }

  /** Union sketch. Plain inputs take the aggregate-side Buffer merge, so the
    * result is byte-identical to folding the same rows in one aggregate (and
    * estimates identically to [[unionEstimate]]). Tagged inputs merge under
    * the common theta; if more than K survive, theta drops to the (K+1)-th
    * smallest hash (the DataSketches union rule) so n/theta stays unbiased.
    */
  def unionSketch(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (_, ta) = hashesTheta(a); val (_, tb) = hashesTheta(b)
    val plainA = ByteBuffer.wrap(a).getInt >= 0
    val plainB = ByteBuffer.wrap(b).getInt >= 0
    if (plainA && plainB) {
      val buf = deserialize(a)
      buf.mergeFrom(deserialize(b))
      serialize(buf)
    } else {
      val (ha, _) = hashesTheta(a); val (hb, _) = hashesTheta(b)
      var theta = math.min(ta, tb)
      val merged = (ha ++ hb).filter(h => toDoubleUnit(h) < theta)
        .distinct.sortWith((x, y) => java.lang.Long.compareUnsigned(x, y) < 0)
      val kept =
        if (merged.length > K) { theta = toDoubleUnit(merged(K)); merged.take(K) }
        else merged
      serializeTagged(kept, theta)
    }
  }

  /** Intersection sketch: common hashes below the common theta. */
  def intersectSketch(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (ha, ta) = hashesTheta(a); val (hb, tb) = hashesTheta(b)
    val theta = math.min(ta, tb)
    val setB = hb.toSet
    val common = ha.filter(h => (theta == 1.0 || toDoubleUnit(h) < theta) && setB.contains(h))
    if (theta == 1.0) serializePlain(common) else serializeTagged(common, theta)
  }

  /** A-NOT-B sketch: hashes of A below the common theta absent from B. */
  def notSketch(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (ha, ta) = hashesTheta(a); val (hb, tb) = hashesTheta(b)
    val theta = math.min(ta, tb)
    val setB = hb.toSet
    val only = ha.filter(h => (theta == 1.0 || toDoubleUnit(h) < theta) && !setB.contains(h))
    if (theta == 1.0) serializePlain(only) else serializeTagged(only, theta)
  }

  /** Estimate for either layout: tagged → retained/theta; plain → KMV. */
  def estimateAny(bytes: Array[Byte]): Double = {
    val bb = ByteBuffer.wrap(bytes)
    if (bb.getInt >= 0) estimateFrom(values(bytes))
    else { val (h, theta) = hashesTheta(bytes); h.length / theta }
  }

  /** Relative standard error of a full sketch: ~1/sqrt(K-1) (Beyer et al.);
    * exact (0) while below K retained keys with theta 1.
    */
  def errorBounds(bytes: Array[Byte], numStdDev: Int): (Double, Double, Double) = {
    val (h, theta) = hashesTheta(bytes)
    val est = estimateAny(bytes)
    if (theta == 1.0 && h.length < K) (est, est, est)
    else {
      val rse = 1.0 / math.sqrt((K - 1).toDouble)
      val f = numStdDev * rse
      (est, est / (1.0 + f), est * (1.0 + f))
    }
  }
}

/** KMV distinct-sketch aggregate (binary sketch out; estimate via the
  * post-aggregation expressions below — mirroring the reference's
  * thetaSketch agg + thetaSketchEstimate post-agg split).
  */
case class KmvSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Buffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Kmv.Buffer = new Kmv.Buffer

  override def update(buf: Kmv.Buffer, input: InternalRow): Kmv.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(a: Kmv.Buffer, b: Kmv.Buffer): Kmv.Buffer = { a.mergeFrom(b); a }
  override def eval(buf: Kmv.Buffer): Any = Kmv.serialize(buf)
  override def serialize(buf: Kmv.Buffer): Array[Byte] = Kmv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Kmv.Buffer = Kmv.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch_agg"

  override def withNewMutableAggBufferOffset(n: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KmvSketchAgg =
    copy(child = c)
}

/** Post-aggregation scalar: estimate of a serialized KMV sketch. */
case class KmvEstimate(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Kmv.estimateAny(v.asInstanceOf[Array[Byte]])
  }
  override protected def withNewChildInternal(c: Expression): KmvEstimate = copy(child = c)
}

/** Post-aggregation scalar: theta-style set-op estimates over two sketches. */
case class KmvSetEstimate(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input); val b = right.eval(input)
    if (a == null || b == null) null
    else {
      val ab = a.asInstanceOf[Array[Byte]]; val bb = b.asInstanceOf[Array[Byte]]
      op match {
        case "intersect" => Kmv.intersectEstimate(ab, bb)
        case "union"     => Kmv.unionEstimate(ab, bb)
        case "not"       => Kmv.notEstimate(ab, bb)
        case o => throw new IllegalArgumentException(s"unknown set op: $o")
      }
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object KmvSketchAgg {
  def kmvSketch(c: Column): Column =
    toCol(KmvSketchAgg(toExpr(c)).toAggregateExpression())
  def kmvEstimate(sketch: Column): Column = toCol(KmvEstimate(toExpr(sketch)))
  def kmvIntersect(a: Column, b: Column): Column =
    toCol(KmvSetEstimate(toExpr(a), toExpr(b), "intersect"))
  def kmvUnion(a: Column, b: Column): Column =
    toCol(KmvSetEstimate(toExpr(a), toExpr(b), "union"))
  def kmvNot(a: Column, b: Column): Column =
    toCol(KmvSetEstimate(toExpr(a), toExpr(b), "not"))
}
