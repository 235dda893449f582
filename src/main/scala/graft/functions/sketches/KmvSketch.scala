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
    else Kmv.estimateFrom(Kmv.values(v.asInstanceOf[Array[Byte]]))
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
