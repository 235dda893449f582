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

/** Bloom filter aggregate + membership test — the analog of the reference's
  * bloom-filter extension (`extensions-core/druid-bloom-filter/`: an
  * aggregator building a filter plus a dim filter testing membership).
  * Standard construction: m-bit array, k index functions derived from two
  * base hashes (Kirsch–Mitzenmacher h1 + i*h2).
  *
  * No false negatives; false-positive rate ≈ (1 - e^(-kn/m))^k.
  */
object Bloom {
  def bitsFor(numBits: Int): Array[Long] = new Array[Long]((numBits + 63) / 64)

  def indexes(h: Long, k: Int, numBits: Int): Seq[Int] = {
    val h1 = h
    val h2 = java.lang.Long.rotateLeft(h, 31) ^ 0x9E3779B97F4A7C15L
    (0 until k).map { i =>
      val combined = h1 + i * h2
      ((combined % numBits + numBits) % numBits).toInt
    }
  }

  def add(bits: Array[Long], h: Long, k: Int, numBits: Int): Unit =
    indexes(h, k, numBits).foreach { idx =>
      bits(idx >> 6) |= (1L << (idx & 63))
    }

  def mightContain(bits: Array[Long], h: Long, k: Int, numBits: Int): Boolean =
    indexes(h, k, numBits).forall { idx =>
      (bits(idx >> 6) & (1L << (idx & 63))) != 0
    }

  def serialize(bits: Array[Long], k: Int, numBits: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * bits.length)
    bb.putInt(k); bb.putInt(numBits)
    bits.foreach(bb.putLong)
    bb.array()
  }

  /** (k, numBits, bits) */
  def deserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt; val numBits = bb.getInt
    val bits = Array.fill((numBits + 63) / 64)(bb.getLong)
    (k, numBits, bits)
  }
}

/** Aggregate building a serialized bloom filter of the input column. */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int = 1 << 20,
    numHashes: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = Bloom.bitsFor(numBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      Bloom.add(buf, XxHash64Function.hash(v, child.dataType, 42L), numHashes, numBits)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = Bloom.serialize(buf, numHashes, numBits)

  override def serialize(buf: Array[Long]): Array[Byte] =
    Bloom.serialize(buf, numHashes, numBits)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Bloom.deserialize(bytes)._3

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build_agg"

  override def withNewMutableAggBufferOffset(n: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BloomFilterAgg =
    copy(child = c)
}

/** Membership test against a serialized bloom filter (the reference's bloom
  * dim filter). `left` = filter bytes, `right` = value to probe.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  // the filter side is usually a literal/scalar-subquery result: cache decode
  @transient private lazy val cached = {
    left match {
      case lit: org.apache.spark.sql.catalyst.expressions.Literal if lit.value != null =>
        Some(Bloom.deserialize(lit.value.asInstanceOf[Array[Byte]]))
      case _ => None
    }
  }

  override def eval(input: InternalRow): Any = {
    val v = right.eval(input)
    if (v == null) null
    else {
      val (k, numBits, bits) = cached.getOrElse {
        val f = left.eval(input)
        if (f == null) return null
        Bloom.deserialize(f.asInstanceOf[Array[Byte]])
      }
      Bloom.mightContain(bits, XxHash64Function.hash(v, right.dataType, 42L), k, numBits)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object BloomFilterAgg {
  def bloomBuild(c: Column, numBits: Int = 1 << 20, numHashes: Int = 5): Column =
    toCol(BloomFilterAgg(toExpr(c), numBits, numHashes).toAggregateExpression())
  def bloomMightContain(filter: Column, value: Column): Column =
    toCol(BloomMightContain(toExpr(filter), toExpr(value)))
}
