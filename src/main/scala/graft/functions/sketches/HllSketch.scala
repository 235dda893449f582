package graft.functions.sketches

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Dense HyperLogLog, the analog of the reference's hyperUnique aggregator
  * (`processing/.../hll/HyperLogLogCollector.java:53` — 2048 buckets, i.e.
  * precision 11). Algorithm follows the published Flajolet et al. HLL with
  * linear-counting small-range correction.
  *
  * The register array is the mergeable binary intermediate: partial
  * aggregates merge by taking the per-register max, which is exactly how the
  * reference folds sketch columns at the broker — and how Spark folds partial
  * aggregation buffers across executors.
  */
object Hll {
  val Precision = 11
  val M: Int = 1 << Precision // 2048 registers

  def emptyRegisters(): Array[Byte] = new Array[Byte](M)

  def add(regs: Array[Byte], hash: Long): Unit = {
    val idx = (hash >>> (64 - Precision)).toInt
    val w = hash << Precision
    val rho = (if (w == 0) 64 - Precision else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > regs(idx)) regs(idx) = rho.toByte
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  def estimate(regs: Array[Byte]): Long = math.round(estimateDouble(regs))

  def estimateDouble(regs: Array[Byte]): Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * M * M / sum
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
    else raw
  }
}

/** `TypedImperativeAggregate` over the HLL register array.
  *
  * @param child        input column (any atomic type, hashed with xxhash64),
  *                     or a BinaryType sketch column when `mergeSketches`
  * @param emitSketch   true → return the binary sketch (for storage /
  *                     re-folding, like the reference's sketch columns);
  *                     false → return the finalized BIGINT estimate
  * @param mergeSketches true → input rows are serialized sketches to fold
  *                     (the reference's hyperUnique-over-sketch-column mode)
  */
case class HllSketchAgg(
    child: Expression,
    emitSketch: Boolean = false,
    mergeSketches: Boolean = false,
    mvPerElement: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Byte] = Hll.emptyRegisters()

  // mvPerElement: a MULTI-VALUE dimension folds per ELEMENT with nulls
  // skipped (the reference's cardinality aggregator over an MVD —
  // CalciteQueryTest testApproxCountDistinct: ACD(SUBSTRING(dim2,1,1))
  // = 1, the ''-mapped null elements and null rows uncounted); TRUE
  // arrays stay whole values. The flag is DECIDED AT BUILD TIME from the
  // resolved argument's druid.mv tag — the planner rebinds the child to
  // a metadata-less reference before execution, so a tag check here
  // would always miss.
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeSketches) Hll.merge(buf, v.asInstanceOf[Array[Byte]])
      else child.dataType match {
        case org.apache.spark.sql.types.ArrayType(et, _) if mvPerElement =>
          val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          var i = 0
          while (i < arr.numElements()) {
            if (!arr.isNullAt(i))
              Hll.add(buf, XxHash64Function.hash(arr.get(i, et), et, 42L))
            i += 1
          }
        case _ =>
          Hll.add(buf, XxHash64Function.hash(v, child.dataType, 42L))
      }
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)

  override def eval(buf: Array[Byte]): Any =
    if (emitSketch) buf else Hll.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = if (emitSketch) BinaryType else LongType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (emitSketch) "hll_sketch_agg" else "hll_estimate_agg"

  override def withNewMutableAggBufferOffset(n: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HllSketchAgg =
    copy(child = c)
}

/** Scalar estimate of ONE stored HLL register array — the reference's
  * HLL_SKETCH_ESTIMATE post-aggregation (`HllSketchToEstimate`), applied to
  * a sketch column without folding. Returns DOUBLE like the reference
  * (rounding to long happens only in the APPROX_COUNT_DISTINCT-style
  * aggregators).
  */
case class HllEstimate(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else Hll.estimateDouble(v.asInstanceOf[Array[Byte]])
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object HllSketchAgg {
  /** HLL estimate of distinct `col` (reference: hyperUnique / SQL
    * APPROX_COUNT_DISTINCT_BUILTIN).
    */
  def hllEstimate(c: Column): Column =
    toCol(HllSketchAgg(toExpr(c)).toAggregateExpression())

  /** Build a mergeable binary sketch (stored-sketch-column workflow). */
  def hllSketch(c: Column): Column =
    toCol(HllSketchAgg(toExpr(c), emitSketch = true).toAggregateExpression())

  /** Fold a column of stored sketches and estimate. */
  def hllMergeEstimate(c: Column): Column =
    toCol(HllSketchAgg(toExpr(c), mergeSketches = true).toAggregateExpression())
}
