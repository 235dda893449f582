package graft.functions.sketches

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar (per-row) sketch combinators backing the reference's
  * sketch-returning SQL surface — these are POST-aggregation functions that
  * operate on already-aggregated sketch columns, row by row:
  *
  *  - `HLL_SKETCH_UNION(expr0, expr1, …)` / `HLL_SKETCH_TO_STRING` /
  *    `HLL_SKETCH_ESTIMATE_WITH_ERROR_BOUNDS` (reference
  *    `datasketches/hll/sql/…` operator conversions);
  *  - `THETA_SKETCH_UNION / INTERSECT / NOT` +
  *    `THETA_SKETCH_ESTIMATE_WITH_ERROR_BOUNDS` (reference
  *    `datasketches/theta/SketchSetPostAggregator.java`);
  *  - `DS_TUPLE_DOUBLES_UNION / INTERSECT / NOT` +
  *    `DS_TUPLE_DOUBLES_METRICS_SUM_ESTIMATE` (reference
  *    `datasketches/tuple/ArrayOfDoublesSketchSetOpPostAggregator.java`);
  *  - `DS_QUANTILE_SUMMARY` (reference quantiles sketch module).
  *
  * All are CodegenFallback: they run once per GROUP, not per input row, so
  * codegen would buy nothing — keeping them out of generated code keeps the
  * surrounding WholeStageCodegen spans intact.
  */

/** N-ary HLL register-wise max merge; returns the merged binary sketch. */
case class HllUnion(children: Seq[Expression])
  extends Expression with CodegenFallback {
  require(children.nonEmpty, "hll_sketch_union needs at least one sketch")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    var acc: Array[Byte] = null
    children.foreach { c =>
      val v = c.eval(input)
      if (v != null) {
        val regs = v.asInstanceOf[Array[Byte]]
        if (acc == null) acc = regs.clone()
        else Hll.merge(acc, regs)
      }
    }
    acc
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllUnion = copy(children = newChildren)
}

/** Debug string for an HLL sketch (reference HLL_SKETCH_TO_STRING). */
case class HllToString(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val regs = v.asInstanceOf[Array[Byte]]
      val nonZero = regs.count(_ != 0)
      UTF8String.fromString(
        s"### HLL sketch summary:\n  registers: ${Hll.M}\n" +
        s"  non-zero registers: $nonZero\n" +
        s"  estimate: ${Hll.estimateDouble(regs)}")
    }
  }
  override protected def withNewChildInternal(c: Expression): HllToString =
    copy(child = c)
}

/** ARRAY<DOUBLE>(estimate, lowerBound, upperBound) for an HLL sketch.
  * Bounds use the HyperLogLog relative standard error 1.04/sqrt(M)
  * (Flajolet et al. 2007) scaled by numStdDev, mirroring the shape of the
  * reference's HLL_SKETCH_ESTIMATE_WITH_ERROR_BOUNDS output.
  */
case class HllEstimateWithBounds(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null
    else {
      val regs = v.asInstanceOf[Array[Byte]]
      val k = right.eval(input) match {
        case null => 1
        case n: java.lang.Number => n.intValue()
      }
      val est = Hll.estimateDouble(regs)
      val f = k * 1.04 / math.sqrt(Hll.M.toDouble)
      ArrayData.toArrayData(Array(est, est / (1.0 + f), est * (1.0 + f)))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Sketch-returning theta-style set op over two KMV sketches. */
case class KmvSetSketch(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input); val b = right.eval(input)
    // Null semantics are per-op: a null side means "no sketch", so union
    // keeps the surviving side, intersect is unknowable (null), and A-NOT-B
    // is null when A is missing but A unchanged when B is missing.
    if (a == null || b == null) op match {
      case "union"     => if (a == null) b else a
      case "intersect" => null
      case "not"       => if (a == null) null else a
      case o => throw new IllegalArgumentException(s"unknown set op: $o")
    }
    else {
      val ab = a.asInstanceOf[Array[Byte]]; val bb = b.asInstanceOf[Array[Byte]]
      op match {
        case "union"     => Kmv.unionSketch(ab, bb)
        case "intersect" => Kmv.intersectSketch(ab, bb)
        case "not"       => Kmv.notSketch(ab, bb)
        case o => throw new IllegalArgumentException(s"unknown set op: $o")
      }
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** ARRAY<DOUBLE>(estimate, lowerBound, upperBound) for a KMV/theta sketch. */
case class KmvEstimateWithBounds(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null
    else {
      val k = right.eval(input) match {
        case null => 1
        case n: java.lang.Number => n.intValue()
      }
      val (est, lo, hi) = Kmv.errorBounds(v.asInstanceOf[Array[Byte]], k)
      ArrayData.toArrayData(Array(est, lo, hi))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Sketch-returning set op over two tuple ("array of doubles") sketches. */
case class TupleSetSketch(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input); val b = right.eval(input)
    // Same per-op null semantics as KmvSetSketch above.
    if (a == null || b == null) op match {
      case "union"     => if (a == null) b else a
      case "intersect" => null
      case "not"       => if (a == null) null else a
      case o => throw new IllegalArgumentException(s"unknown set op: $o")
    }
    else {
      val ab = a.asInstanceOf[Array[Byte]]; val bb = b.asInstanceOf[Array[Byte]]
      op match {
        case "union"     => TupleKmv.unionSketch(ab, bb)
        case "intersect" => TupleKmv.intersectSketch(ab, bb)
        case "not"       => TupleKmv.notSketch(ab, bb)
        case o => throw new IllegalArgumentException(s"unknown set op: $o")
      }
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Population-scaled per-metric sums of a tuple sketch (one array slot per
  * summary column — reference DS_TUPLE_DOUBLES_METRICS_SUM_ESTIMATE).
  */
case class TupleMetricsSumEstimate(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else ArrayData.toArrayData(
      TupleKmv.metricsSumEstimate(v.asInstanceOf[Array[Byte]]))
  }
  override protected def withNewChildInternal(c: Expression): TupleMetricsSumEstimate =
    copy(child = c)
}

/** Human-readable summary of a KLL quantiles sketch (reference
  * DS_QUANTILE_SUMMARY).
  */
case class KllSummary(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val buf = Kll.deserialize(v.asInstanceOf[Array[Byte]])
      UTF8String.fromString(
        s"### Quantiles sketch summary:\n  K: ${buf.k}\n  N: ${buf.n}\n" +
        s"  Min: ${buf.minV}\n  Max: ${buf.maxV}\n" +
        s"  Median: ${buf.quantile(0.5)}")
    }
  }
  override protected def withNewChildInternal(c: Expression): KllSummary =
    copy(child = c)
}
