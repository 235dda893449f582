package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, EvalMode, Expression, IntegralDivide, RuntimeReplaceable}
import org.apache.spark.sql.types._

/** Calcite's `/` — INTEGER division when BOTH operands are integral
  * (`1/2 = 0`, Java long truncation; qaUnnest array_sql_ops A1_B4 pins
  * `c/s_int` over BIGINTs at 0/1, not 0.5/1.0), double division
  * otherwise. Spark's `/` always divides as double, so the SQL facade
  * swaps parsed `Divide` nodes for this expression BEFORE analysis; the
  * replacement picks the arithmetic once the children's types resolve.
  * DataFrame-API code keeps Spark's operator untouched — the dialect
  * lives at the SQL boundary.
  */
/** Druid's CAST(timestamp AS BIGINT) yields epoch MILLIS — timestamps ARE
  * millis longs in the reference's value space (CalciteJoinQueryTest
  * testJoinOnTimeseriesWithFloorOnTime expects 946684800000) — where
  * Spark's cast yields epoch seconds. And a STRING casts to an integral
  * type LENIENTLY through the double space (ExprEval: Longs.tryParse,
  * then Doubles.tryParse truncated — CAST('10.1' AS INTEGER) is 10,
  * CalciteQueryTest testSumOfString; non-numeric text stays NULL). The
  * facade swaps parsed integral casts for this node; other inputs keep
  * the original cast.
  */
case class DruidLongCast(child: Expression, evalMode: EvalMode.Value,
    target: DataType = LongType)
    extends Expression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case TimestampType if target == LongType =>
      org.apache.spark.sql.catalyst.expressions.UnixMillis(child)
    case StringType =>
      org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
        Cast(child, target, None, EvalMode.TRY),
        Cast(Cast(child, DoubleType, None, EvalMode.TRY),
          target, None, EvalMode.TRY)))
    case _ => Cast(child, target, None, evalMode)
  }

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "druid_long_cast"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DruidLongCast =
    copy(child = newChildren(0))
}

case class CalciteDiv(left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable {

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  // Calcite casts a VARCHAR operand toward the NUMERIC side of the
  // division (qaUnnest scalar batteries: mv element '1' / c_long 2 = 0 —
  // integer division, '' and non-numeric strings → NULL via lenient cast)
  private def coerced(e: Expression, other: DataType): Expression =
    e.dataType match {
      case StringType if integral(other) =>
        org.apache.spark.sql.catalyst.expressions.Cast(
          e, LongType, None, EvalMode.TRY)
      case StringType =>
        org.apache.spark.sql.catalyst.expressions.Cast(
          e, DoubleType, None, EvalMode.TRY)
      case _ => e
    }

  override lazy val replacement: Expression = {
    val l = coerced(left, right.dataType)
    val r = coerced(right, left.dataType)
    if (integral(l.dataType) && integral(r.dataType))
      // IntegralDivide resolves on LONG operands only (TypeCoercion
      // widens div operands; a pre-analysis swap must do it itself)
      IntegralDivide(
        org.apache.spark.sql.catalyst.expressions.Cast(l, LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(r, LongType),
        EvalMode.LEGACY)
    else {
      // Druid's numeric space is LONG/DOUBLE only — a DECIMAL literal
      // (7.0) is a DOUBLE there, and Divide itself resolves only on
      // same-typed operands (the analyzer does not coerce inside a
      // replacement), so any fractional mix divides as DOUBLE.
      def dbl(e: Expression): Expression = e.dataType match {
        case DoubleType => e
        case _ => org.apache.spark.sql.catalyst.expressions.Cast(
          e, DoubleType, None, EvalMode.TRY)
      }
      Divide(dbl(l), dbl(r), EvalMode.LEGACY)
    }
  }

  override def children: Seq[Expression] = Seq(left, right)
  override def prettyName: String = "calcite_div"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CalciteDiv =
    copy(left = newChildren(0), right = newChildren(1))
}
