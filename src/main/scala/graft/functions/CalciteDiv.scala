package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Divide, EvalMode, Expression, IntegralDivide, RuntimeReplaceable}
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
case class CalciteDiv(left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable {

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override lazy val replacement: Expression =
    if (integral(left.dataType) && integral(right.dataType))
      // IntegralDivide resolves on LONG operands only (TypeCoercion
      // widens div operands; a pre-analysis swap must do it itself)
      IntegralDivide(
        org.apache.spark.sql.catalyst.expressions.Cast(left, LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(right, LongType),
        EvalMode.LEGACY)
    else Divide(left, right, EvalMode.LEGACY)

  override def children: Seq[Expression] = Seq(left, right)
  override def prettyName: String = "calcite_div"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CalciteDiv =
    copy(left = newChildren(0), right = newChildren(1))
}
