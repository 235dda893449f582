package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Druid's VARCHAR-is-a-multi-value-string convention at MV_* call sites: a
  * STRING scalar in an array position is a 1-element MV, a NULL string is a
  * NULL MV (reference MultiValueStringOperatorConversions — e.g.
  * `mv_prepend(cast(c AS char), cast(c AS char))` = ["1","1"], qaUnnest
  * array_sql_mv_funcs A1_B10_C1_D1). ARRAY inputs pass through untouched.
  * Dispatch needs the RESOLVED input type, which function builders don't
  * see, hence an expression (same pattern as JsonInputText).
  */
case class MvInput(child: Expression, nullAsSingleNull: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = child.dataType match {
    case a: ArrayType => a
    case _ => ArrayType(StringType)
  }
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) {
      // the CONTAINS/OVERLAP family treats a NULL scalar as the
      // single-null MV — mv_contains(CAST(NULL AS CHAR), CAST(NULL AS
      // CHAR)) is TRUE in every reference engine (qaUnnest
      // array_sql_mv_funcs A1_B6_C1) — while the add-element family nulls
      // out (ArrayScalarFunction.apply: asArray() == null → missing)
      return if (nullAsSingleNull && !child.dataType.isInstanceOf[ArrayType])
        new GenericArrayData(Array[Any](null))
      else null
    }
    child.dataType match {
      case _: ArrayType => v
      case StringType => new GenericArrayData(Array[Any](v))
      case _ =>
        // non-string scalar: stringify like a VARCHAR MV would carry it
        val s = org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.catalyst.expressions.Literal(v, child.dataType),
          StringType, Some("UTC"),
          org.apache.spark.sql.catalyst.expressions.EvalMode.TRY).eval(null)
        new GenericArrayData(Array[Any](s))
    }
  }

  override protected def withNewChildInternal(c: Expression): MvInput =
    copy(child = c)
}
