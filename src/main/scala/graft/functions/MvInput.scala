package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  Cast, Coalesce, CreateArray, EvalMode, Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
import org.apache.spark.sql.types._

/** Druid's VARCHAR-is-a-multi-value-string convention at MV_* call sites: a
  * STRING scalar in an array position is a 1-element MV, a NULL string is a
  * NULL MV (reference MultiValueStringOperatorConversions — e.g.
  * `mv_prepend(cast(c AS char), cast(c AS char))` = ["1","1"], qaUnnest
  * array_sql_mv_funcs A1_B10_C1_D1). ARRAY inputs pass through untouched.
  * Dispatch needs the RESOLVED input type, which function builders don't
  * see, hence an expression — but the dispatch is static at plan time, so
  * it is RuntimeReplaceable: the optimizer substitutes the type-specific
  * replacement and the whole MV_* call stays inside whole-stage codegen
  * (the interpreted CodegenFallback version cost 2-11x on the MV
  * microgates at r17).
  *
  * `nullAsSingleNull`: the CONTAINS/OVERLAP family treats a NULL scalar as
  * the single-null MV — mv_contains(CAST(NULL AS CHAR), CAST(NULL AS
  * CHAR)) is TRUE in every reference engine (qaUnnest array_sql_mv_funcs
  * A1_B6_C1) — while the add-element family nulls out
  * (ArrayScalarFunction.apply: asArray() == null → missing).
  */
case class MvInput(child: Expression, nullAsSingleNull: Boolean = false)
    extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(child)

  override lazy val replacement: Expression = child.dataType match {
    case ArrayType(et, _) if nullAsSingleNull && CompatCompare.mvTagged(child) =>
      // an MVD column's null row IS the single-null MV in the reference
      // (a null MVD selector matches it): MV_CONTAINS(dim3, ARRAY[NULL])
      // keeps the null-dim3 rows (CalciteMultiValueStringQueryTest
      // testMultiValueStringContainsFilterNull) — TRUE arrays keep the
      // null-in/null-out convention below
      Coalesce(Seq(child, CreateArray(Seq(Literal.create(null, et)))))
    case _: ArrayType => child
    case StringType =>
      if (nullAsSingleNull) CreateArray(Seq(child))
      else If(IsNull(child),
        Literal.create(null, ArrayType(StringType)), CreateArray(Seq(child)))
    case _ =>
      // non-string scalar: stringify like a VARCHAR MV would carry it
      val s = Cast(child, StringType, Some("UTC"), EvalMode.TRY)
      if (nullAsSingleNull) CreateArray(Seq(s))
      else If(IsNull(child),
        Literal.create(null, ArrayType(StringType)), CreateArray(Seq(s)))
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MvInput = copy(child = c.head)
}
