package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  And, Cast, EqualNullSafe, Expression, IsNull}
import org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
import org.apache.spark.sql.types._

/** The reference's `Objects.equals(array[i], scalarExpr.value())` needle
  * probe (Function.java ArrayOffsetOfFunction:3733 / ArrayOrdinalOfFunction)
  * — STRICT typed equality with NO implicit coercion: a LONG needle never
  * matches a STRING element ('1' ≠ 1 → mv_offset_of(a_mixed, 1) is NULL,
  * qaArray ops_funcs_mv_funcs A1_B8_C19_D1) and never matches a DOUBLE
  * element (1 ≠ 1.0 → mv_offset_of(a_float, 1) is NULL, A1_B8_C7_D1). A
  * NULL needle FINDS a null element (Objects.equals(null, null) is true).
  *
  * Values normalize within their own type family only — the engine's
  * integral widths (BYTE..LONG) all model Druid LONG and its fractional
  * widths (FLOAT/DOUBLE/DECIMAL literals) model Druid DOUBLE; BOOLEAN
  * models Druid's strict-boolean LONG 1/0. Cross-family is always false
  * (unless both sides are NULL), exactly like Objects.equals on
  * Long/Double/String boxes.
  *
  * A custom expression (not plain EqualNullSafe on the raw operands)
  * because Spark's comparison coercion would CAST the operands to a common
  * type first — the exact behavior the reference doesn't have. The family
  * check is static on the operand dataTypes, so this is RuntimeReplaceable:
  * cross-family pairs fold to a null-pair probe and same-family pairs to a
  * cast-normalized EqualNullSafe — all codegen'd (the interpreted
  * CodegenFallback version cost 2-11x on the MV microgates at r17).
  * NaN-vs-NaN: EqualNullSafe says true, matching Objects.equals on Double
  * boxes (Double.equals treats NaN equal).
  */
case class DruidTypedEquals(left: Expression, right: Expression)
    extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(left, right)

  // 0 = integral(Long), 1 = fractional(Double), 2 = string,
  // 3 = date, 4 = timestamp (own families: internal units differ from
  // LONG millis, so they never cross-match a numeric needle), -1 = other
  private def family(t: DataType): Int = t match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType => 0
    case FloatType | DoubleType | _: DecimalType => 1
    case StringType => 2
    case DateType => 3
    case TimestampType => 4
    case _ => -1
  }

  override lazy val replacement: Expression = {
    val lf = family(left.dataType); val rf = family(right.dataType)
    if (lf != rf || lf < 0) {
      // cross-family: only a null pair matches (Objects.equals(null, null))
      And(IsNull(left), IsNull(right))
    } else lf match {
      case 0 => EqualNullSafe(Cast(left, LongType), Cast(right, LongType))
      case 1 => EqualNullSafe(Cast(left, DoubleType), Cast(right, DoubleType))
      case _ => EqualNullSafe(left, right)
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): DruidTypedEquals =
    copy(left = c(0), right = c(1))
}
