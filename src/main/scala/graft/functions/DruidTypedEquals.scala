package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  * models Druid's strict-boolean LONG 1/0. Cross-family is always false,
  * exactly like Objects.equals on Long/Double/String boxes.
  *
  * A custom expression (not EqualNullSafe) because Spark's comparison
  * coercion would CAST the operands to a common type first — the exact
  * behavior the reference doesn't have.
  */
case class DruidTypedEquals(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

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

  private def normLong(v: Any): Long = v match {
    case b: Boolean => if (b) 1L else 0L
    case n: Number => n.longValue()
    case x => x.asInstanceOf[Number].longValue()
  }

  private def normDouble(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue()
    case x => x.asInstanceOf[Number].doubleValue()
  }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) return (l == null) && (r == null)
    val lf = family(left.dataType); val rf = family(right.dataType)
    if (lf != rf || lf < 0) return false
    lf match {
      case 0 => normLong(l) == normLong(r)
      case 1 => normDouble(l) == normDouble(r)
      case 2 => l.asInstanceOf[UTF8String].equals(r.asInstanceOf[UTF8String])
      case _ => l == r // date/timestamp: same-family raw internal values
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DruidTypedEquals =
    copy(left = newLeft, right = newRight)
}
