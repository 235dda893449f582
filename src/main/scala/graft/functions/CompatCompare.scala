package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCoercion
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Calcite-dialect comparison of two incompatibly-typed ARRAY columns —
  * the reference plans `WHERE a_int = a_str` (BIGINT[] vs VARCHAR[]) by
  * coercing to the VARCHAR array space (qaUnnest mv_sql/array_sql
  * subquery_with_where batteries run dozens of such cross-type column
  * predicates), where Spark's comparison coercion finds no common type and
  * fails analysis. The SQL facade retries a failed analysis with the
  * offending attribute-vs-attribute comparisons swapped to this node; the
  * replacement widens when Spark can (numeric arrays) and falls back to
  * STRING-array comparison otherwise. Same-type pairs rebuild the original
  * comparison unchanged.
  *
  * `op` is the comparison tag: "=", "<=>", "<", "<=", ">", ">=".
  */
case class CompatCompare(left: Expression, right: Expression, op: String)
  extends Expression with RuntimeReplaceable with BinaryLike[Expression] {

  private def mk(l: Expression, r: Expression): Expression = op match {
    case "<=>" => EqualNullSafe(l, r)
    case "<"   => LessThan(l, r)
    case "<="  => LessThanOrEqual(l, r)
    case ">"   => GreaterThan(l, r)
    case ">="  => GreaterThanOrEqual(l, r)
    case _     => EqualTo(l, r)
  }

  override lazy val replacement: Expression =
    (left.dataType, right.dataType) match {
      case (lt, rt) if lt == rt => mk(left, right)
      case (lt: ArrayType, rt: ArrayType) =>
        TypeCoercion.findWiderTypeForTwo(lt, rt) match {
          case Some(w) => mk(Cast(left, w), Cast(right, w))
          case None =>
            val s = ArrayType(StringType, containsNull = true)
            mk(Cast(left, s), Cast(right, s))
        }
      case (lt, rt) =>
        TypeCoercion.findWiderTypeForTwo(lt, rt) match {
          case Some(w) => mk(Cast(left, w), Cast(right, w))
          case None => mk(left, right)
        }
    }

  override def prettyName: String = "compat_compare"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CompatCompare = copy(left = l, right = r)
}
