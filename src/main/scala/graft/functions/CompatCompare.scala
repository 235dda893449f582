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

  // Druid's MULTI-VALUE filter semantics: a scalar comparison against an
  // MV column matches when ANY element satisfies it (`dim2 = 'a'` over the
  // MV dim2 is the MVD selector; CalciteJoinQueryTest joins foo.dim2 to
  // the lookup key the same way). Per-element three-valued exists.
  private def mvAnyMatch(arr: Expression, scalar: Expression,
      flip: Boolean): Expression = {
    val ArrayType(elemT, _) = arr.dataType: @unchecked
    val v = NamedLambdaVariable("graft_mv_x", elemT, nullable = true)
    val needle = Cast(scalar, elemT, None, EvalMode.TRY)
    val body = if (flip) mk(needle, v) else mk(v, needle)
    ArrayExists(arr, LambdaFunction(body, Seq(v)))
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
      // only MVD-derived arrays take the any-element-match dialect — a
      // tagged column or any expression over one (MV_FILTER_ONLY(dim3,…)
      // = 'b' filters per element); a TRUE ARRAY column vs a scalar keeps
      // the original comparison so analysis rejects it exactly like the
      // reference's validator (qaArray !error grids)
      case (_: ArrayType, rt) if !rt.isInstanceOf[ArrayType] &&
          (CompatCompare.mvTagged(left) ||
            CompatCompare.treeHasMvTag(left)) =>
        mvAnyMatch(left, right, flip = false)
      case (lt, _: ArrayType) if !lt.isInstanceOf[ArrayType] &&
          (CompatCompare.mvTagged(right) ||
            CompatCompare.treeHasMvTag(right)) =>
        mvAnyMatch(right, left, flip = true)
      // a fractional LITERAL coerces toward a narrower fractional COLUMN
      // (Druid casts the literal to the column type: f1 = 0.1 matches the
      // FLOAT 0.1f — CalciteQueryTest testFilterFloatDimension — where a
      // double-space compare would see 0.10000000149011612 ≠ 0.1)
      case (FloatType, rt)
          if (rt == DoubleType || rt.isInstanceOf[DecimalType]) &&
            right.isInstanceOf[Literal] =>
        mk(left, Cast(right, FloatType, None, EvalMode.TRY))
      case (lt, FloatType)
          if (lt == DoubleType || lt.isInstanceOf[DecimalType]) &&
            left.isInstanceOf[Literal] =>
        mk(Cast(left, FloatType, None, EvalMode.TRY), right)
      // Calcite coerces a STRING against a temporal column toward the
      // TEMPORAL side (`__time >= '2000-01-01'` compares as timestamps —
      // a string-space widening would compare formatted text); the
      // engine's clock convention is UTC
      case (lt @ (TimestampType | DateType), StringType) =>
        mk(left, Cast(right, lt, Some("UTC"), EvalMode.TRY))
      case (StringType, rt @ (TimestampType | DateType)) =>
        mk(Cast(left, rt, Some("UTC"), EvalMode.TRY), right)
      case (lt, rt) =>
        TypeCoercion.findWiderTypeForTwo(lt, rt) match {
          case Some(w) => mk(Cast(left, w, Some("UTC"), EvalMode.LEGACY),
            Cast(right, w, Some("UTC"), EvalMode.LEGACY))
          // otherwise the STRING side casts toward the typed side (only
          // when that cast exists — an uncastable target would make the
          // REPLACEMENT itself unresolvable, an internal error instead of
          // the reference's clean validation failure);
          // incomparable non-string pairs keep the original comparison
          // so analysis reports them
          case None if rt == StringType && Cast.canCast(rt, lt) =>
            mk(left, Cast(right, lt, Some("UTC"), EvalMode.TRY))
          case None if lt == StringType && Cast.canCast(lt, rt) =>
            mk(Cast(left, rt, Some("UTC"), EvalMode.TRY), right)
          case None => mk(left, right)
        }
    }

  override def prettyName: String = "compat_compare"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CompatCompare = copy(left = l, right = r)
}

object CompatCompare {
  /** MV string columns carry the `druid.mv` metadata tag (set by the
    * fixture loaders) — VARCHAR in the reference, so the MVD any-match
    * filter dialect applies; untagged TRUE ARRAY columns do not (the
    * reference's validator rejects scalar comparisons against them).
    * Same tag check as DruidFunctions.mvElementwiseSubstring.
    */
  def mvTagged(e: Expression): Boolean = e match {
    case at: AttributeReference => at.metadata.contains("druid.mv")
    case al: Alias => mvTagged(al.child)
    case c: Cast => mvTagged(c.child)
    // an elementwise map over an MV operand produces an MV
    case m: MvElementwise => m.producesMv
    case _ => false
  }

  /** True when ANYWHERE in the tree a druid.mv-tagged attribute appears.
    * OuterReference is a LEAF expression (correlated lateral subqueries
    * wrap the outer attribute in one), so a plain exists() cannot see
    * through it — unwrap explicitly.
    */
  def treeHasMvTag(e: Expression): Boolean = treeHasTag(e, "druid.mv")

  /** Generic metadata-tag scan — also used for `druid.autojson` (nested
    * columns of auto-typed tables, whose JSON_VALUE semantics differ from
    * the v4-format walk — see JsonWalk.valueTyped).
    */
  def treeHasTag(e: Expression, key: String): Boolean = e.exists {
    case a: AttributeReference => a.metadata.contains(key)
    case o: OuterReference => o.e match {
      case a: AttributeReference => a.metadata.contains(key)
      case _ => false
    }
    case _ => false
  }
}
