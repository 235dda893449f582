package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Druid's expression layer maps a scalar STRING function over a
  * multi-value input per element (ExpressionVirtualColumn: one MV operand
  * allowed, the expression applies to each value — `CONCAT(dim3, 'foo')`
  * over MV ["b","c"] is ["bfoo","cfoo"], `COALESCE(dim2, dim1)` fills
  * per element; CalciteMultiValueStringQueryTest grids). Spark's
  * analyzer instead fails DATA_DIFF_TYPES, so the SQL facade's retry
  * path swaps these calls for this node; the replacement dispatches on
  * the RESOLVED types — an MV operand (an ARRAY whose tree carries a
  * druid.mv-tagged attribute) maps elementwise, anything else rebuilds
  * the plain function so genuinely invalid calls (TRUE ARRAY operands)
  * still fail analysis like the reference's validator.
  *
  * A NULL MV row is the reference's null scalar at expression time — the
  * function applies once with NULL and the result is the 1-element MV.
  */
case class MvElementwise(name: String, children: Seq[Expression])
    extends RuntimeReplaceable {

  private def isMv(e: Expression): Boolean =
    e.dataType.isInstanceOf[ArrayType] && e.exists {
      case a: AttributeReference => a.metadata.contains("druid.mv")
      case _ => false
    }

  /** True when some operand is an MV — the result is then an MV too
    * (CompatCompare's filter dialect keys on this). */
  def producesMv: Boolean = children.exists(isMv)

  private def str(e: Expression): Expression =
    if (e.dataType == StringType) e
    else if (e.dataType.isInstanceOf[ArrayType]) e // keep invalid — fails
    else Cast(e, StringType, Some("UTC"), EvalMode.TRY)

  private def rebuild(args: Seq[Expression]): Expression = name match {
    case "coalesce" | "nvl" => Coalesce(args.map(str))
    case "concat" | "textcat" => Concat(args.map(str))
    case "upper" => Upper(args.head)
    case "lower" => Lower(args.head)
    case _ => Coalesce(args) // unreachable by construction
  }

  override lazy val replacement: Expression = {
    val mvIdx = children.indexWhere(isMv)
    if (mvIdx < 0) {
      // no MV operand: plain function, original (possibly failing) types
      name match {
        case "coalesce" | "nvl" => Coalesce(children)
        case "concat" | "textcat" => Concat(children)
        case "upper" => Upper(children.head)
        case "lower" => Lower(children.head)
        case _ => Coalesce(children)
      }
    } else {
      val arr = Cast(children(mvIdx), ArrayType(StringType, containsNull = true))
      def applied(x: Expression) = rebuild(children.updated(mvIdx, x))
      val v = NamedLambdaVariable("graft_mv_e", StringType, nullable = true)
      val mapped = ArrayTransform(arr, LambdaFunction(applied(v), Seq(v)))
      // a NULL MV row evaluates the expression once with the null scalar;
      // a null RESULT is the SQL NULL (renders empty — CalciteQueryTest
      // testConcat2 null-propagates), a non-null one the 1-element MV
      val onNull = applied(Literal.create(null, StringType))
      If(IsNull(arr),
        If(IsNull(onNull),
          Literal.create(null, ArrayType(StringType, containsNull = true)),
          CreateArray(Seq(onNull))),
        mapped)
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MvElementwise = copy(children = c)
}

/** Druid's MVD LIKE filter: `dim3 LIKE 'b%'` over a multi-value
  * dimension matches when ANY element matches (the MVD selector
  * convention, same as equality via CompatCompare). Untagged arrays keep
  * the plain LIKE so analysis rejects them like the reference.
  */
case class MvLikeAny(left: Expression, right: Expression, escapeChar: Char)
    extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(left, right)

  override lazy val replacement: Expression = left.dataType match {
    case _: ArrayType if CompatCompare.mvTagged(left) =>
      ArrayExists(
        Cast(left, ArrayType(StringType, containsNull = true)), {
          val v = NamedLambdaVariable("graft_mv_l", StringType, nullable = true)
          LambdaFunction(Like(v, right, escapeChar), Seq(v))
        })
    case _ => Like(left, right, escapeChar)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MvLikeAny = copy(left = c(0), right = c(1))
}
