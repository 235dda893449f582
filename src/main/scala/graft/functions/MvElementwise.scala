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

  // MV_TO_ARRAY(dim) is a TRUE array — whole-value under COALESCE etc.
  // (testMultiValueStringOverlapFilterCoalesceNvl: coalesce(
  // mv_to_array(dim3), ARRAY['other']) returns the first non-null ARRAY)
  // — even though its tree still holds the tagged attribute
  private def isTrueArray(e: Expression): Boolean = e match {
    case _: MvInput => true
    case a: Alias => isTrueArray(a.child)
    case c: Cast => isTrueArray(c.child)
    case _ => false
  }

  private def isMv(e: Expression): Boolean =
    e.dataType.isInstanceOf[ArrayType] && CompatCompare.treeHasMvTag(e) &&
      !isTrueArray(e)

  /** True when some operand is an MV — the result is then an MV too
    * (CompatCompare's filter dialect keys on this). */
  def producesMv: Boolean = children.exists(isMv)

  private def str(e: Expression): Expression =
    if (e.dataType == StringType) e
    // an ARRAY operand that is NOT a cartesian-bound MVD (an MvInput /
    // true-array member riding the single-MV path) reads as its MVD
    // scalar (1-element unwrap, multi → NULL) so the call resolves
    else if (e.dataType.isInstanceOf[ArrayType])
      Cast(MvScalarRead(e), StringType, Some("UTC"), EvalMode.TRY)
    else Cast(e, StringType, Some("UTC"), EvalMode.TRY)

  private def rebuild(args: Seq[Expression]): Expression = name match {
    case "coalesce" | "nvl" => Coalesce(args.map(str))
    case "concat" | "textcat" => Concat(args.map(str))
    case "upper" => Upper(args.head)
    case "lower" => Lower(args.head)
    case "nullif" =>
      If(EqualNullSafe(str(args.head), str(args(1))),
        Literal.create(null, StringType), str(args.head))
    case _ => Coalesce(args) // unreachable by construction
  }

  override lazy val replacement: Expression = {
    val mvIdx = children.indexWhere(isMv)
    // TWO OR MORE multi-value operands: the reference applies the
    // function over the CARTESIAN PRODUCT of the element sets (Druid
    // docs "Multi-value dimensions", expression behavior;
    // CalciteQueryTest testCoalesceMoreColumns — coalesce(dim2, dim3,
    // dim1) over dim2=['a'], dim3=['a','b'] yields ['a','a'], TWO cells
    // in the 'a' group), with a null MV row as the single-null element
    // set. The first MV is the outer loop, matching the reference's
    // cartesian fold order.
    if (children.filter(isMv).distinct.size >= 2) {
      // DISTINCT MV operands — repeated references to the SAME MV
      // expression (CONCAT(dim3, '-lol-', dim3)) map together on the
      // single-MV path below, not as a cartesian square
      val at = ArrayType(StringType, containsNull = true)
      val mvs = children.filter(isMv).distinct
      def sets(e: Expression): Expression =
        Coalesce(Seq(Cast(e, at),
          CreateArray(Seq(Literal.create(null, StringType)))))
      def build(remaining: Seq[Expression],
                bound: Map[Expression, Expression]): Expression =
        remaining match {
          case Seq() => rebuild(children.map(c => bound.getOrElse(c, c)))
          case head +: tail =>
            val v = NamedLambdaVariable(s"graft_mv_c${bound.size}",
              StringType, nullable = true)
            val inner = build(tail, bound + (head -> v))
            val t = ArrayTransform(sets(head), LambdaFunction(inner, Seq(v)))
            if (tail.isEmpty) t else Flatten(t)
        }
      val built = build(mvs, Map.empty)
      // ALL MV inputs null: the expression evaluates once with the null
      // scalars and a null result is the SQL NULL, not [null] — same
      // convention as the single-MV path's null-row collapse
      val allNull = mvs.map(m => IsNull(Cast(m, at)))
        .reduce[Expression](And(_, _))
      val onNull = rebuild(children.map(c =>
        if (isMv(c)) Literal.create(null, StringType) else c))
      If(allNull,
        If(IsNull(onNull), Literal.create(null, at),
          CreateArray(Seq(onNull))),
        built)
    } else if (mvIdx < 0) {
      // no MV operand: plain function. The replacement resolves
      // POST-analysis, so the analyzer's implicit type coercion never
      // sees it — widen mixed operand types here (NVL(JSON_VALUE(…
      // RETURNING DOUBLE), long) — CalciteNestedDataQueryTest
      // testNvlJsonValueDoubleMissingColumn)
      lazy val widened = org.apache.spark.sql.catalyst.analysis.TypeCoercion
        .findWiderCommonType(children.map(_.dataType))
      def co(v: Expression): Expression = widened match {
        case Some(w) if v.dataType != w => Cast(v, w, Some("UTC"))
        case _ => v
      }
      name match {
        case "coalesce" | "nvl" => Coalesce(children.map(co))
        case "concat" | "textcat" =>
          // Concat accepts only same-type STRING/BINARY/ARRAY operands —
          // replicate the analyzer's coercion (1 || 2 → '12', a || cnt)
          val types = children.map(_.dataType).distinct
          val ok = types.size == 1 && (types.head == StringType ||
            types.head == org.apache.spark.sql.types.BinaryType ||
            types.head.isInstanceOf[ArrayType])
          if (ok) Concat(children)
          else Concat(children.map(c =>
            if (c.dataType == StringType) c
            else Cast(c, StringType, Some("UTC"), EvalMode.TRY)))
        case "upper" => Upper(children.head)
        case "lower" => Lower(children.head)
        case "nullif" =>
          If(EqualNullSafe(co(children.head), co(children(1))),
            Literal.create(null, children.head.dataType), children.head)
        case _ => Coalesce(children.map(co))
      }
    } else {
      val mv = children(mvIdx)
      val arr = Cast(mv, ArrayType(StringType, containsNull = true))
      // every occurrence of the SAME MV expression maps together —
      // CONCAT(dim3, dim3) applies per element as concat(x, x)
      // (the reference's single-MV-per-expression mapping rule)
      def applied(x: Expression) =
        rebuild(children.map(c => if (c == mv) x else c))
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
    // treeHasMvTag, not just a top-level tagged attr: an MV-derived
    // expression (MV_FILTER_PREFIX(dim3,'b') LIKE 'b%') filters per
    // element too
    case _: ArrayType
        if CompatCompare.mvTagged(left) || CompatCompare.treeHasMvTag(left) =>
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

/** `probe IN (literals)` in the facade's retry path: an MV-producing
  * probe filters per element (mv_overlap semantics), while a SCALAR
  * probe keeps Spark's three-valued IN — `UPPER(x) IN ('A','B')` must
  * yield NULL for a NULL x in projection contexts, not FALSE. The
  * dispatch reads the RESOLVED probe type, so the rewrite itself can
  * fire on any coalesce/upper/lower/concat/nullif spelling safely.
  */
case class MvInDispatch(value: Expression, list: Seq[Expression])
    extends RuntimeReplaceable {

  override def children: Seq[Expression] = value +: list

  // any ARRAY-typed probe keeps the MV-overlap path (mv_*/string_to_mv
  // calls produce untagged arrays); only a probe that RESOLVES scalar —
  // an elementwise spelling over scalar operands — takes the scalar IN
  private def probeIsMv: Boolean = value match {
    case m: MvElementwise => m.producesMv
    case e => e.dataType.isInstanceOf[ArrayType]
  }

  override lazy val replacement: Expression =
    if (probeIsMv)
      GraftArrayOverlap(
        MvInput(value, nullAsSingleNull = true),
        MvInput(CreateArray(list), nullAsSingleNull = true),
        threeValued = true)
    else In(value, list)

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MvInDispatch =
    copy(value = c.head, list = c.tail)
}

/** CASE with a multi-value branch: `CASE WHEN grouping(dim2)=1 THEN 'ALL'
  * ELSE dim2 END` mixes a scalar branch with an MVD one — the reference's
  * expression layer reads the CASE as MV-valued (the scalar branch is the
  * 1-element MV). When a resolved branch is an MV-tagged array, every
  * scalar branch wraps to its single-element array; an all-scalar CASE
  * stays untouched.
  */
case class MvCaseAlign(conds: Seq[Expression], values: Seq[Expression],
    elseValue: Option[Expression]) extends RuntimeReplaceable {

  // holds the PIECES, not a CaseWhen — a mixed-type CaseWhen child would
  // fail its own checkInputDataTypes before this node could replace it

  override def children: Seq[Expression] = conds ++ values ++ elseValue

  override lazy val replacement: Expression = {
    val all = values ++ elseValue
    val mv = all.exists(v => v.dataType.isInstanceOf[ArrayType] &&
      CompatCompare.treeHasMvTag(v))
    def arr(v: Expression): Expression = v.dataType match {
      case _: ArrayType =>
        Cast(v, ArrayType(StringType, containsNull = true))
      case _ => CreateArray(Seq(Cast(v, StringType, Some("UTC"),
        EvalMode.TRY)))
    }
    if (mv)
      CaseWhen(conds.zip(values.map(arr)), elseValue.map(arr))
    else {
      // the replacement is built post-analysis, so the analyzer's CASE
      // branch coercion never sees it — widen the branches here (THEN
      // NULL ELSE cnt is VOID vs BIGINT)
      val widened = org.apache.spark.sql.catalyst.analysis.TypeCoercion
        .findWiderCommonType(all.map(_.dataType))
      def co(v: Expression): Expression = widened match {
        case Some(w) if v.dataType != w => Cast(v, w, Some("UTC"))
        case _ => v
      }
      CaseWhen(conds.zip(values.map(co)), elseValue.map(co))
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MvCaseAlign = {
    val n = conds.size
    copy(conds = c.take(n), values = c.slice(n, 2 * n),
      elseValue = if (c.size > 2 * n) Some(c.last) else None)
  }
}

/** The reference's expression layer has no FLOAT — aggregate folds read
  * floats widened to DOUBLE (ARRAY_AGG(f1) holds 0.10000000149011612,
  * not 0.1 — CalciteArraysQueryTest testArrayAggNumeric; qaAggFuncs
  * array_agg_float grids pin the same). Everything else passes through.
  */
case class FloatWiden(child: Expression) extends RuntimeReplaceable {
  override def children: Seq[Expression] = Seq(child)
  override lazy val replacement: Expression = child.dataType match {
    case FloatType => Cast(child, DoubleType)
    case ArrayType(FloatType, n) =>
      Cast(child, ArrayType(DoubleType, n))
    case _ => child
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FloatWiden = copy(child = c.head)
}

/** REGEXP_LIKE over an MVD matches when ANY element matches — same
  * selector convention as MvLikeAny (CalciteQueryTest
  * testStringOperationsNullableInference). Scalar input keeps RLike.
  */
case class MvRLikeAny(left: Expression, right: Expression)
    extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(left, right)

  override lazy val replacement: Expression = left.dataType match {
    case _: ArrayType
        if CompatCompare.mvTagged(left) || CompatCompare.treeHasMvTag(left) =>
      ArrayExists(
        Cast(left, ArrayType(StringType, containsNull = true)), {
          val v = NamedLambdaVariable("graft_mv_r", StringType, nullable = true)
          LambdaFunction(RLike(v, right), Seq(v))
        })
    case _ => RLike(left, right)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MvRLikeAny = copy(left = c(0), right = c(1))
}

/** IS [NOT] NULL over an MV-producing expression: Druid's null selector
  * matches an MVD row when the row is NULL or ANY element is null —
  * `NULLIF(dim2, 'a') IS NULL` counts the ['a']→[null] rows
  * (CalciteQueryTest testNullEmptyStringEquality). Scalar-resolving
  * inputs keep the plain IsNull.
  */
case class MvIsNull(child: Expression) extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(child)

  override lazy val replacement: Expression = child.dataType match {
    case ArrayType(et, _) =>
      Or(IsNull(child), ArrayExists(child, {
        val v = NamedLambdaVariable("graft_mv_n", et, nullable = true)
        LambdaFunction(IsNull(v), Seq(v))
      }))
    case _ => IsNull(child)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MvIsNull = copy(child = c.head)
}

/** Druid's MVD-to-scalar read: in a scalar slot (an ARRAY[] constructor
  * member — `ARRAY[dim2, dim4]` over the MVD dim2 reads dim2's scalar
  * value per row), a single-element MV unwraps to its element, a NULL MV
  * is NULL, and a multi-element MV has no scalar form (NULL). Untagged
  * inputs pass through untouched, so the wrap is safe to apply broadly
  * in the retry path.
  */
case class MvScalarRead(child: Expression) extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(child)

  override lazy val replacement: Expression = child.dataType match {
    case ArrayType(et, _) if CompatCompare.treeHasMvTag(child) =>
      If(And(IsNotNull(child), EqualTo(Size(child), Literal(1))),
        GetArrayItem(child, Literal(0)), Literal.create(null, et))
    case _ => child
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MvScalarRead = copy(child = c.head)
}

/** UNNEST input adapter: unnesting a multi-value DIMENSION emits a row
  * with a NULL element for each null-MVD row — the reference's unnest
  * cursor reads the MVD selector where the null row IS the single-null
  * value (CalciteArraysQueryTest testUnnest: 8 rows over numfoo.dim3,
  * two of them null) — while TRUE arrays skip null rows like a plain
  * explode. Dispatch is on the druid.mv tag in the resolved tree, so
  * untagged array unnests pass through untouched.
  */
case class MvUnnestInput(child: Expression) extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(child)

  override lazy val replacement: Expression = child.dataType match {
    case ArrayType(et, _) if CompatCompare.treeHasMvTag(child) =>
      Coalesce(Seq(child, CreateArray(Seq(Literal.create(null, et)))))
    case _ => child
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MvUnnestInput = copy(child = c.head)
}
