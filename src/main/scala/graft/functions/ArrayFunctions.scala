package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCoercion
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Druid-parity ARRAY_AGG (reference
  * `sql/src/main/java/org/apache/druid/sql/calcite/aggregation/builtin/ArraySqlAggregator.java`,
  * `query/aggregation/ExpressionLambdaAggregatorFactory` array fold): unlike
  * Spark's `collect_list`, the reference keeps NULL inputs as NULL array
  * elements (qaAggFuncs `array_agg_long_test001`: 18 rows, 6 null →
  * `array_length(array_agg(tab0l0)) = 18`), and returns NULL — not an empty
  * array — when no rows accumulate.
  *
  * Distributed shape: a standard partial/final `TypedImperativeAggregate`;
  * the buffer serializes through an `UnsafeProjection` over
  * `ARRAY<child.dataType>` with `containsNull = true` (the stock `Collect`
  * serializer declares `containsNull = false`, which would corrupt the very
  * nulls this aggregate exists to keep). DISTINCT is handled by the planner's
  * generic distinct-aggregate rewrite, so `ARRAY_AGG(DISTINCT x)` works and
  * keeps a null group like the reference.
  */
case class DruidArrayAgg(
    child: Expression,
    sorted: Boolean = false,
    mvFlatten: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  // a MULTI-VALUE dimension input folds its ELEMENTS (flattened), with a
  // NULL row contributing a null element — Druid's MVD scalar-read fold
  // (CalciteArraysQueryTest testArrayAggMultiValue:
  // ["a","b","b","c","d","",null,null]); TRUE-array inputs keep nesting.
  // The flag is an EXPLICIT constructor parameter set at plan time
  // (SortDistinctArrayAgg reads the druid.mv tag on the ANALYZED tree) —
  // deriving it from child metadata here would diverge between driver and
  // executor once the distinct rewrite re-attributes the child.
  @transient private lazy val mvFold: Boolean =
    mvFlatten && child.dataType.isInstanceOf[ArrayType]
  @transient private lazy val elemType: DataType =
    if (mvFold) child.dataType.asInstanceOf[ArrayType].elementType
    else child.dataType

  override def update(
      buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    // copy: unsafe-backed values (strings, nested arrays) are reused buffers
    child.eval(input) match {
      case arr: ArrayData if mvFold =>
        var i = 0
        while (i < arr.numElements()) {
          buf += (if (arr.isNullAt(i)) null
                  else InternalRow.copyValue(arr.get(i, elemType)))
          i += 1
        }
      case v => buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = buf ++= other

  // ARRAY_AGG(DISTINCT x) returns a SORTED array in the reference
  // (array_sql_agg_funcs A1_B28: [null, 1, 2], nulls first ascending) —
  // the [[graft.plans.SortDistinctArrayAgg]] rule flips `sorted` on
  // distinct call sites
  @transient private lazy val elemOrdering: Ordering[Any] = {
    val base = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(elemType)
    new Ordering[Any] {
      override def compare(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else base.compare(a, b)
    }
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    if (buf.isEmpty) null
    // the DISTINCT rewrite dedups the INPUT values — for a flattened MV
    // fold the element-level dedup happens here (distinct arrays can
    // share elements: ['a','b'] and ['b','c'] agg to a,b,c)
    else new GenericArrayData(
      if (sorted) buf.toArray.distinct.sorted(elemOrdering)
      else buf.toArray)

  @transient private lazy val bufType = ArrayType(elemType, containsNull = true)
  @transient private lazy val serProjection =
    UnsafeProjection.create(Array[DataType](bufType))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    serProjection(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val out = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      out += (if (arr.isNullAt(i)) null
              else InternalRow.copyValue(arr.get(i, elemType)))
      i += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(elemType, containsNull = true)
  override def nullable: Boolean = true
  override def defaultResult: Option[Literal] = None
  override def prettyName: String = "array_agg"

  override def withNewMutableAggBufferOffset(n: Int): DruidArrayAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): DruidArrayAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): DruidArrayAgg =
    copy(child = c)
}

/** Druid-parity ARRAY_CONTAINS (reference
  * `math/expr/Function.java` ArrayContainsFunction +
  * `sql/.../expression/builtin/ArrayContainsOperatorConversion.java`):
  * polymorphic over the second argument — a scalar tests membership, an array
  * tests contains-all — and never returns the SQL three-valued NULL that
  * Spark's `array_contains` produces when the array holds nulls: a missing
  * value is `false` even for `[null, null, null]` (qaArray
  * `ops_funcs_array_funcs` A1_B5_C13: `array_contains(a_null, 1)` → false).
  * A NULL array input returns NULL.
  *
  * Resolves post-analysis via `RuntimeReplaceable`: the replacement coerces
  * both sides to a common element type (so `array_contains(a_str, 9)` probes
  * for `'9'` like the reference's string coercion) and rewrites to
  * `size(array_except(needles, haystack)) = 0`, whose set semantics treat
  * null elements as ordinary values — all inside codegen-friendly built-ins.
  */
case class GraftArrayContains(left: Expression, right: Expression)
  extends Expression with RuntimeReplaceable with BinaryLike[Expression] {

  override lazy val replacement: Expression = {
    // MV convention: a scalar haystack is a 1-element array (null scalar →
    // NULL result via the IsNull guard, like native asArray() == null)
    val leftArr = left.dataType match {
      case _: ArrayType => left
      case _ => CreateArray(Seq(left))
    }
    val ArrayType(leftElem, _) = leftArr.dataType: @unchecked
    val (needles, needleElem) = right.dataType match {
      case ArrayType(e, _) => (right, e)
      case _               => (CreateArray(Seq(right)), right.dataType)
    }
    val common = TypeCoercion.findWiderTypeForTwo(leftElem, needleElem)
      .getOrElse(StringType)
    def asCommon(e: Expression, from: DataType): Expression =
      if (from == common) e else Cast(e, ArrayType(common, containsNull = true))
    val hay = asCommon(leftArr, leftElem)
    val need = asCommon(needles, needleElem)
    If(IsNull(left), Literal.create(null, BooleanType),
      EqualTo(Size(ArrayExcept(need, hay)), Literal(0)))
  }

  override def prettyName: String = "array_contains"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GraftArrayContains = copy(left = l, right = r)
}

/** Druid-parity ARRAY_APPEND / ARRAY_PREPEND (reference
  * `math/expr/Function.java` ArrayAppendFunction / ArrayPrependFunction):
  * the element coerces toward the ARRAY's element type when no numeric
  * widening applies — `array_append(a_str, 9)` appends `'9'` (qaArray
  * `ops_funcs_array_funcs` A1_B10_C10), where Spark's ANSI coercion would
  * instead try to cast the string elements to BIGINT and throw. Numeric
  * pairs still widen (`array_append(a_float, 9)` → `[..., 9.0]`).
  *
  * `RuntimeReplaceable` so the element type is known at rewrite time; the
  * replacement is a plain `concat`, fully codegen'd.
  */
case class GraftArrayAppend(arr: Expression, elem: Expression, prepend: Boolean)
  extends Expression with RuntimeReplaceable with BinaryLike[Expression] {

  override def left: Expression = arr
  override def right: Expression = elem

  override lazy val replacement: Expression = {
    // MV convention: a SCALAR in the array slot is a 1-element array
    // (native asArray() wraps scalars — array_append('Z', c_long) =
    // ['Z', '0']); a NULL scalar nulls out like asArray() == null
    val (arrArr, wrapped) = arr.dataType match {
      case _: ArrayType => (arr, false)
      case _ => (CreateArray(Seq(arr)), true)
    }
    val ArrayType(arrElem, _) = arrArr.dataType: @unchecked
    // reference ArrayAddElementFunction (Function.java:542-568): the ARRAY
    // argument's element type WINS — `scalarExpr.castTo(arrayExpr
    // .elementType())`, so appending 'A' to ARRAY<LONG> yields a null
    // element (ExprEval casts never error), not a widened string array.
    // NullType elements keep the array type; a NullType ARRAY adopts the
    // element's type (nothing to preserve on that side).
    def nullify(dt: DataType): DataType = dt match {
      case ArrayType(et, _) => ArrayType(nullify(et), containsNull = true)
      case org.apache.spark.sql.types.MapType(k, v, _) =>
        org.apache.spark.sql.types.MapType(nullify(k), nullify(v),
          valueContainsNull = true)
      case other => other
    }
    val target =
      nullify(if (arrElem == org.apache.spark.sql.types.NullType &&
          elem.dataType != org.apache.spark.sql.types.NullType) elem.dataType
      else arrElem)
    // Concat demands EXACTLY equal child types (containsNull included) —
    // normalize both sides to the fully-nullable array form
    val outType = ArrayType(target, containsNull = true)
    def castArr(e: Expression) =
      if (e.dataType == outType) e else Cast(e, outType)
    val single = castArr(CreateArray(Seq(
      if (elem.dataType == target) elem
      else (target, elem.dataType) match {
        // nested-array element type: a SCALAR addend wraps to its
        // 1-element array before the cast — ExprEval.castTo(ARRAY<LONG>)
        // on '1' yields [1] (CalciteArraysQueryTest
        // testGroupByNestedArrayInline: ARRAY_PREPEND('1', agg) = [[1],…])
        case (at: ArrayType, _: ArrayType) =>
          Cast(elem, at, None, EvalMode.TRY)
        case (at: ArrayType, _) =>
          Cast(CreateArray(Seq(elem)), at, None, EvalMode.TRY)
        case _ => Cast(elem, target, None, EvalMode.TRY)
      })))
    val combined =
      if (prepend) Concat(Seq(single, castArr(arrArr)))
      else Concat(Seq(castArr(arrArr), single))
    if (!wrapped) combined
    else If(IsNull(arr),
      Literal.create(null, ArrayType(target, containsNull = true)), combined)
  }

  override def prettyName: String = if (prepend) "array_prepend" else "array_append"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GraftArrayAppend = copy(arr = l, elem = r)
}

/** Druid-parity ARRAY_OVERLAP / MV_OVERLAP: the RIGHT array casts toward
  * the LEFT array's element type (Function.java
  * ArrayOverlapFunction:4192 `arrayExpr2.castTo(array1Type)` — so
  * `mv_overlap(bigint_array, ARRAY[1])` is true), and the SQL layer's
  * result is IN-like THREE-VALUED (qaArray ops_funcs_mv_funcs A1_B7 grid):
  * TRUE on any shared element — a shared NULL counts, like the native
  * `asList.contains(check)` — otherwise NULL when either side carries a
  * null element (`mv_overlap(a_str, ARRAY[1])` and `mv_overlap(a_null,
  * ARRAY[1])` are NULL, not false), and FALSE only when both sides are
  * null-free. A NULL array input is NULL.
  */
case class GraftArrayOverlap(left: Expression, right: Expression,
    threeValued: Boolean)
  extends Expression with RuntimeReplaceable with BinaryLike[Expression] {

  override lazy val replacement: Expression = {
    // MV convention: a scalar in array position is a 1-element array
    // (native asArray() wraps scalars; a NULL scalar → NULL result via the
    // IsNull guard below, matching asArray() == null)
    val leftArr = left.dataType match {
      case _: ArrayType => left
      case _ => CreateArray(Seq(left))
    }
    val ArrayType(leftElem, _) = leftArr.dataType: @unchecked
    val rhs = right.dataType match {
      case ArrayType(e, _) if e == leftElem => right
      case _: ArrayType =>
        Cast(right, ArrayType(leftElem, containsNull = true), None,
          EvalMode.TRY)
      case _ => CreateArray(Seq(Cast(right, leftElem, None, EvalMode.TRY)))
    }
    val nullBool = Literal.create(null, BooleanType)
    val overlaps = GreaterThan(Size(ArrayIntersect(leftArr, rhs)), Literal(0))
    if (!threeValued) {
      // ARRAY_OVERLAP — the native two-valued fn
      // (ArrayOverlapFunction:4188-4202): null LHS → NULL, null RHS →
      // FALSE, otherwise found/not-found — array_overlap(a_str, ARRAY[1])
      // is FALSE even though a_str carries nulls (ops_funcs_array_funcs
      // A1_B6_C10); a shared null still matches (asList.contains(null))
      If(IsNull(left), nullBool,
        If(IsNull(rhs), Literal(false), overlaps))
    } else {
      // MV_OVERLAP — IN-like THREE-VALUED at the SQL layer (qaArray
      // ops_funcs_mv_funcs A1_B7): TRUE on any shared element, otherwise
      // NULL when the LEFT side carries a null element (mv_overlap(a_str,
      // ARRAY[1]) is NULL — the unknown probe might have matched), FALSE
      // when the probe side is null-free — a null on the RIGHT only ever
      // MATCHES a null probe, it never un-knows a miss (qaUnnest
      // array_sql_mv_funcs A1_B7: mv_overlap('2', NULL-scalar) = false
      // while mv_overlap(NULL, NULL) = true).
      // intersect uses null-safe set semantics, so a shared null lands in
      // the intersection; except(x, [null]) strips nulls for the probe test
      def hasNull(e: Expression): Expression =
        GreaterThan(Size(e),
          Size(ArrayExcept(e,
            CreateArray(Seq(Literal.create(null, leftElem))))))
      If(Or(IsNull(left), IsNull(rhs)), nullBool,
        If(overlaps, Literal(true),
          If(hasNull(leftArr), nullBool, Literal(false))))
    }
  }

  override def prettyName: String = "array_overlap"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GraftArrayOverlap = copy(left = l, right = r)
}

/** Type-dispatched IN-subquery retry (the SQL facade's analysis-failure
  * path): `collected` is a scalar subquery returning
  * `struct(vals: collect_list(col), hasnull: max(col IS NULL))` over the
  * IN-subquery's output. An ARRAY-typed probe takes Druid's MVD
  * IN-subquery dialect — any element of the MV in the value set
  * (two-valued overlap, like the MVD selector). A SCALAR probe keeps
  * standard SQL three-valued IN semantics, which the collected null-free
  * list alone cannot express (collect_list drops the NULLs that make a
  * NOT IN miss evaluate to NULL): empty set → FALSE, null probe → NULL,
  * match → TRUE, miss with a null in the set → NULL, otherwise FALSE.
  * The probe casts toward the wider of the two types (Calcite's IN
  * coercion), string space as the fallback.
  *
  * Scale note: this node only appears on the type-mismatch retry path —
  * well-typed IN subqueries keep Spark's semi-join planning; the
  * collected array is bounded by the dialect use case (lookup-sized
  * value sets).
  */
case class GraftInCollected(value: Expression, collected: Expression)
  extends Expression with RuntimeReplaceable with BinaryLike[Expression] {

  override def left: Expression = value
  override def right: Expression = collected

  override lazy val replacement: Expression = {
    val vals = GetStructField(collected, 0, Some("vals"))
    val hasNull = Coalesce(Seq(
      GetStructField(collected, 1, Some("hasnull")), Literal(false)))
    val ArrayType(elemT, _) = vals.dataType: @unchecked
    value.dataType match {
      case _: ArrayType => GraftArrayOverlap(value, vals, threeValued = false)
      case vt =>
        val common = TypeCoercion.findWiderTypeForTwo(vt, elemT)
          .getOrElse(StringType)
        val probe =
          if (vt == common) value
          else Cast(value, common, Some("UTC"), EvalMode.TRY)
        val castVals =
          if (elemT == common) vals
          else Cast(vals, ArrayType(common, containsNull = true),
            Some("UTC"), EvalMode.TRY)
        val nullB = Literal.create(null, BooleanType)
        If(And(EqualTo(Size(vals), Literal(0)), Not(hasNull)),
          Literal(false),
          If(IsNull(value), nullB,
            If(Coalesce(Seq(ArrayContains(castVals, probe), Literal(false))),
              Literal(true),
              If(hasNull, nullB, Literal(false)))))
    }
  }

  override def prettyName: String = "graft_in_collected"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GraftInCollected =
    copy(value = l, collected = r)
}

/** STRING_AGG value adapter — the reference folds through its expression
  * layer where FLOAT widens to DOUBLE before stringifying (f1 renders
  * 0.10000000149011612, not 0.1 — CalciteQueryTest testStringAggNumeric)
  * and a MULTI-VALUE input folds PER ELEMENT (testStringAggMultiValue:
  * 'a,b,b,c,d,'). Scalars keep the epoch-millis timestamp render.
  */
case class StringAggInput(child: Expression) extends RuntimeReplaceable {
  override def children: Seq[Expression] = Seq(child)
  override lazy val replacement: Expression = child.dataType match {
    case FloatType => Cast(Cast(child, DoubleType), StringType)
    case _: ArrayType =>
      Cast(child, ArrayType(StringType, containsNull = true))
    case _ => Cast(TimeAsMillis(child), StringType)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): StringAggInput = copy(child = c.head)
}

/** Plain STRING_AGG: encounter-order fold joined by the separator. NULL
  * scalars skip; an ARRAY input (a multi-value dimension) contributes its
  * non-null ELEMENTS; an all-skipped group is SQL NULL; the optional
  * maxBytes cap fails the fold on overflow like the reference's
  * ExpressionLambdaAggregatorFactory buffer.
  */
case class GraftStringAgg(
    child: Expression,
    delimiter: Expression,
    maxBytes: Option[Int] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[String]]
  with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = delimiter
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "string_agg"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    // literal-like = no column references and deterministic (a plain
    // .foldable misses RuntimeReplaceable wrappers over constant args —
    // CONCAT('|','|') routed through the MV dialect)
    if (delimiter.references.isEmpty && delimiter.deterministic)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "string_agg separator must be a literal")

  @transient private lazy val sep: String = {
    val v = delimiter.eval(null)
    if (v == null) "" else v.toString
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[String] =
    mutable.ArrayBuffer.empty[String]

  override def update(buf: mutable.ArrayBuffer[String],
                      input: InternalRow): mutable.ArrayBuffer[String] = {
    child.eval(input) match {
      case null =>
      case arr: ArrayData =>
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) buf += arr.getUTF8String(i).toString
          i += 1
        }
      case v => buf += v.toString
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[String],
                     b: mutable.ArrayBuffer[String]): mutable.ArrayBuffer[String] =
    a ++= b

  override def eval(buf: mutable.ArrayBuffer[String]): Any =
    if (buf.isEmpty) null
    else {
      val joined = buf.mkString(sep)
      maxBytes.foreach { mb =>
        val n = joined.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        if (n > mb) throw new IllegalStateException(
          s"string_agg aggregation result ($n bytes) exceeds maxSizeBytes " +
            s"($mb) — raise the limit or reduce the group")
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(joined)
    }

  override def serialize(buf: mutable.ArrayBuffer[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { s =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    }
    out.close(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[String] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf += new String(b, java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): GraftStringAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GraftStringAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GraftStringAgg =
    copy(child = l, delimiter = r)
}

/** STRING_AGG(DISTINCT x, sep) — the reference's distinct fold is a
  * TreeSet, so the output is the SORTED distinct set joined by the
  * separator (CalciteQueryTest testStringAgg: ',1,10.1,2,abc,def').
  * A dedicated aggregate (dedup + sort inside) because Spark's ListAgg
  * loses its SortOrder children through the distinct-aggregate rewrite;
  * the facade rewrites the DISTINCT spelling to this function, dropping
  * the keyword. NULL inputs are skipped; an all-NULL group is SQL NULL.
  */
case class GraftStringAggSorted(
    child: Expression,
    delimiter: Expression,
    maxBytes: Option[Int] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[String]]
  with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = delimiter
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "string_agg_sorted"

  // a column-valued separator would NPE at executor time (eval(null));
  // the reference requires a literal and fails validation the same way
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    // literal-like = no column references and deterministic (a plain
    // .foldable misses RuntimeReplaceable wrappers over constant args —
    // CONCAT('|','|') routed through the MV dialect)
    if (delimiter.references.isEmpty && delimiter.deterministic)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "string_agg separator must be a literal")

  @transient private lazy val sep: String = {
    val v = delimiter.eval(null)
    if (v == null) "" else v.toString
  }

  override def createAggregationBuffer(): mutable.TreeSet[String] =
    mutable.TreeSet.empty[String]

  override def update(buf: mutable.TreeSet[String],
                      input: InternalRow): mutable.TreeSet[String] = {
    child.eval(input) match {
      case null =>
      // a multi-value input folds per element (StringAggInput casts MV
      // inputs to ARRAY<STRING>; CalciteQueryTest testStringAggMultiValue
      // DISTINCT = ',a,b,c,d')
      case arr: ArrayData =>
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) buf += arr.getUTF8String(i).toString
          i += 1
        }
      case v => buf += v.toString
    }
    buf
  }

  override def merge(a: mutable.TreeSet[String],
                     b: mutable.TreeSet[String]): mutable.TreeSet[String] =
    a ++= b

  override def eval(buf: mutable.TreeSet[String]): Any =
    if (buf.isEmpty) null
    else {
      val joined = buf.mkString(sep)
      maxBytes.foreach { mb =>
        val n = joined.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        if (n > mb) throw new IllegalStateException(
          s"string_agg aggregation result ($n bytes) exceeds maxSizeBytes " +
            s"($mb) — raise the limit or reduce the group")
      }
      org.apache.spark.unsafe.types.UTF8String.fromString(joined)
    }

  override def serialize(buf: mutable.TreeSet[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { s =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    }
    out.close(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[String] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[String]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf += new String(b, java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): GraftStringAggSorted =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GraftStringAggSorted =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GraftStringAggSorted =
    copy(child = l, delimiter = r)
}
