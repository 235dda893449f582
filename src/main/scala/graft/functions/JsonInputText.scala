package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Adapter feeding the JSON walker: a STRING input passes through, an SQL
  * ARRAY input serializes to its compact JSON text first. The reference's
  * JSON functions accept ARRAY-typed expressions as nested data —
  * `json_keys(a_str, '$.')` yields the index keys `[0, 1, 2]` and
  * `json_query(a_str, '$[0]')` the first element (qaArray
  * ops_funcs_json_funcs A1_B1_C10/A1_B4_C10) — where a bare CAST to
  * STRING would render Spark's non-JSON array form (`[S1, S2, null]`)
  * that the walker cannot parse. Type dispatch needs the RESOLVED child
  * type, which function builders don't see — but it is STATIC at plan
  * time, so this is RuntimeReplaceable: the dominant STRING case folds to
  * the bare child (whole-stage codegen'd — STRING_TO_MV previously paid
  * an interpreted pass-through per row) and only genuinely nested inputs
  * route to the interpreted serializer below.
  */
case class JsonInputText(child: Expression) extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(child)

  override lazy val replacement: Expression = child.dataType match {
    case StringType => child
    case _ => JsonInputTextSerialize(child)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): JsonInputText = copy(child = c.head)
}

/** JSON walker method dispatch on the input's storage-format tag: columns
  * of AUTO-typed tables (druid.autojson metadata, set by the nested
  * fixture loaders) read their SPECIALIZED field columns in the reference
  * — single-element arrays unwrap, scalars wrap under array RETURNING,
  * negative indexes resolve — while v4-format nested columns keep the
  * raw-walk semantics the qaJsonCols corpus pins (primitive arrays pass
  * through as text, negative indexes NULL). Both are the reference's own
  * behaviors; the divergence is real and storage-dependent
  * (CalciteNestedDataQueryTest vs qaJsonCols func_json_value.02).
  */
case class JsonWalkDispatch(input: Expression, path: Expression,
    typedMethod: String, rawMethod: String, resultType: DataType)
    extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(input, path)

  override lazy val replacement: Expression = {
    val m =
      if (CompatCompare.treeHasTag(input, "druid.autojson")) typedMethod
      else rawMethod
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      JsonWalk.getClass, resultType, m,
      Seq(JsonInputText(input),
        org.apache.spark.sql.catalyst.expressions.Cast(path, StringType)),
      Seq(StringType, StringType), propagateNull = false)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): JsonWalkDispatch =
    copy(input = c(0), path = c(1))
}

/** The non-string arm of [[JsonInputText]]: serializes ARRAY input to
  * compact JSON text and casts scalar input with the reference's
  * datetime-as-epoch-millis convention. Interpreted (CodegenFallback) —
  * every consumer is already a non-codegen StaticInvoke walker call.
  */
case class JsonInputTextSerialize(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  private lazy val jsonFactory = new com.fasterxml.jackson.core.JsonFactory()

  // The reference's expression layer has NO datetime types — TIMESTAMP and
  // DATE ride as LONG epoch millis, so JSON functions see the millis value
  // (`json_value(__time, '$')` = '1640995200000' and `RETURNING bigint`
  // compares against millis — qaJsonCols funcs_and_sql_func_json_value
  // A001-A003; json_object TIMESTAMP values render epoch millis, r15).
  // Other non-string atomics (BINARY …) route through Cast-to-string
  // semantics instead of toString on Catalyst internals.
  private def timeMillis(v: Any, t: DataType): Long = t match {
    case DateType => v.asInstanceOf[Int].toLong * 86400000L
    case _ => Math.floorDiv(v.asInstanceOf[Long], 1000L) // micros → millis
  }

  @transient private lazy val tzId: String =
    try org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
    catch { case _: Exception => "UTC" }

  private def castText(v: Any, t: DataType): UTF8String = t match {
    case DateType | TimestampType | TimestampNTZType =>
      UTF8String.fromString(timeMillis(v, t).toString)
    case _ =>
      import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
      Cast(Literal(v, t), StringType, Some(tzId), EvalMode.TRY)
        .eval(null).asInstanceOf[UTF8String]
  }

  private def write(gen: com.fasterxml.jackson.core.JsonGenerator,
                    v: Any, t: DataType): Unit = (v, t) match {
    case (null, _) => gen.writeNull()
    case (a: ArrayData, ArrayType(et, _)) =>
      gen.writeStartArray()
      var i = 0
      while (i < a.numElements()) {
        write(gen, if (a.isNullAt(i)) null else a.get(i, et), et)
        i += 1
      }
      gen.writeEndArray()
    case (s: UTF8String, _) => gen.writeString(s.toString)
    // DATE/TIMESTAMP store as Int/Long internally — dispatch on the TYPE
    // before the numeric cases; they serialize as epoch-millis NUMBERS
    // (the reference's expr layer carries datetimes as LONG)
    case (d, DateType | TimestampType | TimestampNTZType) =>
      gen.writeNumber(timeMillis(d, t))
    case (b: Boolean, _) => gen.writeBoolean(b)
    case (n: Byte, _) => gen.writeNumber(n.toLong)
    case (n: Short, _) => gen.writeNumber(n.toLong)
    case (n: Int, _) => gen.writeNumber(n.toLong)
    case (n: Long, _) => gen.writeNumber(n)
    case (n: Float, _) => gen.writeNumber(n.toDouble)
    case (n: Double, _) => gen.writeNumber(n)
    case (n: org.apache.spark.sql.types.Decimal, _) =>
      gen.writeNumber(n.toJavaBigDecimal)
    case (other, t) =>
      val s = castText(other, t)
      gen.writeString(if (s == null) other.toString else s.toString)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    child.dataType match {
      case StringType => v
      case at: ArrayType =>
        val sw = new java.io.StringWriter()
        val gen = jsonFactory.createGenerator(sw)
        write(gen, v, at)
        gen.close()
        UTF8String.fromString(sw.toString)
      case t =>
        val s = castText(v, t)
        if (s == null) UTF8String.fromString(v.toString) else s
    }
  }

  override protected def withNewChildInternal(
      c: Expression): JsonInputTextSerialize = copy(child = c)
}
