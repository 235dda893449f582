package graft.functions

import org.apache.spark.sql.catalyst.expressions.{And, Cast, Divide, EqualTo, Expression, If, IntegralDivide, IsNaN, Literal, Not, Or, RuntimeReplaceable}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misc scalar functions from the reference's native expression library
  * (`processing/.../math/expr/Function.java`) with no Spark built-in
  * equivalent.
  */

/** `safe_divide(x, y)` — division that absorbs the error cases
  * (Function.java SafeDivide:1218): on the LONG path a zero divisor yields
  * NULL; on the DOUBLE path a zero-or-NaN divisor yields NULL unless the
  * dividend is also zero, which yields 0.0 (the reference's "0/0 = 0"
  * special case). Type-polymorphic like the reference: both-integral
  * inputs divide as longs, anything else as doubles. RuntimeReplaceable —
  * the optimizer swaps in the typed If/Divide tree, so evaluation and
  * codegen are entirely built-in expressions.
  */
case class SafeDivide(left: Expression, right: Expression)
    extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(left, right)

  override lazy val replacement: Expression = {
    val integral = Seq(left, right).forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    if (integral) {
      val x = Cast(left, LongType)
      val y = Cast(right, LongType)
      If(EqualTo(y, Literal(0L)), Literal.create(null, LongType),
        IntegralDivide(x, y))
    } else {
      val x = Cast(left, DoubleType)
      val y = Cast(right, DoubleType)
      // null-branch condition is Java's `x != 0` (NaN != 0 is TRUE there,
      // and Spark's EqualTo(NaN, 0.0) is false, so Not(EqualTo) matches)
      If(Or(EqualTo(y, Literal(0.0)), IsNaN(y)),
        If(Not(EqualTo(x, Literal(0.0))),
          Literal.create(null, DoubleType), Literal(0.0)),
        Divide(x, y))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

/** `div(x, y)` — Function.java Div:1250: on the LONG path plain long
  * division; on the DOUBLE path the reference divides FIRST and then
  * truncates the quotient — `(long)(x / y)` (Function.java:1264-1268) —
  * so DIV(10.0, 2.5) = 4, not 10/2 = 5, and a fractional divisor < 1 is
  * a perfectly good divisor, not a divide-by-zero. Type-polymorphic like
  * [[SafeDivide]]: both-integral inputs go through IntegralDivide,
  * anything else divides as doubles and casts the quotient to LONG
  * (Spark's non-ANSI double→long cast is Java's `(long)` — NaN → 0,
  * ±Infinity → ±Long.MaxValue — matching the reference cast exactly,
  * including x/0.0 = Infinity → Long.MaxValue).
  */
case class DruidDiv(left: Expression, right: Expression)
    extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(left, right)

  override lazy val replacement: Expression = {
    val integral = Seq(left, right).forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    if (integral) {
      // long /0 throws in the reference (Java ArithmeticException) — ANSI
      // IntegralDivide's divide-by-zero error is the same rejection
      IntegralDivide(Cast(left, LongType), Cast(right, LongType))
    } else {
      // Spark's Divide NULLs on a zero divisor in every eval mode, so the
      // IEEE-then-truncate semantics need their own expression
      DoubleDivToLong(Cast(left, DoubleType), Cast(right, DoubleType))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

/** Native-expression `cast(x, 'TYPE')` (Function.java CastFunc:1986 over
  * ExprEval.castTo) — the edge rules differ from SQL CAST:
  *  - string → LONG/DOUBLE goes through `computeNumber` (ExprEval.java:625):
  *    'true'/'false' (any case) are 1/0, then a long parse, then a DOUBLE
  *    parse — so cast('12.5', 'LONG') is 12 where SQL CAST errors/NULLs;
  *    unparseable text is NULL, never an error.
  *  - double → LONG truncates with Java (long) saturation.
  *  - scalar → ARRAY<T> wraps a single element; array → ARRAY<T> casts
  *    per element with the same rules.
  * RuntimeReplaceable — the typed tree is picked once child types resolve,
  * and every leaf is a built-in (codegen'd) expression.
  */
case class DruidCast(child: Expression, typeName: String)
    extends RuntimeReplaceable {

  import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, CaseWhen, Coalesce, EvalMode, LambdaFunction, Lower, NamedLambdaVariable}
  import org.apache.spark.sql.types.{ArrayType, BooleanType, FloatType}

  override def children: Seq[Expression] = Seq(child)

  private def lit(s: String) =
    Literal(UTF8String.fromString(s), StringType)

  /** computeNumber, truncated to LONG. */
  private def strToLong(e: Expression): Expression = {
    val s = Cast(e, StringType)
    CaseWhen(Seq(
      (EqualTo(Lower(s), lit("true")), Literal(1L): Expression),
      (EqualTo(Lower(s), lit("false")), Literal(0L): Expression)),
      Coalesce(Seq(
        Cast(s, LongType, None, EvalMode.TRY),
        Cast(Cast(s, DoubleType, None, EvalMode.TRY), LongType, None,
          EvalMode.LEGACY))))
  }

  private def strToDouble(e: Expression): Expression = {
    val s = Cast(e, StringType)
    CaseWhen(Seq(
      (EqualTo(Lower(s), lit("true")), Literal(1.0): Expression),
      (EqualTo(Lower(s), lit("false")), Literal(0.0): Expression)),
      Cast(s, DoubleType, None, EvalMode.TRY))
  }

  private def scalarTo(e: Expression, target: String): Expression =
    (target, e.dataType) match {
      case ("LONG", StringType)   => strToLong(e)
      case ("LONG", _)            => Cast(e, LongType, None, EvalMode.LEGACY)
      case ("DOUBLE", StringType) => strToDouble(e)
      case ("DOUBLE", _)          => Cast(e, DoubleType, None, EvalMode.LEGACY)
      case ("STRING", BooleanType) =>
        // Druid longs render booleans as 1/0 strings
        Cast(Cast(e, LongType), StringType)
      case ("STRING", _)          => Cast(e, StringType)
      case (other, _) => throw new IllegalArgumentException(
        s"cast: invalid type [$other]")
    }

  override lazy val replacement: Expression = {
    val t = typeName.toUpperCase.replaceAll("\\s+", "")
    val ArrayRe = "ARRAY<(LONG|DOUBLE|STRING)>".r
    t match {
      case ArrayRe(et) =>
        child.dataType match {
          case ArrayType(elemType, _) =>
            val lv = NamedLambdaVariable("graft_cast_x", elemType, true)
            ArrayTransform(child, LambdaFunction(scalarTo(lv, et), Seq(lv)))
          case _ =>
            org.apache.spark.sql.catalyst.expressions.CreateArray(
              Seq(scalarTo(child, et)))
        }
      case scalar =>
        child.dataType match {
          case ArrayType(_, _) => throw new IllegalArgumentException(
            s"cast: invalid cast from ARRAY to [$scalar]")
          case _ => scalarTo(child, scalar)
        }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** The native expression language's truthiness rule
  * (`math/expr/Evals.java:55-68`): numerics are true iff `x > 0` (so
  * `-1` is FALSE, unlike a SQL nonzero-cast), strings go through
  * `Boolean.parseBoolean` (only a case-insensitive `"true"` is true —
  * `'1'` is FALSE), booleans pass through. NULL input stays NULL here;
  * each caller applies its own null rule (asBoolean contexts treat null
  * as false, `istrue`/`isfalse` check the raw value first).
  * RuntimeReplaceable — the typed tree is picked once the child type
  * resolves, every leaf codegen'd.
  */
case class DruidTruth(child: Expression) extends RuntimeReplaceable {

  import org.apache.spark.sql.catalyst.expressions.{GreaterThan, Lower}
  import org.apache.spark.sql.types.{BooleanType, DecimalType, FloatType}

  override def children: Seq[Expression] = Seq(child)

  override lazy val replacement: Expression = child.dataType match {
    case BooleanType => child
    case StringType =>
      EqualTo(Lower(child), Literal(UTF8String.fromString("true"), StringType))
    case ByteType | ShortType | IntegerType | LongType =>
      GreaterThan(child, Cast(Literal(0), child.dataType))
    case DoubleType | FloatType | _: DecimalType =>
      // Java `x > 0` is false for NaN; Spark's nan-safe ordering puts NaN
      // above everything, so guard it out explicitly
      And(Not(IsNaN(Cast(child, DoubleType))),
        GreaterThan(Cast(child, DoubleType), Literal(0.0)))
    case org.apache.spark.sql.types.NullType =>
      Literal.create(null, org.apache.spark.sql.types.BooleanType)
    case _ => Cast(child, BooleanType)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `string_format(pattern, args…)` — Function.java StringFormatFunc:2790
  * over `StringUtils.nonStrictFormat:381`: `String.format(Locale.ENGLISH,
  * …)`, except an ILLEGAL format never errors — the reference appends
  * "; arg" per argument to the unformatted pattern and returns that.
  * Spark's FormatString throws, so this needs its own eval; string
  * rendering is off any hot aggregate path, CodegenFallback is fine.
  * (A null pattern returns NULL — the reference NPEs there when args are
  * present; accepted leniency on a pathological input.)
  */
case class NonStrictFormat(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val fmt = children.head.eval(input)
    if (fmt == null) return null
    val f = fmt.toString
    if (children.size == 1) return UTF8String.fromString(f)
    val args: Seq[AnyRef] = children.tail.map { c =>
      c.eval(input) match {
        case null => null
        case u: UTF8String => u.toString
        case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
        case v => v.asInstanceOf[AnyRef]
      }
    }
    val out =
      try String.format(java.util.Locale.ENGLISH, f, args: _*)
      catch {
        case _: java.util.IllegalFormatException =>
          args.foldLeft(new StringBuilder(f)) { (sb, a) =>
            sb.append("; ").append(a)
          }.toString
      }
    UTF8String.fromString(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Plain IEEE `x / y` on doubles (Infinity on a zero divisor, never an
  * error) — Spark's Divide rejects zero divisors under ANSI and NULLs them
  * in legacy mode, so reference-exact double math needs the raw operation.
  * Codegen emits the literal Java division.
  */
case class DoubleDivide(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(x: Any, y: Any): Any =
    x.asInstanceOf[Double] / y.asInstanceOf[Double]

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"($a / $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Java's `(long)(x / y)` exactly — IEEE division (x/0.0 = ±Infinity, never
  * an error) followed by the narrowing cast (NaN → 0, ±Inf → ±Long.Max).
  * Codegen emits the literal Java expression, so it stays inside
  * whole-stage codegen on the hot path.
  */
case class DoubleDivToLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(x: Any, y: Any): Any =
    (x.asInstanceOf[Double] / y.asInstanceOf[Double]).toLong

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"(long)($a / $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `round(x[, scale])` — Function.java Round:1489: HALF_UP in exact
  * BigDecimal, and NON-FINITE doubles normalize BEFORE rounding
  * (safeGetFromDouble:1563 — NaN → 0.0, ±Infinity → ±Double.MaxValue).
  * Spark's Round propagates NaN/Infinity, so the double path wraps the
  * input; every other type is exactly Spark's Round (same HALF_UP
  * BigDecimal.valueOf mechanism).
  */
case class DruidRound(child: Expression, scale: Expression)
    extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(child, scale)

  override lazy val replacement: Expression = child.dataType match {
    case DoubleType | org.apache.spark.sql.types.FloatType =>
      import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Round}
      val x = Cast(child, DoubleType)
      val norm = CaseWhen(Seq(
        (IsNaN(x), Literal(0.0): Expression),
        (EqualTo(x, Literal(Double.PositiveInfinity)),
          Literal(Double.MaxValue): Expression),
        (EqualTo(x, Literal(Double.NegativeInfinity)),
          Literal(-Double.MaxValue): Expression)),
        x)
      Round(norm, scale)
    case _ => org.apache.spark.sql.catalyst.expressions.Round(child, scale)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), scale = newChildren(1))
}

object HumanReadableFormat {
  sealed trait UnitSystem
  case object BinaryByte extends UnitSystem
  case object DecimalByte extends UnitSystem
  case object Decimal extends UnitSystem

  private val BinaryUnits = Array("", "Ki", "Mi", "Gi", "Ti", "Pi", "Ei")
  private val DecimalUnits = Array("K", "M", "G", "T", "P", "E")

  /** `HumanReadableBytes.format` (utils/HumanReadableBytes.java:247):
    * binary units step at powers of 1024 with a "B" suffix, decimal at
    * powers of 1000; the plain decimal system drops the suffix. Values
    * inside the first unit print as bare integers.
    */
  def format(bytes: Long, precision: Int, system: UnitSystem): String = {
    require(precision >= 0 && precision <= 3,
      s"precision [$precision] must be in the range of [0,3]")
    system match {
      case BinaryByte =>
        if (bytes > -1024 && bytes < 1024) s"$bytes B"
        else if (bytes == Long.MinValue)
          String.format(s"%.${precision}f %s%s",
            Double.box(-8.0), BinaryUnits.last, "B")
        else {
          val idx = (63 - java.lang.Long.numberOfLeadingZeros(
            math.abs(bytes))) / 10
          String.format(s"%.${precision}f %s%s",
            Double.box(bytes.toDouble / (1L << (idx * 10))),
            BinaryUnits(idx), "B")
        }
      case DecimalByte => decimalFormat(bytes, precision, "B")
      case Decimal     => decimalFormat(bytes, precision, "").trim
    }
  }

  private def decimalFormat(bytes0: Long, precision: Int,
      suffix: String): String = {
    if (bytes0 > -1000 && bytes0 < 1000) s"$bytes0 $suffix"
    else {
      var bytes = bytes0
      var idx = 0
      while (bytes <= -1000000L || bytes >= 1000000L) {
        bytes /= 1000; idx += 1
      }
      String.format(s"%.${precision}f %s%s",
        Double.box(bytes / 1000.0), DecimalUnits(idx), suffix)
    }
  }
}

/** `human_readable_{binary_byte,decimal_byte,decimal}_format(value[,
  * precision])` (Function.java SizeFormatFunc:4690) — string rendering, off
  * any hot aggregate path, so CodegenFallback is fine.
  */
case class HumanReadableFormatExpr(child: Expression, precision: Expression,
    system: HumanReadableFormat.UnitSystem)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, precision)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val p = precision.eval(input)
      val prec = if (p == null) 2 else p.asInstanceOf[Number].intValue()
      UTF8String.fromString(HumanReadableFormat.format(
        v.asInstanceOf[Number].longValue(), prec, system))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), precision = newChildren(1))
}

/** Druid's expression layer has no TIMESTAMP type — datetimes ride as LONG
  * epoch millis, so aggregates that STRINGIFY their input render millis,
  * not formatted text: `string_agg(__time, '|')` = '1577840461000|…'
  * (qaAggFuncs string_agg_timestamp_test001-004). Resolves to a
  * millis LONG for timestamp input and passes anything else through
  * untouched; builders wrap stringifying call sites with it because they
  * can't see the resolved input type.
  */
case class TimeAsMillis(child: Expression) extends RuntimeReplaceable {
  override def children: Seq[Expression] = Seq(child)
  override lazy val replacement: Expression = child.dataType match {
    case org.apache.spark.sql.types.TimestampType =>
      org.apache.spark.sql.catalyst.expressions.UnixMillis(child)
    case _ => child
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TimeAsMillis = copy(child = c.head)
}
