package graft.plans

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, DeclarativeAggregate, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact decimal SUM with LONG partials — the hybrid documented in
  * SCALING.md's round-13 experiment (measured 1.37× over the builtin
  * decimal sum on the TPC-H Q01 shape) and deferred there as "the
  * documented optimization when a real workload is decimal-sum-bound".
  *
  * The builtin Sum over DECIMAL keeps a DECIMAL(p+10) buffer: every row
  * pays a Decimal object add (BigDecimal arithmetic once past the compact
  * range). This aggregate instead accumulates the UNSCALED long value of
  * each input (exact: p ≤ 18 guarantees a row's unscaled value fits a
  * long) and folds the long partial into a DECIMAL(38) carry only when
  * the partial approaches overflow (|partial| > 2⁶¹; one flush per ~2⁶¹ /
  * avg-unscaled rows, i.e. amortized never) and at merge/evaluate time.
  * Exactness and ORDER-INDEPENDENCE are structural: long addition is
  * associative/commutative and every flush is an exact widening — the
  * round-11 determinism hardening (bit-identical at any partition count)
  * is preserved, unlike double partials.
  *
  * Semantics vs builtin Sum:
  *  - result type, null-on-empty, null-skipping: identical;
  *  - overflow: the final value is checked against the builtin's result
  *    type DECIMAL(min(38, p+10), s) — null (legacy) / throw (ANSI)
  *    exactly like the builtin's CheckOverflowInSum. The one divergence
  *    is favorable: the builtin can null out when an INTERMEDIATE buffer
  *    value overflows (p+10) even though the true sum fits; the hybrid's
  *    38-digit carry only overflows when the true sum does.
  */
case class DecimalSumHybrid(child: Expression, failOnError: Boolean)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  private lazy val (p, s) = child.dataType match {
    case dt: DecimalType => (dt.precision, dt.scale)
    case other => throw new IllegalStateException(
      s"DecimalSumHybrid needs a DECIMAL child, got $other")
  }

  // DecimalType.bounded is private[sql]; 38 = MAX_PRECISION
  private def bounded(precision: Int, scale: Int): DecimalType =
    DecimalType(math.min(precision, 38), scale)

  override lazy val dataType: DataType = bounded(p + 10, s)
  override def nullable: Boolean = true
  override def prettyName: String = "decimal_sum_hybrid"

  private lazy val carryType = DecimalType(38, s)

  private lazy val partial =
    AttributeReference("partial", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()
  private lazy val carry =
    AttributeReference("carry", carryType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(partial, seen, carry)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(0L), Literal(false), Literal.create(Decimal(0, 38, s), carryType))

  // |partial| stays ≤ FlushAt + max unscaled (< 2⁶¹ + 2⁶⁰ < 2⁶³): a single
  // row's unscaled value is < 10¹⁸ < 2⁶⁰ because p ≤ 18, so the LEGACY
  // (unchecked) long add below can never wrap
  private val FlushAt = 1L << 61

  private def longAdd(a: Expression, b: Expression) =
    Add(a, b, EvalMode.LEGACY)
  private def decAdd(a: Expression, b: Expression) =
    Add(a, b, EvalMode.LEGACY)
  private def asCarry(longPartial: Expression) =
    MakeDecimal(longPartial, 38, s)

  override lazy val updateExpressions: Seq[Expression] = {
    val u = UnscaledValue(child)
    val mustFlush = GreaterThan(Abs(partial, failOnError = false), Literal(FlushAt))
    Seq(
      If(IsNull(child), partial,
        If(mustFlush, u, longAdd(partial, u))),
      Or(seen, IsNotNull(child)),
      If(IsNull(child), carry,
        If(mustFlush, decAdd(carry, asCarry(partial)), carry)))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    partial.left,
    Or(seen.left, seen.right),
    decAdd(decAdd(carry.left, carry.right), asCarry(partial.right)))

  override lazy val evaluateExpression: Expression =
    If(Not(seen), Literal.create(null, dataType),
      CheckOverflow(decAdd(carry, asCarry(partial)),
        bounded(p + 10, s), nullOnOverflow = !failOnError))

  override protected def withNewChildInternal(newChild: Expression)
      : DecimalSumHybrid = copy(child = newChild)
}

/** Rewrite `sum(x: DECIMAL(p ≤ 18, s))` in GROUP BY aggregates to
  * [[DecimalSumHybrid]]. Scope deliberately excludes: DISTINCT sums (the
  * distinct rewrite owns those), TRY eval mode, window aggregates (frame
  * re-evaluation has different cost shape), and p > 18 inputs (a row's
  * unscaled value must fit a long).
  */
object HybridDecimalSumRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.hybridDecimalSum.enabled", "true").toBoolean

  private def eligible(e: Expression): Boolean = e.dataType match {
    // 18 = Decimal.MAX_LONG_DIGITS (private[sql]): unscaled fits a long
    case dt: DecimalType if dt.precision <= 18 => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUpWithSubqueries {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(
              Sum(e, evalMode), _, false, _, _)
              if eligible(e) && evalMode != EvalMode.TRY =>
            ae.copy(aggregateFunction =
              DecimalSumHybrid(e, evalMode == EvalMode.ANSI))
        }
    }
  }

  /** Idempotently arm the rule on a session not built with extensions. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val alreadyInjected = spark.sessionState.optimizer.batches
      .exists(_.rules.exists(_ eq this))
    if (!alreadyInjected &&
        !spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }
}
