package graft.plans

import org.apache.spark.sql.catalyst.expressions.{CurrentRow, Expression, Literal, SpecifiedWindowFrame, UnaryMinus, UnboundedFollowing, UnboundedPreceding}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreePattern

/** Rejects window frames whose bounds are inverted (lower > upper) — the
  * qaWin `orderby_{rows,range}_negative_*` corpus (56 `.iq` files, all
  * `!error`): the reference/Calcite validator throws on
  * `ROWS BETWEEN -1 PRECEDING AND CURRENT ROW` and every analogue, while
  * Spark silently evaluates the empty frame to NULL. `-1 PRECEDING` parses
  * to the bound +1, so an inverted (lower, upper) pair is exactly the
  * negative-amount family plus the equally-invalid `2 FOLLOWING AND
  * 1 FOLLOWING` shapes Calcite also rejects. Interval-typed RANGE bounds
  * (non-numeric) are skipped.
  */
object RejectInvertedFrames extends Rule[LogicalPlan] {

  private def boundVal(e: Expression): Option[Long] = e match {
    case UnboundedPreceding          => Some(Long.MinValue)
    case UnboundedFollowing          => Some(Long.MaxValue)
    case CurrentRow                  => Some(0L)
    case Literal(v: Byte, _)         => Some(v.toLong)
    case Literal(v: Short, _)        => Some(v.toLong)
    case Literal(v: Int, _)          => Some(v.toLong)
    case Literal(v: Long, _)         => Some(v)
    case UnaryMinus(inner, _)        => boundVal(inner).map(v => -v)
    case _                           => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // O(1) guard: SpecifiedWindowFrame only lives under window expressions,
    // so plans without a Window node skip the full-tree expression walk —
    // this rule sits in a fixed-point optimizer batch and must not tax the
    // enormous iterative plans the PQ/Lloyd pipelines compile.
    if (!plan.containsAnyPattern(TreePattern.WINDOW,
                                 TreePattern.WINDOW_EXPRESSION)) return plan
    plan.foreach { node =>
      if (node.containsAnyPattern(TreePattern.WINDOW,
                                  TreePattern.WINDOW_EXPRESSION)) {
        node.expressions.foreach(_.foreach {
          case SpecifiedWindowFrame(_, lower, upper) =>
            for (l <- boundVal(lower); u <- boundVal(upper))
              if (l > u) throw new IllegalArgumentException(
                s"Window frame upper bound ($upper) must not be less than " +
                  s"lower bound ($lower)")
          case _ =>
        })
      }
    }
    plan
  }
}
