package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.DruidArrayAgg

/** ARRAY_AGG(DISTINCT x) returns its elements SORTED ascending with nulls
  * first in the reference (ExpressionLambdaAggregatorFactory's distinct
  * accumulation; qaUnnest array_sql_agg_funcs A1_B28 expects [null, 1, 2])
  * while the plain form keeps encounter order. The DISTINCT flag lives on
  * the AggregateExpression wrapper the analyzer adds AFTER the function
  * builder runs, so the sorted variant is flipped on here.
  */
object SortDistinctArrayAgg extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // (the MVD-flatten decision is NOT made here: flattening changes the
      // aggregate's result type, so it must precede parent resolution —
      // SqlApi.mvdGroupByExplode renames the call to the array_agg_mv
      // builder, whose constructor flag survives the distinct rewrite)
      case ae: AggregateExpression if ae.isDistinct =>
        ae.aggregateFunction match {
          case d: DruidArrayAgg if !d.sorted =>
            ae.copy(aggregateFunction = d.copy(sorted = true))
          // STRING_AGG(DISTINCT …) is sorted too (array_sql_agg_funcs
          // A1_B32: '1|2' regardless of encounter order)
          case l: org.apache.spark.sql.catalyst.expressions.aggregate.ListAgg
              if l.orderExpressions.isEmpty =>
            ae.copy(aggregateFunction = l.withOrderingWithinGroup(Seq(
              org.apache.spark.sql.catalyst.expressions.SortOrder(
                l.child,
                org.apache.spark.sql.catalyst.expressions.Ascending)))
              .asInstanceOf[org.apache.spark.sql.catalyst.expressions
                .aggregate.AggregateFunction])
          // a DISTINCT spelling that reached the plain fold (the textual
          // STRING_AGG(DISTINCT…) rewrite can be bypassed by plan-level
          // construction) reroutes to the sorted TreeSet fold
          case s: graft.functions.GraftStringAgg =>
            ae.copy(aggregateFunction = graft.functions.GraftStringAggSorted(
              s.child, s.delimiter, s.maxBytes,
              s.mutableAggBufferOffset, s.inputAggBufferOffset),
              isDistinct = false)
          case _ => ae
        }
    }
}
