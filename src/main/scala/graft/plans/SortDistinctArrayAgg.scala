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
      case ae: AggregateExpression if ae.isDistinct =>
        ae.aggregateFunction match {
          case d: DruidArrayAgg if !d.sorted =>
            ae.copy(aggregateFunction = d.copy(sorted = true))
          case _ => ae
        }
    }
}
