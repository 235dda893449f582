package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ElementAt, Expression, ExprId, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.MapType

/** The reference's AggregatePullUpLookupRule
  * (`sql/.../rule/AggregatePullUpLookupRule.java`): grouping by
  * `LOOKUP(x)` over an INJECTIVE lookup is rewritten to group by the raw
  * `x` and apply the lookup AFTER the aggregation. The win at scale: the
  * map probe runs on post-agg group rows (thousands) instead of every
  * input row (billions), and the shuffle key becomes a plain —
  * dictionary-encoded, stats-friendly — column instead of an expression.
  *
  * By the time extra optimizer rules run, Spark's own
  * PullOutGroupingExpressions has rewritten `groupBy(lookup(x))` into
  * `Aggregate(ge#N, …, Project(lookup(x) AS _groupingexpression#N, child))`
  * — the probe still evaluated per input row in the pre-projection. This
  * rule matches that shape, turns the pre-projection alias into the raw
  * key, and re-applies the lookup in a Project ABOVE the aggregate under
  * the original output exprIds.
  *
  * Semantics preservation needs true injectivity over the column's actual
  * domain: distinct keys must map to distinct values. A map literal shows
  * one-to-one-ness of its OWN entries, but two distinct unmapped keys both
  * land on null — merged in the original grouping, separate after pull-up.
  * The reference resolves this exactly the same way: the rule only fires
  * for lookups the user DECLARED injective (full key coverage is part of
  * that contract). Here the declaration is
  * `spark.graft.assumeInjectiveLookups=true`, and the statically checkable
  * half (values pairwise distinct and non-null) is still verified per map.
  */
object AggregatePullUpLookupRule extends Rule[LogicalPlan] {

  /** Statically checkable injectivity of the map literal itself. */
  private def valuesDistinct(m: MapData, mt: MapType): Boolean = {
    val values = m.valueArray()
    val seen = scala.collection.mutable.HashSet.empty[Any]
    (0 until m.numElements()).forall { i =>
      !values.isNullAt(i) && seen.add(values.get(i, mt.valueType))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.assumeInjectiveLookups", "false")
        .toBoolean) {
      return plan
    }
    // reference context key sqlPullUpLookup (default TRUE) force-disables
    // the lift per query even for injective-registered lookups
    if (conf.getConfString("spark.graft.sqlPullUpLookup", "true") != "true") {
      return plan
    }
    plan.transform {
      case agg: Aggregate if agg.child.isInstanceOf[Project] =>
        val proj = agg.child.asInstanceOf[Project]
        // pre-projection aliases of shape element_at(mapLit, key) that the
        // aggregate groups on
        val groupedIds: Set[ExprId] = agg.groupingExpressions.collect {
          case a: AttributeReference => a.exprId
        }.toSet
        val pulled: Map[ExprId, (Alias, ElementAt)] = proj.projectList.collect {
          case a @ Alias(
              el @ ElementAt(Literal(m: MapData, mt: MapType), key, _, _), _)
              if groupedIds.contains(a.exprId) && key.deterministic &&
                valuesDistinct(m, mt) =>
            a.exprId -> (Alias(el.right, "__lookup_key")(), el)
        }.toMap
        if (pulled.isEmpty) agg
        else {
          // pre-projection now carries the raw key under a fresh id
          val newProjList = proj.projectList.map {
            case a: Alias if pulled.contains(a.exprId) => pulled(a.exprId)._1
            case other => other
          }
          val newGrouping = agg.groupingExpressions.map {
            case a: AttributeReference if pulled.contains(a.exprId) =>
              pulled(a.exprId)._1.toAttribute
            case other => other
          }
          // aggregate emits the raw key; the Project above re-applies the
          // lookup to the group rows under the ORIGINAL exprIds, so nothing
          // upstream re-resolves
          val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
            case al @ Alias(a: AttributeReference, _)
                if pulled.contains(a.exprId) => pulled(a.exprId)._1.toAttribute
            case a: AttributeReference if pulled.contains(a.exprId) =>
              pulled(a.exprId)._1.toAttribute
            case other => other
          }
          val topProject: Seq[NamedExpression] = agg.aggregateExpressions.map {
            case al @ Alias(a: AttributeReference, name)
                if pulled.contains(a.exprId) =>
              val (keyAlias, el) = pulled(a.exprId)
              Alias(el.copy(right = keyAlias.toAttribute), name)(
                exprId = al.exprId, qualifier = al.qualifier)
            case a: AttributeReference if pulled.contains(a.exprId) =>
              val (keyAlias, el) = pulled(a.exprId)
              Alias(el.copy(right = keyAlias.toAttribute), a.name)(
                exprId = a.exprId, qualifier = a.qualifier)
            case other => other.toAttribute
          }
          Project(topProject,
            agg.copy(groupingExpressions = newGrouping,
              aggregateExpressions = newAggExprs,
              child = proj.copy(projectList = newProjList)))
        }
    }
  }
}
