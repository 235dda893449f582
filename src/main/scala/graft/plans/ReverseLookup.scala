package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ElementAt, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.MapType

/** The reference's ReverseLookupRule (`sql/.../rule/ReverseLookupRule.java`):
  * a filter on the OUTPUT of a lookup, `LOOKUP(x) = 'v'`, is rewritten to a
  * filter on the INPUT, `x IN (preimage of 'v')`. Semantically identical for
  * any map (unmapped keys yield null, never equal to a non-null literal) —
  * and decisive at scale: the IN filter on a raw column pushes down to the
  * parquet scan, while an equality on a map-extraction expression cannot.
  */
object ReverseLookupRule extends Rule[LogicalPlan] {

  private def preimage(m: MapData, mt: MapType, v: Any): Seq[Literal] = {
    val keys = m.keyArray()
    val values = m.valueArray()
    (0 until m.numElements()).collect {
      case i if !values.isNullAt(i) && values.get(i, mt.valueType) == v =>
        Literal(keys.get(i, mt.keyType), mt.keyType)
    }
  }

  /** Value types whose Catalyst runtime representation compares correctly
    * with `==` (binary values are Array[Byte] — reference equality — and
    * must not be inverted).
    */
  private def comparable(mt: MapType): Boolean =
    !mt.valueType.isInstanceOf[org.apache.spark.sql.types.BinaryType]

  private def invert(cond: Expression): Expression = cond.transformUp {
    case eq @ EqualTo(ElementAt(Literal(m: MapData, mt: MapType), key, _, _),
        Literal(v, _)) if v != null && comparable(mt) =>
      preimage(m, mt, v) match {
        case Seq()    => Literal.FalseLiteral
        case Seq(one) => EqualTo(key, one)
        case many     => In(key, many)
      }
    case eq @ EqualTo(Literal(v, _),
        ElementAt(Literal(m: MapData, mt: MapType), key, _, _))
        if v != null && comparable(mt) =>
      preimage(m, mt, v) match {
        case Seq()    => Literal.FalseLiteral
        case Seq(one) => EqualTo(key, one)
        case many     => In(key, many)
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // reference context key sqlReverseLookup (default TRUE) disables the
    // rewrite per query; SqlApi folds the context into this conf
    if (conf.getConfString("spark.graft.sqlReverseLookup", "true") != "true") plan
    else plan.transform {
      // Cheap containment precheck before the allocating transformUp: only
      // a map-literal extraction in the condition can match the rewrite.
      case f @ Filter(cond, _) if cond.exists {
            case ElementAt(Literal(_: MapData, _: MapType), _, _, _) => true
            case _ => false
          } =>
        val inverted = invert(cond)
        if (inverted fastEquals cond) f else f.copy(condition = inverted)
    }
  }
}
