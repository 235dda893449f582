package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Deterministic tie order for peer-insensitive window functions.
  *
  * The reference's windowOperator sorts each partition STABLY over its
  * input, and that input is itself deterministic (a groupBy feeding a
  * window arrives sorted by every grouping dimension), so ROWS-frame
  * aggregates over tied ORDER BY keys are reproducible — qaWin
  * orderby_rows_* W20: two rows tied on every window key take frame
  * positions in grouping-dimension order. Spark's window sort is only by
  * (partition, order) keys; tie order is whatever the shuffle delivered.
  *
  * For Window operators whose every function is insensitive to PEERS —
  * ROWS frames (positional), row_number / lead / lag (offset) — appending
  * the remaining output columns to the ORDER spec cannot change any
  * frame's semantics, only pin which of two tied rows is "first". Peers
  * matter for RANGE/GROUPS frames and the rank family, so those nodes are
  * left untouched (their results don't depend on tie order anyway, except
  * through frame contents which ARE peer-based).
  *
  * The extension rides the window's own ORDER spec, so it survives the
  * exchange that EnsureRequirements plans between the window and its
  * child — a pre-shuffle Sort would be destroyed by the repartition.
  */
object DeterministicWindowOrder extends Rule[LogicalPlan] {

  private def peerInsensitive(e: Expression): Boolean = e match {
    case WindowExpression(fn, spec) =>
      val frameOk = spec.frameSpecification match {
        case SpecifiedWindowFrame(RowFrame, _, _) => true
        case UnspecifiedFrame => false // resolved away pre-optimizer anyway
        case _ => false
      }
      fn match {
        case _: RowNumber | _: Lead | _: Lag => true
        case _: NTile | _: Rank | _: DenseRank | _: PercentRank |
             _: CumeDist => false
        case _ => frameOk
      }
    case _ => true // non-window parts of the projection
  }

  override def apply(plan: LogicalPlan): LogicalPlan = if (
    !conf.getConfString("spark.graft.deterministicWindows", "true").toBoolean
  ) plan else plan.transform {
    // order MAY be empty (OVER (ROWS UNBOUNDED PRECEDING) — qaWin W22):
    // the reference runs the frame over its deterministic input order, so
    // the full-output tie-break IS the order
    case w @ Window(exprs, part, order, child, hint)
        if exprs.forall(e => e.collect { case we: WindowExpression => we }
          .forall(peerInsensitive)) &&
          !child.output.exists(_.name == RowOrderCol) =>
      if (child.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.Aggregate])) {
        // groupBy-fed window: the reference's input arrives sorted by
        // the grouping dimensions — the output columns approximate that
        val covered = ExpressionSet(part ++ order.map(_.child))
        val extra = child.output
          .filter(a => RowOrdering.isOrderable(a.dataType))
          .filterNot(covered.contains)
          .map(a => SortOrder(a, Ascending))
        val already = order.size >= extra.size && extra.nonEmpty &&
          order.takeRight(extra.size).map(_.child) == extra.map(_.child)
        if (extra.isEmpty || already) w
        else Window(exprs, part, order ++ extra, child, hint)
      } else {
        // scan-fed window: the reference breaks ORDER ties by SEGMENT ROW
        // ORDER (wikipediaScanWindow.sqlTest: LAG over ORDER BY __time
        // with tied timestamps takes the ingest-order neighbor), not by
        // sorting the remaining columns — ride the input order. The id is
        // (partition << 33 | offset), so it reproduces the scan order
        // within each partition and ranks partitions in read order.
        val mid = Alias(MonotonicallyIncreasingID(), RowOrderCol)()
        val proj = org.apache.spark.sql.catalyst.plans.logical.Project(
          child.output :+ mid, child)
        org.apache.spark.sql.catalyst.plans.logical.Project(w.output,
          Window(exprs, part,
            order :+ SortOrder(mid.toAttribute, Ascending), proj, hint))
      }
  }

  private val RowOrderCol = "__graft_roworder"
}
