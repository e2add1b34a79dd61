package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/**
 * Metadata-only `count(*)`: a global count over an unfiltered graft
 * relation is answered from the manifest's per-file row counts — zero
 * tasks, zero bytes read — instead of scanning every file (the same
 * optimization Delta ships for its stats-bearing tables). At 100 TB the
 * difference is a full-corpus scan vs an O(files) driver-side sum that
 * was already paid for at commit time.
 *
 * Safety gates: the relation must be a [[GraftTable]] with NO pending MoR
 * deltas and per-file counts known for every live file
 * ([[GraftTable.statsRowCount]]); the aggregate must be global (no
 * grouping) with every output column a bare `count(*)`/`count(1)`
 * (non-distinct, unfiltered, non-nullable argument). Anything else keeps
 * its scan. Runs in the operator-optimization batch, BEFORE
 * V2ScanRelationPushDown turns the relation into a scan.
 */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupless, exprs, child, _)
        if groupless.isEmpty && exprs.forall(isCountStar) =>
      graftRelation(child).flatMap(_.statsRowCount) match {
        case Some(n) =>
          LocalRelation(agg.output, Seq(InternalRow.fromSeq(exprs.map(_ => n))))
        case None => agg
      }
  }

  /** The bare graft relation beneath the aggregate — an intervening
   *  Project is fine (count(*) evaluates nothing row-wise), an
   *  intervening Filter is not. */
  private def graftRelation(plan: LogicalPlan): Option[GraftTable] = plan match {
    case r: DataSourceV2Relation =>
      r.table match {
        case g: GraftTable => Some(g)
        case _ => None
      }
    case Project(_, child) => graftRelation(child)
    case _ => None
  }

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) => isRowCount(ae)
    case ae: AggregateExpression => isRowCount(ae)
    case _ => false
  }

  private def isRowCount(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(children) => children.forall {
        case l: Literal => l.value != null
        case _ => false
      }
      case _ => false
    })
}
