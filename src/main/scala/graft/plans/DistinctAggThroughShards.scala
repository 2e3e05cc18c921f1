package graft.plans

import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.expressions.{Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.ShardedWarehouseTable

/** DISTINCT-aggregate pushdown for SHARDED warehouse scans (review r16
  * #4). The DSv2 aggregate-push API cannot carry a partial DISTINCT:
  * Spark's `supportPartialAggPushDown` refuses any distinct function
  * when `supportCompletePushDown` is false, because min/max/sum/count
  * partials merge across shards but distinct sets do not — so
  * `count(DISTINCT x)` over a sharded warehouse table shipped RAW rows
  * from every shard, the one shape the pushdown source exists to
  * avoid.
  *
  * The SOUND partial form is a dedup, not an aggregate: rewrite
  *
  * {{{ Aggregate(g, count(DISTINCT x), shardedRel) }}}
  * into
  * {{{ Aggregate(g, count(x), Aggregate(g :+ x, g :+ x, shardedRel)) }}}
  *
  * — exact by definition (a distinct count IS a plain count over the
  * deduped (g, x) pairs; nulls agree: the dedup keeps one (g, NULL)
  * row and `count(x)` skips it, exactly as `count(DISTINCT x)` does).
  * The inner grouping-only Aggregate is something the standard
  * `V2ScanRelationPushDown` CAN push partially: each shard executes
  * `SELECT g, x FROM shard WHERE … GROUP BY g, x` — dedup WITHIN the
  * shard — and Spark's merge Aggregate dedups ACROSS shards, above
  * group×value-cardinality rows instead of raw rows. At 100× this is
  * the difference between shipping every event row and shipping each
  * shard's distinct pairs once.
  *
  * Deliberately narrow (fires only when it is exactly right):
  *  - the child chain is Filter/Project over ONE [[DataSourceV2Relation]]
  *    whose table is a [[ShardedWarehouseTable]] with shardCount > 1
  *    (a single-table warehouse pushes `COUNT(DISTINCT …)` COMPLETE —
  *    one SQL answer — which strictly beats this rewrite);
  *  - grouping keys are plain attributes;
  *  - every aggregate call is a DISTINCT `Count`/`Sum` over the SAME
  *    single attribute, with no FILTER clause (a pre-aggregate filter
  *    would apply before the dedup — different semantics).
  * Anything else is left for Spark's stock planning. Idempotent: the
  * rewritten aggregates carry no distinct flag, so the fixed-point
  * operator-optimization batch (which runs before the early-pushdown
  * batch that builds the scan) cannot match them again.
  */
object DistinctAggThroughShards extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupExprs, resultExprs, child, _)
        if overShardedWarehouse(child) &&
          groupExprs.forall(_.isInstanceOf[Attribute]) =>
      distinctColumnOf(resultExprs) match {
        case Some(x) =>
          val groupAttrs = groupExprs.map(_.asInstanceOf[Attribute])
          val innerGroup: Seq[NamedExpression] =
            if (groupAttrs.exists(_.semanticEquals(x))) groupAttrs
            else groupAttrs :+ x
          val dedup = Aggregate(innerGroup, innerGroup, child, None)
          val plain = resultExprs.map(_.transform {
            case ae: AggregateExpression if ae.isDistinct =>
              ae.copy(isDistinct = false)
          }.asInstanceOf[NamedExpression])
          Aggregate(groupExprs, plain, dedup, None)
        case None => agg
      }
  }

  /** The single attribute every aggregate call DISTINCT-aggregates, if
    * the aggregate list is exactly the shape the rewrite covers. */
  private def distinctColumnOf(
      resultExprs: Seq[NamedExpression]): Option[Attribute] = {
    val calls = resultExprs.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    val cols = calls.map { ae =>
      if (!ae.isDistinct || ae.filter.isDefined) None
      else ae.aggregateFunction match {
        case Count(Seq(a: Attribute)) => Some(a)
        case Sum(a: Attribute, _) => Some(a)
        case _ => None
      }
    }
    if (calls.nonEmpty && cols.forall(_.isDefined) &&
        cols.flatten.distinct.size == 1) cols.head
    else None
  }

  @tailrec
  private def overShardedWarehouse(p: LogicalPlan): Boolean = p match {
    case f: Filter => overShardedWarehouse(f.child)
    case pr: Project => overShardedWarehouse(pr.child)
    case r: DataSourceV2Relation => r.table match {
      case t: ShardedWarehouseTable => t.shardCount > 1
      case _ => false
    }
    case _ => false
  }
}
