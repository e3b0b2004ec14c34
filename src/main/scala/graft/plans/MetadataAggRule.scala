package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.sources.GraftRelation
import graft.tables.ManagedTable

/** Metadata-only aggregate rewrite (Delta's OptimizeMetadataOnlyDeltaQuery):
  * a whole-table `SELECT count(*) / min(c) / max(c) FROM graft_table`
  * collapses to a [[LocalRelation]] answered from the commit log's
  * per-file footer stats — ZERO scan jobs, O(files) driver arithmetic.
  * At 100 TB this turns the most common freshness/range probes from a
  * million-file scan into a manifest read.
  *
  * Strictly conservative: the rewrite fires only for an ungrouped,
  * unfiltered aggregate whose child is the bare current-version relation
  * (optionally under an attribute-only projection), whose every
  * aggregate is `count(<non-null literal>)`, `min(col)` or `max(col)`
  * without DISTINCT/FILTER, and only when
  * [[ManagedTable.statsAggregateRaw]] can answer EXACTLY — any deletion
  * vector, missing per-file stat, or non-fixed-width column type leaves
  * the plan untouched (the scan stays the arbiter, the rewrite is never
  * a guess). */
class GraftMetadataAggRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupingExprs, aggExprs, child, _)
        if groupingExprs.isEmpty =>
      relationOf(child)
        .flatMap(rel => rewrite(agg, aggExprs, rel))
        .getOrElse(agg)
  }

  /** The bare graft relation under attribute-only projections — any
    * Filter, Sample, or computed projection disqualifies. Time-travel
    * relations are excluded: stats come from the CURRENT manifest. */
  private def relationOf(plan: LogicalPlan): Option[GraftRelation] =
    plan match {
      case l: LogicalRelation => l.relation match {
        case g: GraftRelation if g.versionAsOf.isEmpty => Some(g)
        case _ => None
      }
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        relationOf(child)
      case SubqueryAlias(_, child) => relationOf(child)
      case _ => None
    }

  private sealed trait Shape
  private case object Cnt extends Shape
  private final case class CntOf(name: String) extends Shape
  private final case class MinOf(name: String) extends Shape
  private final case class MaxOf(name: String) extends Shape

  private def shapeOf(e: Expression): Option[Shape] = e match {
    case Alias(c, _) => shapeOf(c)
    case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(l: Literal)) if l.value != null => Some(Cnt)
        // count(col) = non-null count, answered from per-file null counts
        case Count(Seq(a: AttributeReference)) => Some(CntOf(a.name))
        case Min(a: AttributeReference) => Some(MinOf(a.name))
        case Max(a: AttributeReference) => Some(MaxOf(a.name))
        case _ => None
      }
    case _ => None
  }

  private def rewrite(agg: Aggregate, aggExprs: Seq[NamedExpression],
      rel: GraftRelation): Option[LogicalPlan] = {
    val shapes = aggExprs.map(shapeOf)
    if (shapes.isEmpty || shapes.exists(_.isEmpty)) return None
    val wanted = shapes.flatten.collect {
      case CntOf(c) => c
      case MinOf(c) => c
      case MaxOf(c) => c
    }.distinct
    val t = ManagedTable(session, rel.path)
    try t.statsAggregateRaw(wanted).flatMap { case (total, perCol) =>
      val byName = perCol.map(c => c.field.name -> c).toMap
      val values: Seq[Option[Any]] = shapes.flatten.map {
        case Cnt      => Some(Some(total))
        case CntOf(c) => byName(c).nonNulls.map(Some(_))
        case MinOf(c) =>
          if (byName(c).extremaExact) Some(byName(c).extrema.map(_._1))
          else None
        case MaxOf(c) =>
          if (byName(c).extremaExact) Some(byName(c).extrema.map(_._2))
          else None
      }.map {
        // outer None = CANNOT answer (abort rewrite); inner None = SQL NULL
        case Some(Some(v)) => Some(v)
        case Some(None)    => Some(null)
        case None          => None
      }
      if (values.exists(_.isEmpty)) None
      else {
        val catalyst = values.flatten.zip(aggExprs).map { case (v, e) =>
          if (v == null) null
          else CatalystTypeConverters.createToCatalystConverter(e.dataType)(v)
        }
        Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(catalyst))))
      }
    } catch {
      // optimization, never an arbiter: any metadata hiccup keeps the scan
      case scala.util.control.NonFatal(_) => None
    }
  }
}
