package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Materialized-view rewrite (injected Catalyst optimizer rule): an
  * aggregate over a REGISTERED base table is transparently re-planned
  * onto its stored summary table when every piece is derivable — the
  * lakehouse pattern where a 100 TB fact table's daily rollups are
  * answered from a keys-sized summary instead of a corpus scan.
  *
  * Scope (deliberately narrow, every guard sound-by-construction):
  *  - the aggregate's child must be the registered base relation itself
  *    (optionally under a pure-attribute Project — column pruning);
  *    ANY other intervening operator (Filter, Join, ...) aborts the
  *    rewrite, because the summary cannot answer it.
  *  - grouping columns must be a subset of the summary's keys (equal or
  *    COARSER — re-aggregation over the stored partials handles rollup).
  *  - aggregates must be derivable from stored partials with EXACT
  *    semantics: count(*)/count(1) from summing the stored count;
  *    min/max from re-min/max of the stored per-key min/max; sum only
  *    when re-summing the stored partial yields the SAME data type as
  *    the original (LongType/integral sums — double re-sums change
  *    float addition order and decimal re-sums widen precision, both
  *    abort).
  *  - anything else (avg, distinct aggs, expressions over aggregates
  *    the matcher doesn't recognize) aborts — the query silently runs
  *    against the base table, never wrong, just unrewritten.
  *
  * Freshness is the REGISTRAR's contract, as in every MV system: specs
  * are registered against a content-addressed summary (the fixture
  * builders key the summary dir on [[graft.ops.ContentTag]], so a base
  * rewrite mints a new summary path). Output attribute exprIds are
  * preserved via aliases, so parent plans are untouched; the summary
  * relation is `newInstance()`d per rewrite so two rewrites in one
  * query cannot collide on exprIds. The rule is idempotent (the
  * rewritten aggregate's child is the summary relation, which is never
  * registered as a base).
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  /** keys: summary grouping columns; countCol: stored count(*) partial;
    * minCols/maxCols/sumCols: base column name → stored partial column.
    */
  case class SummarySpec(
      summaryPath: String, keys: Seq[String], countCol: String,
      minCols: Map[String, String] = Map.empty,
      maxCols: Map[String, String] = Map.empty,
      sumCols: Map[String, String] = Map.empty) {
    // resolved once at registration: the summary's analyzed relation
    // (file listing paid once, not per optimizer pass)
    private[SummaryRewrite] lazy val relation: LogicalPlan =
      SparkSession.active.read.parquet(summaryPath).queryExecution.analyzed
  }

  // base-relation identity = the relation's qualified root paths
  private val specs = new ConcurrentHashMap[String, SummarySpec]()

  private def rootKey(rel: LogicalRelation): Option[String] =
    rel.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        Some(fs.location.rootPaths.map(_.toString).sorted.mkString(","))
      case _ => None
    }

  /** Register `summary` as the stored rollup of the base table at
    * `srcPath`. Reads the base relation once to pin its qualified
    * identity. Re-registration replaces (the content-tagged fixture
    * pattern: a new corpus tag re-registers its new summary).
    */
  def register(srcPath: String, spec: SummarySpec): Unit = {
    val rel = SparkSession.active.read.parquet(srcPath)
      .queryExecution.analyzed.collectFirst { case r: LogicalRelation => r }
      .getOrElse(throw new IllegalArgumentException(
        s"SummaryRewrite.register: $srcPath is not a file relation"))
    specs.put(rootKey(rel).get, spec)
    spec.relation // force resolution now, not inside an optimizer pass
  }

  /** Drop every registration (test isolation). */
  def clear(): Unit = specs.clear()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (specs.isEmpty) return plan
    plan.transform {
      case agg @ Aggregate(_, _, child, _) =>
        baseOf(child).flatMap { rel =>
          Option(specs.get(rootKey(rel).orNull))
            .flatMap(spec => rewrite(agg, spec))
        }.getOrElse(agg)
    }
  }

  /** The registered base relation, seen through at most a pure-attribute
    * Project (column pruning); anything else means the summary cannot
    * serve the query.
    */
  private def baseOf(child: LogicalPlan): Option[LogicalRelation] =
    child match {
      case r: LogicalRelation => Some(r)
      case Project(projList, r: LogicalRelation)
          if projList.forall(_.isInstanceOf[AttributeReference]) => Some(r)
      case _ => None
    }

  private def rewrite(agg: Aggregate, spec: SummarySpec): Option[Aggregate] = {
    val keySet = spec.keys.map(_.toLowerCase).toSet
    // grouping must be plain base columns, a subset of the summary keys
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference if keySet(a.name.toLowerCase) => a.name
      case _ => return None
    }
    val fresh = spec.relation match {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
      case p => p
    }
    val byName: Map[String, Attribute] =
      fresh.output.map(a => a.name.toLowerCase -> a).toMap
    def summaryAttr(name: String): Option[Attribute] =
      byName.get(name.toLowerCase)

    def agged(fn: Expression): Expression =
      AggregateExpression(
        fn.asInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction],
        Complete, isDistinct = false)

    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      // grouping key passthrough: keep the ORIGINAL exprId so parent
      // plans' references stay valid
      case a: AttributeReference if groupNames.contains(a.name) =>
        summaryAttr(a.name) match {
          case Some(sa) => Alias(sa, a.name)(exprId = a.exprId)
          case None => return None
        }
      case al @ Alias(AggregateExpression(fn, Complete, false, None, _), name) =>
        val derived: Option[Expression] = fn match {
          case Count(Seq(Literal(_, _))) =>
            // count(*) == sum of stored counts; coalesce keeps count's
            // never-null contract (sum is nullable by type)
            summaryAttr(spec.countCol).map(c =>
              Coalesce(Seq(agged(Sum(c)), Literal(0L))))
          case Min(a: AttributeReference) =>
            spec.minCols.get(a.name).flatMap(summaryAttr)
              .map(c => agged(Min(c)))
          case Max(a: AttributeReference) =>
            spec.maxCols.get(a.name).flatMap(summaryAttr)
              .map(c => agged(Max(c)))
          case s @ Sum(a: AttributeReference, _) =>
            // exact only when re-summing the partial keeps the type
            // (integral sums); double re-sums change fp addition order,
            // decimal re-sums widen precision — both abort
            spec.sumCols.get(a.name).flatMap(summaryAttr)
              .map(c => agged(Sum(c)))
              .filter(_.dataType == s.dataType)
          case _ => None
        }
        derived match {
          case Some(e) if e.dataType == al.child.dataType =>
            Alias(e, name)(exprId = al.exprId)
          case _ => return None
        }
      case _ => return None
    }
    val newGrouping = groupNames.map(n => summaryAttr(n).get)
    Some(Aggregate(newGrouping, newAggExprs, fresh))
  }
}
