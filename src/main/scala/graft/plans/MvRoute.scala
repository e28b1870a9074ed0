package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, Cast, Expression, Literal,
  NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** MATERIALIZED-VIEW ROUTING — the optimizer half of incremental view
  * maintenance ([[graft.sink.IncrementalView]] is the storage half):
  * a registered view declares "this table holds `groupBy(g).agg(...)`
  * over that base", and the Catalyst rule rewrites any matching
  * aggregate query to a scan of the VIEW instead of the base — the
  * classic materialized-view query-rewrite (Oracle/Calcite
  * "aggregate rollup matching", scoped to exact grouping matches).
  * At 100 TB the economics are the whole point: the user writes the
  * natural full-table aggregate, and the plan that executes reads a
  * keys-sized table maintained incrementally from the change feed —
  * file I/O bounded by the view, not the corpus, with zero query
  * rewrites in user code.
  *
  * Matching is deliberately conservative (wrong routing is silent
  * corruption, a missed routing is just the unrouted plan):
  *
  *   - the aggregate's child must be THE registered base —
  *     `sameResult` after stripping pure-column Projects (column
  *     pruning's work), so any independent re-read of the same
  *     committed file set matches, but any filter, join, or
  *     different epoch does not;
  *   - the grouping must be exactly the view's grouping columns;
  *   - every output must be a grouping column or an aggregate the
  *     view declares: `count(*)` (any non-null literal child),
  *     `sum/min/max` over a declared column (casts stripped — the
  *     view's stored arithmetic is authoritative, which is the
  *     registration contract); DISTINCT and FILTER forms never match.
  *
  * The rewrite keeps every output's name AND exprId (aliases onto the
  * view's columns, cast when the stored type is wider — e.g. the
  * view's DECIMAL(38,4) running sum vs the query's DECIMAL(28,4)
  * sum), so downstream operators resolve unchanged. FRESHNESS is the
  * registrant's contract, exactly as in every MV system with
  * transparent rewrite: register a view only while something (the
  * IVM refresh cursor, the continuous stream) keeps it current.
  */
object MatViews {

  /** An aggregate the view stores: (fn, input column) — `count` has
    * no input (count(*)); `sum`/`min`/`max` name a base column. */
  final case class AggKey(fn: String, inCol: Option[String])

  final case class MvDef(name: String, base: LogicalPlan,
                         groupCols: Seq[String],
                         aggCols: Map[AggKey, String],
                         view: () => LogicalPlan)

  private val defs = new java.util.concurrent.CopyOnWriteArrayList[MvDef]()

  /** Register `view` as the materialization of
    * `base.groupBy(groupCols).agg(...)`. `aggCols` maps each stored
    * aggregate to its VIEW column; the view's grouping columns must
    * carry the SAME names as the base's. `view` is re-planned lazily
    * per rewrite, so it always reads the view table's CURRENT epoch. */
  def register(name: String, base: DataFrame, groupCols: Seq[String],
               aggCols: Map[AggKey, String], view: () => DataFrame): Unit = {
    deregister(name)
    defs.add(MvDef(name, base.queryExecution.analyzed, groupCols, aggCols,
      () => view().queryExecution.analyzed))
  }

  def deregister(name: String): Unit =
    defs.removeIf(_.name == name): Unit

  def clear(): Unit = defs.clear()

  def all: Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    defs.asScala.toSeq
  }
}

object MvRoute extends Rule[LogicalPlan] {

  /** Column pruning interposes attribute-only Projects between the
    * Aggregate and the relation; they don't change the result set the
    * aggregate consumes, so strip them before the sameResult test. */
  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(c)
    case other => other
  }

  private def stripCasts(e: Expression): Expression = e match {
    case c: Cast => stripCasts(c.child)
    case other => other
  }

  private def colName(e: Expression): Option[String] = stripCasts(e) match {
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  private def aggKeyOf(ae: AggregateExpression): Option[MatViews.AggKey] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case Count(Seq(Literal(v, _))) if v != null => Some(MatViews.AggKey("count", None))
      case Count(Seq()) => Some(MatViews.AggKey("count", None))
      case s: Sum => colName(s.child).map(n => MatViews.AggKey("sum", Some(n)))
      case m: Min => colName(m.child).map(n => MatViews.AggKey("min", Some(n)))
      case m: Max => colName(m.child).map(n => MatViews.AggKey("max", Some(n)))
      case _ => None
    }

  private def route(agg: Aggregate, mv: MatViews.MvDef): Option[LogicalPlan] = {
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case _ => return None
    }
    if (groupNames.toSet != mv.groupCols.toSet) return None
    val groupSet = groupNames.toSet
    // every output must map BEFORE we commit to the rewrite
    val mapped: Seq[(NamedExpression, String)] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupSet(a.name) => (a, a.name)
      case al @ Alias(a: AttributeReference, _) if groupSet(a.name) => (al, a.name)
      case al @ Alias(ae: AggregateExpression, _) =>
        aggKeyOf(ae).flatMap(mv.aggCols.get) match {
          case Some(viewCol) => (al, viewCol)
          case None => return None
        }
      case _ => return None
    }
    val viewPlan = mv.view()
    val viewOut = viewPlan.output.map(a => a.name -> a).toMap
    if (!mapped.forall { case (_, v) => viewOut.contains(v) }) return None
    val projections = mapped.map { case (orig, viewCol) =>
      val src: Expression = {
        val a = viewOut(viewCol)
        if (a.dataType == orig.dataType) a else Cast(a, orig.dataType)
      }
      Alias(src, orig.name)(exprId = orig.exprId)
    }
    Some(Project(projections, viewPlan))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mvs = MatViews.all
    if (mvs.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate =>
        val child = stripProjects(agg.child)
        mvs.iterator
          .filter(mv => child.sameResult(mv.base))
          .flatMap(mv => route(agg, mv))
          .nextOption()
          .getOrElse(agg)
    }
  }
}
