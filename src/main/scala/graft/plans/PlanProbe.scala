package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan-shape probes shared by the registry's oracle gates and the
  * spec suites. The load-bearing detail: `AdaptiveSparkPlanExec` has
  * NO children, so a naive `executedPlan.collect` finds NOTHING under
  * AQE and a shuffle-absence gate passes VACUOUSLY — every probe here
  * descends through the adaptive final plan and its materialized
  * query stages, so "zero shuffles" means zero shuffles in the plan
  * that actually ran. */
object PlanProbe {

  /** collect that also descends into executed AQE query stages. */
  def deepCollect[T](p: SparkPlan)(
      f: PartialFunction[SparkPlan, T]): Seq[T] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    (if (f.isDefinedAt(p)) Seq(f(p)) else Nil) ++ kids.flatMap(deepCollect(_)(f))
  }

  /** The shuffle exchanges of the plan that EXECUTED (AQE-unwrapped).
    * Run the query (e.g. `.collect()`) before probing, so the
    * adaptive plan is final. */
  def shuffles(df: DataFrame): Seq[SparkPlan] =
    deepCollect(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s
    }

  /** The joins of the executed plan (AQE-unwrapped). */
  def joins(df: DataFrame): Seq[SparkPlan] =
    deepCollect(df.queryExecution.executedPlan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }

  /** Shuffles feeding any JOIN of the executed plan — the
    * storage-partitioned-join probe: a post-join aggregation may
    * legitimately reshuffle on its own grouping keys, but an SPJ's
    * INPUTS must be exchange-free. */
  def joinInputShuffles(df: DataFrame): Seq[SparkPlan] =
    joins(df).flatMap(_.children).flatMap(c => deepCollect(c) {
      case s: ShuffleExchangeExec => s
    })
}
