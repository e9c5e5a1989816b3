package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan audit helpers shared by the bench artifact and the plan
  * invariant specs (VERDICT r16 item 5: the measured shuffle count per
  * headline query belongs IN the bench artifact, so plan drift is visible
  * round-over-round without running the test suite).
  */
object PlanAudit {

  /** Flatten an executed plan, descending through AQE wrappers
    * (AdaptiveSparkPlanExec / query stages) — without this an audit only
    * ever sees the adaptive root node.
    */
  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flatten(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        flatten(s.plan)
      case _ => Seq.empty
    }
    (p +: p.children.flatMap(flatten)) ++ p.subqueries.flatMap(flatten) ++ inner
  }

  /** Count the non-range shuffles of an EXECUTED DataFrame (the caller
    * must have run an action first so AQE has settled the final stages).
    * Range-partitioned exchanges (ORDER BY) are excluded — the drift
    * signature worth watching is hash/round-robin exchange creep: a
    * broadcast silently becoming a shuffle, a reused exchange splitting
    * in two.
    */
  def nonRangeShuffles(df: DataFrame): Int =
    flatten(df.queryExecution.executedPlan).count {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        !e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]
      case _ => false
    }
}
