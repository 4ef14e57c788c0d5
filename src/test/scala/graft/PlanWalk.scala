package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Test-side plan inspection that sees THROUGH AQE: a plain
  * `executedPlan.collect` stops at `AdaptiveSparkPlanExec` (and, after
  * execution, at materialized `QueryStageExec` wrappers), so structural
  * assertions written against it are vacuous. These helpers execute the
  * frame first and then walk the FINAL adaptive plan, descending into
  * stages. */
object PlanWalk {

  /** Execute `df` and return every node of its final physical plan,
    * including nodes inside adaptive sub-plans and query stages. */
  def allNodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    allNodes(df.queryExecution.executedPlan)
  }

  def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
    case q: QueryStageExec => allNodes(q.plan)
    case o => o.children.flatMap(allNodes)
  })

  /** Does any file scan under `p` read a parquet path containing `name`? */
  def readsTable(p: SparkPlan, name: String): Boolean =
    allNodes(p).exists {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.exists(_.toString.contains(name))
      case _ => false
    }
}
