package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Physical-plan introspection helpers for the in-plan assertions the
  * declared queries carry (partition pruning, pushdown, zero-exchange).
  *
  * `TreeNode.collect` stops at AQE boundaries — `AdaptiveSparkPlanExec` and
  * query stages are leaf-like wrappers whose subtree is only reachable
  * through their own accessors — so a plain `executedPlan.collect` misses
  * every scan under a join once AQE is on. These helpers recurse through
  * the wrappers.
  */
object PlanChecks {

  /** All parquet/file scans anywhere in the plan, including under AQE
    * wrappers, query stages, and reused exchanges.
    */
  def fileScans(plan: SparkPlan): Seq[FileSourceScanExec] =
    plan.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case s: QueryStageExec => fileScans(s.plan)
      case r: ReusedExchangeExec => fileScans(r.child)
    }.flatten

  /** The scan whose root path mentions `pathFragment` — for asserting on a
    * specific table's scan in a multi-table plan.
    */
  def fileScanFor(plan: SparkPlan, pathFragment: String): Option[FileSourceScanExec] =
    fileScans(plan).find(_.relation.location.rootPaths.exists(_.toString.contains(pathFragment)))
}
