package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, SparkPartitionID}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Sort, Window}
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

  // ---- global-window audit (round 14) ----
  // An unpartitioned window funnels its whole input through ONE task — the
  // classic scale cliff. The repo's two intentional sites are both over
  // provably metadata-sized frames (a literal top-k limit; a
  // one-row-per-partition count aggregate), and the audit below proves that
  // boundedness STRUCTURALLY from the optimized plan instead of
  // whitelisting call sites by name — so a new data-sized global window
  // anywhere in the inventory fails PlanAudit instead of hiding in
  // `WindowExec: No Partition Defined` warning noise.

  /** One unpartitioned logical Window in a query's optimized plan. */
  final case class GlobalWindowSite(exprs: String, bounded: Boolean, why: String)

  /** All unpartitioned Window nodes in `df`'s optimized logical plan, each
    * tagged with whether its input frame is provably bounded: either
    * Catalyst's own `maxRows` derivation gives a small literal bound (a
    * top-k limit survives Project/Filter/Join-free paths), or the input is
    * an aggregate grouped solely by `spark_partition_id()` — one row per
    * partition, metadata-sized on any cluster.
    */
  def globalWindows(df: DataFrame): Seq[GlobalWindowSite] = {
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty =>
        val (bounded, why) = w.child.maxRows match {
          case Some(n) if n <= 100000L => (true, s"maxRows=$n")
          case _ if partitionCountBounded(w.child) =>
            (true, "one-row-per-partition aggregate")
          case _ => (false, "data-sized input")
        }
        GlobalWindowSite(w.windowExpressions.map(_.name).mkString(","), bounded, why)
    }
  }

  /** Input is an Aggregate grouped entirely by expressions tracing to
    * `spark_partition_id()`, reached through row-count-preserving or
    * -reducing unary nodes only (a Join/Generate/Union between the window
    * and the aggregate voids the proof).
    */
  private def partitionCountBounded(p: LogicalPlan): Boolean = p match {
    case a: Aggregate =>
      a.groupingExpressions.nonEmpty &&
        a.groupingExpressions.forall(derivesFromPartitionId(_, a.child))
    case pr: Project => partitionCountBounded(pr.child)
    case f: Filter   => partitionCountBounded(f.child)
    case s: Sort     => partitionCountBounded(s.child)
    case w: Window   => partitionCountBounded(w.child)
    case _ => false
  }

  private def derivesFromPartitionId(e: Expression, scope: LogicalPlan): Boolean = e match {
    case _: SparkPartitionID   => true
    case a: Alias              => derivesFromPartitionId(a.child, scope)
    case c: Cast               => derivesFromPartitionId(c.child, scope)
    case ar: AttributeReference =>
      val producers = scope.collect {
        case pr: Project   => pr.projectList
        case ag: Aggregate => ag.aggregateExpressions
        case wd: Window    => wd.windowExpressions
      }.flatten.collect { case al: Alias if al.exprId == ar.exprId => al.child }
      producers.exists(derivesFromPartitionId(_, scope))
    case _ => false
  }
}
