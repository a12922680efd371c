package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print a one-line physical-plan health summary per declared
  * query — flags CartesianProduct / BroadcastNestedLoopJoin, counts
  * exchanges, and reports whether parquet scans carry pushed filters.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.build("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    // global-window invariant (round 14): every unpartitioned window must
    // carry a structural boundedness proof (PlanChecks.globalWindows) — a
    // data-sized one fails the audit (exit 1) instead of hiding in
    // `WindowExec: No Partition Defined` warning noise.
    var gwBounded = List.empty[String]
    var gwUnbounded = List.empty[String]
    SparkEntry.registry.sortBy(_.name).foreach { q =>
      try {
        // skip side-effecting/streaming/iterative queries (they execute
        // real jobs while the plan is being built)
        // (dedup3/pipe2 checkpoint candidate pairs at build; sim3 collects
        // the k-means sample; dedup2 runs the cap's plan-time doc count;
        // graph1 caches + counts each PageRank iteration at build)
        val sideEffecting = Set("q_scan2", "q_ext_dedup6", "q_ext_pipe1",
          "q_ext_pipe2", "q_ext_dedup2", "q_ext_dedup3", "q_ext_sim3",
          "q_ext_sim4", "q_ext_dedup7", "q_ext_bucket1", "q_upd1",
          "q_ext_graph1")
        if (q.name.startsWith("q_ing") || q.name.startsWith("q_norm") ||
            q.name.startsWith("q_ext_stream") || sideEffecting(q.name)) {
          println(f"${q.name}%-16s SKIP (side-effecting/streaming/iterative)")
        } else {
          val df = q.run(spark, sfDir)
          val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
          val gws = graft.plans.PlanChecks.globalWindows(df)
          gws.foreach { s =>
            val line = s"${q.name}: [${s.exprs}] ${s.why}"
            if (s.bounded) gwBounded ::= line else gwUnbounded ::= line
          }
          val flags = Seq(
            "CartesianProduct" -> plan.contains("CartesianProduct"),
            "BNLJ" -> plan.contains("BroadcastNestedLoopJoin"),
            "GLOBALWINDOW" -> gws.exists(!_.bounded)
          ).collect { case (n, true) => n }
          val nEx = "Exchange".r.findAllIn(plan).length
          val nBhj = "BroadcastHashJoin".r.findAllIn(plan).length
          val nSmj = "SortMergeJoin".r.findAllIn(plan).length
          val gwNote = if (gws.nonEmpty) s" gw=${gws.count(_.bounded)}ok/${gws.size}" else ""
          println(f"${q.name}%-16s exchanges=$nEx%-3d bhj=$nBhj smj=$nSmj$gwNote ${if (flags.nonEmpty) "FLAGS: " + flags.mkString(",") else ""}")
        }
      } catch { case e: Throwable => println(f"${q.name}%-16s ERROR ${e.getMessage.take(80)}") }
    }
    println(s"\nglobal windows: ${gwBounded.size} bounded (whitelisted by proof), " +
      s"${gwUnbounded.size} unbounded")
    gwBounded.reverse.foreach(l => println(s"  OK   $l"))
    gwUnbounded.reverse.foreach(l => println(s"  FAIL $l"))
    spark.stop()
    if (gwUnbounded.nonEmpty) sys.exit(1)
  }
}
