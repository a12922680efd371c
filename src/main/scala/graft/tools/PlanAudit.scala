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
          // physical Window prints `Window [fns], [partCols], [orderCols]` —
          // an empty second bracket list = global single-partition window
          val globalWindow = "Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan).isDefined
          val flags = Seq(
            "CartesianProduct" -> plan.contains("CartesianProduct"),
            "BNLJ" -> plan.contains("BroadcastNestedLoopJoin"),
            "globalWindow" -> globalWindow
          ).collect { case (n, true) => n }
          val nEx = "Exchange".r.findAllIn(plan).length
          val nBhj = "BroadcastHashJoin".r.findAllIn(plan).length
          val nSmj = "SortMergeJoin".r.findAllIn(plan).length
          println(f"${q.name}%-16s exchanges=$nEx%-3d bhj=$nBhj smj=$nSmj ${if (flags.nonEmpty) "FLAGS: " + flags.mkString(",") else ""}")
        }
      } catch { case e: Throwable => println(f"${q.name}%-16s ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
