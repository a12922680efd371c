package graft.tools

import graft.SparkEntry
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write each named query's formatted physical plan to
  * <outDir>/<name>_<suffix>.txt — the per-query before/after plan evidence
  * the optimization rounds commit under plans/r<N>/.
  *
  * Usage: PlanSnap <sfDir> <outDir> <suffix> <query...>
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args.drop(3).toSeq
    require(names.nonEmpty, "pass at least one query name")
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.GraftSession.build("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    names.foreach { n =>
      val plan = byName(n).run(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"[plansnap] wrote $n ($suffix)")
    }
    spark.stop()
  }
}
