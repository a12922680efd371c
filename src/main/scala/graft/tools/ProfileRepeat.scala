package graft.tools

import graft.SparkEntry

/** Dev tool: run a subset of declared queries repeatedly in one session to
  * distinguish per-query cost from cross-query/session accumulation effects.
  * Usage: runMain graft.tools.ProfileRepeat <sfDir> <reps> <query...>
  */
object ProfileRepeat {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("INFO")
    for (r <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[repeat] rep$r $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
