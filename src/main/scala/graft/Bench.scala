package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: absorb session/scheduler/codegen startup so it isn't
    // attributed to whichever query happens to run first
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop write materializes the full plan (projections, sorts, windows)
      // instead of letting count() prune it down to a row count.
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name,
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // failed queries report negative elapsed so they can't masquerade as
      // fast successes in the emitted JSON
      if (ok) sec else -sec
    }
    // Fixed name order × 3 interleaved rounds, per-query MEDIAN: a single
    // run carries ±20%+ scheduler/GC noise, and whichever queries run while
    // the session is still cold (file listing, JIT, codegen) absorb seconds
    // that aren't theirs. Interleaving whole rounds (not back-to-back
    // repeats) means cold costs land in round 1 only and the median reflects
    // the session-steady-state cost; the fixed order makes rounds comparable
    // across versions. A failure on ANY run keeps the negative marker — a
    // median over the surviving runs would smuggle a flaky query in as a
    // success.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val rounds = 3
    val samples = (1 to rounds).map { _ =>
      ordered.map { case (name, fn) => name -> once(name, fn) }.toMap
    }
    val results = ordered.map { case (name, _) =>
      val runs = samples.map(_(name))
      val med =
        if (runs.exists(_ < 0)) runs.min // most-negative = failed marker
        else runs.sorted.apply(rounds / 2)
      name -> med
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    val errJson = errors.map { case (k, v) => s"\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_failed":${errors.size},"rounds":$rounds,"stat":"median","sf":"$sfDir"}""")
    spark.stop()
  }
}
