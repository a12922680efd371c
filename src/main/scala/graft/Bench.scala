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
    // best-of-2: single runs carry ±20%+ scheduler/GC noise on individual
    // queries in a 90+-query session; the min is the real per-query cost.
    // A failure on EITHER run keeps the negative marker — abs() of a failed
    // second run would smuggle its (short) elapsed in as a success.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val first = once(name, fn)
      val best =
        if (first < 0) first
        else {
          val second = once(name, fn)
          if (second < 0) second else math.min(first, second)
        }
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    val errJson = errors.map { case (k, v) => s"\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_failed":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
