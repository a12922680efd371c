package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing names: dump only those queries, IN THE GIVEN ORDER
    // (the sf10 value sweep passes a family-priority order so a run killed
    // by the round clock still leaves its most important prefix checked —
    // the round-13 re-run died with zero rows recorded; the driver always
    // passes exactly two args → full dump, name-sorted)
    val names =
      if (args.length > 2) args.drop(2).toSeq.distinct
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    // Data-contract gate (round-7 lesson): fail the WHOLE run with a named
    // schema diff if the driver's parquet drifted from the expected types —
    // 20 silent wrong answers are worse than one loud setup failure.
    Tables.verifyContract(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    // oracle SQL first (it's pure metadata): a sweep killed mid-queries can
    // still oracle-check every result dumped so far.
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[verify] unknown query: $name")
        case Some(fn) =>
          try {
            val t0 = System.nanoTime()
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            // progress marker, one line per completed dump, flushed — the
            // sweep wrapper (tools/sweep.py) oracle-checks each query the
            // moment this line appears, so an interrupted sweep keeps its
            // completed prefix
            println(f"[verify] done $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
            Console.out.flush()
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
