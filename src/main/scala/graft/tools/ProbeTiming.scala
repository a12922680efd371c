package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev probe: time the incremental dedup PROBE alone against a prebuilt
  * MinHash store (the deployment's per-tick cost, vs the declared query
  * which rebuilds the store each run for determinism).
  */
object ProbeTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = "target/tmp/minhash_store/probe_timing"
    Dedup.buildMinHashStore(docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", dir)
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = Dedup.minHashPairsAgainstStore(docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", dir, threshold = 0.8).count()
      println(f"[probe] rep$r pairs=$n elapsed=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
