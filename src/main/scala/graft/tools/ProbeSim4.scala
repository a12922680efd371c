package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Dev probe: break down q_ext_sim4's cost at a given sfDir — the full
  * declared query vs its pieces (exact anchored scoring pass, the top-5
  * window over it, the ivfSelfTopK deployment arm) — to aim the round-13
  * oracle-arm tightening at the piece that actually pays.
  */
object ProbeSim4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, sfDir, "embeddings")
    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[sim4-probe] $name%-28s rows=$n%10d elapsed=${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val dir = "target/tmp/ivf/probe_sim4"
    timed("ensureIvfIndexSized") {
      Similarity.ensureIvfIndexSized(spark, dir, emb, "vec_id", "embedding",
        Similarity.autoCentroids(_))._1
    }
    timed("ivfSelfTopK") {
      Similarity.ivfSelfTopK(Similarity.loadIvfIndex(spark, dir), k = 5, nprobe = 8).count()
    }

    val v = emb.select(col("vec_id").as("nid"), col("embedding").as("nv"),
      Similarity.norm(col("embedding")).as("nn"))
    val qDiv = emb.agg(
      greatest(lit(1L), floor(count(lit(1)) / 500.0).cast("long")).as("qdiv"))
    val qs = emb.crossJoin(broadcast(qDiv))
      .filter(col("vec_id") % col("qdiv") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        Similarity.norm(col("embedding")).as("qn"))
    val scored = v.crossJoin(broadcast(qs))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosr",
        round(Similarity.cosinePre(col("qv"), col("nv"), col("qn"), col("nn")), 4))
    timed("scoring pass (count only)") { scored.count() }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosr").desc, col("nid"))
    timed("scoring + top5 window") {
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).count()
    }
    timed("scoring + top5 window rep2") {
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).count()
    }
    spark.stop()
  }
}
