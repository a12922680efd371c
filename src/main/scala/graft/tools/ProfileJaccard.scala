package graft.tools

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timings for the capped jaccardPairs path. */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[jac] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val arrays = docs.repartition(32).select(col("doc_id").as("id"),
      array_distinct(TextFunctions.shingles(col("text"), 3)).as("toks"))
    val toks = arrays.select(col("id"), explode(col("toks")).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("th"))

    time("arrays")(arrays)
    time("toks")(toks)
    val dfW = Window.partitionBy("th")
    val capped = toks.withColumn("df", count(lit(1)).over(dfW))
      .filter(col("df") <= 10000).drop("df")
    time("capped (window df)")(capped)
    val cand = capped.as("a")
      .join(capped.withColumnRenamed("id", "id2").as("b"),
        col("a.th") === col("b.th") && col("a.id") < col("id2"))
      .select(col("a.id").as("d1"), col("id2").as("d2"))
    time("candidates pre-distinct")(cand)
    time("candidates distinct")(cand.distinct())
    val candD = cand.distinct()
    time("verify join")(
      candD.join(arrays.select(col("id").as("d1"), col("toks").as("t1")), "d1")
        .join(arrays.select(col("id").as("d2"), col("toks").as("t2")), "d2")
        .withColumn("c", size(array_intersect(col("t1"), col("t2"))).cast("long"))
        .withColumn("jac", col("c").cast("double") / (size(col("t1")) + size(col("t2")) - col("c")))
        .filter(col("jac") >= 0.6))
    time("full jaccardPairs")(
      Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.6, shingleN = 3))
    // old shape for reference: count-based intersections, no cap
    val sizes = arrays.select(col("id"), size(col("toks")).as("sz"))
    val inter = toks.as("a")
      .join(toks.withColumnRenamed("id", "id2").as("b"),
        col("a.th") === col("b.th") && col("a.id") < col("id2"))
      .groupBy(col("a.id").as("d1"), col("id2").as("d2"))
      .agg(count(lit(1)).as("c"))
    time("old count-based full")(
      inter.join(sizes.select(col("id").as("d1"), col("sz").as("sz1")), "d1")
        .join(sizes.select(col("id").as("d2"), col("sz").as("sz2")), "d2")
        .withColumn("jac", col("c").cast("double") / (col("sz1") + col("sz2") - col("c")))
        .filter(col("jac") >= 0.6))
    spark.stop()
  }
}
