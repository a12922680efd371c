package graft.tools

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timings for the dedup pipeline at a given SF dir.
  * Not part of the driver contract.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val spreadDocs = docs.repartition(32)

    time("scan")(docs)
    time("shingle3")(spreadDocs.select(col("doc_id"),
      array_distinct(TextFunctions.shingles(col("text"), 3)).as("toks")))
    val toks = spreadDocs.select(col("doc_id").as("id"),
      explode(array_distinct(TextFunctions.shingles(col("text"), 3))).as("tok"))
    time("explode")(toks)
    time("tok self-join")(
      toks.as("a").join(toks.withColumnRenamed("id", "id2").as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("id2")))
    time("tok self-join + groupBy")(
      toks.as("a").join(toks.withColumnRenamed("id", "id2").as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("id2"))
        .groupBy(col("a.id").as("d1"), col("id2").as("d2"))
        .agg(count(lit(1)).as("c")))
    time("minhash sig 32")(
      Dedup.minHashSignature(docs, "doc_id", "text", numHashes = 32, shingleN = 3))
    time("full minHashPairs")(
      Dedup.minHashPairs(docs, "doc_id", "text", threshold = 0.8, numBands = 16,
        rowsPerBand = 2, shingleN = 3))
    time("full jaccardPairs")(
      Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.6, shingleN = 3))

    // fan-in bound under a planted hot shingle: every doc shares one
    // sentence prefix, so uncapped candidate generation is n²/2 while the
    // df cap drops the hot shingles entirely
    val n = 2000L
    val planted = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("hot shingle planted everywhere "), col("id").cast("string"),
        lit(" unique "), col("id").cast("string"), lit(" tail")).as("text"))
    val unc = Dedup.jaccardCandidates(planted, "doc_id", "text", 3, Int.MaxValue).count()
    val cap = Dedup.jaccardCandidates(planted, "doc_id", "text", 3, 100).count()
    println(s"[profile] planted-hot-shingle n=$n candidates: uncapped=$unc capped(100)=$cap")
    spark.stop()
  }
}
object ExplainDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    println("=== jaccardPairs plan ===")
    Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.6, shingleN = 3)
      .explain("formatted")
    spark.stop()
  }
}
