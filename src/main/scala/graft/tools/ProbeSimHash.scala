package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev probe for the simHashPairs hot path (round 14): times the operator
  * at q_ext_dedup4's configuration on a given sf dir and prints the census
  * size, so a hot-path plan change can be attributed before it reaches the
  * bench. Not part of the library surface.
  */
object ProbeSimHash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.1fs rows=$n")
    }
    // warm the file listing + signature kernel once
    time("warm simHash")(Dedup.simHash(docs, "doc_id", "text").count())
    args.drop(1).headOption.getOrElse("hot,fast").split(",").foreach {
      case "hot" =>
        time("pairs maxBucket=800 (hot)")(
          Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 7,
            numBlocks = 8, maxBucket = 800L).count())
      case "fast" =>
        time("pairs maxBucket=10^9 (fast)")(
          Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 7,
            numBlocks = 8, maxBucket = 1000000000L).count())
      case "explain" =>
        Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 7,
          numBlocks = 8, maxBucket = 800L).explain("formatted")
      case mode @ ("oldhot" | "nodedup") =>
        // inline reconstruction of the r13 emit-all hot plan (oldhot) and
        // the new banding join WITHOUT band selection (nodedup) — cost
        // attribution for the single-emission rewrite
        val maxBucket = 800L
        val sig = Dedup.simHash(docs, "doc_id", "text").localCheckpoint()
        val blocks = 8
        val widths = Array.fill(blocks)(8)
        val offsets = widths.scanLeft(0)(_ + _)
        def blockVal(i: Int) =
          shiftright(col("simhash"), offsets(i)).bitwiseAND(lit(255L))
        val bands = (0 until blocks).map(i =>
          struct(lit(i).as("ci"), blockVal(i).as("cv")))
        val blocked = sig.select(col("id"), col("simhash"),
          explode(array(bands: _*)).as("ch"))
          .select(col("id"), col("simhash"), col("ch.ci").as("ci"), col("ch.cv").as("cv"))
        val hot = blocked.groupBy("ci", "cv").agg(count(lit(1)).as("m"))
          .filter(col("m") > maxBucket)
          .withColumn("nsub", ceil(col("m").cast("double") / maxBucket).cast("long"))
          .select("ci", "cv", "nsub").localCheckpoint()
        val sub = blocked.join(broadcast(hot), Seq("ci", "cv"), "left")
          .withColumn("sub", pmod(xxhash64(col("id")), coalesce(col("nsub"), lit(1L))))
          .select(col("id"), col("simhash"), col("ci"), col("cv"), col("sub"))
        val joined = sub.as("x")
          .join(sub.select(col("id").as("id2"), col("simhash").as("simhash2"),
            col("ci").as("ci2"), col("cv").as("cv2"), col("sub").as("sub2")).as("y"),
            col("ci") === col("ci2") && col("cv") === col("cv2") &&
              col("sub") === col("sub2") && col("x.id") < col("id2"))
          .select(col("x.id").as("d1"), col("id2").as("d2"),
            bit_count(col("simhash").bitwiseXOR(col("simhash2"))).as("dist"))
          .filter(col("dist") <= 7)
        if (mode == "oldhot") time("r13 emit-all + distinct")(joined.distinct().count())
        else time("join + dist only (dups)")(joined.count())
      case other => println(s"[probe] unknown mode $other")
    }
    spark.stop()
  }
}
