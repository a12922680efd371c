package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Dev probe (round 14): distribution of partition sizes after
  * `repartition(n)` at normalize's geometry — attribution for q_norm1's
  * sf10 file-count divergence (9275 files vs the exact-packing 7325).
  */
object ProbeNorm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/testdata/sf10")
    val maxRows = 8192L
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.load(spark, sfDir, "lineitem")
    val total = li.count()
    val n = math.max(1, math.ceil(total.toDouble / maxRows).toInt)
    println(s"[probe-norm] rows=$total n=$n ideal=${math.ceil(total.toDouble / maxRows).toLong}")
    val sizes = li.repartition(n).groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("c"))
    val agg = sizes.agg(
      count(lit(1)).as("parts"),
      min("c").as("minc"), max("c").as("maxc"),
      sum(when(col("c") > maxRows, ceil(col("c").cast("double") / maxRows))
        .otherwise(lit(1L))).as("files_projected"),
      sum(when(col("c") > maxRows, 1L).otherwise(0L)).as("over"))
      .collect()(0)
    println(s"[probe-norm] parts=${agg.getAs[Long]("parts")} min=${agg.getAs[Long]("minc")} " +
      s"max=${agg.getAs[Long]("maxc")} over8192=${agg.getAs[Long]("over")} " +
      s"filesProjected=${agg.getAs[Long]("files_projected")}")
    spark.stop()
  }
}
