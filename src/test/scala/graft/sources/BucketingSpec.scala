package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed-by-key join runs with zero shuffle exchange and matches the plain join") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")

    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_bucketed", "l_orderkey", buckets = 8)

    val joined = Bucketing.read(spark, "li_bucketed")
      .join(Bucketing.read(spark, "o_bucketed"), "l_orderkey")
    assert(Bucketing.isShuffleFree(joined),
      joined.queryExecution.executedPlan.toString)

    val expected = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(li("l_orderkey"), col("l_quantity"), col("o_totalprice"))
      .orderBy("l_orderkey", "l_quantity").collect().toSeq
    val actual = joined
      .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
      .orderBy("l_orderkey", "l_quantity").collect().toSeq
    assert(actual === expected)
  }

  test("bucketed groupBy on the bucket key also avoids the exchange") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(li, "li_bucketed_agg", "l_orderkey", buckets = 8)
    val agg = Bucketing.read(spark, "li_bucketed_agg")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
    assert(Bucketing.isShuffleFree(agg), agg.queryExecution.executedPlan.toString)
  }
}
