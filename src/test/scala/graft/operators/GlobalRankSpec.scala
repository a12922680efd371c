package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank: the scalable two-pass global rank/ntile vs the
  * single-partition window it replaces.
  */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int) = {
    // duplicate sort keys (v has collisions) + unique tiebreak id
    (0 until n).map(i => ((i * 7919) % 97, i.toLong)).toDF("v", "id")
  }

  test("globalRowNumber equals the single-partition row_number") {
    val df = fixture(5000)
    val got = GlobalRank.globalRowNumber(df, Seq(col("v"), col("id")), out = "rn")
    val want = df.withColumn("rn", row_number().over(Window.orderBy(col("v"), col("id"))))
    assert(got.orderBy("id").select("id", "rn").collect().toSeq ===
      want.orderBy("id").select("id", "rn").collect().toSeq)
  }

  test("globalNtile equals ntile for even, uneven, and degenerate sizes") {
    for ((n, k) <- Seq((5000, 4), (5003, 7), (100, 100), (5, 8), (97, 1))) {
      val df = fixture(n)
      val got = GlobalRank.globalNtile(df, Seq(col("v"), col("id")), k, out = "b")
      val want = df.withColumn("b", ntile(k).over(Window.orderBy(col("v"), col("id"))))
      assert(got.orderBy("id").select("id", "b").collect().toSeq ===
        want.orderBy("id").select("id", "b").collect().toSeq,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("ranks survive (or fail loudly) with exchange reuse disabled") {
    // With spark.sql.exchange.reuse off, the counts branch and the rank
    // branch each build their own range exchange whose sampled bounds may
    // differ. Correct ranks only need the two size vectors to agree, and
    // ANY disagreement trips the in-plan __local <= __cnt guard — so the
    // acceptable outcomes are exactly: identical ranks, or the named error.
    // Silent wrong ranks are the one outcome that must be impossible.
    val old = spark.conf.getOption("spark.sql.exchange.reuse")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val df = fixture(5000)
      val want = df.withColumn("rn", row_number().over(Window.orderBy(col("v"), col("id"))))
        .orderBy("id").select("id", "rn").collect().toSeq
      try {
        val got = GlobalRank.globalRowNumber(df, Seq(col("v"), col("id")), out = "rn")
          .orderBy("id").select("id", "rn").collect().toSeq
        assert(got === want, "reuse-off run returned wrong ranks WITHOUT tripping the guard")
      } catch {
        case e: Exception =>
          def chain(t: Throwable): String =
            if (t == null) "" else t.toString + "\n" + chain(t.getCause)
          assert(chain(e).contains("GlobalRank"),
            s"reuse-off run failed with an unexpected error: ${chain(e)}")
      }
    } finally {
      old match {
        case Some(v) => spark.conf.set("spark.sql.exchange.reuse", v)
        case None => spark.conf.unset("spark.sql.exchange.reuse")
      }
    }
  }

  test("the data path is range-partitioned, not single-partition") {
    val df = fixture(5000)
    val plan = GlobalRank.globalNtile(df, Seq(col("v"), col("id")), 4, out = "b")
      .queryExecution.executedPlan.toString
    // the input flows through a range exchange (the scalable shape) …
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"expected a range exchange on the data path:\n$plan")
    // … and the data-side window ranks within __pid partitions; the only
    // SinglePartition stage is the per-partition-counts prefix sum, whose
    // input is one row per partition (metadata-sized by construction)
    assert(plan.contains("row_number()") && plan.contains("__pid"),
      s"expected the local rank window keyed on __pid:\n$plan")
  }
}
