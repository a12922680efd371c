package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("reducedJoin matches the plain join exactly (inner and left_semi)") {
    val large = (0L until 50000L).map(i => (i % 1000, i)).toDF("k", "payload")
    val small = Seq((3L, "a"), (17L, "b"), (999L, "c")).toDF("sk", "tag")
    for (jt <- Seq("inner", "left_semi")) {
      val plain = large.join(small, $"k" === $"sk", jt)
      val reduced = BloomJoin.reducedJoin(large, small, "k", "sk",
        expectedItems = 10, joinType = jt)
      assert(reduced.columns.toSeq === plain.columns.toSeq)
      assert(reduced.exceptAll(plain).isEmpty && plain.exceptAll(reduced).isEmpty,
        s"$jt reduced join diverged from the plain join")
    }
  }

  test("prefilter has no false negatives and a bounded false-positive rate") {
    val n = 20000L
    val keys = (0L until n).toDF("k")
    val members = (0L until 500L).map(_ * 7L) // 500 member keys, rest non-members
    val bloom = BloomJoin.buildBloom(members.toDF("m"), $"m",
      expectedItems = 500, fpp = 0.01)
    val passed = BloomJoin.prefilter(keys, $"k", bloom)
      .collect().map(_.getLong(0)).toSet
    val memberSet = members.toSet
    assert(memberSet.subsetOf(passed), "bloom dropped a true member (false negative)")
    val fps = (passed -- memberSet).size.toDouble
    val nonMembers = (n - memberSet.count(_ < n)).toDouble
    assert(fps / nonMembers <= 0.05,
      f"false-positive rate ${fps / nonMembers}%.4f far above the 0.01 target")
  }

  test("reduction drops the non-matching bulk before the join") {
    val large = (0L until 100000L).map(i => (i % 10000, i)).toDF("k", "v")
    val small = (0L until 20L).toDF("sk")
    val bloom = BloomJoin.buildBloom(small, $"sk", expectedItems = 20)
    val kept = BloomJoin.prefilter(large, $"k", bloom).count()
    val trueMatches = 200L // 20 keys x 10 rows each
    assert(kept >= trueMatches, "prefilter lost matching rows")
    assert(kept <= trueMatches + (0.05 * 100000).toLong,
      s"prefilter kept $kept rows - no meaningful reduction over 100000")
  }

  test("oversized build sides are rejected instead of shipping a data-sized literal") {
    intercept[IllegalArgumentException] {
      BloomJoin.optimalNumBits(1_000_000_000L, 0.01)
    }
    // at the cap boundary it still sizes normally
    assert(BloomJoin.optimalNumBits(1_000_000L, 0.01) <= BloomJoin.MaxNumBits)
  }

  test("outer joins are rejected (reduction would drop result rows)") {
    val df = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      BloomJoin.reducedJoin(df, df.toDF("sk", "sv"), "k", "sk",
        expectedItems = 1, joinType = "left_outer")
    }
  }
}
