package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StringSimSpec extends SparkSpec {
  import spark.implicits._

  private lazy val names = Seq(
    1L -> "kitten", 2L -> "sitten", // substitution
    3L -> "kitte", // deletion
    4L -> "kittens", // insertion
    5L -> "mitten", // substitution (of kitten/sitten)
    6L -> "banana", 7L -> "banana", // exact duplicate → dist 0
    8L -> "bananas", // insertion
    9L -> "zzzzzz" // unrelated
  ).toDF("id", "s")

  private def brute: Set[(Long, Long, Int)] =
    names.as("a").crossJoin(names.as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .where(col("d") <= 1)
      .as[(Long, Long, Int)].collect().toSet

  test("editDistance1Join finds exactly the brute-force pairs (sub/ins/del/dup)") {
    val got = StringSim.editDistance1Join(names, "id", "s")
      .select(col("k1"), col("k2"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute)
    // sanity on the fixture: all three edit kinds and a dist-0 pair present
    assert(got.contains((1L, 2L, 1))) // substitution
    assert(got.contains((1L, 3L, 1))) // deletion
    assert(got.contains((1L, 4L, 1))) // insertion
    assert(got.contains((6L, 7L, 0))) // exact duplicate
    assert(!got.exists { case (a, b, _) => a == 9L || b == 9L })
  }

  test("each qualifying pair appears exactly once despite multi-variant matches") {
    val rows = StringSim.editDistance1Join(names, "id", "s")
      .select("k1", "k2").as[(Long, Long)].collect().toSeq
    assert(rows.size === rows.toSet.size)
  }

  test("editDistanceJoin(maxDist=2) finds exactly the brute-force dist-≤2 pairs") {
    val brute2 = names.as("a").crossJoin(names.as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"), levenshtein(col("a.s"), col("b.s")).as("d"))
      .where(col("d") <= 2)
      .as[(Long, Long, Int)].collect().toSet
    val got = StringSim.editDistanceJoin(names, "id", "s", maxDist = 2)
      .select(col("k1"), col("k2"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute2)
    assert(got.contains((2L, 3L, 2))) // sitten → kitten → kitte: sub + del
    assert(got.size > brute.size) // radius 2 strictly widens the relation here
  }

  test("a hot variant group fails loudly instead of exploding quadratically") {
    // 50 identical strings: the shared variants form groups of 50 > the cap
    val hot = (1 to 50).map(i => (i.toLong, "same")).toDF("id", "s")
    val e = intercept[Exception] {
      StringSim.editDistance1Join(hot, "id", "s", maxVariantGroup = 10).collect()
    }
    assert(e.getMessage.contains("maxVariantGroup"))
    // the same data passes with the cap above the group size, as exact dups
    val ok = StringSim.editDistance1Join(hot, "id", "s", maxVariantGroup = 1000)
    assert(ok.count() === 50L * 49 / 2)
  }

  test("the plan is an equi-join on variants — no nested loop, no cartesian") {
    val plan = StringSim.editDistance1Join(names, "id", "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected a shuffled/broadcast equi-join on the variant column:\n$plan")
  }
}
