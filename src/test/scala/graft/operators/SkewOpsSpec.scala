package graft.operators

import graft.SparkSpec

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 900 of 1000 rows share key 7
  private lazy val big = (1 to 1000)
    .map(i => (if (i <= 900) 7L else i.toLong, i.toLong)).toDF("k", "payload")
  private lazy val small = Seq((7L, "hot"), (950L, "cold"), (2000L, "unmatched"))
    .toDF("k", "tag")

  test("saltedJoin(inner) equals the plain inner join on skewed keys") {
    val plain = big.join(small, "k").select("k", "payload", "tag")
      .orderBy("k", "payload").collect().toSeq
    val salted = SkewOps.saltedJoin(big, small, "k", saltFactor = 8)
      .select("k", "payload", "tag").orderBy("k", "payload").collect().toSeq
    assert(salted === plain)
    assert(plain.size === 901)
  }

  test("saltedJoin(left_outer) preserves unmatched big-side rows exactly once") {
    val plain = big.join(small, Seq("k"), "left_outer").select("k", "payload", "tag")
      .orderBy("k", "payload").collect().toSeq
    val salted = SkewOps.saltedJoin(big, small, "k", saltFactor = 8, "left_outer")
      .select("k", "payload", "tag").orderBy("k", "payload").collect().toSeq
    assert(salted === plain)
    assert(plain.size === 1000)
  }

  test("saltedJoin rejects join types where replication is unsound") {
    intercept[IllegalArgumentException](
      SkewOps.saltedJoin(big, small, "k", 8, "right_outer"))
  }
}
