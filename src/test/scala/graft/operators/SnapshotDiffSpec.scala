package graft.operators

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private lazy val oldDf = Seq(
    (1L, Option("a"), 10.0), // removed
    (2L, Option("b"), 20.0), // unchanged
    (3L, Option("c"), 30.0), // v changes
    (4L, Option.empty[String], 40.0), // null → value (changed)
    (6L, Option.empty[String], 60.0) // null == null (unchanged)
  ).toDF("k", "v", "x")

  private lazy val newDf = Seq(
    (2L, Option("b"), 20.0),
    (3L, Option("cc"), 30.5), // both columns change
    (4L, Option("d"), 40.0),
    (5L, Option("e"), 50.0), // added
    (6L, Option.empty[String], 60.0)
  ).toDF("k", "v", "x")

  test("classifies added / removed / changed with the changed column list") {
    val got = SnapshotDiff.diff(oldDf, newDf, Seq("k"))
      .select("k", "status", "changed_cols")
      .as[(Long, String, String)].collect()
      .map { case (k, s, c) => k -> (s, c) }.toMap
    assert(got === Map(
      1L -> ("removed", ""),
      3L -> ("changed", "v,x"),
      4L -> ("changed", "v"),
      5L -> ("added", "")))
  }

  test("includeUnchanged surfaces identical and null==null rows") {
    val got = SnapshotDiff.diff(oldDf, newDf, Seq("k"), includeUnchanged = true)
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(got(2L) === "unchanged")
    assert(got(6L) === "unchanged") // null <=> null is a match, not a change
    assert(got.size === 6)
  }

  test("old_/new_ column values ride along for changed rows") {
    val row = SnapshotDiff.diff(oldDf, newDf, Seq("k"))
      .where($"k" === 3L).select("old_v", "new_v", "old_x", "new_x")
      .as[(String, String, Double, Double)].collect().head
    assert(row === ("c", "cc", 30.0, 30.5))
  }

  test("rejects key-only schemas") {
    val ks = Seq(1L).toDF("k")
    intercept[IllegalArgumentException](SnapshotDiff.diff(ks, ks, Seq("k")))
  }
}
