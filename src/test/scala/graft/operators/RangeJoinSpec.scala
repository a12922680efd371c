package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketed join equals the naive theta join, boundaries inclusive") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == lo of iv A (inclusive)
      (2L, ts("2024-01-01 00:59:59")),
      (3L, ts("2024-01-01 01:00:00")), // == hi of iv A (inclusive)
      (4L, ts("2024-01-01 01:00:01")), // just past A, inside B
      (5L, ts("2024-01-03 12:30:00")), // inside C only
      (6L, ts("2024-02-01 00:00:00"))  // matches nothing
    ).toDF("pid", "t")
    val intervals = Seq(
      ("A", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      ("B", ts("2024-01-01 00:30:00"), ts("2024-01-01 02:00:00")),
      ("C", ts("2024-01-03 12:00:00"), ts("2024-01-03 13:00:00"))
    ).toDF("iv", "lo", "hi")

    val got = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi", 3600L)
      .select("pid", "iv")
    val want = points.join(intervals, $"t" >= $"lo" && $"t" <= $"hi")
      .select("pid", "iv")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "bucketed range join diverged from the theta join")
    // each true pair meets in exactly one bucket - no duplicate rows
    assert(got.count() === got.distinct().count())
  }

  test("plans as an equi-join, not a nested loop / cartesian product") {
    val points = (0L until 1000L)
      .map(i => (i, new Timestamp(1700000000000L + i * 60000L))).toDF("pid", "t")
    val intervals = (0L until 200L)
      .map(i => (i, new Timestamp(1700000000000L + i * 300000L),
        new Timestamp(1700000000000L + i * 300000L + 3600000L))).toDF("iv", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi", 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    // the naive formulation of the same join DOES nested-loop - the operator
    // is what removes it, not the data shape
    val naive = points.join(intervals, $"t" >= $"lo" && $"t" <= $"hi")
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin") || naive.contains("CartesianProduct"))
  }

  test("malformed intervals (hi < lo) are dropped, not exploded descending") {
    val points = Seq((1L, ts("2024-01-01 00:30:00"))).toDF("pid", "t")
    val intervals = Seq(
      ("ok", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      ("bad", ts("2024-01-01 02:00:00"), ts("2024-01-01 00:00:00"))
    ).toDF("iv", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi", 3600L)
      .select($"iv").as[String].collect().toSeq
    assert(got === Seq("ok"))
  }

  test("multi-bucket intervals still match each point exactly once") {
    // 6-hour interval over 1-hour buckets: spans 7 bucket rows
    val points = Seq((1L, ts("2024-01-01 03:30:00"))).toDF("pid", "t")
    val intervals = Seq(("long", ts("2024-01-01 00:15:00"), ts("2024-01-01 06:15:00")))
      .toDF("iv", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi", 3600L)
    assert(got.count() === 1L)
  }

  test("interval overlap equals the naive theta join, exactly once per pair") {
    // spans of wildly different widths, touching endpoints, disjoint cases
    val left = Seq(
      ("L1", ts("2024-01-01 00:00:00"), ts("2024-01-01 06:00:00")), // 6h
      ("L2", ts("2024-01-01 05:59:59"), ts("2024-01-01 06:30:00")),
      ("L3", ts("2024-01-02 00:00:00"), ts("2024-01-02 00:00:00")), // zero-width
      ("L4", ts("2024-03-01 00:00:00"), ts("2024-03-01 01:00:00"))  // overlaps nothing
    ).toDF("lid", "llo", "lhi")
    val right = Seq(
      ("R1", ts("2024-01-01 06:00:00"), ts("2024-01-01 07:00:00")), // touches L1 at one instant
      ("R2", ts("2023-12-31 00:00:00"), ts("2024-01-03 00:00:00")), // 3-day span covers L1-L3
      ("R3", ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00"))  // nested inside L1
    ).toDF("rid", "rlo", "rhi")
    val got = RangeJoin.intervalOverlap(left, "llo", "lhi", right, "rlo", "rhi", 3600L)
      .select("lid", "rid")
    val want = left.join(right, $"llo" <= $"rhi" && $"rlo" <= $"lhi")
      .select("lid", "rid")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "bucketed interval overlap diverged from the theta join")
    // the greatest-lo-bucket rule must emit each pair exactly once even
    // though wide spans co-occur in many buckets
    assert(got.count() === got.distinct().count())
  }

  test("interval overlap plans as an equi-join, not a nested loop") {
    val left = (0L until 500L).map(i => (i,
      new Timestamp(1700000000000L + i * 120000L),
      new Timestamp(1700000000000L + i * 120000L + 1800000L))).toDF("lid", "llo", "lhi")
    val right = (0L until 300L).map(i => (i,
      new Timestamp(1700000000000L + i * 180000L),
      new Timestamp(1700000000000L + i * 180000L + 3600000L))).toDF("rid", "rlo", "rhi")
    val plan = RangeJoin.intervalOverlap(left, "llo", "lhi", right, "rlo", "rhi", 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval overlap fell back to a nested loop:\n$plan")
  }

  test("non-positive bucket width is rejected") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("a", "t")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(df, "t", df.toDF("b", "lo"), "lo", "lo", 0L)
    }
  }
}
