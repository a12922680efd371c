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

  test("asOf picks the latest in-horizon row per key, deterministically on ties") {
    val rng = new java.util.SplittableRandom(31L)
    val base = 1700000000000L
    val lefts = (0L until 300L)
      .map(i => (i, new Timestamp(base + rng.nextInt(500000) * 1000L))).toDF("lid", "lts")
    // duplicate timestamps on the right exercise the tie-break
    val rights = (0L until 600L)
      .map(i => (i, new Timestamp(base + rng.nextInt(250000) * 2000L), i * 0.5))
      .toDF("rid", "rts", "rv")
    val got = RangeJoin.asOf(lefts, "lts", "lid", rights, "rts",
      horizonSeconds = 3600L, tieBreakDesc = Seq("rid"))
      .select("lid", "rid")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lid").orderBy($"rts".desc, $"rid".desc)
    val want = lefts
      .join(rights, $"rts" <= $"lts" && $"rts" >= $"lts" - expr("INTERVAL 1 HOUR"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select("lid", "rid")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "asOf diverged from the window-formulated as-of")
    // exactly one winner per matched left row
    assert(got.count() === got.select("lid").distinct().count())
    // and it plans as an equi-join, not a nested loop
    val plan = RangeJoin.asOf(lefts, "lts", "lid", rights, "rts", 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"asOf fell back to a nested loop:\n$plan")
    // a left row whose nearest predecessor is beyond the horizon is dropped
    val lonely = Seq((99L, ts("2030-01-01 12:00:00"))).toDF("lid", "lts")
    val stale = Seq((1L, ts("2030-01-01 10:00:00"), 1.0)).toDF("rid", "rts", "rv")
    assert(RangeJoin.asOf(lonely, "lts", "lid", stale, "rts", 3600L).count() === 0L)
  }

  test("open-ended sentinel interval fails loudly instead of exploding") {
    // the classic SCD pattern: hi = 9999-12-31 on one dirty row would
    // explode to ~70M bucket rows at 1-hour buckets — the guard must turn
    // that into a clear error naming the bound, not an executor OOM
    val points = Seq((1L, ts("2024-01-01 00:30:00"))).toDF("pid", "t")
    val intervals = Seq(
      ("ok", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      ("sentinel", ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00"))
    ).toDF("iv", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi", 3600L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxSpanBuckets"), s"guard error lost its diagnosis: $msg")
    // same guard on the overlap variant
    val e2 = intercept[Exception] {
      RangeJoin.intervalOverlap(points.select($"t".as("llo"), $"t".as("lhi")),
        "llo", "lhi", intervals, "lo", "hi", 3600L).collect()
    }
    val msg2 = Option(e2.getMessage).getOrElse("") +
      Option(e2.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg2.contains("maxSpanBuckets"))
    // a raised maxSpanBuckets admits the wide interval and joins correctly
    val wide = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi",
      3600L, maxSpanBuckets = 100000000L)
    assert(wide.select($"iv").as[String].collect().sorted.toSeq === Seq("ok", "sentinel"))
  }

  test("auto-picked bucket width joins correctly and near the hand-tuned explode cost") {
    // mixed workload: most intervals ~30 min, a tail of 4-hour spans
    val rng = new java.util.SplittableRandom(17L)
    val base = 1700000000000L
    val intervals = (0L until 400L).map { i =>
      val lo = base + rng.nextInt(1000000) * 1000L
      val spanMs = if (i % 10 == 0) 4 * 3600 * 1000L else 1800 * 1000L
      (i, new Timestamp(lo), new Timestamp(lo + spanMs))
    }.toDF("iv", "lo", "hi")
    val points = (0L until 2000L)
      .map(i => (i, new Timestamp(base + rng.nextInt(1000000) * 1000L))).toDF("pid", "t")
    val auto = RangeJoin.autoBucketSeconds(intervals, "lo", "hi")
    assert(auto === 1800L, s"median span of the mixed workload is 30 min, picked $auto s")
    // explode cost at the auto width stays within 2x of the hand-tuned one
    def explodeRows(bucketSeconds: Long): Long = intervals.select(
      (floor(unix_timestamp($"hi") / bucketSeconds) -
        floor(unix_timestamp($"lo") / bucketSeconds) + lit(1L)).as("n"))
      .agg(sum($"n")).collect().head.getLong(0)
    val handTuned = explodeRows(1800L)
    assert(explodeRows(auto) <= 2 * handTuned)
    // and the no-width overload computes the same relation as the theta join
    val got = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi")
      .select("pid", "iv")
    val want = points.join(intervals, $"t" >= $"lo" && $"t" <= $"hi")
      .select("pid", "iv")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "auto-width range join diverged from the theta join")
    assert(got.count() === got.distinct().count())
  }

  test("skew probe names a collapsed time axis; healthy spread passes") {
    // the round-7 failure mode reproduced: 5000 points that SHOULD span
    // a month squeezed into ~3 minutes (micros read as nanos = ÷1000)
    val collapsed = (0L until 5000L)
      .map(i => (i, new Timestamp(1700000000000L + i * 36L))).toDF("pid", "t")
    val e = intercept[RangeJoin.DegenerateBucketDistributionException] {
      RangeJoin.probeBucketSkew(collapsed, "t", 3600L)
    }
    assert(e.getMessage.contains("degenerate bucket distribution"))
    assert(e.getMessage.contains("wrong timestamp unit"))

    // same cardinality spread over a real month: passes untouched
    val healthy = (0L until 5000L)
      .map(i => (i, new Timestamp(1700000000000L + i * 36L * 14400L))).toDF("pid", "t")
    RangeJoin.probeBucketSkew(healthy, "t", 3600L) // must not throw

    // sub-minRows inputs are exempt even when single-bucket (a tiny
    // fixture legitimately fits in one hour)
    val tiny = (0L until 50L)
      .map(i => (i, new Timestamp(1700000000000L + i))).toDF("pid", "t")
    RangeJoin.probeBucketSkew(tiny, "t", 3600L) // must not throw
  }

  test("memoized probe re-probes after the dataset is mutated at the same path") {
    // a PASSED probe is memoized per datasetKey; mutating the table at the
    // same path must yield a NEW key (mtime/length fingerprint) so the
    // post-mutation skew collapse is caught, not waved through by the memo
    val dir = "target/tmp/rangejoin_spec/mutable"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    (0L until 5000L).map(i => (i, new Timestamp(1700000000000L + i * 36L * 14400L)))
      .toDF("pid", "t").write.mode("overwrite").parquet(dir)
    val key1 = RangeJoin.datasetKey(spark, dir)
    RangeJoin.probeBucketSkewOnce(s"$key1|t|3600", spark.read.parquet(dir), "t", 3600L)
    // mutate in place: the round-7 collapsed axis lands at the same path
    (0L until 5000L).map(i => (i, new Timestamp(1700000000000L + i * 36L)))
      .toDF("pid", "t").write.mode("overwrite").parquet(dir)
    val key2 = RangeJoin.datasetKey(spark, dir)
    assert(key2 !== key1, "datasetKey must change when the dir is rewritten")
    intercept[RangeJoin.DegenerateBucketDistributionException] {
      RangeJoin.probeBucketSkewOnce(s"$key2|t|3600", spark.read.parquet(dir), "t", 3600L)
    }
  }
}
