package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — the operator Spark lacks natively.
  *
  * A point-in-interval join with NO equi-key plans as
  * BroadcastNestedLoopJoin (or CartesianProduct + filter): O(|points| ×
  * |intervals|) comparisons, which dies at 100 TB the moment the interval
  * side outgrows a broadcast. This operator manufactures the equi-key the
  * data doesn't have: time is cut into fixed-width buckets, each point maps
  * to exactly ONE bucket, each interval is exploded to EVERY bucket it
  * overlaps, and the join becomes a shuffled equi-join on the bucket id
  * followed by the exact range filter.
  *
  * Cost model: O(|points| + |intervals| · avg_span_buckets + true_matches)
  * rows through the shuffle, instead of the nested-loop product. Each true
  * (point, interval) pair meets in exactly one bucket — the point's — so no
  * post-join dedup is needed. Pick `bucketSeconds` near the typical interval
  * length (or omit it: the no-width overloads measure the median span with a
  * one-pass quantile sketch and pick it for you): spans then explode to ~2
  * rows each, and a hot bucket holds one bucket-width of points (AQE
  * skew-join splits it further if the time distribution is spiky).
  *
  * Dirty-data guard: one open-ended sentinel interval (`hi = 9999-12-31`,
  * the classic SCD pattern) at `bucketSeconds = 3600` would explode to a
  * ~70-million-element bucket array — a single bad row OOMing an executor.
  * Every explode is therefore bounded by `maxSpanBuckets` (default 10,000 —
  * three orders of magnitude past the ~2-bucket sweet spot, far below array
  * and memory limits) and fails LOUDLY with the offending interval in the
  * message rather than dying opaquely mid-shuffle.
  */
object RangeJoin {

  /** Bucket-count bound per exploded interval. At the documented sweet spot
    * (bucketSeconds ≈ typical span) real intervals explode to ~2 rows; a
    * span 10,000× wider is either a sentinel/dirty row or a badly-picked
    * width, and both deserve an error naming the row, not an executor OOM.
    */
  val DefaultMaxSpanBuckets: Long = 10000L

  private def bucketOf(ts: Column, bucketSeconds: Long): Column =
    floor(unix_timestamp(ts) / bucketSeconds)

  /** `sequence(bucket(lo), bucket(hi))` with a loud per-row span bound.
    *
    * The guard lives INSIDE the sequence's upper bound (not a separate
    * assert column Catalyst could prune away): rows within the bound take
    * the `when` branch untouched; an over-span row routes the upper bound
    * through `raise_error`, so the task fails with the offending interval,
    * its bucket count, and the remedy in the message.
    */
  private def boundedBucketSeq(
      lo: Column, hi: Column, bucketSeconds: Long, maxSpanBuckets: Long): Column = {
    val loB = bucketOf(lo, bucketSeconds)
    val hiB = bucketOf(hi, bucketSeconds)
    val span = hiB - loB + lit(1L)
    sequence(
      loB,
      when(span <= maxSpanBuckets, hiB).otherwise(raise_error(concat(
        lit("RangeJoin: interval ["), lo.cast("string"), lit(", "), hi.cast("string"),
        lit("] spans "), span.cast("string"),
        lit(s" buckets at bucketSeconds=$bucketSeconds, exceeding maxSpanBuckets=" +
          s"$maxSpanBuckets — widen bucketSeconds, raise maxSpanBuckets, or drop/clamp " +
          "the offending interval (open-ended sentinel hi values are the usual cause)")))))
  }

  /** Named failure for a bucket distribution that would degenerate the
    * equi-join: nearly every row hashing to one bucket key is a full-table
    * hot partition — the round-7 collapsed-time failure mode, where a
    * silent unit drift squeezed 30 days into ~3 buckets and turned an
    * O(points + intervals·2) plan into an effectively quadratic one.
    */
  final class DegenerateBucketDistributionException(msg: String)
    extends RuntimeException(msg)

  /** Optional pre-join skew probe: fails loudly (with the share and the
    * bucket count in the message) when more than `maxTopBucketShare` of
    * rows land in a single bucket.
    *
    * Cost: one map-side-combined groupBy over ONE column of the probed
    * side — output is bucket-count-sized, so the driver-side top-1 is a
    * tiny agg. Off by default inside the operator (a 100 TB caller may not
    * want an extra pass); the engine's event-range queries turn it on
    * because a degenerate distribution there means the DATA drifted, and a
    * named setup error beats a 200× slower wrong answer mid-bench.
    *
    * `minRows` skips tiny inputs where one bucket legitimately dominates
    * (a 50-row fixture can live in one hour).
    */
  def probeBucketSkew(
      df: DataFrame, tsCol: String, bucketSeconds: Long,
      maxTopBucketShare: Double = 0.5, minRows: Long = 1000L): Unit = {
    val row = df.select(bucketOf(col(tsCol), bucketSeconds).as("__b"))
      .groupBy("__b").count()
      .agg(sum("count").as("rows"), max("count").as("top"),
        count(lit(1)).as("buckets"))
      .collect()(0)
    if (!row.isNullAt(0)) {
      val (rows, top, buckets) = (row.getLong(0), row.getLong(1), row.getLong(2))
      val share = top.toDouble / rows
      if (rows >= minRows && share > maxTopBucketShare)
        throw new DegenerateBucketDistributionException(
          f"RangeJoin: degenerate bucket distribution on '$tsCol' — top bucket holds " +
            f"$top of $rows rows (${share * 100}%.1f%%, threshold ${maxTopBucketShare * 100}%.0f%%) " +
            f"across $buckets bucket(s) at bucketSeconds=$bucketSeconds. The time axis has " +
            "collapsed (wrong timestamp unit?) or the bucket width dwarfs the data's range " +
            "— fix the input's encoding or pass a narrower bucketSeconds")
    }
  }

  private val probeOk = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** Session-memo key component for an ON-DISK dataset: the path plus its
    * (mtime, length) fingerprint, so a dataset mutated or re-staged at the
    * same path in-session yields a NEW key and re-probes — a stale PASS
    * must not wave through a post-mutation skew collapse. One FS metadata
    * call; directory mtime advances whenever children are created or
    * removed (every upsert/re-stage rewrites part files).
    */
  def datasetKey(spark: org.apache.spark.sql.SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val st = p.getFileSystem(spark.sessionState.newHadoopConf()).getFileStatus(p)
    s"$path@${st.getModificationTime}:${st.getLen}"
  }

  /** [[probeBucketSkew]] memoized on a caller-supplied key
    * ([[datasetKey]] + probed column + width): a PASSED probe of an
    * unchanged input never re-runs in the session, so repeated query
    * invocations (bench rounds, repeated plans over the same sf dir) pay
    * the one-column pass once. Failures are not cached — a throwing probe
    * re-probes (and re-throws) until the data is fixed.
    */
  def probeBucketSkewOnce(key: String, df: DataFrame, tsCol: String,
      bucketSeconds: Long, maxTopBucketShare: Double = 0.5, minRows: Long = 1000L): Unit =
    if (!probeOk.contains(key)) {
      probeBucketSkew(df, tsCol, bucketSeconds, maxTopBucketShare, minRows)
      probeOk.put(key, true)
    }

  /** Median interval length in seconds — the cost-model-optimal bucket width.
    *
    * One-pass `approxQuantile` (a driver-merged quantile sketch with
    * map-side combine — a cheap aggregate even on a 100 TB interval side,
    * and the join itself re-reads that side anyway). Malformed (hi < lo)
    * intervals are excluded, matching the join's own filter. Falls back to
    * 3600 s on an empty side; never returns below 1 s.
    */
  def autoBucketSeconds(intervals: DataFrame, loCol: String, hiCol: String): Long = {
    val spans = intervals
      .select((unix_timestamp(col(hiCol)) - unix_timestamp(col(loCol)))
        .cast("double").as("__span"))
      .filter(col("__span") >= 0)
    val med = spans.stat.approxQuantile("__span", Array(0.5), 0.02)
      .headOption.getOrElse(3600.0)
    math.max(1L, med.toLong)
  }

  /** Join `points` to every interval of `intervals` containing them:
    * lo <= point ts <= hi (inclusive both ends).
    *
    * `points` and `intervals` must have disjoint column names apart from the
    * internal bucket key. Intervals with hi < lo are dropped (a descending
    * `sequence` would otherwise fabricate negative-width spans). Any
    * interval spanning more than `maxSpanBuckets` buckets fails the job
    * loudly (see the class doc's dirty-data guard).
    */
  def pointInInterval(
      points: DataFrame, pointTsCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketSeconds: Long,
      maxSpanBuckets: Long = DefaultMaxSpanBuckets): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(maxSpanBuckets > 0, s"maxSpanBuckets must be positive, got $maxSpanBuckets")
    // bucket ids from second-truncated epochs: truncation is monotone, so a
    // true match (lo <= t <= hi) always satisfies
    // bucket(lo) <= bucket(t) <= bucket(hi) — bucketing never loses a pair,
    // the exact predicate below only removes false candidates
    val pB = points.withColumn("__bucket", bucketOf(col(pointTsCol), bucketSeconds))
    val iB = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__bucket",
        explode(boundedBucketSeq(col(loCol), col(hiCol), bucketSeconds, maxSpanBuckets)))
    pB.join(iB, Seq("__bucket"))
      .filter(col(pointTsCol) >= col(loCol) && col(pointTsCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** [[pointInInterval]] with the bucket width auto-picked from the interval
    * side's median span (see [[autoBucketSeconds]]).
    */
  def pointInInterval(
      points: DataFrame, pointTsCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame =
    pointInInterval(points, pointTsCol, intervals, loCol, hiCol,
      autoBucketSeconds(intervals, loCol, hiCol))

  /** Join `left` to every interval of `right` it overlaps:
    * left.lo <= right.hi AND right.lo <= left.hi (inclusive). The
    * interval×interval generalization of [[pointInInterval]] — the shape
    * Catalyst can only nested-loop.
    *
    * Both sides explode to every bucket they span, so an overlapping pair
    * co-occurs in EVERY bucket of the spans' intersection. Emitting it once
    * per co-occurrence would need a distinct() over the (potentially huge)
    * join output; instead each pair is kept only in the single bucket
    * `greatest(bucket(left.lo), bucket(right.lo))`. That bucket always lies
    * in the intersection when the intervals truly overlap (truncation is
    * monotone: lo <= other.hi bucket-wise on both sides), so the output is
    * exact with no dedup pass. Column names must be disjoint across sides;
    * intervals with hi < lo are dropped on both sides; spans past
    * `maxSpanBuckets` buckets fail loudly on either side.
    */
  def intervalOverlap(
      left: DataFrame, lLoCol: String, lHiCol: String,
      right: DataFrame, rLoCol: String, rHiCol: String,
      bucketSeconds: Long,
      maxSpanBuckets: Long = DefaultMaxSpanBuckets): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(maxSpanBuckets > 0, s"maxSpanBuckets must be positive, got $maxSpanBuckets")
    def explodeSpan(df: DataFrame, lo: String, hi: String) = df
      .filter(col(hi) >= col(lo))
      .withColumn("__bucket",
        explode(boundedBucketSeq(col(lo), col(hi), bucketSeconds, maxSpanBuckets)))
    explodeSpan(left, lLoCol, lHiCol)
      .join(explodeSpan(right, rLoCol, rHiCol), Seq("__bucket"))
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol) &&
        col("__bucket") === greatest(
          bucketOf(col(lLoCol), bucketSeconds), bucketOf(col(rLoCol), bucketSeconds)))
      .drop("__bucket")
  }

  /** No-equi-key as-of join: for each `left` row, the single latest `right`
    * row with `right.ts <= left.ts`, looking back at most `horizonSeconds`.
    *
    * The classic as-of (latest quote before each trade, latest click before
    * each purchase) has an unbounded lookback Catalyst can only nested-loop;
    * bounding it by a horizon makes it bucketable: each left row becomes the
    * interval `[ts - horizon, ts]`, candidates arrive via [[pointInInterval]]
    * (a shuffled equi-join on the bucket id), and one window per left key
    * keeps the latest. The horizon bound loses nothing when a predecessor
    * exists within it — the globally-latest predecessor IS the within-horizon
    * one — and drops only left rows whose nearest predecessor is older than
    * the horizon (inner-join semantics; at 100 TB an explicit staleness bound
    * is the correct default anyway).
    *
    * @param leftKeyCol   unique key of `left` (the window partition; a
    *                     duplicated key would collapse two left rows into one)
    * @param tieBreakDesc extra `right` columns ordered DESC after the
    *                     timestamp, making equal-timestamp winners
    *                     deterministic
    * @param bucketSeconds bucket width for the underlying range join;
    *                      defaults to the horizon itself (spans then explode
    *                      to ~2 bucket rows each — the cost-model optimum)
    */
  def asOf(
      left: DataFrame, leftTsCol: String, leftKeyCol: String,
      right: DataFrame, rightTsCol: String,
      horizonSeconds: Long,
      tieBreakDesc: Seq[String] = Nil,
      bucketSeconds: Long = 0L): DataFrame = {
    require(horizonSeconds > 0, s"horizonSeconds must be positive, got $horizonSeconds")
    val width = if (bucketSeconds > 0) bucketSeconds else horizonSeconds
    val intervals = left.withColumn("__lo",
      col(leftTsCol) - expr(s"INTERVAL $horizonSeconds SECOND"))
    val candidates = pointInInterval(right, rightTsCol, intervals, "__lo", leftTsCol, width)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(leftKeyCol))
      .orderBy(col(rightTsCol).desc +: tieBreakDesc.map(c => col(c).desc): _*)
    candidates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__lo")
  }

  /** [[intervalOverlap]] with the bucket width auto-picked as the LARGER of
    * the two sides' median spans: each side's typical interval then explodes
    * to at most ~2 bucket rows (the wider side defines the grid; the
    * narrower side can only explode less), which is the cost-model optimum
    * the scaladoc tells callers to aim for by hand.
    */
  def intervalOverlap(
      left: DataFrame, lLoCol: String, lHiCol: String,
      right: DataFrame, rLoCol: String, rHiCol: String): DataFrame =
    intervalOverlap(left, lLoCol, lHiCol, right, rLoCol, rHiCol,
      math.max(autoBucketSeconds(left, lLoCol, lHiCol),
        autoBucketSeconds(right, rLoCol, rHiCol)))
}
