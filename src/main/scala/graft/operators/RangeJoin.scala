package graft.operators

import org.apache.spark.sql.DataFrame
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
  * length: spans then explode to ~2 rows each, and a hot bucket holds one
  * bucket-width of points (AQE skew-join splits it further if the time
  * distribution is spiky).
  */
object RangeJoin {

  /** Join `points` to every interval of `intervals` containing them:
    * lo <= point ts <= hi (inclusive both ends).
    *
    * `points` and `intervals` must have disjoint column names apart from the
    * internal bucket key. Intervals with hi < lo are dropped (a descending
    * `sequence` would otherwise fabricate negative-width spans).
    */
  def pointInInterval(
      points: DataFrame, pointTsCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    // bucket ids from second-truncated epochs: truncation is monotone, so a
    // true match (lo <= t <= hi) always satisfies
    // bucket(lo) <= bucket(t) <= bucket(hi) — bucketing never loses a pair,
    // the exact predicate below only removes false candidates
    def bucketOf(ts: org.apache.spark.sql.Column) =
      floor(unix_timestamp(ts) / bucketSeconds)
    val pB = points.withColumn("__bucket", bucketOf(col(pointTsCol)))
    val iB = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    pB.join(iB, Seq("__bucket"))
      .filter(col(pointTsCol) >= col(loCol) && col(pointTsCol) <= col(hiCol))
      .drop("__bucket")
  }

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
    * intervals with hi < lo are dropped on both sides.
    */
  def intervalOverlap(
      left: DataFrame, lLoCol: String, lHiCol: String,
      right: DataFrame, rLoCol: String, rHiCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    def bucketOf(ts: org.apache.spark.sql.Column) =
      floor(unix_timestamp(ts) / bucketSeconds)
    def explodeSpan(df: DataFrame, lo: String, hi: String) = df
      .filter(col(hi) >= col(lo))
      .withColumn("__bucket", explode(sequence(bucketOf(col(lo)), bucketOf(col(hi)))))
    explodeSpan(left, lLoCol, lHiCol)
      .join(explodeSpan(right, rLoCol, rHiCol), Seq("__bucket"))
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol) &&
        col("__bucket") === greatest(bucketOf(col(lLoCol)), bucketOf(col(rLoCol))))
      .drop("__bucket")
  }
}
