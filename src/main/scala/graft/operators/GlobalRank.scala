package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no partition key moves the ENTIRE input into
  * one partition — the classic scale killer for global row_number/ntile
  * (Spark itself warns "No Partition Defined for Window operation"). The
  * scalable equivalent is the standard two-pass offset scheme:
  *
  *   1. range-partition the input on the order key — partition i holds a
  *      contiguous key range, all ranges in partition-id order (Spark's
  *      RangePartitioning contract), each partition ~|input|/n rows;
  *   2. rank WITHIN each partition (a distributed window keyed on the
  *      partition id);
  *   3. compute per-partition row counts (n tiny rows), prefix-sum them
  *      into offsets (a single-partition window over n ROWS, not the
  *      data), and broadcast-join the offset back:
  *      global rank = partition offset + local rank.
  *
  * Only metadata (one row per partition) ever converges to one task; the
  * data path sees one range shuffle + one partitioned window — the same
  * shape at 15 k rows and at 100 TB.
  *
  * Ties: rows with equal order keys may straddle a range boundary, in
  * which case their relative order is partition-assignment-dependent —
  * exactly row_number's usual arbitrary-within-ties behavior. Callers
  * needing full determinism append a unique tiebreak column, as with any
  * row_number.
  */
object GlobalRank {

  /** Global 1-based row_number over `orderCols`, as column `out`. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column], out: String = "rn",
      numPartitions: Int = 0): DataFrame =
    withRank(df, orderCols, numPartitions)
      .withColumn(out, col("__offset") + col("__local"))
      .drop("__pid", "__local", "__offset", "__total")

  /** Exact global ntile(k) over `orderCols`, as column `out` — SQL ntile
    * semantics: with T rows, the first T mod k buckets hold ceil(T/k)
    * rows, the rest floor(T/k).
    */
  def globalNtile(df: DataFrame, orderCols: Seq[Column], k: Int, out: String = "bucket",
      numPartitions: Int = 0): DataFrame = {
    require(k > 0, s"GlobalRank.globalNtile: k must be positive, got $k")
    // Integer division below rides double `/` then truncates: exact for
    // any rank under ~4.5e15 (quotient*divisor < 2^52 keeps the IEEE
    // quotient within the truncation-safe band) — beyond every practical
    // row count, asserted here so the boundary is loud, not silent.
    val r = col("__offset") + col("__local") // global rank, 1-based
    val q = col("__total") divide k cast "long"
    val m = col("__total") % k
    val big = (q + 1) * m // rows living in the (q+1)-sized buckets
    val bucket = when(col("__total") < k, r) // degenerate: fewer rows than buckets
      .otherwise(
        when(r <= big, (r - 1).divide(q + 1).cast("long") + 1)
          .otherwise(m + (r - big - 1).divide(q).cast("long") + 1))
    withRank(df, orderCols, numPartitions)
      .withColumn(out, bucket.cast("int"))
      .drop("__pid", "__local", "__offset", "__total")
  }

  /** Both consumers of `parted` (the counts branch and the rank branch)
    * build the same range exchange; Spark's exchange reuse normally dedups
    * them into ONE physical exchange, so both branches see identical
    * partition bounds. Range bounds are SAMPLED with an rdd.id-dependent
    * seed, so with reuse disabled (or a refactor that de-canonicalizes the
    * branches) the two exchanges could pick different bounds. Correctness
    * here only requires the counts branch's size VECTOR to match the rank
    * branch's actual partition sizes (offsets are a pure function of sizes,
    * and any valid range partitioning orders partitions globally), and any
    * size-vector mismatch must push some partition's local rank above its
    * counted size — both vectors sum to the same total — so the per-row
    * `__local <= __cnt` guard below catches EVERY divergent-bounds scenario
    * loudly (raise_error) instead of returning silently wrong ranks.
    * GlobalRankSpec exercises the guard with exchange reuse disabled.
    */
  private def withRank(df: DataFrame, orderCols: Seq[Column], numPartitions: Int): DataFrame = {
    require(orderCols.nonEmpty, "GlobalRank: orderCols must be non-empty")
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(n, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    // one row per partition — metadata-sized no matter the input
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val wAll = Window.orderBy("__pid")
    val offsets = counts
      .withColumn("__offset",
        coalesce(sum("__cnt").over(wAll.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__total",
        sum("__cnt").over(wAll.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__pid", "__cnt", "__offset", "__total")
    val wLocal = Window.partitionBy("__pid").orderBy(orderCols: _*)
    parted
      .withColumn("__local", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("__local",
        when(col("__local") <= col("__cnt"), col("__local"))
          .otherwise(raise_error(concat(
            lit("GlobalRank: partition "), col("__pid").cast("string"),
            lit(" holds more rows than its counted size "), col("__cnt").cast("string"),
            lit(" — the counts and rank branches saw different range bounds " +
              "(exchange reuse defeated?)")))))
      .drop("__cnt")
  }
}
