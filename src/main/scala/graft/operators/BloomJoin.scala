package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — cut the BIG side of a selective join
  * down to (matches + ε) BEFORE its shuffle.
  *
  * A plain `large.join(small, key)` shuffles every large row; when `small`
  * is selective (a date slice, one tenant, an eval set) almost all of that
  * shuffle is rows that match nothing. Building a Bloom filter over the
  * small side's keys (one aggregate; the sketch is KB-MB regardless of row
  * count) and filtering `large` by `might_contain` first drops non-matching
  * rows AT THE SCAN, so the join's exchange moves ~matching rows only. At
  * 100 TB this is the difference between shuffling 100 TB and shuffling the
  * few GB that actually join. False positives only cost shuffle bytes (the
  * exact join still runs — results are identical to the plain join); false
  * negatives cannot happen.
  *
  * This is Spark's own runtime-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the expressions
  * behind `spark.sql.optimizer.runtime.bloomFilter`), driven explicitly so
  * it applies when the optimizer's cost heuristics would not fire and under
  * plain parquet reads. Both expressions operate on `xxhash64(key)` longs,
  * the same keying the runtime filter injects.
  *
  * The sketch itself is collected to the driver once and inlined as a
  * binary literal: `might_contain` requires a constant/scalar-subquery
  * bloom side, and the literal is bounded by `numBits/8` bytes by
  * construction (default ≈ 120 KB at 100k items / 1% fpp) — the same
  * bounded-collect class as the k-means seed sample, never data-sized.
  */
object BloomJoin {

  private def registered(df: DataFrame): Unit =
    graft.functions.GraftFunctions.register(df.sparkSession)

  /** Ceiling on sketch size (bits) — Spark's own runtime-filter cap (8 MiB
    * serialized). The sketch ships to every task as a literal, so an
    * unbounded build side would trade the shuffle it saves for plan/closure
    * bloat. Beyond this, the build side is no longer "small": use a plain
    * shuffle semi-join, which is what the exact join does anyway.
    */
  val MaxNumBits: Long = 67108864L

  /** Optimal bit count for `n` items at false-positive rate `fpp`:
    * m = -n·ln(fpp)/ln(2)². Fails loudly past [[MaxNumBits]] (≈ 7M items at
    * 1% fpp) rather than silently shipping a data-sized literal.
    */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val bits = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong.max(64L)
    require(bits <= MaxNumBits,
      s"bloom sketch for $n items at fpp=$fpp needs $bits bits > cap $MaxNumBits " +
        "(the build side is not small enough for semi-join reduction; " +
        "use the plain join, or raise fpp)")
    bits
  }

  /** Serialized Bloom filter over `keys`' key column (distributed
    * aggregate; only the sketch reaches the driver).
    */
  def buildBloom(keys: DataFrame, keyCol: Column, expectedItems: Long,
                 fpp: Double = 0.01): Array[Byte] = {
    registered(keys)
    val bits = optimalNumBits(expectedItems, fpp)
    keys.agg(call_function("bloom_agg", xxhash64(keyCol),
        lit(expectedItems), lit(bits)).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
  }

  /** `large` filtered to rows whose key MIGHT be in the bloom — no false
    * negatives, ~fpp false positives. The filter is a codegen'd expression
    * evaluated at the scan, before any exchange.
    */
  def prefilter(large: DataFrame, keyCol: Column, bloom: Array[Byte]): DataFrame = {
    registered(large)
    large.filter(call_function("bloom_might_contain", lit(bloom), xxhash64(keyCol)))
  }

  /** Equivalent of `large.join(small, largeKey === smallKey, joinType)` with
    * the large side bloom-reduced before its shuffle. `expectedItems` is an
    * UPPER bound on small's distinct keys (overestimating only wastes
    * sketch bits; underestimating raises fpp, never correctness).
    *
    * Inner and left-semi joins only: for outer joins the dropped
    * non-matching rows would be part of the result.
    */
  def reducedJoin(large: DataFrame, small: DataFrame, largeKey: String,
                  smallKey: String, expectedItems: Long, fpp: Double = 0.01,
                  joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi").contains(joinType.toLowerCase),
      s"bloom reduction drops non-matching large rows — unsound for $joinType joins")
    val bloom = buildBloom(small, col(s"`$smallKey`"), expectedItems, fpp)
    prefilter(large, col(s"`$largeKey`"), bloom)
      .join(small, col(s"`$largeKey`") === col(s"`$smallKey`"), joinType)
  }
}
