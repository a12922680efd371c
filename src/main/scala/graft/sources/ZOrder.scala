package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-column clustering — the layout lever for
  * tables queried by MORE THAN ONE high-cardinality column.
  *
  * `normalize(sortBy = k)` gives perfect skipping on `k` and none on any
  * other column (the second sort key's per-file range is the full domain
  * inside each leading-key run). Interleaving the bits of every key's
  * equi-depth rank instead gives each file a small HYPER-RECTANGLE of the value
  * space: a predicate on ANY subset of the z-columns prunes files by footer
  * min/max. At 100 TB this is the difference between "fast on the one
  * blessed key" and "fast on each of the 2-3 keys analysts actually filter
  * by" without storing the table twice.
  *
  * Design (all Spark-first, no driver loops over data):
  *  1. per column: (2^bits - 1) approximate quantile boundaries in ONE pass
  *     (`df.stat.approxQuantile` — GK sketch, driver holds only the
  *     boundary array, ≤ 2^bits doubles per column);
  *  2. per row: equi-depth rank via the codegen'd binary-search expression
  *     [[graft.functions.QuantileBucket]] — equal row mass per bucket, so
  *     value skew cannot collapse the curve (a min/max linear scale would);
  *  3. interleave rank bits into one long z-value (pure bit-op Column
  *     expressions, whole-stage codegen like the simHash bit pack);
  *  4. range-partition + sort by z — contiguous curve intervals per file,
  *     which are bounded-volume rectangles in value space.
  */
object ZOrder {
  // Scope: numeric z-columns only (quantile_bucket ranks primitives). A
  // string key would need an order-preserving numeric surrogate to benefit;
  // hashing one destroys exactly the locality the curve exists to create.

  /** Interleave the low `bits` bits of each (non-negative int) column:
    * result bit `i * cols.size + j` = bit `i` of `cols(j)`. With k columns
    * of b bits each, the z-value uses k·b bits (must fit a long's 63).
    */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "interleaveBits needs at least one column")
    require(cols.size * bits <= 63, s"${cols.size} cols × $bits bits exceeds a long")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(1L), i * cols.size + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** The z-value column for `df` over `zCols`: equi-depth bucket ranks
    * (computed from one approxQuantile pass over `df`) bit-interleaved into
    * a long. Null values rank into bucket 0 (nulls cluster at the curve's
    * origin rather than poisoning the whole file's range).
    *
    * @param bits  bits per column; 2^bits buckets per dimension. File-level
    *              clustering needs only ~#files × O(1) distinct z-cells, so
    *              8 (256 buckets/dim) covers tables into the tens of
    *              thousands of files.
    * @param relErr approxQuantile relative error; boundary wobble only
    *              shifts bucket edges slightly (layout quality, never
    *              correctness — scans consult real footer stats, not the
    *              quantiles). The default matches the resolution the
    *              bucketing can even express (2^-8 ≈ 0.004): a tighter
    *              sketch costs real scan time and buys nothing below the
    *              bucket width.
    */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int = 8,
             relErr: Double = 0.004): Column = {
    require(zCols.nonEmpty, "zValue needs at least one column")
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    // one distributed pass computes every column's boundary sketch
    val allSplits = df.stat.approxQuantile(
      zCols.toArray, probs, relErr)
    val ranks = zCols.zip(allSplits).map { case (c, splits) =>
      coalesce(
        call_function("quantile_bucket",
          col(s"`$c`").cast("double"), lit(splits.distinct.sorted)),
        lit(0))
    }
    interleaveBits(ranks, bits)
  }
}
