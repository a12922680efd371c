package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heavy hitters — the most frequent items of a corpus/stream, exact and
  * sketched.
  *
  * The exact form is two map-side-combinable aggregations and never sorts
  * the full key space: count per item (one shuffle, partial aggregation
  * collapses per-partition duplicates), then the bounded-buffer
  * [[graft.functions.Aggregators.TopKAgg]] whose partial states ship at
  * most k rows per partition to a single tiny merge — a global
  * `ORDER BY n DESC LIMIT k` without the global sort.
  *
  * The count-min form never holds per-item state at all: each row explodes
  * to `depth` (row, cell) coordinates and aggregates into a depth×width
  * counter matrix. The explode happens map-side and partial aggregation
  * collapses it to ≤ depth·width rows per partition BEFORE the exchange,
  * so shuffle volume is bounded by partitions × depth × width no matter how
  * many rows (or distinct items) flow through — the classical sketch
  * guarantee (est ≥ true; est ≤ true + (e/width)·N w.h.p.) in exchange for
  * per-item exactness. Estimation joins candidates back on the ≤
  * depth·width-row matrix (broadcast-sized by construction) and takes the
  * per-item MIN over the depth rows.
  */
object HeavyHitters {

  /** Exact global top-k items by frequency; ties break toward the smaller
    * item id, so the result is fully deterministic (hash-comparable to the
    * SQL row_number formulation).
    *
    * Output: rank (1..k), item, n.
    */
  def exact(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k > 0, s"HeavyHitters.exact: k must be positive, got $k")
    val topk = udaf(new graft.functions.Aggregators.TopKAgg(k))
    df.groupBy(col(itemCol))
      .agg(count(lit(1)).as("n"))
      .agg(topk(col("n"), col(itemCol)).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("col._2").as(itemCol), col("col._1").as("n"))
  }

  private def cell(item: Column, d: Int, width: Int): Column =
    pmod(xxhash64(item, lit(d)), lit(width))

  /** Count-min sketch of an item column: a DataFrame of (d, idx, cnt) —
    * the non-zero cells of the depth×width counter matrix. Deterministic
    * (xxhash64 with the row index as seed), mergeable (sketches of two
    * corpora add cell-wise), and at most depth·width rows regardless of
    * input size.
    */
  def countMinSketch(df: DataFrame, itemCol: String,
      depth: Int = 5, width: Int = 1024): DataFrame = {
    require(depth > 0 && width > 0,
      s"HeavyHitters.countMinSketch: depth/width must be positive, got $depth×$width")
    df.select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), cell(col(itemCol), d, width).as("idx"))): _*)).as("h"))
      .groupBy(col("h.d").as("d"), col("h.idx").as("idx"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Space-Saving summary fold — the bounded-memory streaming heavy-hitter
    * kernel (Metwally et al.): at most `m` tracked (item, count, err)
    * triples. A tracked item increments; an untracked one, with the summary
    * full, REPLACES the minimum-count entry, inheriting its count as both
    * floor and error bound. Guarantees after N insertions: every tracked
    * count overestimates the true frequency by at most its `err` ≤ N/m, and
    * any item with true frequency > N/m is tracked. With `m` at least the
    * distinct-item count nothing is ever evicted and the summary is exact.
    *
    * Deterministic: eviction breaks count ties toward the LARGEST item id,
    * the returned summary sorts by (count desc, item asc). Pure function of
    * (init, insertion order) — the streaming state transition.
    */
  def spaceSavingFold(init: Seq[(Long, Long, Long)], xs: Iterator[Long],
      m: Int): Seq[(Long, Long, Long)] = {
    require(m > 0, s"spaceSavingFold: m must be positive, got $m")
    val cnt = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    init.foreach { case (i, c, e) => cnt(i) = (c, e) }
    xs.foreach { x =>
      cnt.get(x) match {
        case Some((c, e)) => cnt(x) = (c + 1, e)
        case None if cnt.size < m => cnt(x) = (1L, 0L)
        case None =>
          val (mi, (mc, _)) = cnt.minBy { case (i, (c, _)) => (c, -i) }
          cnt -= mi
          cnt(x) = (mc + 1, mc)
      }
    }
    cnt.iterator.map { case (i, (c, e)) => (i, c, e) }.toSeq
      .sortBy { case (i, c, _) => (-c, i) }
  }

  /** Point-estimate item frequencies from a sketch built with the same
    * (depth, width): per item, min over the depth rows of the addressed
    * cell. `candidates` must carry `itemCol`; output appends `est`.
    * The sketch side is ≤ depth·width rows — broadcast it.
    */
  def estimate(candidates: DataFrame, sketch: DataFrame, itemCol: String,
      depth: Int = 5, width: Int = 1024): DataFrame = {
    val hashed = candidates.select(col(itemCol),
      explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), cell(col(itemCol), d, width).as("idx"))): _*)).as("h"))
      .select(col(itemCol), col("h.d").as("d"), col("h.idx").as("idx"))
    hashed.join(broadcast(sketch), Seq("d", "idx"), "left")
      // an unhit cell is a zero counter, not an unknown
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(col(itemCol))
      .agg(min(col("cnt")).as("est"))
  }
}
