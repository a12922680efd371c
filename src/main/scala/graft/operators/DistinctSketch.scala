package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental distinct counting via Datasketches HLL — the streaming-
  * metrics pattern: recomputing `count(DISTINCT x)` over the full corpus
  * per batch is a full shuffle of history; a per-key HLL sketch store
  * merges each new batch in O(keys · sketch bytes) instead.
  *
  * Spark-first: the sketches are built/merged/read with the engine's own
  * codegen'd Datasketches aggregates (`hll_sketch_agg` / `hll_union_agg`
  * / `hll_sketch_estimate`) — no UDFs. Merging never widens the error
  * class: a union of same-lgK sketches carries the classical
  * ~1.04/sqrt(2^lgK) relative standard error vs exact, the same as a
  * single pass (estimates may differ in the last counts between the two
  * paths — Datasketches' sparse→dense promotion happens at different
  * points — but both stay inside the bound; spec-asserted).
  *
  * The persisted store is one parquet row per key — metadata-sized
  * relative to the corpus — and rewrites via a retire-then-promote rename
  * sequence that keeps a complete copy on disk at every step (see
  * [[mergeBatchIntoStore]] for the crash-window analysis).
  */
object DistinctSketch {

  val DefaultLgK = 12 // ~1.6% rse, 2^12 registers ≈ 4 KB per key

  /** One HLL sketch per key group over `itemCol`. */
  def sketchByKey(df: DataFrame, keys: Seq[String], itemCol: String,
      lgK: Int = DefaultLgK): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(itemCol), lit(lgK)).as("sketch"))

  /** Merge two same-shape sketch tables key-wise (missing keys pass through). */
  def mergeSketchTables(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))

  /** Per-key distinct estimates from a sketch table. */
  def estimates(sketches: DataFrame, out: String = "distinct_est"): DataFrame =
    sketches.withColumn(out, hll_sketch_estimate(col("sketch")))

  def buildStore(df: DataFrame, keys: Seq[String], itemCol: String, dir: String,
      lgK: Int = DefaultLgK): Unit =
    sketchByKey(df, keys, itemCol, lgK).write.mode("overwrite").parquet(dir)

  /** Fold one new batch into the persisted store: sketch the batch, union
    * with the stored sketches, swap via retire-then-promote. Cost is the
    * batch scan + a keys-sized merge — history is never re-read beyond its
    * sketches.
    *
    * Swap protocol (each step is one FS rename, but the SEQUENCE is not
    * atomic): write `dir__sketch_tmp`, rename live aside to `dir__old`,
    * promote tmp → live, delete the retired dir. A crash between the
    * retire and promote steps leaves no live dir but BOTH complete copies
    * on disk — `dir__old` (pre-merge) and `dir__sketch_tmp` (post-merge) —
    * so recovery is a rename of either, never a rebuild; a crash anywhere
    * else leaves the live dir intact. The old delete-then-rename order had
    * a window with only the tmp copy under a non-live name.
    */
  def mergeBatchIntoStore(spark: SparkSession, batch: DataFrame, keys: Seq[String],
      itemCol: String, dir: String, lgK: Int = DefaultLgK): Unit = {
    val merged = mergeSketchTables(
      spark.read.parquet(dir), sketchByKey(batch, keys, itemCol, lgK), keys)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__sketch_tmp")
    val old = new org.apache.hadoop.fs.Path(dir + "__old")
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(old, true) // debris from an earlier crash
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"sketch store retire failed: $live -> $old")
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(
        s"sketch store promote failed: $tmp -> $live (pre-merge copy intact at $old)")
    fs.delete(old, true)
  }

  def readEstimates(spark: SparkSession, dir: String, out: String = "distinct_est"): DataFrame =
    estimates(spark.read.parquet(dir), out).drop("sketch")
}
