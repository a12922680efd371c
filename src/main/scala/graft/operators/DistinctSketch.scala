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
  *
  * SINGLE-WRITER CONTRACT: the merge paths stage under fixed sibling names
  * and recover by idempotent batch REPLAY (HLL union of the same batch is
  * a no-op — spec-asserted), a design that deliberately differs from
  * [[graft.sources.ParquetDatabase]]'s multi-writer optimistic concurrency:
  * a commit gate here would wedge the crash-replay story that IS the
  * store's recovery mechanism. Exactly one writer owns a store at a time —
  * naturally satisfied by the intended owner, a single streaming query
  * ([[graft.streaming.EventStreams.distinctStoreStream]], batchId-guarded
  * against re-delivery). Two concurrent mergers would clobber each other's
  * staging and can lose one batch's fold on a shared bucket; coordinate at
  * the caller if a store must be shared.
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

  // ---- bucketed store: the growing-key-set compaction story --------------
  //
  // The flat store rewrites every key's sketch per merge — O(all keys) per
  // refresh, which stops scaling once the key set itself is large (per-user
  // sketches over a 100 TB corpus: 10⁸ keys × 4 KB = a 400 GB rewrite to
  // fold in a 1-key batch). The bucketed layout hash-partitions keys into
  // `bucket=<b>` dirs (b = pmod(xxhash64(keys), nBuckets)); a batch merge
  //   1. sketches the batch (batch-sized scan, keys-sized result),
  //   2. reads ONLY the store buckets the batch's keys hash into
  //      (partition-pruned scan — untouched buckets are never opened),
  //   3. rewrites only those buckets, each via the same retire-then-promote
  //      rename sequence as the flat store.
  // Refresh cost is O(touched-bucket keys · sketch), not O(all keys).
  //
  // Crash posture: per-bucket promotion is sequential, so a crash can leave
  // a MIX of pre- and post-merge buckets. Every bucket stays internally
  // consistent, and replaying the SAME batch converges the store: HLL union
  // is idempotent on identical inputs (re-merging a batch into a bucket
  // that already folded it changes nothing), so recovery is "re-run the
  // merge", never a rebuild — spec-asserted. Dead keys vacuum per bucket.

  private def bucketCol(keys: Seq[String], nBuckets: Int) =
    pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong))

  def buildBucketedStore(df: DataFrame, keys: Seq[String], itemCol: String, dir: String,
      nBuckets: Int = 64, lgK: Int = DefaultLgK): Unit =
    sketchByKey(df, keys, itemCol, lgK)
      .withColumn("bucket", bucketCol(keys, nBuckets))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

  /** Fold one batch into the bucketed store, rewriting only touched
    * buckets. `nBuckets` must match the build (bucket ids are recomputed
    * from the same hash).
    */
  def mergeBatchIntoBucketedStore(spark: SparkSession, batch: DataFrame, keys: Seq[String],
      itemCol: String, dir: String, nBuckets: Int = 64, lgK: Int = DefaultLgK): Unit = {
    val batchSk = sketchByKey(batch, keys, itemCol, lgK)
      .withColumn("bucket", bucketCol(keys, nBuckets))
      .localCheckpoint() // keys-sized; feeds the touched-set and the merge
    // ≤ nBuckets values — metadata-sized by construction
    val touched = batchSk.select("bucket").distinct().collect()
      .map(_.getLong(0)).sorted
    val existing = spark.read.parquet(dir)
      .filter(col("bucket").isin(touched: _*))
      .select((keys :+ "sketch" :+ "bucket").map(col): _*)
    val merged = existing
      .unionByName(batchSk.select((keys :+ "sketch" :+ "bucket").map(col): _*))
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))
    val tmpRoot = new org.apache.hadoop.fs.Path(dir + "__sketch_tmp")
    val fs = tmpRoot.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(tmpRoot, true)
    merged.write.partitionBy("bucket").parquet(tmpRoot.toString)
    touched.foreach { b =>
      val live = new org.apache.hadoop.fs.Path(dir, s"bucket=$b")
      val tmp = new org.apache.hadoop.fs.Path(tmpRoot, s"bucket=$b")
      // retired copy lives OUTSIDE the store root: a crash-left sibling
      // named bucket=N__old inside it would parse as another partition
      val old = new org.apache.hadoop.fs.Path(dir + s"__old_bucket_$b")
      if (!fs.exists(tmp))
        throw new java.io.IOException(s"merged write produced no dir for touched bucket $b")
      fs.delete(old, true)
      if (fs.exists(live) && !fs.rename(live, old))
        throw new java.io.IOException(s"bucket retire failed: $live -> $old")
      if (!fs.rename(tmp, live))
        throw new java.io.IOException(
          s"bucket promote failed: $tmp -> $live (pre-merge copy at $old)")
      fs.delete(old, true)
    }
    fs.delete(tmpRoot, true)
  }
}
