package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-writer stress drills for the PERSISTED SKETCH STORES (r10 verdict
  * task 5): the table store got optimistic concurrency in round 10
  * (ConcurrentWriterSpec); these extend the same promise — every collision
  * is loud, the store stays readable, a retry converges with nothing
  * silently lost — to the MinHash signature store, the IVF index, and the
  * bucketed HLL store. Concurrent ingest ticks are the 100 TB norm.
  */
class ConcurrentSketchWriterSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val dir = s"target/tmp/sketch_ccw/$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (fs.exists(p.getParent))
      fs.listStatus(p.getParent).map(_.getPath)
        .filter(s => s.getName == name || s.getName.startsWith(name + "__"))
        .foreach(fs.delete(_, true))
    dir
  }

  private def retrying(maxAttempts: Int = 600)(op: => Unit): Unit = {
    // patient by design: the competing writer legitimately holds the store
    // mutex for whole multi-second Spark jobs, so the loser must out-wait
    // several full appends, not just a rename window
    var attempt = 0
    var done = false
    while (!done) {
      try { op; done = true }
      catch {
        case e @ (_: java.util.ConcurrentModificationException | _: java.io.IOException
                  | _: org.apache.spark.SparkException
                  | _: org.apache.spark.sql.AnalysisException) =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
          Thread.sleep(math.min(200L, 10L * attempt))
      }
    }
  }

  private def inThreads(work: Seq[() => Unit]): Unit = {
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = work.map(w => new Thread(() => {
      try w() catch { case t: Throwable => errors.add(t) }
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, errors.toArray.mkString("; "))
  }

  test("MinHash store: concurrent appends both commit; compaction is mutexed and recoverable") {
    val dir = fresh("mh2w")
    def doc(i: Int) = (i.toLong, s"unique document number $i with shared tail words $i")
    Dedup.buildMinHashStore((0 until 4).map(doc).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    // two genuinely concurrent appenders, disjoint batches: segments are
    // invocation-unique and visibility is one atomic rename, so BOTH land
    // with no coordination and no retry needed
    inThreads(Seq(
      () => Dedup.appendToMinHashStore((4 until 8).map(doc).toDF("doc_id", "text"),
        "doc_id", "text", dir, batchMarker = Some("a1")),
      () => Dedup.appendToMinHashStore((8 until 12).map(doc).toDF("doc_id", "text"),
        "doc_id", "text", dir, batchMarker = Some("b1"))))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("seg-"))
    assert(segs.length === 3, segs.mkString(", "))
    // the union is what probes see: all 12 docs' signatures present
    val ids = spark.read.parquet(segs.map(s => s"$dir/$s/toks"): _*)
      .select("id").distinct().count()
    assert(ids === 12L)
    // compaction vs compaction: the mutex makes the second loser LOUD
    val mutex = new org.apache.hadoop.fs.Path(dir, "_compact_pending")
    assert(graft.sources.HadoopText.writeIfAbsent(fs, mutex, "held-by-peer"))
    intercept[java.util.ConcurrentModificationException](
      Dedup.compactMinHashStore(spark, dir))
    // a DIED compactor's mutex is released by the quiesced sweep
    val acts = Dedup.recoverMinHashStore(spark, dir)
    assert(acts.contains("released-compact-mutex"), acts.mkString("; "))
    assert(Dedup.compactMinHashStore(spark, dir) === 3)
    // exactly-once survives compaction: both batch markers carried forward
    Dedup.appendToMinHashStore((99 until 100).map(doc).toDF("doc_id", "text"),
      "doc_id", "text", dir, batchMarker = Some("a1"))
    val idsAfter = spark.read.parquet(
        fs.listStatus(new org.apache.hadoop.fs.Path(dir))
          .map(_.getPath.getName).filter(_.startsWith("seg-")).map(s => s"$dir/$s/toks"): _*)
      .select("id").distinct().count()
    assert(idsAfter === 12L, "re-delivered batch a1 was double-applied after compaction")
  }

  test("IVF index: concurrent appends are CAS-gated — loud conflict, retry converges, identity composes") {
    val dir = fresh("ivf2w")
    def vecs(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, (0 until 8).map(j => math.sin(i * 31 + j).toFloat)))
      .toDF("vec_id", "embedding")
    Similarity.ensureIvfIndex(spark, dir, vecs(0, 64), "vec_id", "embedding",
      numCentroids = 4)
    // 2 threads × 3 batches each, disjoint ids, retry on the pending-marker
    // conflict: every batch must land exactly once
    inThreads(Seq(
      () => (0 until 3).foreach(k => retrying() {
        Similarity.appendToIvfIndex(spark, dir, vecs(100 + k * 10, 110 + k * 10),
          "vec_id", "embedding")
      }),
      () => (0 until 3).foreach(k => retrying() {
        Similarity.appendToIvfIndex(spark, dir, vecs(200 + k * 10, 210 + k * 10),
          "vec_id", "embedding")
      })))
    assert(spark.read.parquet(s"$dir/assigned").count() === 124L)
    assert(spark.read.parquet(s"$dir/assigned").select("nid").distinct().count() === 124L)
    // the composed fingerprint identity matches the grown corpus: ensure
    // over it recognizes the index as current (no rebuild)
    val centMtime = new org.apache.hadoop.fs.Path(s"$dir/centroids")
      .getFileSystem(spark.sessionState.newHadoopConf())
      .getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/centroids")).getModificationTime
    val grown = vecs(0, 64).unionByName(vecs(100, 110)).unionByName(vecs(110, 120))
      .unionByName(vecs(120, 130)).unionByName(vecs(200, 210))
      .unionByName(vecs(210, 220)).unionByName(vecs(220, 230))
    Similarity.ensureIvfIndex(spark, dir, grown, "vec_id", "embedding", numCentroids = 4)
    val after = new org.apache.hadoop.fs.Path(s"$dir/centroids")
      .getFileSystem(spark.sessionState.newHadoopConf())
      .getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/centroids")).getModificationTime
    assert(after === centMtime,
      "ensureIvfIndex rebuilt an index whose concurrent appends composed correctly")
  }

  test("bucketed HLL store: concurrent mergers converge to the sequential fold; conflicts are loud; crash states repair") {
    val dir = fresh("hll2w")
    def events(lo: Int, hi: Int) = (lo until hi)
      .map(i => (s"g${i % 5}", s"user$i")).toDF("g", "u")
    DistinctSketch.buildBucketedStore(events(0, 100), Seq("g"), "u", dir, nBuckets = 8)
    // two genuinely concurrent mergers, overlapping key groups (every batch
    // touches all 5 groups): bucket contention is real, conflicts are
    // retried, HLL idempotence makes the replay converge
    inThreads(Seq(
      () => (0 until 3).foreach(k => retrying() {
        DistinctSketch.mergeBatchIntoBucketedStore(spark,
          events(100 + k * 50, 150 + k * 50), Seq("g"), "u", dir, nBuckets = 8)
      }),
      () => (0 until 3).foreach(k => retrying() {
        DistinctSketch.mergeBatchIntoBucketedStore(spark,
          events(300 + k * 50, 350 + k * 50), Seq("g"), "u", dir, nBuckets = 8)
      })))
    // reference: the same data folded sequentially into a fresh store —
    // HLL union is order-independent, so estimates must agree EXACTLY
    val ref = fresh("hll2w_ref")
    DistinctSketch.buildBucketedStore(events(0, 100), Seq("g"), "u", ref, nBuckets = 8)
    (0 until 3).foreach(k => DistinctSketch.mergeBatchIntoBucketedStore(spark,
      events(100 + k * 50, 150 + k * 50), Seq("g"), "u", ref, nBuckets = 8))
    (0 until 3).foreach(k => DistinctSketch.mergeBatchIntoBucketedStore(spark,
      events(300 + k * 50, 350 + k * 50), Seq("g"), "u", ref, nBuckets = 8))
    def est(d: String) = DistinctSketch.estimates(spark.read.parquet(d))
      .select("g", "distinct_est").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est(dir) === est(ref))

    // deterministic conflict: a competitor owning a bucket mid-swap (live
    // dir renamed away after our entry repair would have run) -> the merge
    // aborts loudly... simulated at the narrowest observable point: a
    // moved-aside copy with live present is a live competitor's window,
    // and the quiesced sweep drops it once the competitor is gone
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val liveBucket = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("bucket=")).head
    val b = liveBucket.stripPrefix("bucket=")
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + s"__old_bucket_${b}_deadcafe"))
    val swept = DistinctSketch.recoverBucketedStore(spark, dir)
    assert(swept.exists(_.contains("__old_bucket_")), swept.mkString("; "))

    // crashed-mid-swap state: live bucket MISSING with a moved-aside copy.
    // Merges must abort LOUDLY — an entry-time auto-restore raced a live
    // competitor's swap window and nested its promote (the bug this drill
    // caught under full-suite load) — and the QUIESCED sweep restores,
    // after which the retried merge folds with nothing lost.
    val before = est(dir)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir, liveBucket),
      new org.apache.hadoop.fs.Path(dir + s"__old_bucket_${b}_feedbeef")))
    val ex = intercept[java.util.ConcurrentModificationException](
      DistinctSketch.mergeBatchIntoBucketedStore(spark, events(900, 910), Seq("g"), "u",
        dir, nBuckets = 8))
    assert(ex.getMessage.contains("recoverBucketedStore"), ex.getMessage)
    DistinctSketch.recoverBucketedStore(spark, dir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, liveBucket)))
    DistinctSketch.mergeBatchIntoBucketedStore(spark, events(900, 910), Seq("g"), "u",
      dir, nBuckets = 8)
    val after = est(dir)
    // every group's estimate is >= its pre-crash value: nothing was lost
    // to the crash window (a lost bucket would crater its groups to the
    // new batch's tiny counts)
    before.foreach { case (g, v) => assert(after(g) >= v, s"group $g lost mass: $v -> ${after(g)}") }
  }

  test("bucketed HLL store: a retire landing in the entry-check-to-capture gap aborts; no sketch mass stranded") {
    // the round-11 advice TOCTOU: a competitor retires a touched bucket
    // AFTER the entry orphan check but BEFORE the per-bucket capture, so
    // the capture reads "" (missing) and the fold is batch-only. Without
    // the pre-promote orphan re-check the merge would promote that
    // batch-only fold into the empty slot — and if the competitor then
    // crashed, recoverBucketedStore would see OUR live bucket and drop the
    // competitor's moved-aside copy (holding ALL the bucket's prior mass)
    // as post-promote debris: a silent distinct-count loss.
    val dir = fresh("hlltoctou")
    val data = (0 until 200).map(i => (s"k${i % 8}", i.toLong)).toDF("k", "v")
    DistinctSketch.buildBucketedStore(data, Seq("k"), "v", dir, nBuckets = 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // the bucket the batch's key hashes into, computed like the store does
    val b = Seq("k0").toDF("k")
      .select(pmod(xxhash64(col("k")), lit(4L))).first.getLong(0)
    val live = new org.apache.hadoop.fs.Path(dir, s"bucket=$b")
    val aside = new org.apache.hadoop.fs.Path(dir + s"__old_bucket_${b}_c0ffee01")
    val batch = Seq(("k0", 9999L)).toDF("k", "v")
    DistinctSketch.postEntryCheckHook = () =>
      assert(fs.rename(live, aside), "drill setup: competitor retire failed")
    try {
      val ex = intercept[java.util.ConcurrentModificationException](
        DistinctSketch.mergeBatchIntoBucketedStore(spark, batch, Seq("k"), "v",
          dir, nBuckets = 4))
      assert(ex.getMessage.contains("moved-aside copy appeared"), ex.getMessage)
    } finally DistinctSketch.postEntryCheckHook = () => ()
    // the competitor "crashed": quiesced sweep restores its retired bucket,
    // the replayed merge folds the batch, and the prior mass is intact
    DistinctSketch.recoverBucketedStore(spark, dir)
    assert(fs.exists(live))
    DistinctSketch.mergeBatchIntoBucketedStore(spark, batch, Seq("k"), "v",
      dir, nBuckets = 4)
    val estK0 = DistinctSketch.readEstimates(spark, dir)
      .filter(col("k") === "k0").select("distinct_est").first.getLong(0)
    // 25 original distinct values (+1 batch value) within HLL error — a
    // stranded bucket would read 1
    assert(estK0 >= 24L && estK0 <= 28L, s"k0 estimate $estK0 lost prior mass")
  }
}
