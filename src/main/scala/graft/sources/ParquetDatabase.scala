package graft.sources

import graft.schema.SchemaOps
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Directory-rooted parquet table facade — the ParquetDB API surface the
  * reference delegates to (SURVEY.md §2.2 P1–P8; `ParquetDB(dir)`,
  * `create`, `read`, `normalize`, stats).
  *
  * Everything stays lazy/distributed: `create` is a conform+append write,
  * `read` is a pruned scan (Catalyst pushes column projection and filters to
  * the parquet footers), `normalize` is a repartition rewrite — never a
  * driver-side materialization (the reference needs ~64 GB RAM to build its
  * combined DB, README.md:120; this needs an executor's worth).
  */
class ParquetDatabase(val spark: SparkSession, val dir: String) {

  // session Hadoop conf, not `new Configuration()`: session-configured
  // filesystem settings (credentials, endpoints) must reach every listing,
  // rename, and footer read this facade performs
  private def hconf: Configuration = spark.sessionState.newHadoopConf()
  private def fs = new Path(dir).getFileSystem(hconf)

  def exists: Boolean = fs.exists(new Path(dir))

  // ------------------------------------------------ optimistic concurrency

  /** Fingerprint of the live table state: every file's table-relative path,
    * length, and mtime under the table root, hashed. Mutation paths capture
    * it at entry and the swap kernels ([[rewriteWith]] / [[replaceFiles]])
    * re-check it AFTER the replacement data is fully staged and immediately
    * BEFORE the first rename — the optimistic-concurrency CAS: a concurrent
    * writer's commit between this mutation's read and its swap fails the
    * mutation loudly (`ConcurrentModificationException`, staged temp output
    * dropped, live table untouched) instead of silently overwriting the
    * other writer's rows (lost update). Cost is one metadata-only recursive
    * listing per mutation — the same order as the footer-stats pass the
    * scoped mutations already do.
    *
    * Residual window: the check and the first rename are not one atomic
    * step, so two writers whose swaps land inside the same rename-latency
    * window can still both pass. Every interleaving from there aborts
    * without silent loss on a filesystem with atomic rename: a second
    * writer renaming while the first is mid-swap fails outright (dir
    * already moved), a second REWRITER renaming after the first fully
    * committed is caught by [[rewriteWith]]'s post-lock re-check (the
    * moved-aside tree no longer fingerprints as the expected state — it is
    * restored and the writer aborts), and a second PATCHER is serialized
    * by the create-no-overwrite manifest gate in [[replaceFiles]]. A
    * multi-writer fleet on an object store without atomic rename needs a
    * conditional-put commit log; these aborts' failure mode (nothing
    * renamed, or renamed-then-restored) is what such a log slots under.
    */
  def fingerprint(): String = fingerprintOfTree(dir)

  /** [[fingerprint]] of an arbitrary tree with table-relative names —
    * a directory rename preserves every file's length and mtime, so the
    * moved-aside `__old` tree fingerprints identically to the live table
    * it was seconds ago (the post-swap-rename re-check relies on this).
    */
  private def fingerprintOfTree(root: String): String = {
    val sb = new StringBuilder
    def walk(p: Path): Unit =
      // a concurrent writer's swap can delete entries between the parent
      // listing and this stat — skip them rather than crash the mutation
      // entry. The resulting print describes a state that no longer
      // exists, so any CAS against it simply conflicts (safe), and the
      // walk stays usable while peers mutate.
      try {
        val st = fs.getFileStatus(p)
        if (st.isDirectory)
          fs.listStatus(p).sortBy(_.getPath.getName).foreach(s => walk(s.getPath))
        else sb.append(relativize(root, p)).append('|').append(st.getLen)
          .append('|').append(st.getModificationTime).append('\n')
      } catch { case _: java.io.FileNotFoundException => () }
    if (fs.exists(new Path(root))) walk(new Path(root))
    java.security.MessageDigest.getInstance("MD5")
      .digest(sb.result().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** A `__patch_old` manifest names originals that are NOT in the live
    * tree: the table is mid-patch (crashed, or a writer is live) and cannot
    * be read consistently without [[recover]]. A manifest whose touched
    * originals are all present is a not-yet-started patch (crash before any
    * rename, or a concurrent writer still staging) — the live tree is
    * complete and must be left alone.
    */
  private def patchRepairNeeded(): Boolean = {
    val pOld = new Path(s"${dir}__patch_old")
    val manifest = new Path(pOld, "_manifest")
    // TOCTOU: a concurrent patcher finishing its commit deletes
    // __patch_old/_manifest between the exists() and the read — that
    // interleaving means the live tree is complete, i.e. no repair needed
    try {
      fs.exists(manifest) && readTextFile(manifest).linesIterator
        .filter(_.startsWith("touched\t"))
        .exists(l => !fs.exists(new Path(l.stripPrefix("touched\t"))))
    } catch { case _: java.io.FileNotFoundException => false }
  }

  /** Mutator-entry capture: recover ONLY when the live tree itself is
    * unreadable — the table dir is missing (interrupted swap) or a patch
    * manifest shows moved-aside originals. Healthy-table staging siblings
    * (`__normalize_tmp_<token>`, a manifest with all originals present, …)
    * are NOT reclaimed here: with optimistic concurrency they may belong
    * to a LIVE writer mid-stage, and deleting them would strand its swap
    * (round-10 review finding). Crashed-stage debris is invisible to
    * readers and swept ONLY by an explicit, quiesced [[recover]] — it
    * accumulates disk (each staged rewrite is table-sized) until one runs,
    * so a fleet deployment schedules recover() in its maintenance window.
    */
  private def entryFingerprint(): String = {
    if (!fs.exists(new Path(dir)) || patchRepairNeeded()) recover()
    fingerprint()
  }

  /** Test seam: runs after a swap's temp write completes and before the
    * conflict check + renames — the deterministic interleaving point the
    * two-writer spec drives a concurrent commit through.
    */
  private[sources] var preSwapHook: () => Unit = () => ()

  /** Test seam: runs after the conflict check passes and immediately before
    * the swap's dir -> __old rename — the check-to-rename gap the post-lock
    * re-check spec drives a full concurrent commit through.
    */
  private[sources] var preRenameHook: () => Unit = () => ()

  /** Test seam: runs after the swap's dir -> __old retire rename succeeds
    * and before the post-lock fingerprint re-check — the crash window where
    * __old may hold a competitor's committed table and roll-forward of this
    * writer's stage would be a lost update.
    */
  private[sources] var postRetireHook: () => Unit = () => ()

  /** Run a staging write with conflict-aware failure handling: any failure
    * drops the half-written temp (otherwise every aborted attempt leaves a
    * table-sized debris dir for recover()), and a failure caused by table
    * files vanishing mid-scan — the read-side signature of a peer's swap
    * landing underneath the staging read — is rethrown as the documented
    * retryable `ConcurrentModificationException` instead of a raw Spark
    * task failure.
    */
  /** Re-map a failure whose cause chain says "table files vanished
    * underneath a read" to the documented retryable
    * `ConcurrentModificationException`. Both vanish signatures are matched:
    * at OPEN Spark classifies it itself (FAILED_READ_FILE.FILE_NOT_EXIST /
    * FileNotFoundException); a file retired MID-READ — the open stream's
    * next positioned read fails — surfaces as FAILED_READ_FILE.NO_HINT
    * caused by a raw java.nio.file.NoSuchFileException (both seen under
    * host load in the two-writer stress drill, round 14).
    */
  private[sources] def conflictIfVanished[T](phase: String)(f: => T): T =
    try f catch {
      case t: Throwable =>
        val vanishedUnderneath = Iterator.iterate(t)(_.getCause)
          .takeWhile(_ != null).take(20)
          .exists(c => c.isInstanceOf[java.io.FileNotFoundException] ||
            c.isInstanceOf[java.nio.file.NoSuchFileException] ||
            String.valueOf(c.getMessage).contains("FILE_NOT_EXIST"))
        // a conflict is only plausible when the TABLE DIRECTORY still
        // exists and member files vanished out of it (a peer's swap). A
        // missing/mistyped table dir is a permanent error — remapping it
        // would make retry-looping callers spin on something no retry can
        // fix — so it rethrows raw. BUT a single absent probe cannot prove
        // permanence: a peer's swap retires dir to __old for the instant
        // between its two renames (rewriteWith), so the probe accepts a
        // visible __old (the retired table) as mid-swap evidence and
        // re-probes a few times before declaring the dir gone — the
        // two-writer stress drill caught the single-probe form rethrowing
        // raw exactly in that window. (The probe itself failing, e.g. a
        // flaky FS, counts as "can't prove permanence" → conflict.)
        def presentOrMidSwap(): Boolean =
          try fs.exists(new Path(dir)) || fs.exists(new Path(dir + "__old"))
          catch { case _: Throwable => true }
        def plausiblyLive(): Boolean = {
          var probes = 0
          var present = presentOrMidSwap()
          while (!present && probes < 5) {
            Thread.sleep(40L); present = presentOrMidSwap(); probes += 1
          }
          present
        }
        if (vanishedUnderneath && plausiblyLive())
          throw new java.util.ConcurrentModificationException(
            s"optimistic-concurrency conflict on $dir: table files vanished underneath " +
              s"this mutation's $phase (another writer swapped the table mid-scan). " +
              "Table untouched — re-read and retry.", t)
        else throw t
    }

  private def stageOrAbort(tmp: Path)(write: => Unit): Unit =
    try conflictIfVanished("staging read")(write) catch {
      case t: Throwable =>
        try fs.delete(tmp, true) catch { case _: Throwable => () }
        throw t
    }

  private def conflictCheck(expected: Option[String], tmps: Seq[Path]): Unit =
    expected.foreach { e =>
      if (fingerprint() != e) {
        tmps.foreach(t => fs.delete(t, true))
        throw new java.util.ConcurrentModificationException(
          s"optimistic-concurrency conflict on $dir: the live table changed between " +
            "this mutation's read and its swap (another writer committed). Aborted " +
            "before any rename — staged output dropped, table untouched; re-read and retry.")
      }
    }

  /** Append a batch (ParquetDB `create`, base.py:180-182).
    *
    * @param target  optional canonical schema to conform to (permissive
    *                unify + cast, SURVEY.md §1.4.1)
    * @param assignId add a deterministic content-derived id (xxhash64 over
    *                all columns) — reproducible across runs, unlike the
    *                reference's positional auto-increment (§1.4.5)
    */
  /** @param partitionBy optional hive-style partition columns. At 100 TB
    *  this is the primary scan lever: a filter on a partition column prunes
    *  whole directories before any footer is read. Choose low-cardinality
    *  columns (the canonical layout partitions by source_database /
    *  source_dataset).
    */
  def create(df: DataFrame, target: Option[StructType] = None, assignId: Boolean = false,
             partitionBy: Seq[String] = Nil): Unit = {
    val conformed = target.map(t => SchemaOps.conformToSchema(df, t)).getOrElse(df)
    val withId =
      if (assignId) conformed.withColumn("id", xxhash64(conformed.columns.map(c => col(s"`$c`")): _*))
      else conformed
    val writer = withId.write.mode("append")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(dir)
  }

  /** Projected / filtered read (ParquetDB `read`, base.py:188-193).
    * `mergeSchema` reproduces the permissive union across appended batches
    * with evolved schemas; nested structs need no rebuild (parquet native).
    *
    * @param options per-read tuning (the reference's per-call `LoadConfig`,
    *                base.py:224,239 — batch sizing etc.): Spark parquet
    *                source options, e.g. `vectorized reader batch size` via
    *                `spark.sql.parquet.columnarReaderBatchSize` is session
    *                level, but per-read knobs like `mergeSchema`,
    *                `datetimeRebaseMode`, `int96RebaseMode`,
    *                `modifiedAfter/Before`, `pathGlobFilter`,
    *                `recursiveFileLookup` apply here. Caller-supplied keys
    *                override the defaults (incl. mergeSchema).
    */
  def read(columns: Seq[String] = Nil, filter: Option[Column] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read
      .options(Map("mergeSchema" -> "true") ++ options)
      .parquet(dir)
    val filtered = filter.map(base.filter).getOrElse(base)
    if (columns.isEmpty) filtered else filtered.select(columns.map(c => col(s"`$c`")): _*)
  }

  def schema: StructType = read().schema
  def nRows: Long = read().count()
  def nColumns: Int = schema.fields.length

  /** Row count from parquet footers when the flat layout exposes them
    * (metadata-only — no data pages); falls back to a count job on
    * hive-partitioned layouts whose files live in subdirectories.
    */
  private def footerRowCount: Long = {
    val fromFooters = ParquetStats.totalRows(dir, hconf)
    if (fromFooters > 0) fromFooters else nRows
  }

  /** Rewrite the table into evenly-sized files (ParquetDB `normalize`,
    * base.py:184-186; the notebook's "6 GB file → ≤2 GB" goal).
    *
    * Swap order matters for crash safety: the live dir is renamed aside
    * before the rewritten dir takes its place, so there is no window where
    * the data exists only in a temp dir — a crash at any point leaves the
    * table recoverable by a single rename (of either `__old` or the
    * invocation-unique `__normalize_tmp_<token>`), never deleted.
    */
  /** @param sortBy optional layout key: range-partition + sort the rewrite
    *  by these columns, so parquet row-group min/max stats become tight,
    *  disjoint ranges — filters on the sort key then skip whole files/row
    *  groups at scan time (data skipping, the complement to hive
    *  partitioning for high-cardinality keys).
    */
  /** Partition count for a row-capped rewrite: target maxRows − maxRows/32
    * rows per partition, NOT maxRows exactly. Zero-headroom packing makes
    * the cap a cliff: `repartition(n)` is round-robin-even only to
    * ±O(√inputSplits) rows, so when ceil(rows/maxRows) partitions average
    * within a few rows of the cap, every partition the jitter pushes over
    * spills a tiny second file through maxRecordsPerFile (measured at 100×
    * bench scale: 60 M rows into 7 325 zero-headroom partitions landed
    * 1 950 of them at 8 193–8 195 rows → 1 950 three-row files, 9 275
    * total vs the intended 7 325). With 1/32 headroom the jitter never
    * crosses the cap at any realistic input-split count, the file count
    * stays the closed form ceil(rows / (maxRows − maxRows/32)) that the
    * q_norm1 oracle reproduces in SQL, and maxRecordsPerFile remains the
    * HARD bound either way — a pathological distribution degrades to a few
    * split files, never to an over-cap file.
    */
  private def packPartitions(maxRowsPerFile: Long): Int = {
    val effective = math.max(1L, maxRowsPerFile - maxRowsPerFile / 32)
    math.max(1, math.ceil(footerRowCount.toDouble / effective).toInt)
  }

  def normalize(maxRowsPerFile: Long, sortBy: Seq[String] = Nil): Unit = {
    val expect = Some(entryFingerprint())
    val df = read()
    // row count from the footers (metadata-only) — a count() job here would
    // be a full extra pass over the table being rewritten
    val n = packPartitions(maxRowsPerFile)
    val laidOut =
      if (sortBy.nonEmpty)
        df.repartitionByRange(n, sortBy.map(c => col(s"`$c`")): _*)
          .sortWithinPartitions(sortBy.map(c => col(s"`$c`")): _*)
      else df.repartition(n)
    rewriteWith(laidOut, Map("maxRecordsPerFile" -> maxRowsPerFile.toString), expect)
  }

  /** Rewrite the table clustered along a Z-order (Morton) curve over
    * `zCols` — multi-dimensional data skipping where `normalize(sortBy)` is
    * one-dimensional: each output file covers a small hyper-rectangle of
    * the (equi-depth-ranked) value space, so footer min/max stats prune
    * files for predicates on ANY subset of the z-columns, not just a
    * leading sort key. See [[ZOrder]] for the curve construction.
    */
  def normalizeZOrder(maxRowsPerFile: Long, zCols: Seq[String], bits: Int = 8): Unit = {
    val expect = Some(entryFingerprint())
    val df = read()
    val n = packPartitions(maxRowsPerFile)
    val z = "__zorder"
    val laidOut = df.withColumn(z, ZOrder.zValue(df, zCols, bits))
      .repartitionByRange(n, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
    rewriteWith(laidOut, Map("maxRecordsPerFile" -> maxRowsPerFile.toString), expect)
  }

  /** Full-rewrite-and-swap: write `newData` to a temp sibling, then swap it
    * into place. Crash-safe (see `normalize` doc): the live dir is renamed
    * aside before the rewrite takes its place, so a crash at any point
    * leaves the table recoverable by a single rename — never deleted.
    */
  private def rewriteWith(newData: DataFrame, options: Map[String, String] = Map.empty,
                          expected: Option[String] = None): Unit = {
    // staging is INVOCATION-UNIQUE: with a shared tmp name, writer B's
    // overwrite-mode stage silently replaces writer A's staged bytes while
    // A is pre-swap, and A then commits B's content as its own (a lost
    // update the conflict check cannot see — the live table never changed).
    // The stage takes minutes at scale, so that window is the COMMON
    // concurrent case, not the narrow check-to-rename race. Crashed-stage
    // debris (tmp_<token> with no live writer) is invisible to readers and
    // swept by the quiesced recover(), which globs the prefix.
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmp = s"${dir}__normalize_tmp_$token"
    val old = s"${dir}__old"
    stageOrAbort(new Path(tmp)) {
      newData.write.mode("overwrite").options(options).parquet(tmp)
    }
    preSwapHook()
    conflictCheck(expected, Seq(new Path(tmp)))
    // stale `old` (a crash AFTER its swap committed but before cleanup) is
    // reclaimed only now, AFTER the conflict check passed: a live writer's
    // `old` exists only once it has committed, and a commit since our read
    // fails the check — so an `old` surviving to this point is crash
    // debris, archived-then-dropped exactly like recover() would
    if (fs.exists(new Path(old))) {
      archiveReferenced(new Path(old), p => relativize(old, p))
      fs.delete(new Path(old), true)
    }
    // SWAPPER TOKEN, phase 1 of 2: record which stage THIS swap intends to
    // promote, BEFORE anything is renamed. recover()'s roll-forward only
    // ever promotes the stage this marker names — without it, a stale
    // complete stage left by an earlier crashed writer (invocation-unique
    // staging deliberately leaves debris in place) could be promoted over a
    // competitor's committed table when a later writer crashes mid-abort
    // with __old holding the CURRENT table. Overwrites any stale marker.
    // Phase 2 (the "checked" line) is appended only after the post-lock
    // fingerprint re-check passes — see below.
    writeTextFile(new Path(swapperMarker), tmp)
    preRenameHook()
    // a competitor's __old reappearing here means a commit is IN FLIGHT
    // (it exists only between a competitor's swap and its cleanup) — on
    // HDFS, renaming dir onto an existing directory would NEST the table
    // inside it instead of failing. Abort before renaming anything.
    if (fs.exists(new Path(old))) {
      fs.delete(new Path(tmp), true)
      fs.delete(new Path(swapperMarker), false)
      throw new java.util.ConcurrentModificationException(
        s"optimistic-concurrency conflict on $dir: another writer's swap is in flight " +
          s"($old reappeared after the conflict check). Aborted with nothing renamed — " +
          "re-read and retry.")
    }
    // Hadoop rename signals failure by returning false — a failed swap must
    // abort loudly BEFORE any delete, or the "crash leaves the table
    // recoverable by a single rename" contract above is broken.
    if (!fs.rename(new Path(dir), new Path(old)))
      throw new java.io.IOException(s"rewrite: failed to move $dir aside to $old; table untouched")
    postRetireHook()
    // safety net for the instruction-thin gap between the exists check and
    // the rename: if a competitor created __old in that gap, HDFS rename
    // semantics nested our table inside it — un-nest and abort before the
    // polluted tree can be promoted.
    val nested = new Path(old, new Path(dir).getName)
    if (fs.exists(nested)) {
      if (!fs.rename(nested, new Path(dir)))
        throw new java.io.IOException(
          s"rewrite: swap rename nested the table at $nested and un-nesting failed — " +
            s"rename it back to $dir manually")
      fs.delete(new Path(tmp), true)
      fs.delete(new Path(swapperMarker), false)
      throw new java.util.ConcurrentModificationException(
        s"optimistic-concurrency conflict on $dir: the swap rename landed inside a " +
          "competitor's in-flight cleanup tree and was un-nested. Table restored — " +
          "re-read and retry.")
    }
    // POST-LOCK re-check: dir -> __old succeeding makes this writer the
    // exclusive swapper (any competing rename of dir now fails — dir is
    // gone). But a competitor that FULLY committed inside our
    // check-to-rename gap left a changed table that our rename just moved
    // aside; committing tmp over it would silently drop that writer's
    // committed rows with both writers reporting success. The moved-aside
    // tree fingerprints identically to the live table it was (rename
    // preserves lengths and mtimes), so compare it against our entry
    // capture — on mismatch, put it back and abort with nothing lost.
    // ORDER MATTERS on the abort path: tmp is deleted BEFORE the restore
    // rename, so a crash mid-abort leaves (dir missing, __old = the
    // competitor's committed table, swapper marker naming a now-deleted
    // stage) — a state recover() repairs by rolling __old BACK, which is
    // correct here. The swapper token makes this robust even when an
    // EARLIER crashed writer's complete stage sits beside the table:
    // recover() never promotes a stage the marker doesn't name.
    // COST NOTE: this walk runs while dir is absent, so the reader-visible
    // outage of a rewrite commit is one metadata listing of the table, not
    // just two renames. At fleet scale, readers of actively-mutating
    // tables should use snapshot reads; an object-store deployment slots a
    // conditional-put commit log here and drops the walk entirely.
    expected.foreach { e =>
      if (fingerprintOfTree(old) != e) {
        fs.delete(new Path(tmp), true)
        fs.delete(new Path(swapperMarker), false)
        if (!fs.rename(new Path(old), new Path(dir)))
          throw new java.io.IOException(
            s"rewrite: conflict detected after the swap rename but restoring $old -> $dir " +
              "failed — run recover()")
        throw new java.util.ConcurrentModificationException(
          s"optimistic-concurrency conflict on $dir: another writer committed between " +
            "this mutation's conflict check and its swap rename. The live table was " +
            "restored untouched; staged output dropped — re-read and retry.")
      }
    }
    // ROLL-FORWARD AUTHORIZATION (round 12): the marker gains its second
    // line only once the post-lock re-check above has PASSED. recover()
    // promotes a stage only when the marker carries this token — a crash
    // between the retire rename and this point leaves a single-line marker,
    // and recover() rolls __old BACK instead. Without the token, a writer
    // that lost the optimistic-concurrency race (its __old holds a
    // competitor's already-committed table) and crashed mid-window would
    // get its stale complete stage rolled FORWARD, deleting a committed
    // write that reported success.
    writeTextFile(new Path(swapperMarker), s"$tmp\nchecked")
    if (!fs.rename(new Path(tmp), new Path(dir)))
      throw new java.io.IOException(
        s"rewrite: failed to move rewrite into place; original preserved at $old, rewrite at $tmp")
    // nest-guard before dropping our cleanup tree: a racer that renamed
    // the (committed) table while our __old still existed nested it INSIDE
    // __old — restore it rather than deleting a live table with the debris
    val nestedInOld = new Path(old, new Path(dir).getName)
    if (fs.exists(nestedInOld) && !fs.exists(new Path(dir)))
      fs.rename(nestedInOld, new Path(dir))
    // the moved-aside tree IS the previous table version: park whatever a
    // snapshot still references in the archive before dropping the rest
    archiveReferenced(new Path(old), p => relativize(old, p))
    fs.delete(new Path(old), true)
    fs.delete(new Path(swapperMarker), false)
  }

  /** Sibling marker naming the staging dir of the swap currently (or last)
    * in flight — the roll-forward authorization recover() requires.
    */
  private def swapperMarker: String = s"${dir}__swapper"

  /** Upsert by key (the underlying ParquetDB API's `update` surface —
    * unexercised by the reference's loaders but part of the store's
    * contract, arXiv:2502.05311 §API): rows in `patch` whose key matches an
    * existing row replace it; unmatched patch rows are appended.
    *
    * Scale path: the rewrite is scoped to the FILES whose footer key range
    * intersects a patch key (copy-on-write at file granularity) — on a
    * range-laid-out table (`normalize(sortBy)`) a small patch rewrites a
    * handful of files, not the table. A file whose merged footer
    * [min, max] on `keyCol` misses every patch key provably contains no
    * row to replace, so leaving it physically untouched is exact, not a
    * heuristic. Files without usable integral stats are conservatively
    * rewritten; a layout where no per-file ranges are visible (hive
    * partition subdirs, empty dir) falls back to the full crash-safe
    * rewrite, which is always correct.
    */
  def upsert(patch: DataFrame, keyCol: String): Unit = {
    val expect = Some(entryFingerprint())
    val perFile = ParquetStats.fileKeyRanges(dir, keyCol, hconf)
    if (perFile.isEmpty) {
      // partitioned layout (files in subdirs) or empty table — full rewrite
      val base = read()
      val kept = base.join(patch.select(col(s"`$keyCol`")), Seq(keyCol), "left_anti")
      rewriteWith(kept.unionByName(patch, allowMissingColumns = true), expected = expect)
    } else {
      val (statless, ranged) = perFile.partition(_._2.isEmpty)
      // conform the patch's OVERLAPPING columns to the table's types before
      // any file is staged (round 13, caught by the cross-process drill): the
      // file-scoped path appends the patch's rows as new files beside
      // untouched ones, so a patch whose column types differ — e.g. a BIGINT
      // key patched onto a table whose column landed as INT via partition-dir
      // inference — would leave the table with per-file schemas parquet
      // cannot merge: every later read() fails, long after this write
      // reported success. The full-rewrite branch widens via unionByName and
      // rewrites every row, so it cannot strand a mixed layout.
      val tableTypes = read().schema.map(f => f.name -> f.dataType).toMap
      val conformed = patch.select(patch.columns.map(c =>
        tableTypes.get(c) match {
          case Some(t) => col(s"`$c`").cast(t).as(c)
          case None => col(s"`$c`")
        }): _*)
      // touched-by-range: stream the (large) patch key set against the tiny
      // broadcast range table — a BroadcastNestedLoopJoin whose output is
      // map-side-distinct file paths, so nothing big ever reaches the driver
      val rangeDf = spark.createDataFrame(
        ranged.map { case (p, Some((lo, hi))) => (p, lo, hi); case (p, None) => (p, 0L, 0L) })
        .toDF("path", "lo", "hi")
      val keys = conformed.select(col(s"`$keyCol`").cast("long").as("__k")).distinct()
      val hit =
        if (ranged.isEmpty) Array.empty[String]
        else keys.join(broadcast(rangeDf), col("__k").between(col("lo"), col("hi")))
          .select("path").distinct().collect().map(_.getString(0))
      val touched = (statless.map(_._1) ++ hit).distinct
      val touchedDf =
        if (touched.isEmpty) conformed.limit(0)
        else spark.read.option("mergeSchema", "true").parquet(touched: _*)
          .join(conformed.select(col(s"`$keyCol`")), Seq(keyCol), "left_anti")
      // re-range the replacement on the key so the rewritten files keep
      // tight disjoint footer ranges — future patches prune just as well
      val n = math.max(1, touched.size)
      val shaped = touchedDf.unionByName(conformed, allowMissingColumns = true)
        .repartitionByRange(n, col(s"`$keyCol`"))
        .sortWithinPartitions(col(s"`$keyCol`"))
      replaceFiles(touched, shaped, expected = expect)
    }
  }

  /** Delete rows matching the predicate (ParquetDB `delete` surface).
    *
    * Scale path: one column-pruned, pushdown-friendly scan finds the EXACT
    * set of files holding a matching row (`_metadata.file_path` — no footer
    * stats needed, works for arbitrary predicates); only those files are
    * rewritten, copy-on-write. The scan cost is unavoidable (matches must
    * be found); the rewrite — the expensive half at 100 TB — is scoped.
    * Falls back to the full crash-safe rewrite on partitioned layouts
    * (where file replacement would drop directory-encoded columns).
    */
  def deleteWhere(condition: Column): Unit = {
    val expect = Some(entryFingerprint())
    val base = spark.read.option("mergeSchema", "true").parquet(dir)
    // the hit-scan is an EAGER table read outside the staging write, so a
    // peer's swap landing mid-scan surfaces here, not in stageOrAbort —
    // same retryable-conflict mapping (round-14 stress-drill finding)
    val hitNames = conflictIfVanished("hit scan")(base.filter(condition)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(r => new Path(r.getString(0)).getName).toSet)
    val flat = ParquetStats.listParquetFiles(dir, hconf)
    val touched = flat.map(_.toString).filter(p => hitNames.contains(new Path(p).getName))
    if (hitNames.isEmpty) () // nothing matches — leave every file untouched
    else if (touched.size != hitNames.size) // partitioned subdir layout
      rewriteWith(read().filter(!condition), expected = expect)
    else {
      val kept = spark.read.option("mergeSchema", "true").parquet(touched: _*)
        .filter(!condition)
      replaceFiles(touched, kept, expected = expect)
    }
  }

  /** Copy-on-write commit: replace exactly `touched` files with the files
    * of `newData`, leaving every other file physically untouched (same
    * path, same bytes, same mtime). Ordering never deletes before the new
    * data is fully in place: (1) write new files to a temp sibling — live
    * table unaffected; (2) rename touched files aside into `__patch_old` —
    * each rename atomic, a crash mid-way is recovered by renaming back;
    * (3) rename new files in (part-file names carry a fresh UUID, so no
    * collision with live names); (4) only then drop `__patch_old`.
    */
  private def replaceFiles(touched: Seq[String], newData: DataFrame,
                           targetDir: String = dir,
                           expected: Option[String] = None): Unit = {
    // temp siblings always hang off the TABLE root, never inside it: a
    // `<partition>=x__patch_tmp` child of the root would parse as a bogus
    // partition value for any concurrent reader of the table. The tmp is
    // INVOCATION-UNIQUE for the same reason as rewriteWith's: a shared
    // name lets a concurrent patcher's overwrite stage clobber this one's
    // staged files mid-flight.
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(s"${dir}__patch_tmp_$token")
    val old = new Path(s"${dir}__patch_old")
    // repair ONLY when a prior patch left the live tree incomplete (moved-
    // aside originals) — that state is unreadable and recover() restores it
    // snapshot-aware. Stale __patch_tmp_* and a not-yet-started manifest
    // are a crashed writer's debris OR a live writer's staging; neither is
    // reclaimed here (round-10 review finding).
    if (patchRepairNeeded()) recover()
    stageOrAbort(tmp) { newData.write.mode("overwrite").parquet(tmp.toString) }
    val newFiles = ParquetStats.listParquetFiles(tmp.toString, hconf)
    preSwapHook()
    conflictCheck(expected, Seq(tmp))
    // a manifest surviving to this point is EITHER crash-before-any-rename
    // debris OR a live patcher that won the gate after our conflict check
    // and is mid-rename right now. Reclaiming it here (the round-10 first
    // attempt ran the manifest rollback) loses that distinction: rolling
    // back a LIVE patcher restores originals it is concurrently moving
    // aside and then recursively deletes its __patch_old — an original
    // renamed in between is gone from table, aside dir, AND archive.
    // Abort loudly instead; genuine debris is cleared by the quiesced
    // recover(), after which a retry proceeds.
    if (fs.exists(new Path(old, "_manifest"))) {
      fs.delete(tmp, true)
      throw new java.util.ConcurrentModificationException(
        s"optimistic-concurrency conflict on $dir: another patch's manifest is present " +
          s"at $old — a concurrent patcher is mid-commit, or a crashed patch left " +
          "debris (clear with a quiesced recover()). Aborted with nothing renamed — " +
          "re-read and retry.")
    }
    fs.mkdirs(old)
    // manifest BEFORE any rename: [[recover]] needs to know which live-name
    // files are replacements (delete on rollback) and where each moved-aside
    // original belongs — without it, a crash between steps 2 and 3 would be
    // ambiguous (rolling back originals while leaving new files in place
    // would duplicate rows). create-no-overwrite is the COMMIT GATE: two
    // patchers inside the same residual check-to-rename window serialize
    // here, and the loser aborts loudly with the live table untouched.
    val manifestWritten = HadoopText.writeIfAbsent(fs, new Path(old, "_manifest"),
      (touched.map(p => s"touched\t$p") ++
        newFiles.map(f => s"new\t$targetDir/${f.getName}")).mkString("\n"))
    if (!manifestWritten) {
      fs.delete(tmp, true)
      throw new java.util.ConcurrentModificationException(
        s"optimistic-concurrency conflict on $dir: another writer's patch manifest " +
          "appeared between this mutation's conflict check and its commit. Aborted " +
          "before any rename — staged output dropped, table untouched; re-read and retry.")
    }
    touched.foreach { f =>
      val p = new Path(f)
      if (!fs.rename(p, new Path(old, p.getName)))
        throw new java.io.IOException(s"patch: failed to move $p aside; run recover() " +
          s"(or rename $old/* back into $targetDir)")
    }
    newFiles.foreach { f =>
      if (!fs.rename(f, new Path(targetDir, f.getName)))
        throw new java.io.IOException(s"patch: failed to move $f into $targetDir; originals " +
          s"preserved in $old, rewrite in $tmp — run recover()")
    }
    // moved-aside originals a snapshot still pins go to the archive (they
    // sat at old/<basename>; their table-relative home is under targetDir)
    val relPrefix = if (targetDir == dir) "" else relativize(dir, new Path(targetDir)) + "/"
    archiveReferenced(old, p => relPrefix + p.getName)
    fs.delete(old, true)
    fs.delete(tmp, true)
  }

  private def writeTextFile(p: Path, text: String): Unit =
    HadoopText.write(fs, p, text)

  private def readTextFile(p: Path): String =
    HadoopText.read(fs, p)

  /** Recover from an interrupted `normalize`/`upsert`/`deleteWhere`/
    * `compactSmallFiles` swap — the one-rename (or manifest-driven) repair
    * the crash-safety contracts of [[rewriteWith]] and [[replaceFiles]]
    * promise. Idempotent; a no-op on a healthy table. Returns a summary of
    * the actions taken (empty = nothing to repair).
    *
    * Rewrite swaps: if the live dir is missing, roll-forward is
    * TOKEN-GATED — only the stage the `__swapper` marker names (written by
    * the swap before its first rename) is ever promoted, only if it is
    * COMPLETE (`_SUCCESS` present), and only if the marker carries the
    * second-line `checked` token the swap appends after its post-lock
    * fingerprint re-check passed (a single-line marker = the crash hit
    * inside the check window, where `__old` may hold a competitor's
    * committed table — rollback is the only safe resolution there).
    * Otherwise `__old` is rolled back
    * whenever it exists: always safe, because a crashed writer never
    * reported success. An unattributed complete stage is promoted only in
    * the no-`__old`, no-marker state (nothing else holds table content).
    * This ordering is what makes crashed-stage debris harmless: a stale
    * complete stage from an earlier writer can sit beside the table
    * forever without a later writer's crash mid-abort promoting it over
    * the committed table. Leftover temp dirs beside a healthy live dir
    * are simply dropped.
    *
    * Patch swaps: the `__patch_old/_manifest` written before any rename
    * lists every replacement file path and every moved-aside original, so
    * rollback is exact — replacements that made it into the table are
    * deleted (their fresh-UUID names cannot collide with originals),
    * originals are renamed back where they came from, and the temp dirs
    * dropped. Never loses data: every byte is in the table, `__patch_old`,
    * or a `__patch_tmp*` sibling at all times.
    *
    * QUIESCE CONTRACT: run recover() only when no writer is live on this
    * table. A rename-based staging protocol cannot distinguish a crashed
    * writer's debris from a live writer's in-flight staging, so recovery
    * while a writer runs can roll back its commit or reclaim its staging
    * mid-swap. Mutators therefore auto-recover only the states that make
    * the live tree unreadable (missing table dir, moved-aside patch
    * originals); everything else waits for this explicit, quiesced call.
    */
  def recover(): Seq[String] = {
    val actions = scala.collection.mutable.ListBuffer[String]()
    val nOld = new Path(s"${dir}__old")
    // staging dirs carry an invocation-unique suffix; the bare legacy names
    // are just the empty-suffix case of the same prefix
    val nTmps = stagingSiblings("__normalize_tmp")
    val pTmps = stagingSiblings("__patch_tmp")
    val marker = new Path(swapperMarker)
    if (!fs.exists(new Path(dir))) {
      val complete = nTmps.filter(t => fs.exists(new Path(t, "_SUCCESS")))
      // roll-forward is TOKEN-GATED: only the stage the crashed swap's own
      // __swapper marker names may be promoted — an unattributed complete
      // stage is some EARLIER writer's debris, and promoting it when __old
      // holds the committed table (a crash mid-abort after the post-lock
      // conflict check) would silently replace the live table with a
      // stale rewrite
      // ... and only a stage whose marker carries the second-line "checked"
      // token (appended after the post-lock fingerprint re-check passed).
      // A single-line marker means the crash hit INSIDE the check window:
      // __old may hold a competitor's committed table, so the only safe
      // resolution is rollback — roll-forward there is a lost update of a
      // write that reported success.
      val markerLines = (if (fs.exists(marker)) readTextFile(marker) else "")
        .split('\n').map(_.trim).filter(_.nonEmpty).toSeq
      val own = markerLines.headOption
        .filter(_ => markerLines.lift(1).contains("checked"))
        .map(new Path(_))
        .filter(t => complete.exists(_.getName == t.getName))
      if (own.isDefined) {
        // the in-flight swap finished writing; crash hit between the two
        // renames — roll FORWARD (the rewrite is the intended state)
        val nTmp = complete.find(_.getName == own.get.getName).get
        if (!fs.rename(nTmp, new Path(dir)))
          throw new java.io.IOException(s"recover: failed to move $nTmp into place")
        actions += s"completed interrupted rewrite: $nTmp -> $dir"
        if (fs.exists(nOld)) {
          val a = archiveReferenced(nOld, p => relativize(nOld.toString, p))
          if (a > 0) actions += s"archived $a snapshot-pinned file(s) from $nOld"
          fs.delete(nOld, true); actions += s"dropped $nOld"
        }
        for (t <- nTmps if t != nTmp && fs.exists(t)) {
          fs.delete(t, true); actions += s"dropped incomplete $t"
        }
        fs.delete(marker, false)
      } else if (fs.exists(nOld)) {
        // no token-authorized stage — roll back the original: always safe,
        // the crashed writer never reported success
        if (!fs.rename(nOld, new Path(dir)))
          throw new java.io.IOException(s"recover: failed to restore $nOld")
        actions += s"rolled back interrupted rewrite: $nOld -> $dir"
        for (t <- nTmps if fs.exists(t)) {
          fs.delete(t, true); actions += s"dropped incomplete $t"
        }
        if (fs.exists(marker)) fs.delete(marker, false)
      } else if (complete.size == 1) {
        // no __old and no marker (pre-token debris, or manual surgery):
        // the single complete stage is the only table content anywhere —
        // promote it
        val nTmp = complete.head
        if (!fs.rename(nTmp, new Path(dir)))
          throw new java.io.IOException(s"recover: failed to move $nTmp into place")
        actions += s"completed interrupted rewrite: $nTmp -> $dir"
        for (t <- nTmps if t != nTmp && fs.exists(t)) {
          fs.delete(t, true); actions += s"dropped incomplete $t"
        }
        if (fs.exists(marker)) fs.delete(marker, false)
      } else if (complete.size > 1) {
        throw new java.io.IOException(
          s"recover: $dir is missing with ${complete.size} complete staged rewrites " +
            s"(${complete.mkString(", ")}), none authorized by a __swapper marker, " +
            "and no __old to roll back to — pick one and rename it into place manually")
      }
    } else {
      // live dir healthy: any rewrite leftovers are droppable debris —
      // except files a snapshot pins (nOld held the previous table version)
      if (fs.exists(nOld)) {
        val a = archiveReferenced(nOld, p => relativize(nOld.toString, p))
        if (a > 0) actions += s"archived $a snapshot-pinned file(s) from $nOld"
      }
      for (p <- nTmps :+ nOld :+ marker if fs.exists(p)) {
        fs.delete(p, true); actions += s"dropped leftover $p"
      }
    }
    rollbackPatchOld(actions)
    for (t <- pTmps if fs.exists(t)) { fs.delete(t, true); actions += s"dropped $t" }
    actions.toList
  }

  /** Table-dir siblings whose name starts with `<tableName><prefix>` —
    * the invocation-unique staging dirs plus their bare legacy-named
    * forms. Metadata-sized: one listing of the parent directory.
    */
  private def stagingSiblings(prefix: String): Seq[Path] = {
    val base = new Path(dir)
    val parent = base.getParent
    val namePrefix = base.getName + prefix
    if (parent == null || !fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).iterator.map(_.getPath)
      .filter(_.getName.startsWith(namePrefix)).toSeq.sortBy(_.toString)
  }

  /** The manifest-driven exact rollback of `__patch_old` (the [[recover]]
    * patch-swap arm). No-op when `__patch_old` is absent. Quiesced-only,
    * like all of recover(): running it against a LIVE patcher's manifest
    * restores originals mid-rename and deletes its aside dir.
    */
  private def rollbackPatchOld(actions: scala.collection.mutable.ListBuffer[String]): Unit = {
    val pOld = new Path(s"${dir}__patch_old")
    if (fs.exists(pOld)) {
      val manifest = new Path(pOld, "_manifest")
      if (fs.exists(manifest)) {
        val lines = readTextFile(manifest).linesIterator.filter(_.nonEmpty).toSeq
        lines.collect { case l if l.startsWith("new\t") => new Path(l.stripPrefix("new\t")) }
          .foreach { p => if (fs.exists(p)) { fs.delete(p, false); actions += s"removed replacement $p" } }
        val touched = lines.collect {
          case l if l.startsWith("touched\t") => new Path(l.stripPrefix("touched\t"))
        }
        touched.foreach { orig =>
          val aside = new Path(pOld, orig.getName)
          // a crash mid-archive may have parked the original already —
          // restore from wherever it sits (table / aside / archive is an
          // exactly-one-of invariant for every byte)
          val archived = new Path(archiveRoot, relativize(dir, orig))
          if (!fs.exists(orig)) {
            if (fs.exists(aside)) {
              if (!fs.rename(aside, orig))
                throw new java.io.IOException(s"recover: failed to restore $aside -> $orig")
              actions += s"restored $orig"
            } else if (fs.exists(archived)) {
              if (!fs.rename(archived, orig))
                throw new java.io.IOException(s"recover: failed to restore $archived -> $orig")
              actions += s"restored $orig from archive"
            }
          }
        }
        // anything still aside that a snapshot pins is archived, not dropped
        val origByName = touched.map(p => p.getName -> p).toMap
        val a = archiveReferenced(pOld, p =>
          relativize(dir, origByName.getOrElse(p.getName, new Path(s"$dir/${p.getName}"))))
        if (a > 0) actions += s"archived $a snapshot-pinned file(s) from $pOld"
      }
      fs.delete(pOld, true); actions += s"dropped $pOld"
    }
  }

  /** Compact the small-file tail: bin-pack ONLY the files smaller than
    * `smallFraction · targetBytesPerFile` into ~target-sized replacements,
    * leaving every healthy-sized file physically untouched (same path, same
    * bytes, same mtime). Streaming merge sinks and repeated small appends
    * accrete a tail of tiny files; `normalize()` fixes that by rewriting
    * the WHOLE table — a 100 TB rewrite to repair a few GB of tail. This
    * scopes the rewrite so cost tracks the problem (bytes in small files),
    * not table size, and the commit is the same crash-safe file swap the
    * scoped upsert uses ([[replaceFiles]]).
    *
    * @param sortBy keep a range layout: pack small files range-partitioned
    *               and sorted so the replacements carry tight footer ranges
    *               like the rest of a `normalize(sortBy)` table
    * @return number of small files packed away (0 = nothing worth doing).
    *         Hive-partitioned layouts are packed PER PARTITION DIRECTORY:
    *         partition columns live in the directory names, not the files,
    *         so swapping files inside each partition dir preserves them —
    *         and streaming merge sinks + `create(partitionBy)` are exactly
    *         where small-file tails accrete.
    */
  def compactSmallFiles(targetBytesPerFile: Long, smallFraction: Double = 0.5,
                        sortBy: Seq[String] = Nil): Int = {
    require(smallFraction > 0 && smallFraction <= 1.0,
      s"smallFraction must be in (0, 1], got $smallFraction")
    if (!exists) 0
    else if (ParquetStats.listParquetFiles(dir, hconf).nonEmpty)
      compactDir(dir, targetBytesPerFile, smallFraction, sortBy)
    else
      // one sequential pass over partition leaves: each swap is scoped to
      // its own directory, so a crash mid-table leaves every other
      // partition fully intact (and the touched one recoverable, per
      // replaceFiles' contract)
      partitionLeafDirs(new Path(dir))
        .map(d => compactDir(d.toString, targetBytesPerFile, smallFraction, sortBy)).sum
  }

  /** Leaf `col=value` directories holding this table's data files. Only
    * hive-style names are descended into — temp siblings and metadata dirs
    * never match.
    */
  private def partitionLeafDirs(root: Path): Seq[Path] = {
    val subdirs = fs.listStatus(root).toIndexedSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    if (subdirs.isEmpty) Seq.empty
    else subdirs.map(_.getPath).flatMap { d =>
      val deeper = partitionLeafDirs(d)
      if (deeper.isEmpty) Seq(d) else deeper
    }
  }

  /** The bin-packing kernel of [[compactSmallFiles]], scoped to one
    * directory of files (the table root, or a single partition leaf).
    */
  private def compactDir(d: String, targetBytesPerFile: Long, smallFraction: Double,
                         sortBy: Seq[String]): Int = {
    val expect = Some(entryFingerprint())
    val small = ParquetStats.fileStats(d, hconf)
      .filter(_.fileBytes < (targetBytesPerFile * smallFraction).toLong)
    val bytes = small.map(_.fileBytes).sum
    // conservative 0.9 like normalizeToBytes: re-compression drift must not
    // overshoot the target
    val n = math.max(1, math.ceil(bytes.toDouble / (targetBytesPerFile * 0.9)).toInt)
    if (small.size <= n) 0 // packing would not reduce the file count
    else {
      val paths = small.map(_.path)
      val df = spark.read.option("mergeSchema", "true").parquet(paths: _*)
      val shaped =
        if (sortBy.nonEmpty)
          df.repartitionByRange(n, sortBy.map(c => col(s"`$c`")): _*)
            .sortWithinPartitions(sortBy.map(c => col(s"`$c`")): _*)
        else df.repartition(n)
      replaceFiles(paths, shaped, d, expect)
      small.size
    }
  }

  /** Normalize to a target FILE SIZE (the reference's actual goal — the
    * notebook's "6 GB file → ≤2 GB"): estimate bytes/row from the current
    * footers (compressed, i.e. as-stored) and convert to a row bound. The
    * estimate is conservative by `safety` so post-rewrite compression-ratio
    * drift doesn't overshoot the target.
    */
  /** @param zOrderBy mutually exclusive with sortBy: cluster the rewrite
    *  along a Z-order curve over these columns instead of a 1-D sort
    *  (multi-dimensional skipping, see [[normalizeZOrder]]).
    */
  def normalizeToBytes(targetBytesPerFile: Long, safety: Double = 0.9,
                       sortBy: Seq[String] = Nil, zOrderBy: Seq[String] = Nil): Unit = {
    require(sortBy.isEmpty || zOrderBy.isEmpty,
      "normalizeToBytes: pass sortBy OR zOrderBy, not both (one physical order per table)")
    val stats = fileStats
    val totalBytes = stats.map(_.fileBytes).sum
    val totalRows = stats.map(_.numRows).sum
    require(totalRows > 0, s"normalizeToBytes on empty table $dir")
    val bytesPerRow = math.max(1.0, totalBytes.toDouble / totalRows)
    val maxRows = math.max(1L, (targetBytesPerFile * safety / bytesPerRow).toLong)
    if (zOrderBy.nonEmpty) normalizeZOrder(maxRows, zOrderBy)
    else normalize(maxRows, sortBy)
  }

  /** Replication surface (reference R11: HuggingFace snapshot up/download,
    * `crystpqdb/download.py` — modeled as a parquet-dir copy, SURVEY §1.1):
    * export this table's files to another directory / open a table from a
    * replica. Distributed copy via a read+write (not a driver file loop),
    * so it scales with the cluster like any other job.
    */
  def exportTo(destDir: String): ParquetDatabase = {
    read().write.mode("overwrite").parquet(destDir)
    new ParquetDatabase(spark, destDir)
  }

  /** File-preserving replication with an integrity manifest — the
    * `snapshot_download` + threaded per-file upload shape of the
    * reference's remote replication (`crystpqdb/download.py:23-39`),
    * targeted at any Hadoop filesystem (local in this environment; the
    * same code paths run against a remote FS at scale).
    *
    * Unlike [[exportTo]] (a distributed read+write that rewrites the
    * physical layout), `pushTo` copies each parquet file BYTE-IDENTICALLY
    * with a bounded driver-side thread pool — layout, footers, and
    * row-group statistics survive, so a replica serves the same pruned
    * scans as the original. Each file is hashed (MD5) in-flight and the
    * (path, length, digest) triples land in `_graft_manifest` at the
    * destination; [[ParquetDatabase.pullFrom]] re-hashes on the way back
    * and fails loudly on any divergence — the transfer-integrity check the
    * reference gets from HF's etag validation.
    *
    * Scope: `pushTo` replicates the TABLE — the `*.parquet` data files
    * under the db dir (partition subdirs included). Sibling state dirs
    * (`__snapshots` manifests, `__archive` pinned files) are deliberately
    * not part of a replica: a replica is a readable table, not a clone of
    * the mutation history. Manifest lengths are additionally cross-checked
    * against the SOURCE FileStatus after each copy, so a short read (a
    * stream yielding EOF mid-file) cannot produce a truncated replica that
    * "verifies" against its own manifest.
    */
  def pushTo(destDir: String, parallelism: Int = 8): ParquetDatabase = {
    val destRoot = new Path(destDir)
    val dfs = destRoot.getFileSystem(hconf)
    if (dfs.exists(destRoot)) dfs.delete(destRoot, true)
    dfs.mkdirs(destRoot)
    val files = walkParquet(new Path(dir))
    val entries = ParquetDatabase.inThreadPool(parallelism, files) { p =>
      val rel = relativize(dir, p)
      val (len, md5) = ParquetDatabase.copyAndHash(fs, p, dfs, new Path(destRoot, rel))
      val srcLen = fs.getFileStatus(p).getLen
      if (len != srcLen)
        throw new ParquetDatabase.ReplicaIntegrityException(
          s"pushTo copied $len bytes of $rel but the source holds $srcLen — " +
            "short read during copy")
      s"$rel\t$len\t$md5"
    }
    val out = dfs.create(new Path(destRoot, ParquetDatabase.ManifestName), true)
    try out.write((entries.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    new ParquetDatabase(spark, destDir)
  }

  /** Physical layout stats (ParquetDB P7 introspection). */
  def fileStats: Seq[ParquetStats.FileStats] = ParquetStats.fileStats(dir, hconf)

  // ---- snapshots / time travel -----------------------------------------
  //
  // A snapshot is a MANIFEST (the table-relative parquet file list at tag
  // time), not a copy: parquet files are immutable once written, so a name
  // identifies its bytes forever (part-file names carry fresh UUIDs). The
  // mutation paths normally delete superseded files; while any snapshot
  // references them they are MOVED into `<dir>__archive` instead (same
  // relative layout), so a snapshot read resolves each manifest entry
  // against the live dir first and the archive second. Retention cost is
  // exactly the bytes a snapshot pins — nothing is copied, ever.

  private def snapshotsRoot = new Path(s"${dir}__snapshots")
  private[sources] def archiveRoot = new Path(s"${dir}__archive")

  private def relativize(root: String, p: Path): String = {
    // qualify both sides: `dir` may be a relative working-dir path while
    // filesystem listings come back as absolute URIs
    val r = fs.makeQualified(new Path(root)).toUri.getPath
    val f = fs.makeQualified(p).toUri.getPath
    require(f.startsWith(r + "/"), s"$p is not under $root")
    f.stripPrefix(r + "/")
  }

  /** Every parquet file under `root`, recursively (partition subdirs too). */
  private def walkParquet(root: Path): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else {
      val st = fs.listStatus(root).toIndexedSeq
      st.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).map(_.getPath) ++
        st.filter(_.isDirectory).flatMap(s => walkParquet(s.getPath))
    }

  /** Record the live table's file list under `tag`. O(listing) — no data
    * is read or copied; the files are pinned against deletion instead.
    */
  def snapshot(tag: String): Unit = {
    require(tag.nonEmpty && !tag.contains("/"), s"bad snapshot tag '$tag'")
    val m = new Path(snapshotsRoot, tag)
    require(!fs.exists(m), s"snapshot '$tag' already exists (snapshots are immutable)")
    val rels = walkParquet(new Path(dir)).map(p => relativize(dir, p))
    require(rels.nonEmpty, s"snapshot('$tag'): table $dir is empty")
    fs.mkdirs(snapshotsRoot)
    writeTextFile(m, rels.mkString("\n"))
  }

  def snapshots: Seq[String] =
    if (!fs.exists(snapshotsRoot)) Nil
    else fs.listStatus(snapshotsRoot).toIndexedSeq.map(_.getPath.getName).sorted

  private def snapshotRels(tag: String): Seq[String] = {
    val m = new Path(snapshotsRoot, tag)
    require(fs.exists(m), s"no snapshot '$tag' on $dir (have: ${snapshots.mkString(", ")})")
    readTextFile(m).linesIterator.filter(_.nonEmpty).toSeq
  }

  /** Table-relative paths some snapshot still references. */
  private def referencedRels: Set[String] =
    snapshots.flatMap(snapshotRels).toSet

  /** Resolve `tag`'s pinned table-relative paths against the live dir then
    * the archive: (live rels, archived rels). Fails loudly on files neither
    * root holds. Shared by [[readSnapshot]] and the `graft-snapshot` V2
    * read-option source.
    */
  private[sources] def resolveSnapshot(tag: String): (Seq[String], Seq[String]) = {
    val rels = snapshotRels(tag)
    val (live, gone) = rels.partition(r => fs.exists(new Path(s"$dir/$r")))
    val (arch, missing) = gone.partition(r => fs.exists(new Path(archiveRoot, r)))
    require(missing.isEmpty,
      s"snapshot '$tag' is unreadable — ${missing.size} file(s) gone (vacuumed after " +
        s"dropSnapshot, or archive deleted?): ${missing.take(3).mkString(", ")}")
    (live, arch)
  }

  /** Time-travel read: the table exactly as of `snapshot(tag)`. Files are
    * resolved live-first then archive; both roots share the relative
    * layout, so directory-encoded partition columns survive via basePath.
    */
  def readSnapshot(tag: String): DataFrame = {
    val (live, arch) = resolveSnapshot(tag)
    def part(root: String, rs: Seq[String]) =
      spark.read.option("mergeSchema", "true").option("basePath", root)
        .parquet(rs.map(r => s"$root/$r"): _*)
    if (arch.isEmpty) part(dir, live)
    else if (live.isEmpty) part(archiveRoot.toString, arch)
    else part(dir, live).unionByName(part(archiveRoot.toString, arch),
      allowMissingColumns = true)
  }

  /** Forget `tag`. Pinned bytes are reclaimed by [[vacuumSnapshots]]. */
  def dropSnapshot(tag: String): Unit = {
    val m = new Path(snapshotsRoot, tag)
    require(fs.exists(m), s"no snapshot '$tag' on $dir")
    fs.delete(m, false)
  }

  /** Delete archived files no remaining snapshot references; returns the
    * number removed. Files a live snapshot still pins are kept.
    */
  def vacuumSnapshots(): Int = {
    val refs = referencedRels
    var removed = 0
    walkParquet(archiveRoot).foreach { p =>
      if (!refs.contains(relativize(archiveRoot.toString, p))) {
        fs.delete(p, false); removed += 1
      }
    }
    if (fs.exists(archiveRoot) && walkParquet(archiveRoot).isEmpty)
      fs.delete(archiveRoot, true)
    removed
  }

  /** Retention: keep the `keepLast` most recent snapshots (by manifest
    * creation time), drop the rest, and vacuum unpinned archive bytes in
    * one pass. Returns the dropped tags — the lifecycle hook a deployment
    * calls after each tag ("keep a week of dailies").
    */
  def pruneSnapshots(keepLast: Int): Seq[String] = {
    require(keepLast >= 0, s"pruneSnapshots: keepLast must be >= 0, got $keepLast")
    if (!fs.exists(snapshotsRoot)) return Nil
    val byAge = fs.listStatus(snapshotsRoot).toIndexedSeq
      .sortBy(s => (s.getModificationTime, s.getPath.getName))
    val drop = byAge.dropRight(keepLast).map(_.getPath.getName)
    drop.foreach(dropSnapshot)
    vacuumSnapshots()
    drop
  }

  /** Policy retention on top of [[pruneSnapshots]]: drop every snapshot
    * that is beyond the `maxCount` newest OR older than `maxAgeMillis`
    * (manifest creation time), then vacuum unpinned archive bytes — the
    * "keep 7 dailies, nothing older than a month" lifecycle rule a table
    * owner sets once instead of hand-dropping tags. Either bound defaults
    * to unbounded; `nowMillis` is injectable so policies are testable and
    * replayable. Returns the dropped tags. Snapshots the policy RETAINS
    * stay fully readable — vacuum honors their pins.
    */
  def applyRetention(maxCount: Int = Int.MaxValue,
      maxAgeMillis: Long = Long.MaxValue,
      nowMillis: Long = System.currentTimeMillis()): Seq[String] = {
    require(maxCount >= 0, s"applyRetention: maxCount must be >= 0, got $maxCount")
    require(maxAgeMillis >= 0, s"applyRetention: maxAgeMillis must be >= 0, got $maxAgeMillis")
    if (!fs.exists(snapshotsRoot)) return Nil
    val byAge = fs.listStatus(snapshotsRoot).toIndexedSeq
      .sortBy(s => (s.getModificationTime, s.getPath.getName))
    val overCount = byAge.dropRight(maxCount).map(_.getPath.getName).toSet
    val cutoff = nowMillis - maxAgeMillis
    val overAge = byAge.filter(_.getModificationTime < cutoff)
      .map(_.getPath.getName).toSet
    val drop = byAge.map(_.getPath.getName).filter(t => overCount(t) || overAge(t))
    drop.foreach(dropSnapshot)
    vacuumSnapshots()
    drop
  }

  /** Tag a snapshot and apply the retention policy in one call — the
    * auto-vacuum form: `db.snapshot(today, maxCount = 7)` keeps a rolling
    * week without a separate lifecycle job. Returns the dropped tags.
    */
  def snapshot(tag: String, maxCount: Int, maxAgeMillis: Long = Long.MaxValue): Seq[String] = {
    snapshot(tag)
    applyRetention(maxCount, maxAgeMillis)
  }

  /** Replicate the table AS OF `tag` into `destDir` (the time-travel form
    * of [[exportTo]]): a distributed read+write of the pinned file list —
    * the "reproduce last week's training corpus" hook.
    */
  def exportSnapshot(tag: String, destDir: String): ParquetDatabase = {
    readSnapshot(tag).write.mode("overwrite").parquet(destDir)
    new ParquetDatabase(spark, destDir)
  }

  /** Move every snapshot-referenced parquet file under `root` into the
    * archive before `root` is deleted; `relOf` maps each file to its
    * table-relative path. Files already present in the archive (same
    * immutable name) are simply dropped from `root`. Returns moved count.
    */
  private def archiveReferenced(root: Path, relOf: Path => String): Int = {
    val refs = referencedRels
    if (refs.isEmpty) return 0
    var moved = 0
    walkParquet(root).foreach { p =>
      val rel = relOf(p)
      if (refs.contains(rel)) {
        val dest = new Path(archiveRoot, rel)
        fs.mkdirs(dest.getParent)
        if (fs.exists(dest)) fs.delete(p, false)
        else if (!fs.rename(p, dest))
          throw new java.io.IOException(s"archive: failed to move $p -> $dest")
        moved += 1
      }
    }
    moved
  }
}

object ParquetDatabase {

  val ManifestName = "_graft_manifest"

  /** Named failure for a replica whose bytes don't match its manifest. */
  final class ReplicaIntegrityException(msg: String)
    extends java.io.IOException(msg)

  /** Run `f` over `items` on a bounded thread pool, propagating the first
    * failure. Driver-side by design: replication I/O is per-FILE streaming
    * (no data interpretation), and a bounded pool saturates a filesystem
    * endpoint the way the reference's threaded uploader does — a Spark job
    * would serialize closures to move bytes no executor needs to see.
    */
  private[sources] def inThreadPool[A, B](parallelism: Int, items: Seq[A])(f: A => B): Seq[B] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, items.size max 1)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try Await.result(Future.sequence(items.map(a => Future(f(a)))), Duration.Inf)
    finally pool.shutdown()
  }

  /** Stream-copy one file, MD5-hashing the bytes in flight; returns
    * (length, hex digest). 1 MiB buffer — large enough to amortize FS
    * round-trips, small enough for `parallelism` concurrent streams.
    */
  private[sources] def copyAndHash(
      srcFs: org.apache.hadoop.fs.FileSystem, src: Path,
      dstFs: org.apache.hadoop.fs.FileSystem, dst: Path): (Long, String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    dstFs.mkdirs(dst.getParent)
    val in = srcFs.open(src)
    val out = dstFs.create(dst, true)
    var total = 0L
    try {
      val buf = new Array[Byte](1 << 20)
      var n = in.read(buf)
      while (n > 0) {
        md.update(buf, 0, n)
        out.write(buf, 0, n)
        total += n
        n = in.read(buf)
      }
    } finally { in.close(); out.close() }
    (total, md.digest().map("%02x".format(_)).mkString)
  }

  /** Hash a file without copying it; returns (length, hex digest). */
  private def hashOnly(fs: org.apache.hadoop.fs.FileSystem, p: Path): (Long, String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = fs.open(p)
    var total = 0L
    try {
      val buf = new Array[Byte](1 << 20)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); total += n; n = in.read(buf) }
    } finally in.close()
    (total, md.digest().map("%02x".format(_)).mkString)
  }

  /** Pull a pushed replica into `destDir`, verifying EVERY file against the
    * source's `_graft_manifest` while the bytes stream through. All
    * divergences (missing file, length mismatch, digest mismatch) are
    * collected and reported in ONE [[ReplicaIntegrityException]] — a
    * corrupted replica names every bad file, not just the first. Nothing is
    * half-applied on failure: the destination is written to a temp dir and
    * renamed into place only after the whole manifest verifies.
    *
    * Object-store posture (no atomic rename): the promote step may itself
    * be a per-file copy that dies midway. The protocol's guarantee there is
    * DETECTION, not atomicity — the manifest travels with the data (written
    * into the temp dir before promote), so a partial promote under the
    * final name always fails [[verifyReplica]] (absent manifest, or named
    * missing files) and recovery is a plain re-pull. The protocol never
    * LISTS the destination it wrote (files are addressed by manifest-
    * derived names), so list-after-write lag cannot corrupt it —
    * ObjectStoreReplicationSpec asserts both properties against a
    * rename-by-copy filesystem with injected mid-promote crashes.
    */
  def pullFrom(spark: SparkSession, srcDir: String, destDir: String,
      parallelism: Int = 8): ParquetDatabase = {
    val conf = spark.sessionState.newHadoopConf()
    val srcRoot = new Path(srcDir)
    val srcFs = srcRoot.getFileSystem(conf)
    val manifestPath = new Path(srcRoot, ManifestName)
    if (!srcFs.exists(manifestPath))
      throw new ReplicaIntegrityException(
        s"$srcDir has no $ManifestName — not a pushed replica (use pushTo to create one)")
    val manifestBytes = {
      val len = srcFs.getFileStatus(manifestPath).getLen.toInt
      val buf = new Array[Byte](len)
      val in = srcFs.open(manifestPath)
      try in.readFully(buf) finally in.close()
      buf
    }
    val manifest =
      new String(manifestBytes, java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").toIndexedSeq.filter(_.nonEmpty).map { line =>
          val Array(rel, lenS, md5) = line.split("\t")
          (rel, lenS.toLong, md5)
        }
    val destRoot = new Path(destDir)
    val destFs = destRoot.getFileSystem(conf)
    val tmpRoot = new Path(destDir + "__pull_tmp")
    if (destFs.exists(tmpRoot)) destFs.delete(tmpRoot, true)
    destFs.mkdirs(tmpRoot)
    val problems = inThreadPool(parallelism, manifest) { case (rel, wantLen, wantMd5) =>
      val src = new Path(srcRoot, rel)
      if (!srcFs.exists(src)) Some(s"$rel: missing from replica")
      else {
        val (gotLen, gotMd5) = copyAndHash(srcFs, src, destFs, new Path(tmpRoot, rel))
        if (gotLen != wantLen) Some(s"$rel: length $gotLen != manifest $wantLen")
        else if (gotMd5 != wantMd5) Some(s"$rel: md5 $gotMd5 != manifest $wantMd5")
        else None
      }
    }.flatten
    if (problems.nonEmpty) {
      destFs.delete(tmpRoot, true)
      throw new ReplicaIntegrityException(
        s"replica $srcDir failed integrity verification (${problems.size} file(s)):\n  " +
          problems.mkString("\n  "))
    }
    // land the manifest WITH the data: the pulled dir is itself a
    // re-auditable (and re-pushable) replica, and — critically for targets
    // without atomic rename, where the promote below is a per-file
    // copy+delete that can die midway — a partial promote under the final
    // name can never pass verifyReplica: either the manifest is absent or
    // it names every missing file. Parquet readers skip `_`-prefixed files,
    // so the table read is unaffected.
    val mOut = destFs.create(new Path(tmpRoot, ManifestName), true)
    try mOut.write(manifestBytes) finally mOut.close()
    if (destFs.exists(destRoot)) destFs.delete(destRoot, true)
    if (!destFs.rename(tmpRoot, destRoot))
      throw new java.io.IOException(s"pull: failed to move $tmpRoot -> $destRoot")
    new ParquetDatabase(spark, destDir)
  }

  /** Re-hash an existing replica in place against its own manifest —
    * the integrity audit without a copy. Returns the divergence list
    * (empty = verified).
    */
  def verifyReplica(spark: SparkSession, dir: String, parallelism: Int = 8): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val manifestPath = new Path(root, ManifestName)
    if (!fs.exists(manifestPath)) return Seq(s"$dir has no $ManifestName")
    val len = fs.getFileStatus(manifestPath).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(manifestPath)
    try in.readFully(buf) finally in.close()
    val manifest = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toIndexedSeq.filter(_.nonEmpty).map { line =>
        val Array(rel, lenS, md5) = line.split("\t")
        (rel, lenS.toLong, md5)
      }
    inThreadPool(parallelism, manifest) { case (rel, wantLen, wantMd5) =>
      val p = new Path(root, rel)
      if (!fs.exists(p)) Some(s"$rel: missing")
      else {
        val (gotLen, gotMd5) = hashOnly(fs, p)
        if (gotLen != wantLen) Some(s"$rel: length $gotLen != manifest $wantLen")
        else if (gotMd5 != wantMd5) Some(s"$rel: md5 $gotMd5 != manifest $wantMd5")
        else None
      }
    }.flatten
  }
}
