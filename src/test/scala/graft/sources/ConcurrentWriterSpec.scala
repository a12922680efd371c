package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Optimistic-concurrency drills: two interleaved writers on one table.
  * The `preSwapHook` seam fires after writer A has staged its replacement
  * data and immediately before its conflict check + renames — exactly the
  * point a concurrent writer B's commit must be detected at.
  */
class ConcurrentWriterSpec extends SparkSpec {
  import spark.implicits._

  private def freshDb(name: String): ParquetDatabase = {
    val dir = s"target/tmp/pqdb_ccw/$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    // sweep the table AND every state sibling (`__snapshots`, `__old`,
    // invocation-unique `__normalize_tmp_<token>` debris, …) by prefix —
    // fixed-name deletion leaks the unique-suffixed staging across reruns
    if (fs.exists(p.getParent))
      fs.listStatus(p.getParent).map(_.getPath)
        .filter(s => s.getName == name || s.getName.startsWith(name + "__"))
        .foreach(fs.delete(_, true))
    new ParquetDatabase(spark, dir)
  }

  test("stress: two genuinely concurrent writers converge with every committed mutation applied") {
    // real threads, real races: each writer deletes its own disjoint id
    // slices through the whole-dir rewrite path, retrying on the protocol's
    // loud aborts (ConcurrentModificationException from the CAS / gates,
    // IOException from a lost rename race or a peer's entry-recover rolling
    // a complete stage forward). The protocol's promise is NOT that
    // interleavings never collide — it is that every collision is loud,
    // the table stays readable, and a retry converges with no committed
    // row silently lost or resurrected.
    val a = freshDb("stress2w")
    a.create(spark.range(600).select(col("id"), (col("id") % 3).as("g")),
      partitionBy = Seq("g"))
    val slices = Map(
      0 -> Seq((560L, 580L), (500L, 520L), (440L, 460L), (380L, 400L)),
      1 -> Seq((580L, 600L), (520L, 540L), (460L, 480L), (400L, 420L)))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = slices.map { case (tid, ranges) =>
      new Thread(() => {
        val db = new ParquetDatabase(spark, a.dir)
        try ranges.foreach { case (lo, hi) =>
          var attempt = 0
          var done = false
          while (!done) {
            try { db.deleteWhere(col("id") >= lo && col("id") < hi); done = true }
            catch {
              // the protocol's retryable aborts: CAS/gate conflicts (CME,
              // incl. files-vanished-mid-scan mapped by stageOrAbort), a
              // lost rename race (IOException), and the table dir briefly
              // absent at the eager read while a peer is mid-swap
              // (AnalysisException PATH_NOT_FOUND)
              case e @ (_: java.util.ConcurrentModificationException | _: java.io.IOException
                        | _: org.apache.spark.sql.AnalysisException) =>
                attempt += 1
                if (attempt > 30) throw new IllegalStateException(
                  s"writer $tid failed to converge on [$lo,$hi) after 30 retries", e)
                Thread.sleep(20L * attempt)
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      }, s"stress-writer-$tid")
    }.toSeq
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(errors.isEmpty, s"writer errors: ${errors.toArray.mkString("; ")}")
    // every slice applied exactly once: the surviving ids are EXACTLY the
    // complement of the union of all slices — no committed delete lost, no
    // deleted row resurrected by a stale stage landing late
    val deleted = slices.values.flatten.toSeq
    val expectedSurvivors = (0L until 600L)
      .filterNot(id => deleted.exists { case (lo, hi) => id >= lo && id < hi })
    assert(a.nRows === expectedSurvivors.size.toLong)
    val got = a.read().select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got === expectedSurvivors, "surviving id set diverged from the slice complement")
    // the table is healthy; anything recover() finds is droppable staging
    // debris from aborted attempts, never a rollback/restore
    val acts = a.recover()
    assert(!acts.exists(s => s.contains("rolled back") || s.contains("restored")
      || s.contains("completed")), acts.mkString("; "))
  }

  test("HadoopText.writeIfAbsent never overwrites: the loser sees false, content survives") {
    // the commit gate replaceFiles and appendToIvfIndex serialize on
    val fs = new org.apache.hadoop.fs.Path("target/tmp")
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val p = new org.apache.hadoop.fs.Path(
      s"target/tmp/pqdb_ccw/gate_${java.util.UUID.randomUUID().toString.take(8)}")
    assert(HadoopText.writeIfAbsent(fs, p, "winner"))
    assert(!HadoopText.writeIfAbsent(fs, p, "loser"))
    assert(HadoopText.read(fs, p) === "winner")
    fs.delete(p, false)
  }

  test("writeIfAbsent never resurrects a missing parent dir (a store renamed aside mid-swap)") {
    // claiming a marker inside a store whose dir a rebalance/swap just
    // renamed away must FAIL, not mkdirs the dir back: an empty resurrected
    // dir makes the swapper's promote rename NEST inside it
    val fs = new org.apache.hadoop.fs.Path("target/tmp")
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val parent = new org.apache.hadoop.fs.Path(
      s"target/tmp/pqdb_ccw/absent_${java.util.UUID.randomUUID().toString.take(8)}")
    intercept[java.io.IOException](
      HadoopText.writeIfAbsent(fs, new org.apache.hadoop.fs.Path(parent, "_marker"), "x"))
    assert(!fs.exists(parent), "the failed claim must not recreate the store dir")
  }

  test("interleaved upserts: the second committer wins, the stale one aborts with nothing lost") {
    val a = freshDb("interleave")
    a.create(spark.range(100).select(col("id"), lit("base").as("v")))
    a.normalize(maxRowsPerFile = 25, sortBy = Seq("id")) // ranged files → scoped patch path
    val b = new ParquetDatabase(spark, a.dir)
    // writer B commits an upsert while writer A is between read and swap
    a.preSwapHook = () =>
      b.upsert(Seq((7L, "from-b")).toDF("id", "v"), "id")
    val e = intercept[java.util.ConcurrentModificationException] {
      a.upsert(Seq((3L, "from-a")).toDF("id", "v"), "id")
    }
    a.preSwapHook = () => ()
    assert(e.getMessage.contains("optimistic-concurrency conflict"))
    // B's committed write survives; A's aborted write left no trace
    val rows = a.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size === 100)
    assert(rows(7L) === "from-b")
    assert(rows(3L) === "base")
    // no swap debris: the abort happened before any rename
    val fs = new org.apache.hadoop.fs.Path(a.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    Seq("__patch_tmp", "__patch_old", "__normalize_tmp", "__old").foreach(sfx =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(a.dir + sfx)), s"debris at $sfx"))
    // the aborted writer retries against the fresh state and succeeds
    a.upsert(Seq((3L, "from-a")).toDF("id", "v"), "id")
    val after = a.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after(3L) === "from-a" && after(7L) === "from-b")
  }

  test("a concurrent append fails a full-table rewrite (normalize) instead of being dropped") {
    val a = freshDb("appendvsnorm")
    a.create(spark.range(1000).toDF("id"))
    val b = new ParquetDatabase(spark, a.dir)
    a.preSwapHook = () => b.create(spark.range(1000, 1010).toDF("id"))
    intercept[java.util.ConcurrentModificationException] {
      a.normalize(maxRowsPerFile = 100)
    }
    a.preSwapHook = () => ()
    // the appended batch is intact — a silent normalize would have dropped it
    assert(a.nRows === 1010L)
    a.normalize(maxRowsPerFile = 100) // retry on fresh state succeeds
    assert(a.nRows === 1010L)
  }

  test("a benign concurrent entry does not reclaim a live writer's staging") {
    // round-10 review finding: entry-point auto-recover treated a LIVE
    // writer's __normalize_tmp as crash debris — writer B entering any
    // mutator while A was staged (but pre-swap) deleted A's tmp; A's
    // conflict check then passed (B committed nothing), rename(dir -> __old)
    // succeeded, rename(tmp -> dir) failed, and the table was GONE until a
    // manual recover(). Auto-recover now fires only when the live tree is
    // unreadable, so A must complete.
    val a = freshDb("benignentry")
    a.create(spark.range(500).toDF("id"))
    val b = new ParquetDatabase(spark, a.dir)
    a.preSwapHook = () => b.deleteWhere(col("id") > 10000) // matches nothing, commits nothing
    a.normalize(maxRowsPerFile = 100)
    a.preSwapHook = () => ()
    assert(a.nRows === 500L) // table present and intact — no stranded swap
    val fs = new org.apache.hadoop.fs.Path(a.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    Seq("__normalize_tmp", "__old").foreach(sfx =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(a.dir + sfx)), s"debris at $sfx"))
  }

  test("a crashed rewrite's stale staging never blocks the next writer; recover() sweeps it") {
    // the narrowed entry-recover must not break single-writer crash flow:
    // stale __old (a crash after its swap committed) is reclaimed by the
    // next rewrite once its conflict check passed; stale staging is simply
    // IGNORED (each invocation stages under its own unique name) and waits
    // for the quiesced recover() — a writer cannot tell dead staging from
    // a live peer's, so it must not reclaim it inline
    val a = freshDb("staledebris")
    a.create(spark.range(100).toDF("id"))
    val fs = new org.apache.hadoop.fs.Path(a.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    // fake crash debris: a half-written tmp and a committed-but-uncleaned old
    fs.mkdirs(new org.apache.hadoop.fs.Path(a.dir + "__normalize_tmp_dead1"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(a.dir + "__old"))
    a.normalize(maxRowsPerFile = 50)
    assert(a.nRows === 100L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(a.dir + "__old")), "stale __old not reclaimed")
    assert(fs.exists(new org.apache.hadoop.fs.Path(a.dir + "__normalize_tmp_dead1")),
      "stale staging must be left for the quiesced recover(), not reclaimed inline")
    val acts = a.recover()
    assert(acts.exists(_.contains("__normalize_tmp_dead1")), acts.mkString("; "))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(a.dir + "__normalize_tmp_dead1")))
    assert(a.nRows === 100L)
  }

  test("concurrent stagers cannot clobber each other: a committer lands ITS bytes") {
    // with a SHARED staging name, writer B's overwrite-mode stage replaced
    // writer A's staged bytes while A sat pre-swap; A's conflict check then
    // passed (the live table never changed) and A committed B's content
    // while reporting its own mutation succeeded — a silent lost update
    // with a stage-duration-wide window. Staging is now invocation-unique.
    val a = freshDb("stageiso")
    a.create(spark.range(500).select(col("id"), (col("id") % 5).as("g")),
      partitionBy = Seq("g"))
    val b = new ParquetDatabase(spark, a.dir)
    b.preSwapHook = () => throw new RuntimeException("simulated crash pre-swap")
    a.preSwapHook = () => {
      // b stages a DIFFERENT rewrite (delete >= 400) and dies before its
      // swap, leaving b's staged bytes on disk while a is pre-swap
      intercept[RuntimeException] { b.deleteWhere(col("id") >= 400) }
      ()
    }
    a.deleteWhere(col("id") >= 450) // partitioned layout -> whole-dir rewrite path
    a.preSwapHook = () => ()
    assert(a.nRows === 450L) // a's bytes, not b's 400-row stage
    // b's orphaned stage is debris for the quiesced recover()
    val acts = a.recover()
    assert(acts.exists(_.contains("__normalize_tmp")), acts.mkString("; "))
    assert(a.nRows === 450L)
  }

  test("a commit landing inside the check-to-rename gap is detected post-rename, not dropped") {
    // the narrowest race: writer B fully commits AFTER writer A's conflict
    // check passes and BEFORE A's dir -> __old rename. A's rename then
    // succeeds — against B's COMMITTED table — and without the post-lock
    // re-check A would commit its stage over it, silently dropping B's
    // rows with both writers reporting success. The re-check fingerprints
    // the moved-aside tree (rename preserves lengths/mtimes), restores it,
    // and aborts A.
    val a = freshDb("gapcommit")
    a.create(spark.range(500).select(col("id"), (col("id") % 5).as("g")),
      partitionBy = Seq("g"))
    val b = new ParquetDatabase(spark, a.dir)
    a.preRenameHook = () => b.deleteWhere(col("id") >= 400) // full commit inside the gap
    val ex = intercept[java.util.ConcurrentModificationException] {
      a.deleteWhere(col("id") >= 450)
    }
    a.preRenameHook = () => ()
    assert(ex.getMessage.contains("swap rename"))
    assert(a.nRows === 400L) // B's committed table survived; A's stage dropped
    val fs = new org.apache.hadoop.fs.Path(a.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(a.dir + "__old")), "swap debris left behind")
  }

  test("a crash between the retire rename and the post-lock re-check rolls BACK, never promotes the stale stage") {
    // writer A passes its conflict check; writer B fully commits inside the
    // check-to-rename gap; A's dir -> __old rename succeeds — moving B's
    // COMMITTED table aside — and A dies BEFORE the post-lock re-check that
    // would have caught the conflict. A's staged rewrite is COMPLETE
    // (_SUCCESS present) and the __swapper marker names it, but the marker
    // lacks the second-line "checked" token (appended only after the
    // re-check passes) — so recover() must roll B's table BACK, not promote
    // A's stale stage (which would delete a committed write that reported
    // success: the round-11 advice finding).
    val a = freshDb("retirecrash")
    a.create(spark.range(500).select(col("id"), (col("id") % 5).as("g")),
      partitionBy = Seq("g"))
    val b = new ParquetDatabase(spark, a.dir)
    a.preRenameHook = () => b.deleteWhere(col("id") >= 400) // full commit inside the gap
    a.postRetireHook = () => throw new RuntimeException("simulated crash post-retire")
    intercept[RuntimeException] { a.deleteWhere(col("id") >= 450) }
    a.preRenameHook = () => ()
    a.postRetireHook = () => ()
    val fs = new org.apache.hadoop.fs.Path(a.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    // crash state: dir missing, __old = B's committed 400-row table, A's
    // complete stage on disk with a single-line swapper marker naming it
    assert(!fs.exists(new org.apache.hadoop.fs.Path(a.dir)), "crash state: dir should be missing")
    assert(fs.exists(new org.apache.hadoop.fs.Path(a.dir + "__old")))
    val acts = a.recover()
    assert(acts.exists(_.contains("rolled back")), acts.mkString("; "))
    assert(a.nRows === 400L, "B's committed table must survive; A's 450-row stage must not be promoted")
  }

  test("a foreign patch manifest aborts the patcher loudly; recover() clears it for retry") {
    // a manifest at __patch_old when a patcher reaches its commit step is
    // either crash debris or a LIVE patcher mid-rename — indistinguishable,
    // so the only safe move is a loud abort (the first round-10 cut ran the
    // manifest rollback here, which could restore a live patcher's
    // originals mid-rename and then delete files it was moving aside)
    val a = freshDb("patchgate")
    a.create(spark.range(100).toDF("id").repartition(2))
    val fs = new org.apache.hadoop.fs.Path(a.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val pOld = new org.apache.hadoop.fs.Path(a.dir + "__patch_old")
    fs.mkdirs(pOld)
    HadoopText.write(fs, new org.apache.hadoop.fs.Path(pOld, "_manifest"), "")
    val ex = intercept[java.util.ConcurrentModificationException] {
      a.deleteWhere(col("id") >= 50) // flat layout -> patch path
    }
    assert(ex.getMessage.contains("manifest"))
    assert(a.nRows === 100L) // nothing renamed
    a.recover() // quiesced: clears the (empty-manifest) debris
    a.deleteWhere(col("id") >= 50)
    assert(a.nRows === 50L)
  }

  test("deleteWhere detects a concurrent commit; unchanged tables fingerprint-stably mutate") {
    val a = freshDb("delconflict")
    a.create(spark.range(50).select(col("id"), (col("id") % 5).as("g")))
    val b = new ParquetDatabase(spark, a.dir)
    a.preSwapHook = () => b.upsert(Seq((60L, 1L)).toDF("id", "g"), "id")
    intercept[java.util.ConcurrentModificationException] {
      a.deleteWhere(col("g") === 2L)
    }
    a.preSwapHook = () => ()
    assert(a.nRows === 51L) // b's row landed, nothing deleted
    // without interference the same mutation goes through (no false positive)
    a.deleteWhere(col("g") === 2L)
    assert(a.read().filter(col("g") === 2L).count() === 0L)
  }

  test("vanished-file remap: mid-swap dir-absent window is a conflict, a truly missing dir is raw") {
    // the classification gate behind every staged mutation: a read failing
    // because files vanished is a retryable conflict ONLY while the table
    // plausibly still lives. Three cases, driven directly through the seam:
    val a = freshDb("vanishcls")
    a.create(spark.range(10).toDF("id"))
    val vanish = new java.io.FileNotFoundException("part-00000 gone")
    // 1. table dir present -> conflict (the common peer-swap signature)
    intercept[java.util.ConcurrentModificationException] {
      a.conflictIfVanished("test read")(throw vanish)
    }
    // 2. dir retired to __old mid-swap (dir absent, __old present) -> still
    // a conflict: the stress drill caught the single-probe form rethrowing
    // raw exactly in this window
    val fs = new org.apache.hadoop.fs.Path(a.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(fs.rename(new org.apache.hadoop.fs.Path(a.dir),
      new org.apache.hadoop.fs.Path(a.dir + "__old")))
    intercept[java.util.ConcurrentModificationException] {
      a.conflictIfVanished("test read")(throw vanish)
    }
    assert(fs.rename(new org.apache.hadoop.fs.Path(a.dir + "__old"),
      new org.apache.hadoop.fs.Path(a.dir)))
    // 3. table dir (and __old) genuinely absent -> the raw error survives,
    // so retry-looping callers can't spin on a mistyped path
    val gone = new ParquetDatabase(spark, a.dir + "_nonexistent")
    val raw = intercept[java.io.FileNotFoundException] {
      gone.conflictIfVanished("test read")(throw vanish)
    }
    assert(raw eq vanish)
    // non-vanish failures always pass through untouched
    intercept[IllegalStateException] {
      a.conflictIfVanished("test read")(throw new IllegalStateException("boom"))
    }
  }
}
