package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParquetDatabaseSpec extends SparkSpec {
  import spark.implicits._

  private def freshDb(name: String): ParquetDatabase = {
    val dir = s"target/tmp/pqdb/$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
    new ParquetDatabase(spark, dir)
  }

  test("create + read round-trips with schema evolution across batches") {
    val db = freshDb("evolve")
    db.create(Seq((1L, "a")).toDF("id", "x"))
    db.create(Seq((2L, 3.5)).toDF("id", "y"))
    val out = db.read().orderBy("id").collect()
    assert(db.nColumns === 3)
    assert(out(0).getAs[String]("x") === "a" && out(0).isNullAt(out(0).fieldIndex("y")))
    assert(out(1).isNullAt(out(1).fieldIndex("x")) && out(1).getAs[Double]("y") === 3.5)
  }

  test("normalize bounds rows per file and preserves data; old dir cleaned up") {
    val db = freshDb("norm")
    db.create(spark.range(10000).select(col("id"), (col("id") % 7).as("g")))
    db.normalize(maxRowsPerFile = 1000)
    val stats = db.fileStats
    assert(stats.map(_.numRows).sum === 10000L)
    assert(stats.forall(_.numRows <= 1000L))
    assert(stats.size >= 10)
    val fs = new org.apache.hadoop.fs.Path(db.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(db.dir + "__old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(db.dir + "__normalize_tmp")))
  }

  test("normalize(sortBy) lays out disjoint key ranges per file (data skipping)") {
    val db = freshDb("normsort")
    // write shuffled ids so the sort actually has to move data
    db.create(spark.range(10000)
      .select((col("id") * 2654435761L % 10000).as("id")))
    db.normalize(maxRowsPerFile = 2500, sortBy = Seq("id"))
    val files = ParquetStats.listParquetFiles(db.dir, spark.sessionState.newHadoopConf()).map(_.toString)
    assert(files.size >= 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min("id"),
          org.apache.spark.sql.functions.max("id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlapping ranges $ranges")
      case _ =>
    }
  }

  test("upsert replaces matching keys, appends new ones; deleteWhere filters in place") {
    val db = freshDb("upsert")
    db.create(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "x", "v"))
    db.upsert(Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("id", "x", "v"), "id")
    val rows = db.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows === Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    db.deleteWhere(col("v") === 40.0)
    assert(db.read().orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // crash-safe temp dirs cleaned up after both rewrites
    val fs = new org.apache.hadoop.fs.Path(db.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    for (suffix <- Seq("__old", "__normalize_tmp", "__patch_old", "__patch_tmp"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(db.dir + suffix)), suffix)
  }

  test("a type-divergent patch conforms to the table's schema instead of stranding mixed files") {
    // caught by the cross-process drill (round 13): the file-scoped patch
    // path appends the patch's rows as NEW files beside untouched ones, so a
    // patch whose column types differ from the table's (here INT columns
    // patched with BIGINT — the shape partition-dir inference produces)
    // would leave per-file schemas parquet cannot merge and every later
    // read() would fail, long after the upsert reported success
    val db = freshDb("typeconform")
    db.create(spark.range(100).select(col("id"),
      (col("id") % 7).cast("int").as("v")))
    db.normalize(maxRowsPerFile = 25, sortBy = Seq("id")) // ranged files -> patch path
    db.upsert(Seq((10L, -1L), (200L, -2L)).toDF("id", "v"), "id") // v is BIGINT here
    // the table stays readable with ONE schema, and the patch values landed
    assert(db.read().schema("v").dataType === org.apache.spark.sql.types.IntegerType)
    val got = db.read().filter(col("v") < 0).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === Seq((10L, -1), (200L, -2)))
    assert(db.nRows === 101L)
  }

  test("upsert/deleteWhere on a range-sorted table leave out-of-range files untouched") {
    val db = freshDb("scoped")
    db.create(spark.range(10000).select(col("id"), (col("id") % 97).as("v")))
    db.normalize(maxRowsPerFile = 2500, sortBy = Seq("id"))
    def snapshot(): Map[String, Long] = {
      val fs = new org.apache.hadoop.fs.Path(db.dir)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      ParquetStats.listParquetFiles(db.dir, spark.sessionState.newHadoopConf())
        .map(p => p.toString -> fs.getFileStatus(p).getModificationTime).toMap
    }
    val before = snapshot()
    assert(before.size >= 4)
    // patch keys all land in the first file's range [0, ~2500)
    db.upsert(Seq((10L, -1L), (20L, -2L), (10001L, -3L)).toDF("id", "v"), "id")
    val afterUpsert = snapshot()
    // every file whose range excludes {10, 20, 10001} survives byte-identical
    val preservedU = before.keySet.intersect(afterUpsert.keySet)
    assert(preservedU.size >= before.size - 2,
      s"upsert rewrote too many files: kept ${preservedU.size} of ${before.size}")
    preservedU.foreach(p => assert(before(p) === afterUpsert(p), s"mtime changed: $p"))
    val got = db.read().filter(col("v") < 0).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((10L, -1L), (20L, -2L), (10001L, -3L)))
    assert(db.nRows === 10001L)
    // scoped delete: only the file(s) holding id=10/20 and the upsert file change
    val beforeDel = snapshot()
    db.deleteWhere(col("v") < 0)
    val afterDel = snapshot()
    val preservedD = beforeDel.keySet.intersect(afterDel.keySet)
    assert(preservedD.size >= beforeDel.size - 2,
      s"delete rewrote too many files: kept ${preservedD.size} of ${beforeDel.size}")
    preservedD.foreach(p => assert(beforeDel(p) === afterDel(p), s"mtime changed: $p"))
    assert(db.nRows === 9998L)
    assert(db.read().filter(col("v") < 0).count() === 0L)
    // a delete matching nothing touches nothing
    db.deleteWhere(col("v") === -999L)
    assert(snapshot() === afterDel)
  }

  test("compactSmallFiles packs only the small tail; healthy files untouched") {
    val db = freshDb("compact")
    def snapshot(): Map[String, Long] = {
      val fs = new org.apache.hadoop.fs.Path(db.dir)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      ParquetStats.listParquetFiles(db.dir, spark.sessionState.newHadoopConf())
        .map(p => p.toString -> fs.getFileStatus(p).getModificationTime).toMap
    }
    // one healthy file + a tail of six tiny append files
    db.create(spark.range(20000).select(col("id"), (col("id") % 13).as("v")).repartition(1))
    (0 until 6).foreach { i =>
      db.create(spark.range(200)
        .select((col("id") + 100000L + i * 1000L).as("id"), lit(i.toLong).as("v"))
        .repartition(1))
    }
    val before = snapshot()
    assert(before.size === 7)
    val healthyBytes = db.fileStats.map(_.fileBytes).max
    val healthyPath = db.fileStats.maxBy(_.fileBytes).path
    val checksum = db.read().agg(sum("id"), sum("v"), count(lit(1))).head()

    val packed = db.compactSmallFiles(targetBytesPerFile = healthyBytes)
    assert(packed === 6)
    val after = snapshot()
    // the healthy file survives byte-identical; the tail collapsed
    assert(after.contains(healthyPath) && after(healthyPath) === before(healthyPath))
    assert(after.size < before.size, s"no file-count reduction: ${after.size}")
    assert(db.read().agg(sum("id"), sum("v"), count(lit(1))).head() === checksum)
    // second pass: the packed tail is a single small file — nothing to do
    assert(db.compactSmallFiles(targetBytesPerFile = healthyBytes) === 0)
    assert(snapshot() === after)
    // crash-safe temp dirs cleaned up
    val fs = new org.apache.hadoop.fs.Path(db.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    for (suffix <- Seq("__patch_old", "__patch_tmp"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(db.dir + suffix)), suffix)
  }

  test("compactSmallFiles packs partition-dir tails, preserving directory-encoded columns") {
    val db = freshDb("compact_part")
    def allFiles(): Map[String, (Long, Long)] = { // path -> (bytes, mtime)
      val root = new org.apache.hadoop.fs.Path(db.dir)
      val fs = root.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val it = fs.listFiles(root, true)
      val buf = scala.collection.mutable.Map[String, (Long, Long)]()
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet"))
          buf(s.getPath.toString) = (s.getLen, s.getModificationTime)
      }
      buf.toMap
    }
    // two partition dirs, each one healthy file + a tail of six tiny appends
    db.create(spark.range(20000).select(col("id"),
      (col("id") % 2).cast("string").as("part"), (col("id") % 13).as("v"))
      .repartition(1), partitionBy = Seq("part"))
    (0 until 6).foreach { i =>
      db.create(spark.range(200)
        .select((col("id") + 100000L + i * 1000L).as("id"),
          (col("id") % 2).cast("string").as("part"), lit(i.toLong).as("v"))
        .repartition(1), partitionBy = Seq("part"))
    }
    val before = allFiles()
    assert(before.size === 14, s"fixture shape off: ${before.size} files")
    val healthyBytes = before.values.map(_._1).max
    val healthyPaths = before.filter(_._2._1 * 2 > healthyBytes).keySet
    assert(healthyPaths.size === 2)
    val checksum = db.read().agg(sum("id"), sum("v"), count(lit(1))).head()
    // partition-dir values read back type-inferred (int here) — compare as strings
    val perPart = db.read().groupBy(col("part").cast("string").as("part")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val packed = db.compactSmallFiles(targetBytesPerFile = healthyBytes)
    assert(packed === 12, s"expected both partition tails packed, got $packed")
    val after = allFiles()
    // healthy files survive byte-identical in BOTH partition dirs
    healthyPaths.foreach { p =>
      assert(after.contains(p) && after(p) === before(p), s"healthy file touched: $p")
    }
    assert(after.size < before.size, s"no file-count reduction: ${after.size}")
    // data and the directory-encoded column both intact
    assert(db.read().agg(sum("id"), sum("v"), count(lit(1))).head() === checksum)
    assert(db.read().groupBy(col("part").cast("string").as("part")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap === perPart)
    // second pass: each dir's tail is already one file — nothing to do
    assert(db.compactSmallFiles(targetBytesPerFile = healthyBytes) === 0)
    assert(allFiles() === after)
    // temp siblings hang off the TABLE root (never inside it) and are gone
    val fs = new org.apache.hadoop.fs.Path(db.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    for (suffix <- Seq("__patch_old", "__patch_tmp"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(db.dir + suffix)), suffix)
  }

  test("recover() repairs interrupted swaps exactly") {
    val fs = new org.apache.hadoop.fs.Path("target/tmp")
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    def P(s: String) = new org.apache.hadoop.fs.Path(s)

    // rewrite ROLLBACK: crash after the live dir moved aside, rewrite
    // incomplete (no _SUCCESS in the tmp dir) -> original comes back
    val db = freshDbClean("recover_rw")
    db.create(spark.range(100).toDF("id"))
    fs.mkdirs(P(db.dir + "__normalize_tmp")) // partial rewrite, no _SUCCESS
    assert(fs.rename(P(db.dir), P(db.dir + "__old")))
    val acts = db.recover()
    assert(acts.exists(_.contains("rolled back")), acts.mkString("; "))
    assert(db.read().count() === 100L)
    assert(!fs.exists(P(db.dir + "__old")) && !fs.exists(P(db.dir + "__normalize_tmp")))

    // rewrite ROLL-FORWARD: rewrite complete (_SUCCESS present), the
    // swap's own __swapper marker names it WITH the second-line "checked"
    // token (the post-lock fingerprint re-check passed), crash between the
    // re-check and the promote rename -> the rewrite lands. Roll-forward
    // requires both lines: a single-line marker means the crash hit inside
    // the check window and must roll back instead (drilled in
    // ConcurrentWriterSpec).
    spark.range(200).toDF("id").write.parquet(db.dir + "__normalize_tmp")
    val sw = fs.create(P(db.dir + "__swapper"), true)
    try sw.write((db.dir + "__normalize_tmp\nchecked").getBytes("UTF-8")) finally sw.close()
    assert(fs.rename(P(db.dir), P(db.dir + "__old")))
    val acts2 = db.recover()
    assert(acts2.exists(_.contains("completed")), acts2.mkString("; "))
    assert(db.read().count() === 200L)
    assert(!fs.exists(P(db.dir + "__swapper")))

    // STALE-STAGE SAFETY (r10 advice, ParquetDatabase.scala swapper token):
    // an EARLIER crashed writer's complete stage sits beside the table; a
    // LATER swap crashes mid-abort — its own tmp already deleted, dir
    // renamed to __old (which therefore holds the CURRENT committed
    // table), marker naming the now-deleted stage. recover() must roll
    // __old BACK, never promote the unattributed stale stage.
    spark.range(999).toDF("id").write.parquet(db.dir + "__normalize_tmp_stale")
    val sw2 = fs.create(P(db.dir + "__swapper"), true)
    try sw2.write((db.dir + "__normalize_tmp_gone").getBytes("UTF-8")) finally sw2.close()
    assert(fs.rename(P(db.dir), P(db.dir + "__old")))
    val acts2b = db.recover()
    assert(acts2b.exists(_.contains("rolled back")), acts2b.mkString("; "))
    assert(db.read().count() === 200L) // the committed table, not the 999-row stale stage
    assert(!fs.exists(P(db.dir + "__normalize_tmp_stale")))
    assert(!fs.exists(P(db.dir + "__swapper")))

    // patch ROLLBACK mid-move: one original moved aside, one replacement
    // moved in, manifest present -> byte-exact original table restored
    val db2 = freshDbClean("recover_patch")
    db2.create(spark.range(50).toDF("id").repartition(1))
    db2.create(spark.range(50, 60).toDF("id").repartition(1))
    val files = ParquetStats.listParquetFiles(db2.dir, spark.sessionState.newHadoopConf()).map(_.toString).sorted
    val checksum = db2.read().agg(sum("id")).head().getLong(0)
    spark.range(1000, 1010).toDF("id").write.parquet(db2.dir + "__patch_tmp")
    val newFiles = ParquetStats.listParquetFiles(db2.dir + "__patch_tmp", spark.sessionState.newHadoopConf())
    fs.mkdirs(P(db2.dir + "__patch_old"))
    val manifest = (files.map(p => s"touched\t$p") ++
      newFiles.map(f => s"new\t${db2.dir}/${f.getName}")).mkString("\n")
    val out = fs.create(P(db2.dir + "__patch_old/_manifest"), true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    assert(fs.rename(P(files.head), P(db2.dir + "__patch_old/" + P(files.head).getName)))
    assert(fs.rename(newFiles.head, P(db2.dir + "/" + newFiles.head.getName)))
    val acts3 = db2.recover()
    assert(acts3.exists(_.contains("restored")), acts3.mkString("; "))
    assert(db2.read().agg(sum("id")).head().getLong(0) === checksum)
    assert(!fs.exists(P(db2.dir + "__patch_old")) && !fs.exists(P(db2.dir + "__patch_tmp")))

    // healthy table: recover() is a no-op
    assert(db2.recover().isEmpty)
  }

  test("scoped upsert falls back correctly when footer ranges are unusable (string key)") {
    val db = freshDb("scoped_str")
    db.create(Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v"))
    db.upsert(Seq(("b", 20L), ("d", 4L)).toDF("k", "v"), "k")
    val rows = db.read().orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("a", 1L), ("b", 20L), ("c", 3L), ("d", 4L)))
  }

  test("deleteWhere on a hive-partitioned table keeps partition columns (full-rewrite fallback)") {
    val db = freshDb("scoped_part")
    db.create(spark.range(100).select(col("id"), (col("id") % 4).as("p")),
      partitionBy = Seq("p"))
    db.deleteWhere(col("id") < 10)
    assert(db.nRows === 90L)
    assert(db.read().columns.toSet === Set("id", "p"))
    assert(db.read().filter(col("p").isNull).count() === 0L)
  }

  test("per-read options reach the parquet source (P8 LoadConfig parity)") {
    val db = freshDb("readopts")
    db.create(Seq((1L, "a")).toDF("id", "x"))
    db.create(Seq((2L, 3.5)).toDF("id", "y"))
    // default read merges schemas across batches; a per-read override turns
    // it off and reads a single batch's schema
    assert(db.read().columns.toSet === Set("id", "x", "y"))
    val unmerged = db.read(options = Map("mergeSchema" -> "false"))
    assert(unmerged.columns.length < 3, s"mergeSchema override ignored: ${unmerged.columns.toSeq}")
  }

  test("exportTo replicates the table; replica reads identically") {
    val db = freshDb("exp")
    db.create(Seq((1L, "a"), (2L, "b")).toDF("id", "x"))
    val replica = db.exportTo("target/tmp/pqdb/exp_replica")
    assert(replica.read().orderBy("id").collect().toSeq ===
      db.read().orderBy("id").collect().toSeq)
    assert(replica.nRows === 2L)
  }

  /** freshDb plus its snapshot/archive/swap siblings — snapshot manifests
    * persist OUTSIDE the table dir and would collide across reruns.
    */
  private def freshDbClean(name: String): ParquetDatabase = {
    val db = freshDb(name)
    val fs = new org.apache.hadoop.fs.Path(db.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    for (suffix <- Seq("__snapshots", "__archive", "__patch_old", "__patch_tmp", "__old", "__normalize_tmp"))
      fs.delete(new org.apache.hadoop.fs.Path(db.dir + suffix), true)
    db
  }

  test("snapshot + upsert: time travel reads the pre-patch table exactly") {
    val db = freshDbClean("snap_upsert")
    val base = spark.range(1000).select(col("id"), (col("id") % 10).as("v"))
    db.create(base)
    db.normalize(maxRowsPerFile = 200, sortBy = Seq("id"))
    db.snapshot("pre")
    db.upsert(Seq((5L, 99L), (2000L, 1L)).toDF("id", "v"), "id")
    // current state sees the patch
    val cur = db.read().where(col("id") === 5L || col("id") === 2000L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(cur === Seq((5L, 99L), (2000L, 1L)))
    // the snapshot does not
    val snap = db.readSnapshot("pre")
    assert(snap.count() === 1000L)
    assert(snap.where(col("id") === 5L).as[(Long, Long)].collect().toSeq === Seq((5L, 5L)))
    assert(snap.where(col("id") === 2000L).count() === 0L)
  }

  test("snapshot survives a full rewrite and a delete; vacuum respects pins") {
    val db = freshDbClean("snap_rewrite")
    db.create(spark.range(500).select(col("id"), (col("id") * 2).as("v")))
    db.snapshot("v1")
    db.deleteWhere(col("id") < 100) // scoped or full rewrite — either path archives
    db.normalize(maxRowsPerFile = 100) // full rewrite: whole previous tree archived
    assert(db.read().count() === 400L)
    assert(db.readSnapshot("v1").count() === 500L)
    // a second snapshot of the current state, then vacuum: v1's pins survive
    db.snapshot("v2")
    db.dropSnapshot("v2")
    db.vacuumSnapshots()
    assert(db.readSnapshot("v1").count() === 500L)
    // dropping the last pin reclaims the archive entirely
    db.dropSnapshot("v1")
    db.vacuumSnapshots()
    val fs = new org.apache.hadoop.fs.Path(db.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(!fs.exists(db.archiveRoot), "archive should be empty and removed after last drop")
    intercept[IllegalArgumentException](db.readSnapshot("v1"))
  }

  test("snapshot on a partitioned table keeps directory-encoded columns") {
    val db = freshDbClean("snap_part")
    db.create(spark.range(300).select(col("id"), (col("id") % 3).cast("string").as("part")),
      partitionBy = Seq("part"))
    db.snapshot("p1")
    db.deleteWhere(col("part") === "1") // partitioned → full-rewrite path
    assert(db.read().count() === 200L)
    val snap = db.readSnapshot("p1")
    assert(snap.count() === 300L)
    assert(snap.select("part").distinct().count() === 3L)
  }

  test("pruneSnapshots keeps the newest tags and reclaims unpinned bytes") {
    val db = freshDbClean("snap_prune")
    db.create(spark.range(200).select(col("id"), col("id").as("v")))
    db.snapshot("t1")
    db.deleteWhere(col("id") < 50)
    Thread.sleep(5) // manifest mtimes order the tags
    db.snapshot("t2")
    db.deleteWhere(col("id") < 100)
    Thread.sleep(5)
    db.snapshot("t3")
    val dropped = db.pruneSnapshots(keepLast = 2)
    assert(dropped === Seq("t1"))
    assert(db.snapshots === Seq("t2", "t3"))
    assert(db.readSnapshot("t2").count() === 150L)
    assert(db.readSnapshot("t3").count() === 100L)
    intercept[IllegalArgumentException](db.readSnapshot("t1"))
    // dropping everything reclaims the archive
    assert(db.pruneSnapshots(keepLast = 0).sorted === Seq("t2", "t3"))
    val fs = new org.apache.hadoop.fs.Path(db.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(!fs.exists(db.archiveRoot))
  }

  test("exportSnapshot replicates the as-of table into a fresh store") {
    val db = freshDbClean("snap_export")
    db.create(spark.range(100).select(col("id"), (col("id") * 3).as("v")))
    db.snapshot("gold")
    db.upsert(Seq((7L, -1L)).toDF("id", "v"), "id")
    val replica = db.exportSnapshot("gold", s"target/tmp/pqdb/snap_export_replica")
    assert(replica.read().orderBy("id").as[(Long, Long)].collect().toSeq ===
      (0L until 100L).map(i => (i, i * 3)))
  }

  test("recover() restores a crash-archived original exactly (no loss, no dup)") {
    val db = freshDbClean("snap_recover")
    db.create(spark.range(100).select(col("id"), col("id").as("v")))
    db.normalize(maxRowsPerFile = 100, sortBy = Seq("id")) // one file, ranged
    db.snapshot("pin")
    db.upsert(Seq((5L, 50L)).toDF("id", "v"), "id") // original archived (pinned)
    val fs = new org.apache.hadoop.fs.Path(db.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    // stage the crash recover() must untangle: the swap's manifest exists,
    // the replacement file is live, the original sits in the ARCHIVE (the
    // crash hit after archiving but before the patch-old cleanup finished)
    val liveFile = ParquetStats.listParquetFiles(db.dir, spark.sessionState.newHadoopConf()).head
    val archived = ParquetStats.listParquetFiles(db.archiveRoot.toString, spark.sessionState.newHadoopConf()).head
    val pOld = new org.apache.hadoop.fs.Path(db.dir + "__patch_old")
    fs.mkdirs(pOld)
    val manifest = s"touched\t${db.dir}/${archived.getName}\nnew\t${db.dir}/${liveFile.getName}"
    val out = fs.create(new org.apache.hadoop.fs.Path(pOld, "_manifest"), true)
    out.write(manifest.getBytes("UTF-8")); out.close()
    val actions = db.recover()
    assert(actions.exists(_.contains("from archive")), actions.mkString("; "))
    // rolled back: the original content, exactly once
    val rows = db.read().orderBy("id").as[(Long, Long)].collect().toSeq
    assert(rows === (0L until 100L).map(i => (i, i)))
  }

  test("applyRetention edges: no snapshots, age-only, maxCount=0 wipes and vacuums") {
    val db = freshDbClean("retention_edges")
    db.create(spark.range(100).select(col("id"), (col("id") % 7).as("v")))
    // policy on a table with no snapshots is a no-op, not an error
    assert(db.applyRetention(maxCount = 3) === Nil)
    db.snapshot("a")
    db.upsert(spark.range(10).select(col("id"), (col("id") + 50).as("v")), "id")
    db.snapshot("b")
    // age-only policy with everything inside the horizon drops nothing
    assert(db.applyRetention(maxAgeMillis = Long.MaxValue / 2) === Nil)
    assert(db.snapshots === Seq("a", "b"))
    // maxCount=0 is "retain nothing": every tag dropped, archive vacuumed away
    val dropped = db.applyRetention(maxCount = 0)
    assert(dropped.toSet === Set("a", "b"))
    assert(db.snapshots === Nil)
    val fs = new org.apache.hadoop.fs.Path(db.dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(db.archiveRoot), "unpinned archive must be reclaimed")
    // the live table is untouched by snapshot lifecycle operations
    assert(db.read().count() === 100L)
    intercept[IllegalArgumentException] { db.applyRetention(maxCount = -1) }
    intercept[IllegalArgumentException] { db.applyRetention(maxAgeMillis = -1L) }
  }

  test("graft-snapshot read-option source time-travels without the Scala API") {
    val db = freshDbClean("v2source")
    db.create(spark.range(2000).select(col("id"), (col("id") % 5).as("v")))
    db.snapshot("pre")
    db.upsert(spark.range(500).select(col("id"), (col("id") + 100).as("v")), "id")
    db.deleteWhere(col("id") >= 1500)
    // the live table moved on; the tagged read must not have
    val asof = spark.read.format("graft-snapshot")
      .option("snapshot", "pre").load(db.dir)
    val want = (0L until 2000L).map(i => (i, i % 5))
    assert(asof.orderBy("id").as[(Long, Long)].collect().toSeq === want)
    assert(db.read().count() === 1500L)
    // scan exactly the pinned list: every scanned file is snapshot-pinned
    // (live or archive), and pushdown reaches the delegated parquet scan
    val pruned = asof.filter(col("id") <= 10).select("id")
    val scan = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.headOption.getOrElse(fail("no BatchScanExec in graft-snapshot plan"))
    val scanDesc = scan.scan.description()
    assert(scanDesc.contains("id") && scanDesc.toLowerCase.contains("pushedfilters"),
      s"filter not pushed into the delegated scan: $scanDesc")
    // pure SQL surface
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW v2source_asof USING `graft-snapshot` " +
      s"OPTIONS (path '${db.dir}', snapshot 'pre')")
    assert(spark.table("v2source_asof").count() === 2000L)
    assert(spark.sql("SELECT sum(v) FROM v2source_asof").head().getLong(0) ===
      want.map(_._2).sum)
    // matches the Scala API exactly
    assert(asof.orderBy("id").collect().toSeq ===
      db.readSnapshot("pre").orderBy("id").collect().toSeq)
    // loud errors: unknown tag, missing tag option
    intercept[Exception] {
      spark.read.format("graft-snapshot").option("snapshot", "nope").load(db.dir).schema
    }
    intercept[Exception] {
      spark.read.format("graft-snapshot").load(db.dir).schema
    }
  }

  test("graft-snapshot source keeps partition columns and errors on the mixed shape") {
    val db = freshDbClean("v2part")
    db.create(spark.range(300).select(col("id"), (col("id") % 3).as("p")),
      partitionBy = Seq("p"))
    db.snapshot("pre")
    // fully-live partitioned snapshot: basePath = table dir, partition
    // column recovered from the directory names
    val live = spark.read.format("graft-snapshot")
      .option("snapshot", "pre").load(db.dir)
    assert(live.columns.toSet === Set("id", "p"))
    // partition values come back via directory-name inference (int)
    assert(live.groupBy(col("p").cast("long").as("p")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet === Set((0L, 100L), (1L, 100L), (2L, 100L)))
    // full rewrite parks EVERY pinned file in the archive -> single-root
    // (archive) scan still carries the partition column
    db.deleteWhere(col("id") >= 200)
    val arch = spark.read.format("graft-snapshot")
      .option("snapshot", "pre").load(db.dir)
    assert(arch.count() === 300L)
    assert(arch.columns.toSet === Set("id", "p"))
    assert(arch.orderBy("id").collect().toSeq ===
      db.readSnapshot("pre").orderBy("id").collect().toSeq)
    // mixed live+archive partitioned shape — per-leaf compaction rewrites
    // ONLY the partition with a packable tail, archiving its pinned file
    // while the other partitions' pinned files stay live: loud error
    // pointing at the API that can express it
    val db2 = freshDbClean("v2part_mixed")
    db2.create(spark.range(300).select(col("id"), (col("id") % 3).as("p"))
      .repartition(1), partitionBy = Seq("p"))
    db2.snapshot("mid")
    db2.create(spark.range(300L, 302L).select(col("id"), lit(1L).as("p"))
      .repartition(1), partitionBy = Seq("p"))
    val packed = db2.compactSmallFiles(targetBytesPerFile = 10L * 1024 * 1024)
    assert(packed >= 2, s"fixture: expected only the p=1 leaf to pack, packed=$packed")
    val mixedErr = intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot").option("snapshot", "mid").load(db2.dir).schema
    }
    assert(mixedErr.getMessage.contains("readSnapshot"), mixedErr.getMessage)
    // ...while the Scala API still reads it exactly
    assert(db2.readSnapshot("mid").count() === 300L)
  }

  test("normalizeToBytes converts a byte target into a row bound from footer stats") {
    val db = freshDb("normbytes")
    db.create(spark.range(20000).select(col("id"),
      concat(lit("payload-"), col("id")).as("s")))
    val before = db.fileStats
    val totalBytes = before.map(_.fileBytes).sum
    // target ≈ a quarter of the table → expect ≥ 4 files, all under target
    val target = math.max(1L, totalBytes / 4)
    db.normalizeToBytes(target)
    val after = db.fileStats
    assert(after.map(_.numRows).sum === 20000L)
    assert(after.size >= 4)
    assert(after.forall(_.fileBytes <= target * 2), // footer+dict overhead headroom
      s"files ${after.map(_.fileBytes)} vs target $target")
  }
}
