package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._

/** An object-store-shaped Hadoop filesystem over local disk, for proving
  * the replication protocol's crash posture (VERDICT r8 #7):
  *
  *  - `rename` is NOT atomic: emulated as a per-file recursive copy then a
  *    source delete — the real cost model of S3/GCS-style stores, where a
  *    "rename" can die midway leaving a partial destination;
  *  - an injectable crash (`crashAfterFiles`) kills a rename after N file
  *    copies, reproducing exactly that partial-promote window;
  *  - every external `listStatus` target is recorded, so a spec can assert
  *    the protocol never LISTS a destination it just wrote — the
  *    list-after-write-lag immunity claim reduced to a structural check
  *    (code that never lists cannot be bitten by a lagging listing).
  */
class ObjectStoreLikeFs extends RawLocalFileSystem {
  override def getScheme: String = "graftobj"
  override def getUri: java.net.URI = java.net.URI.create("graftobj:///")

  override def listStatus(f: Path): Array[FileStatus] = {
    ObjectStoreLikeFs.listed.add(f.toUri.getPath)
    super.listStatus(f)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val budget = new java.util.concurrent.atomic.AtomicInteger(
      ObjectStoreLikeFs.crashAfterFiles.get())
    copyTree(src, dst, budget)
    delete(src, true)
    true
  }

  private def copyTree(src: Path, dst: Path,
      budget: java.util.concurrent.atomic.AtomicInteger): Unit = {
    val st = getFileStatus(src)
    if (st.isDirectory) {
      mkdirs(dst)
      // super.listStatus: internal traversal is not an external listing
      super.listStatus(src).foreach(c =>
        copyTree(c.getPath, new Path(dst, c.getPath.getName), budget))
    } else {
      if (ObjectStoreLikeFs.crashAfterFiles.get() >= 0 && budget.getAndDecrement() == 0)
        throw new java.io.IOException(
          "ObjectStoreLikeFs: injected crash mid-rename (non-atomic copy+delete)")
      val in = open(src)
      val out = create(dst, true)
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally { in.close(); out.close() }
    }
  }
}

object ObjectStoreLikeFs {
  /** -1 = renames complete; N >= 0 = the next rename dies after N files. */
  val crashAfterFiles = new java.util.concurrent.atomic.AtomicInteger(-1)
  val listed: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}

/** pushTo/pullFrom against a target with object-store rename semantics —
  * the 100 TB deployment reality the local-FS ReplicationSpec can't model.
  */
class ObjectStoreReplicationSpec extends SparkSpec {
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.graftobj.impl", classOf[ObjectStoreLikeFs].getName)

  private def freshLocal(name: String): String = {
    val dir = s"target/tmp/objstore/$name"
    val p = new Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir
  }

  /** Absolute local path exposed under the graftobj:// scheme, pre-cleaned. */
  private def freshRemote(name: String): (String, String) = {
    val abs = new java.io.File(s"target/tmp/objstore/$name").getAbsolutePath
    val uri = s"graftobj://$abs"
    val p = new Path(uri)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    (uri, abs)
  }

  private def mkTable(dir: String): ParquetDatabase = {
    val db = new ParquetDatabase(spark, dir)
    db.create((1L to 500L).map(i => (i, s"row_$i", i * 1.5)).toDF("id", "name", "v")
      .repartition(4))
    db
  }

  test("push + pull complete on a no-atomic-rename target and never list the destination") {
    ObjectStoreLikeFs.crashAfterFiles.set(-1)
    ObjectStoreLikeFs.listed.clear()
    val src = freshLocal("src")
    val (rep, _) = freshRemote("rep")
    val (back, backAbs) = freshRemote("back")
    val db = mkTable(src)
    db.pushTo(rep, parallelism = 3)
    assert(ParquetDatabase.verifyReplica(spark, rep).isEmpty)
    ParquetDatabase.pullFrom(spark, rep, back, parallelism = 3)
    assert(ParquetDatabase.verifyReplica(spark, back).isEmpty)
    // list-after-write-lag immunity, structurally: neither push nor pull
    // ever LISTED the promoted destination tree (they address files by
    // manifest-derived names), so a lagging listing has nothing to corrupt.
    // (Asserted BEFORE the Spark read below, which legitimately lists.)
    val offenders = ObjectStoreLikeFs.listed.toArray.map(_.toString)
      .filter(p => p == backAbs || p.startsWith(backAbs + "/"))
    assert(offenders.isEmpty,
      s"protocol listed the promoted destination: ${offenders.mkString(", ")}")
    assert(new ParquetDatabase(spark, back).read().orderBy("id").collect().toSeq ===
      db.read().orderBy("id").collect().toSeq)
  }

  test("a crash mid-promote is detected by the manifest audit and a re-pull recovers") {
    ObjectStoreLikeFs.crashAfterFiles.set(-1)
    val src = freshLocal("c_src")
    val (rep, _) = freshRemote("c_rep")
    val (back, _) = freshRemote("c_back")
    mkTable(src).pushTo(rep, parallelism = 3)
    // the verified tmp dir is complete; the promote rename dies after two
    // file copies, leaving a partial destination under the FINAL name —
    // the exact window delete-then-rename protocols hand-wave away
    ObjectStoreLikeFs.crashAfterFiles.set(2)
    try {
      intercept[java.io.IOException] {
        ParquetDatabase.pullFrom(spark, rep, back, parallelism = 3)
      }
    } finally ObjectStoreLikeFs.crashAfterFiles.set(-1)
    // the half-promoted replica must NEVER verify as complete: either the
    // manifest is absent, or it names every missing/short file
    val audit = ParquetDatabase.verifyReplica(spark, back)
    assert(audit.nonEmpty, "a partial promote verified as a complete replica")
    // recovery is a plain re-pull: fresh tmp, fresh verify, fresh promote
    ParquetDatabase.pullFrom(spark, rep, back, parallelism = 3)
    assert(ParquetDatabase.verifyReplica(spark, back).isEmpty)
  }
}
