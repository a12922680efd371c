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
    Seq("", "__snapshots", "__archive", "__old", "__normalize_tmp",
      "__patch_tmp", "__patch_old").foreach(sfx =>
      fs.delete(new org.apache.hadoop.fs.Path(dir + sfx), true))
    new ParquetDatabase(spark, dir)
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

  test("a crashed rewrite's stale staging is clobbered by the next writer, not fatal") {
    // the narrowed entry-recover must not break single-writer crash flow:
    // stale __normalize_tmp (no live writer) is simply overwritten by the
    // next rewrite's own stage, and stale __old is reclaimed pre-swap
    val a = freshDb("staleclobber")
    a.create(spark.range(100).toDF("id"))
    val fs = new org.apache.hadoop.fs.Path(a.dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    // fake crash debris: a half-written tmp and a committed-but-uncleaned old
    fs.mkdirs(new org.apache.hadoop.fs.Path(a.dir + "__normalize_tmp"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(a.dir + "__old"))
    a.normalize(maxRowsPerFile = 50)
    assert(a.nRows === 100L)
    Seq("__normalize_tmp", "__old").foreach(sfx =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(a.dir + sfx)), s"debris at $sfx"))
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
}
