package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** pushTo / pullFrom — file-preserving replication with manifest-verified
  * integrity (reference download.py's threaded snapshot transfer, SURVEY
  * §2.2 R11 hardening).
  */
class ReplicationSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): String = {
    val dir = s"target/tmp/replication/$name"
    val p = new Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir
  }

  private def mkTable(dir: String): ParquetDatabase = {
    val db = new ParquetDatabase(spark, dir)
    db.create((1L to 500L).map(i => (i, s"row_$i", i * 1.5)).toDF("id", "name", "v")
      .repartition(4))
    db
  }

  test("push replicates byte-identically and pull round-trips") {
    val src = freshDir("src"); val rep = freshDir("rep"); val back = freshDir("back")
    val db = mkTable(src)
    val replica = db.pushTo(rep, parallelism = 3)
    // byte-identical: same file names, sizes, and row-group layout
    val srcStats = db.fileStats.map(s => (new Path(s.path).getName, s.fileBytes, s.numRowGroups)).toSet
    val repStats = replica.fileStats.map(s => (new Path(s.path).getName, s.fileBytes, s.numRowGroups)).toSet
    assert(srcStats === repStats, "replica layout diverged from source")
    assert(ParquetDatabase.verifyReplica(spark, rep).isEmpty)
    // pull verifies and lands the same data
    val pulled = ParquetDatabase.pullFrom(spark, rep, back, parallelism = 3)
    assert(pulled.read().orderBy("id").collect().toSeq ===
      db.read().orderBy("id").collect().toSeq)
  }

  test("a corrupted replica file is detected by name on pull") {
    val src = freshDir("c_src"); val rep = freshDir("c_rep"); val back = freshDir("c_back")
    mkTable(src).pushTo(rep)
    // flip bytes in one replica file (content corruption, same length)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(rep).getFileSystem(conf)
    val victim = fs.listStatus(new Path(rep)).toIndexedSeq
      .filter(s => s.getPath.getName.endsWith(".parquet")).head.getPath
    val len = fs.getFileStatus(victim).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(victim); try in.readFully(buf) finally in.close()
    buf(len / 2) = (buf(len / 2) ^ 0xFF).toByte
    val out = fs.create(victim, true); try out.write(buf) finally out.close()

    val audit = ParquetDatabase.verifyReplica(spark, rep)
    assert(audit.size === 1 && audit.head.contains(victim.getName) &&
      audit.head.contains("md5"), s"audit missed the corruption: $audit")
    val e = intercept[ParquetDatabase.ReplicaIntegrityException] {
      ParquetDatabase.pullFrom(spark, rep, back)
    }
    assert(e.getMessage.contains(victim.getName))
    // nothing half-applied: the failed pull leaves no destination dir
    assert(!fs.exists(new Path(back)) && !fs.exists(new Path(back + "__pull_tmp")))
  }

  test("a missing replica file and a missing manifest are named failures") {
    val src = freshDir("m_src"); val rep = freshDir("m_rep"); val back = freshDir("m_back")
    mkTable(src).pushTo(rep)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(rep).getFileSystem(conf)
    val victim = fs.listStatus(new Path(rep)).toIndexedSeq
      .filter(s => s.getPath.getName.endsWith(".parquet")).head.getPath
    fs.delete(victim, false)
    val e = intercept[ParquetDatabase.ReplicaIntegrityException] {
      ParquetDatabase.pullFrom(spark, rep, back)
    }
    assert(e.getMessage.contains("missing"))
    // a plain parquet dir without a manifest is refused, not silently copied
    val e2 = intercept[ParquetDatabase.ReplicaIntegrityException] {
      ParquetDatabase.pullFrom(spark, src, back)
    }
    assert(e2.getMessage.contains(ParquetDatabase.ManifestName))
  }
}
