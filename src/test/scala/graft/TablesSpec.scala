package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The data-contract layer (round-7 lesson): ts decoding is negotiated from
  * the parquet footer, never assumed, and drift fails loudly at setup.
  */
class TablesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("driver events decode to TimestampType in [2000, 2100]") {
    val ev = Tables.load(spark, sfDir, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    val (mn, mx) = ev.agg(min(year(col("ts"))), max(year(col("ts"))))
      .collect().map(r => (r.getInt(0), r.getInt(1))).head
    assert(mn >= 2000 && mx <= 2100, s"decoded year range [$mn, $mx] is insane")
  }

  test("timestampInfo reads the footer's declared unit and UTC flag") {
    val conf = spark.sessionState.newHadoopConf()
    val info = Tables.timestampInfo(s"$sfDir/events.parquet", "ts", conf)
    // the driver data is TIMESTAMP(MICROS) as of round 7; if this fails the
    // data drop changed again — verifyContract should have caught it first
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    assert(info.unit === Some(TimeUnit.MICROS))
    // a non-timestamp column reports None (no annotation)
    assert(Tables.timestampInfo(s"$sfDir/events.parquet", "event_id", conf).unit === None)
  }

  test("raw-long nanos fixture takes the DIV-1000 decode branch") {
    val dir = "target/tmp/tables_spec/nanos"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    // 2024-03-01T00:00:00Z plus i seconds, as raw nanos in a plain INT64
    // column — exactly how an unannotated nanos producer would write it
    val base = 1709251200L * 1000000000L
    spark.range(100)
      .select(col("id").as("event_id"),
        (lit(base) + col("id") * 1000000000L).as("ts"),
        (col("id") % 7).as("user_id"),
        lit("view").as("event_type"),
        lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    val ev = Tables.load(spark, dir, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    val mx = ev.agg(max(unix_timestamp(col("ts")))).collect().head.getLong(0)
    assert(mx === 1709251200L + 99L, "nanos were not truncated to the right seconds")
  }

  test("eventsTsInfo re-probes when the staged path is rewritten in-session") {
    // streaming fixtures delete + re-stage scratch dirs at the same path; a
    // path-only cache key would keep serving the dead staging's decode
    // branch — the footer cache must key on the path's (mtime, length) too
    val path = "target/tmp/tables_spec/restage/events.parquet"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    val base = 1709251200L * 1000000000L
    spark.range(10)
      .select(col("id").as("event_id"), (lit(base) + col("id") * 1000000000L).as("ts"))
      .write.parquet(path)
    assert(Tables.eventsTsInfo(spark, path).unit === None,
      "unannotated INT64 staging must probe as raw-long")
    fs.delete(p, true)
    spark.range(10)
      .select(col("id").as("event_id"),
        to_timestamp(lit("2024-03-01 00:00:00")).as("ts"))
      .write.parquet(path)
    assert(Tables.eventsTsInfo(spark, path).unit.isDefined,
      "restaged annotated encoding must be re-probed, not served from the stale cache")
  }

  test("a unit drift that collapses time fails loudly, not silently") {
    val dir = "target/tmp/tables_spec/collapsed"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    // micros-scale values in an unannotated INT64 column: the nanos branch
    // would divide them into 1970 — the exact round-7 failure mode. The
    // footer-stats sanity check must reject the table at load.
    spark.range(100)
      .select(col("id").as("event_id"),
        (lit(1709251200L * 1000000L) + col("id")).as("ts"),
        col("id").as("user_id"))
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      Tables.load(spark, dir, "events")
    }
    assert(e.getMessage.contains("contract violation"),
      s"wrong failure: ${e.getMessage}")
  }

  test("verifyContract passes on driver data and diffs a broken table") {
    Tables.verifyContract(spark, sfDir) // must not throw
    // a drifted clone: events with a renamed key column and string value
    val dir = "target/tmp/tables_spec/drift"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    Tables.names.foreach { t =>
      val df = Tables.load(spark, sfDir, t)
      val out =
        if (t == "customer") df.withColumnRenamed("c_custkey", "customer_id")
        else if (t == "part") df.withColumn("p_retailprice", col("p_retailprice").cast("string"))
        else df
      out.write.parquet(s"$dir/$t.parquet")
    }
    val e = intercept[IllegalStateException] { Tables.verifyContract(spark, dir) }
    // BOTH violations reported in one pass, named per table.column
    assert(e.getMessage.contains("customer: missing column c_custkey"))
    assert(e.getMessage.contains("part.p_retailprice"))
  }
}
