package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.EventOps
import org.apache.spark.sql.streaming.OutputMode

/** The streaming pipelines must reproduce the batch operators exactly on a
  * bounded AvailableNow replay of the events table.
  */
class EventStreamsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming tumbling hourly agg equals batch result") {
    val streamed = EventStreams.runToMemory(spark, sfDir, EventStreams.tumblingHourly,
        OutputMode.Complete, "spec_tumbling")
      .orderBy("user_id", "hour_bucket").collect()
    val batch = EventOps.tumblingHourly(Tables.load(spark, sfDir, "events"))
      .orderBy("user_id", "hour_bucket").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("parquet-sink streaming (checkpointed) writes exactly the batch-filtered rows") {
    val base = "target/tmp/stream/clicks"
    val p = new org.apache.hadoop.fs.Path("target/tmp/stream")
    p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
    val streamed = EventStreams.runToParquet(spark, sfDir,
        df => df.filter(org.apache.spark.sql.functions.col("event_type") === "click"),
        outDir = base, checkpointDir = s"$base-ckpt")
      .orderBy("event_id").collect()
    val batch = Tables.load(spark, sfDir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .orderBy("event_id").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stateful streaming sessionization equals batch session stats") {
    val streamed = EventStreams.runToMemory(spark, sfDir,
        df => EventStreams.sessionStatsStateful(df, 30),
        OutputMode.Update, "spec_sessions")
      .orderBy("user_id").collect()
    val batch = EventOps.sessionStats(Tables.load(spark, sfDir, "events"), "30 minutes")
      .orderBy("user_id").collect()
    assert(streamed.toSeq === batch.toSeq)
  }
}
