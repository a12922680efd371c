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
