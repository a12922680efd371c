package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event/time operators over the `events` table (batch forms; the streaming
  * variants with watermarks live in graft.streaming.EventStreams).
  */
object EventOps {

  /** Tumbling-window aggregate: one row per (user, hour bucket). Uses the
    * built-in `window()` generator; the bucket is surfaced as epoch seconds
    * so results are engine-portable.
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("hour_bucket"),
        col("n"), col("total"))

  /** Hourly gap filling (time-series resampling): one row per (user, hour)
    * over each user's [min hour, max hour] span, zero-filled where no events
    * occurred. The dense hour axis is generated per user with `sequence`
    * (no driver-side range, no cross join against a global calendar — each
    * user only materializes its own span).
    */
  def hourlyGapFill(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val spans = hourly.groupBy("user_id")
      .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
    val axis = spans.select(col("user_id"),
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hour"))
    axis.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), unix_timestamp(col("hour")).as("hour_bucket"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Sessionization with a fixed inactivity gap: session count + event count
    * per user. Built on `session_window` (merging windows per key).
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("events_in_session"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum(col("events_in_session")).as("n_events"))
}
