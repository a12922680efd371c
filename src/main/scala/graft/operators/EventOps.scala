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

  /** Ordered funnel: per user, the greedy step timestamps for
    * `steps(0) → steps(1) → …` — t1 = first step-1 event, t2 = first step-2
    * event strictly after t1, and so on — plus the depth reached. Strict
    * `>` on the advance means a same-timestamp pair never counts as ordered,
    * matching the SQL formulation (min ts > previous stage's ts).
    *
    * One shuffle total: events are grouped per user, time-sorted with
    * `sort_array`, and the greedy scan runs as a single `aggregate` HOF over
    * the per-user array — no per-stage self-join (the k-join formulation
    * shuffles the events table k times). The buffer is one user's
    * step-relevant events; `maxEventsPerUser` turns the one pathological
    * key (a bot with tens of millions of events) from a silent straggler /
    * OOM into a named error, the same loud-guard pattern RangeJoin and
    * StringSim carry — the check is embedded in the scanned expression, so
    * Catalyst cannot prune it.
    *
    * Output: userCol, depth, t1_us … tk_us (epoch micros, null past depth).
    */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", tieCol: String = "event_id",
      maxEventsPerUser: Int = 10000000): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    require(steps.distinct == steps,
      s"funnel: duplicate step types in ${steps.mkString("[", ", ", "]")} — " +
        "each occurrence would silently map to its last position")
    val idxCol = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    val nulls = steps.map(_ => "CAST(NULL AS TIMESTAMP)").mkString(", ")
    // state: (depth reached, per-step timestamps); advance on the next step
    // id strictly after the previous step's timestamp
    val scan =
      s"""aggregate(
         |  IF(size(evs) <= $maxEventsPerUser, evs,
         |     raise_error(concat('EventOps.funnel: user group of ', CAST(size(evs) AS STRING),
         |                        ' events exceeds maxEventsPerUser=$maxEventsPerUser — ',
         |                        'pre-filter the bot key or raise the bound'))),
         |  named_struct('depth', 0, 'ts', array($nulls)),
         |  (st, e) -> IF(e.step = st.depth + 1 AND IF(st.depth = 0, true, e.ts > st.ts[st.depth - 1]),
         |                named_struct('depth', st.depth + 1,
         |                             'ts', transform(st.ts, (t, i) -> IF(i = st.depth, e.ts, t))),
         |                st))""".stripMargin
    events
      .where(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        struct(col(tsCol).as("ts"), col(tieCol).as("tie"), idxCol.as("step")).as("e"))
      .groupBy(userCol)
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .withColumn("f", expr(scan))
      .select(col(userCol) +: col("f.depth").as("depth") +:
        steps.indices.map(i => unix_micros(col("f.ts")(i)).as(s"t${i + 1}_us")): _*)
  }

  /** Gaps-and-islands: merge overlapping (or ≤ `gapSeconds`-separated)
    * per-key intervals into maximal islands. The classic coalescing step
    * for availability windows, session spans, and on-call schedules.
    *
    * Formulation: per key, sort by (lo, hi, tie); an interval starts a new
    * island iff its lo exceeds the running max hi of all PRECEDING rows
    * (plus the allowed gap); the island id is the running sum of those
    * starts; islands aggregate to (min lo, max hi, n). Ties in lo cannot
    * change the island partition (equal-lo intervals always overlap), so
    * the result is deterministic for any tie order. One shuffle: both
    * windows and the final aggregate share the key partitioning.
    *
    * Input columns must be timestamps; output bounds are epoch micros.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, loCol: String,
      hiCol: String, tieCol: String, gapSeconds: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Seq(col(loCol), col(hiCol), col(tieCol))
    val preceding = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val running = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("_new_island",
        // first row per key: max over empty frame is null → comparison null
        // → otherwise-0, i.e. island 0 — same as SQL CASE semantics
        when(unix_micros(col(loCol)) >
          max(unix_micros(col(hiCol))).over(preceding) + gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("_island", sum(col("_new_island")).over(running))
      .groupBy(col(keyCol), col("_island").as("island"))
      .agg(unix_micros(min(col(loCol))).as("start_us"),
        unix_micros(max(col(hiCol))).as("end_us"),
        count(lit(1)).as("n"))
      .select(col(keyCol), col("island").cast("int").as("island"),
        col("start_us"), col("end_us"), col("n"))
  }

  /** CDC changelog → SCD type-2 dimension: collapse consecutive repeats of
    * `stateCol` per key (change detection via lag), then close each retained
    * version's validity interval with the next version's start (lead).
    * `valid_to_us` is null on the current version.
    *
    * Both window passes share one partitioning (`keyCol`) and one sort
    * (`tsCol, tieCol`), so Catalyst plans a single exchange + sort. At scale
    * the cost is the one shuffle any per-key history operation pays;
    * unchanged-value rows (the bulk of a chatty changelog) are dropped
    * before the second pass.
    */
  def scd2Compact(events: DataFrame, keyCol: String = "user_id",
      stateCol: String = "event_type", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(stateCol), col(tsCol), col(tieCol))
      // first row per key is explicit: with a null initial state,
      // `null <=> null` is true and the lag test alone would drop version 1
      .withColumn("chg", row_number().over(w) === 1 ||
        !(lag(col(stateCol), 1).over(w) <=> col(stateCol)))
      .where(col("chg"))
      .withColumn("version", row_number().over(w).cast("int"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col("version"), col(stateCol).as("state"),
        unix_micros(col(tsCol)).as("valid_from_us"),
        unix_micros(col("valid_to")).as("valid_to_us"),
        col("valid_to").isNull.as("is_current"))
  }
}
