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

  test("streaming dedup keeps exactly one event per key (counts match batch distinct)") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.runToMemory(spark, sfDir,
        df => EventStreams.dedupStream(df, Seq("user_id", "event_type")),
        OutputMode.Append, "spec_dedup")
    // which row survives per key is arrival-order-dependent; the CONTRACT
    // is one survivor per key — compare key sets, not rows
    val streamedKeys = streamed.select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val batchKeys = Tables.load(spark, sfDir, "events")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(streamed.count() === streamedKeys.distinct.size.toLong)
    assert(streamedKeys === batchKeys)
  }

  test("stream-stream interval join equals the batch equi+range join") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.runToMemory(spark, sfDir,
        df => EventStreams.purchaseClickJoin(df, 60),
        OutputMode.Append, "spec_ssjoin")
      .orderBy("p_id", "c_id").collect()
    val ev = Tables.load(spark, sfDir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_uid"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_uid"), col("ts").as("c_ts"))
    val batch = p.join(c,
        col("p_uid") === col("c_uid") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 60 MINUTES") &&
          col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"), col("p_uid").as("user_id"))
      .orderBy("p_id", "c_id").collect()
    assert(streamed.toSeq === batch.toSeq)
    assert(batch.nonEmpty)
  }

  test("no-equi-key streaming range join equals the batch bucketed range join") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.runToMemory(spark, sfDir,
        df => EventStreams.rangeJoinStream(df, 10),
        OutputMode.Append, "spec_rangejoin")
      .orderBy("p_id", "c_id").collect()
    val ev = Tables.load(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts").as("c_ts"))
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"),
        (col("ts") - expr("INTERVAL 10 MINUTES")).as("lo"), col("ts").as("hi"))
    val batch = graft.operators.RangeJoin
      .pointInInterval(clicks, "c_ts", windows, "lo", "hi", 600L)
      .select(col("p_id"), col("c_id"))
      .orderBy("p_id", "c_id").collect()
    assert(streamed.toSeq === batch.toSeq)
    assert(batch.nonEmpty)
    // exactly-once: no pair emitted twice despite the 2-bucket explode
    assert(streamed.length === streamed.distinct.length)
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

  test("stateful streaming funnel equals the batch greedy funnel") {
    val steps = Seq("view", "click", "purchase")
    val streamed = EventStreams.runToMemory(spark, sfDir,
        df => EventStreams.funnelStateful(df, steps),
        OutputMode.Update, "spec_funnel")
      .orderBy("user_id").collect()
    val batch = EventOps.funnel(Tables.load(spark, sfDir, "events"), steps)
      .orderBy("user_id").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("sharded space-saving streaming heavy hitters equal the batch exact top-k") {
    import org.apache.spark.sql.functions._
    val sink = EventStreams.runToMemory(spark, sfDir,
      df => EventStreams.heavyHittersStateful(df, m = 65536, k = 12),
      OutputMode.Update, "spec_hh")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("user_id"))
    val streamed = sink.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 12).select("rank", "user_id", "n")
      .orderBy("rank").collect()
    val batch = graft.operators.HeavyHitters
      .exact(Tables.load(spark, sfDir, "events"), "user_id", 12)
      .orderBy("rank").collect()
    assert(streamed.toSeq === batch.toSeq)
    // genuinely sharded: emissions span multiple state keys (bounded sink)
    assert(sink.count() <= 8L * 12)
  }

  test("stateful streaming interval coalescing equals the batch gaps-and-islands") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.runToMemory(spark, sfDir,
        df => EventStreams.mergeIntervalsStateful(df, lengthMinutes = 30),
        OutputMode.Update, "spec_islands")
      .orderBy("user_id", "island").collect()
    val batch = EventOps.mergeIntervals(
        Tables.load(spark, sfDir, "events")
          .select(col("user_id"), col("ts").as("lo"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("hi"), col("event_id")),
        "user_id", "lo", "hi", "event_id")
      .orderBy("user_id", "island").collect()
    assert(streamed.toSeq === batch.toSeq)
    assert(batch.length > 1, "fixture degenerate: one island total")
    // islands per user must genuinely coalesce (fewer islands than events)
    assert(batch.map(_.getLong(4)).exists(_ > 1L), "no interval ever merged")
  }

  test("stateful streaming SCD2 equals the batch compaction") {
    val streamed = EventStreams.runToMemory(spark, sfDir, EventStreams.scd2Stateful,
        OutputMode.Update, "spec_scd2")
      .orderBy("user_id", "version").collect()
    val batch = EventOps.scd2Compact(Tables.load(spark, sfDir, "events"))
      .orderBy("user_id", "version").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming merge sink converges to the batch aggregate and is replay-safe") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val root = "target/tmp/stream/merge_spec"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.delete(p, true)
    Tables.load(spark, sfDir, "events")
      .repartition(3).write.parquet(s"$root/src")
    def partial(batch: org.apache.spark.sql.DataFrame) =
      batch.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast(DecimalType(18, 4))).as("total"))
    val db = EventStreams.mergeStreamToTable(spark, s"$root/src", partial,
      "user_id", s"$root/tbl", s"$root/ck", maxFilesPerTrigger = 1)
    def snapshot = db.read()
      .select(col("user_id"), col("n"), round(col("total").cast("double"), 4).as("total"))
      .orderBy("user_id").collect().toSeq
    val want = partial(Tables.load(spark, sfDir, "events"))
      .select(col("user_id"), col("n"), round(col("total").cast("double"), 4).as("total"))
      .orderBy("user_id").collect().toSeq
    assert(snapshot === want, "merged table diverged from the batch aggregate")
    // replay with the same checkpoint: no new files -> no merges -> unchanged
    // (the batchId guard additionally protects re-DELIVERED batches)
    EventStreams.mergeStreamToTable(spark, s"$root/src", partial,
      "user_id", s"$root/tbl", s"$root/ck", maxFilesPerTrigger = 1)
    assert(snapshot === want, "re-run with the same checkpoint changed the table")
    // new data arriving later merges incrementally on top
    Tables.load(spark, sfDir, "events")
      .limit(50).write.mode("append").parquet(s"$root/src")
    EventStreams.mergeStreamToTable(spark, s"$root/src", partial,
      "user_id", s"$root/tbl", s"$root/ck", maxFilesPerTrigger = 1)
    val n0 = want.map(_.getLong(1)).sum
    val n1 = snapshot.map(_.getLong(1)).sum
    assert(n1 === n0 + 50, s"incremental merge added ${n1 - n0} rows, want 50")
  }

  test("streamed HLL store equals the one-shot build and skips re-delivery") {
    import org.apache.spark.sql.functions._
    val root = "target/tmp/stream/hll_spec"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.delete(p, true)
    val ev = Tables.load(spark, sfDir, "events")
    ev.repartition(3).write.parquet(s"$root/src")
    val last = EventStreams.distinctStoreStream(spark, s"$root/src",
      Seq("event_type"), "user_id", s"$root/store", s"$root/ck", nBuckets = 8)
    assert(last >= 2, s"replay collapsed into ${last + 1} batches")
    // HLL union is associative: the 3-batch stream build must produce the
    // SAME estimates as a one-shot batch build of the whole table
    graft.operators.DistinctSketch.buildBucketedStore(
      ev, Seq("event_type"), "user_id", s"$root/oneshot", nBuckets = 8)
    def est(dir: String) = graft.operators.DistinctSketch
      .readEstimates(spark, dir, "est").select("event_type", "est")
      .orderBy("event_type").collect().toSeq
    assert(est(s"$root/store") === est(s"$root/oneshot"),
      "streamed store estimates diverge from the one-shot build")
    // re-run with the same checkpoint: no new files -> store untouched
    val before = est(s"$root/store")
    EventStreams.distinctStoreStream(spark, s"$root/src",
      Seq("event_type"), "user_id", s"$root/store", s"$root/ck", nBuckets = 8)
    assert(est(s"$root/store") === before, "checkpointed re-run changed the store")
  }

  test("stateful streaming histogram equals the batch binned groupBy") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.runToMemory(spark, sfDir,
        df => EventStreams.histogramStateful(df, binWidth = 25.0),
        OutputMode.Update, "spec_hist")
      .orderBy("event_type", "bin").collect()
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"), floor(col("value") / 25.0).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bin").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stateful streaming attribution equals the batch window attribution") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.runToMemory(spark, sfDir,
        EventStreams.attributionStateful, OutputMode.Update, "spec_attr")
      .groupBy("last_touch", "first_touch")
      .agg(sum(col("n_conv")).as("n_conv"), round(sum(col("revenue")), 4).as("revenue"))
      .orderBy("last_touch", "first_touch").collect()
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val batch = Tables.load(spark, sfDir, "events")
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("last_touch").isNotNull)
      .groupBy("last_touch", "first_touch")
      .agg(count(lit(1)).as("n_conv"), round(sum(col("value")), 4).as("revenue"))
      .orderBy("last_touch", "first_touch").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }
}
