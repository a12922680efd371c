package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int): Timestamp = new Timestamp(1700000000000L + sec * 1000L)
  private def us(sec: Int): Long = (1700000000000L + sec * 1000L) * 1000L

  // (user_id, event_type, ts, event_id)
  private lazy val events = Seq(
    // user 1: clean view → click → purchase
    (1L, "view", ts(1), 101L), (1L, "click", ts(2), 102L), (1L, "purchase", ts(3), 103L),
    // user 2: click BEFORE the first view must not count; no click after
    (2L, "click", ts(1), 201L), (2L, "view", ts(2), 202L), (2L, "purchase", ts(3), 203L),
    // user 3: click at exactly t1 — strict > means it does not advance
    (3L, "view", ts(1), 301L), (3L, "click", ts(1), 302L),
    // user 4: never enters the funnel (no view)
    (4L, "purchase", ts(1), 401L)
  ).toDF("user_id", "event_type", "ts", "event_id")

  test("funnel: greedy ordered stages with strict-ts advance") {
    val got = EventOps.funnel(events, Seq("view", "click", "purchase"))
      .select("user_id", "depth", "t1_us", "t2_us", "t3_us")
      .as[(Long, Int, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) === ((3, Some(us(1)), Some(us(2)), Some(us(3)))))
    assert(got(2L) === ((1, Some(us(2)), None, None))) // pre-view click ignored
    assert(got(3L) === ((1, Some(us(1)), None, None))) // same-ts click: no advance
    assert(got(4L) === ((0, None, None, None)))
  }

  test("funnel: a bot-sized user group fails loudly instead of buffering unbounded") {
    val e = intercept[Exception] {
      EventOps.funnel(events, Seq("view", "click", "purchase"),
        maxEventsPerUser = 2).collect()
    }
    assert(e.getMessage.contains("maxEventsPerUser"))
    // same data passes with the bound above the largest group
    assert(EventOps.funnel(events, Seq("view", "click", "purchase"),
      maxEventsPerUser = 10).count() === 4L)
  }

  test("funnel: purchase before click never counts even when both exist") {
    val ev = Seq(
      (9L, "view", ts(1), 901L), (9L, "purchase", ts(2), 902L), (9L, "click", ts(3), 903L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = EventOps.funnel(ev, Seq("view", "click", "purchase"))
      .select("user_id", "depth", "t3_us")
      .as[(Long, Int, Option[Long])].collect().head
    assert(got === ((9L, 2, None))) // reaches click (ts 3), purchase was too early
  }

  test("scd2Compact: consecutive repeats collapse, intervals chain, last is current") {
    val ev = Seq(
      (1L, "a", ts(1), 11L), (1L, "a", ts(2), 12L), (1L, "b", ts(3), 13L),
      (1L, "b", ts(4), 14L), (1L, "a", ts(5), 15L),
      (2L, "x", ts(1), 21L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = EventOps.scd2Compact(ev)
      .select("user_id", "version", "state", "valid_from_us", "valid_to_us", "is_current")
      .as[(Long, Int, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      (1L, 1, "a", us(1), Some(us(3)), false),
      (1L, 2, "b", us(3), Some(us(5)), false),
      (1L, 3, "a", us(5), None, true),
      (2L, 1, "x", us(1), None, true)))
  }

  test("mergeIntervals: overlapping and touching intervals coalesce; gaps split") {
    // user 1: [0,10] [5,20] touch/overlap → one island; [40,50] separate
    // user 2: single interval
    val iv = Seq(
      (1L, ts(0), ts(10), 1L), (1L, ts(5), ts(20), 2L), (1L, ts(10), ts(15), 3L),
      (1L, ts(40), ts(50), 4L),
      (2L, ts(0), ts(1), 5L)
    ).toDF("user_id", "lo", "hi", "event_id")
    val got = EventOps.mergeIntervals(iv, "user_id", "lo", "hi", "event_id")
      .select("user_id", "island", "start_us", "end_us", "n")
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      (1L, 0, us(0), us(20), 3L),
      (1L, 1, us(40), us(50), 1L),
      (2L, 0, us(0), us(1), 1L)))
  }

  test("mergeIntervals: gapSeconds bridges near-adjacent intervals") {
    val iv = Seq((1L, ts(0), ts(10), 1L), (1L, ts(12), ts(20), 2L))
      .toDF("user_id", "lo", "hi", "event_id")
    val split = EventOps.mergeIntervals(iv, "user_id", "lo", "hi", "event_id")
      .collect()
    val bridged = EventOps.mergeIntervals(iv, "user_id", "lo", "hi", "event_id",
      gapSeconds = 5L).collect()
    assert(split.length === 2 && bridged.length === 1)
  }

  test("scd2Compact: one exchange — both window passes share partitioning and sort") {
    val plan = EventOps.scd2Compact(events).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected a single shuffle:\n$plan")
  }
}
