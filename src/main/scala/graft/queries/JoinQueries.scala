package graft.queries

import graft.Tables
import graft.operators.{RangeJoin, SkewOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QHelpers._

/** Join flavors (SURVEY.md §2.3 Q-JOIN1..Q-JOIN7, Q-ASOF1).
  *
  * Scale notes: small dimensions (part, nation, region, the query-vector side)
  * are explicitly `broadcast()`; large-large joins shuffle on their equi-keys
  * and rely on AQE for skew handling. The as-of join is expressed as
  * equi-join + range predicate + row_number pick-latest, which Spark executes
  * as a shuffled equi-join on the user key (the range predicate is a post-join
  * filter) — the right shape at 100 TB as long as the equi-key is selective.
  */
object JoinQueries {

  val all: Seq[DeclaredQuery] = Seq(
    DeclaredQuery(
      "q_join1",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val o = Tables.load(s, d, "orders")
        val l = Tables.load(s, d, "lineitem")
        c.join(o, o("o_custkey") === c("c_custkey"))
          .join(l, l("l_orderkey") === o("o_orderkey"))
          .groupBy(c("c_custkey"), c("c_name"))
          .agg(count(lit(1)).as("n_lines"),
            round(sum(money(col("l_extendedprice")) * money(lit(1) - col("l_discount"))).cast("double"), 4).as("revenue"))
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, c_name, count(*) AS n_lines, " +
          "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE),4) AS revenue " +
          "FROM customer JOIN orders ON o_custkey=c_custkey JOIN lineitem ON l_orderkey=o_orderkey " +
          "GROUP BY 1,2 ORDER BY 1")),

    DeclaredQuery(
      "q_join2",
      (s, d) => {
        val l = Tables.load(s, d, "lineitem")
        val p = Tables.load(s, d, "part")
        l.join(broadcast(p), p("p_partkey") === l("l_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"), r4(sum(col("l_quantity"))).as("qty"))
          .orderBy("p_brand")
      },
      Some(
        "SELECT p_brand, count(*) AS n, round(sum(l_quantity),4) AS qty " +
          "FROM lineitem JOIN part ON p_partkey=l_partkey GROUP BY 1 ORDER BY 1")),

    DeclaredQuery(
      "q_join3",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val o = Tables.load(s, d, "orders")
        c.join(o, o("o_custkey") === c("c_custkey"), "left_outer")
          .groupBy(c("c_custkey"))
          .agg(count(o("o_orderkey")).as("n_orders"),
            round(coalesce(sum(money(col("o_totalprice"))).cast("double"), lit(0.0)), 4).as("total"))
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, count(o_orderkey) AS n_orders, " +
          "round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),0),4) AS total " +
          "FROM customer LEFT JOIN orders ON o_custkey=c_custkey GROUP BY 1 ORDER BY 1")),

    DeclaredQuery(
      "q_join3f",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
          .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("nc"))
        val su = Tables.load(s, d, "supplier")
          .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("ns"))
        c.join(su, col("ck") === col("sk"), "full_outer")
          .select(coalesce(col("ck"), col("sk")).as("k"), col("nc"), col("ns"))
          .orderBy("k")
      },
      Some(
        "SELECT coalesce(a.k, b.k) AS k, a.nc, b.ns " +
          "FROM (SELECT c_nationkey k, count(*) nc FROM customer GROUP BY 1) a " +
          "FULL JOIN (SELECT s_nationkey k, count(*) ns FROM supplier GROUP BY 1) b ON a.k=b.k ORDER BY 1")),

    DeclaredQuery(
      "q_join4",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val o = Tables.load(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, o("o_custkey") === c("c_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
          "(SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_orderpriority='1-URGENT') ORDER BY c_custkey")),

    DeclaredQuery(
      "q_join5",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val o = Tables.load(s, d, "orders")
        c.join(o, o("o_custkey") === c("c_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
          "(SELECT 1 FROM orders WHERE o_custkey=c_custkey) ORDER BY c_custkey")),

    DeclaredQuery(
      "q_join6",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val e1 = ev.select(col("user_id"), col("ts"), col("event_id"))
        val e2 = ev.select(col("user_id").as("u2"), col("ts").as("ts2"))
        e1.join(e2,
            col("user_id") === col("u2")
              && col("ts2") > col("ts")
              && col("ts2") <= col("ts") + expr("INTERVAL 1 HOUR"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"))
          .orderBy("user_id")
      },
      Some(
        "SELECT e1.user_id, count(*) AS n FROM events e1 JOIN events e2 " +
          "ON e1.user_id=e2.user_id AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR " +
          "GROUP BY 1 ORDER BY 1")),

    DeclaredQuery(
      "q_join7",
      (s, d) => {
        val r = Tables.load(s, d, "region")
        val n = Tables.load(s, d, "nation")
        r.crossJoin(n)
          .agg(count(lit(1)).as("n_pairs"), min(col("r_name")).as("min_r"), max(col("n_name")).as("max_n"))
      },
      Some(
        "SELECT count(*) AS n_pairs, min(r_name) AS min_r, max(n_name) AS max_n " +
          "FROM region CROSS JOIN nation")),

    // salted equi-join (skew mitigation pattern): identical results to the
    // plain join — the oracle IS the plain join
    DeclaredQuery(
      "q_join8",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val o = Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        SkewOps.saltedJoin(li, o.withColumnRenamed("o_orderkey", "l_orderkey"),
            "l_orderkey", saltFactor = 8)
          .select(col("l_orderkey"), col("l_linenumber"),
            r4(col("l_quantity")).as("qty"), r4(col("o_totalprice")).as("price"))
          .orderBy("l_orderkey", "l_linenumber", "qty", "price")
      },
      Some(
        "SELECT l_orderkey, l_linenumber, round(l_quantity,4) AS qty, round(o_totalprice,4) AS price " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "ORDER BY 1,2,3,4")),

    DeclaredQuery(
      "q_asof1",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_uid"),
            col("ts").as("c_ts"), col("value").as("c_val"))
        val w = Window.partitionBy(col("p_id")).orderBy(col("c_ts").desc, col("c_id").desc)
        p.join(c, col("c_uid") === col("user_id") && col("c_ts") <= col("p_ts"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("p_id").as("event_id"), col("c_id").as("prior_click_id"),
            r4(col("c_val")).as("click_value"))
          .orderBy("event_id")
      },
      Some(
        "WITH p AS (SELECT event_id p_id, user_id, ts p_ts FROM events WHERE event_type='purchase'), " +
          "c AS (SELECT event_id c_id, user_id c_uid, ts c_ts, value c_val FROM events WHERE event_type='click'), " +
          "j AS (SELECT p_id, c_id, c_val, row_number() OVER (PARTITION BY p_id ORDER BY c_ts DESC, c_id DESC) rn " +
          "FROM p JOIN c ON c_uid=user_id AND c_ts<=p_ts) " +
          "SELECT p_id AS event_id, c_id AS prior_click_id, round(c_val,4) AS click_value " +
          "FROM j WHERE rn=1 ORDER BY event_id")),

    // no-equi-key as-of: the latest click from ANY user within the hour
    // before each purchase. q_asof1's equi-key (user_id) let it run as a
    // plain hash join + window; without the key Catalyst would nested-loop,
    // so this rides RangeJoin.asOf (bucketed candidates + one window per
    // purchase — RangeJoinSpec asserts the no-nested-loop plan). The oracle
    // is the same as-of relation with the identical explicit tie-break
    // (c_ts DESC, c_id DESC), horizon-bounded on both engines: the
    // globally-latest predecessor within the horizon IS the as-of answer.
    DeclaredQuery(
      "q_asof2",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("ts").as("c_ts"),
            col("value").as("c_val"))
        // skew probe at the semantic width (the horizon): a collapsed time
        // axis fails here with a named error instead of a 200× hot-bucket
        // join (round-7 failure mode; one cheap one-column agg pass)
        RangeJoin.probeBucketSkewOnce(s"${RangeJoin.datasetKey(s, s"$d/events.parquet")}|events.click.ts|3600", c, "c_ts", 3600L)
        RangeJoin.asOf(p, "p_ts", "p_id", c, "c_ts",
            horizonSeconds = 3600L, tieBreakDesc = Seq("c_id"))
          .select(col("p_id").as("event_id"), col("c_id").as("prior_click_id"),
            r4(col("c_val")).as("click_value"))
          .orderBy("event_id")
      },
      Some(
        "WITH p AS (SELECT event_id p_id, ts p_ts FROM events WHERE event_type='purchase'), " +
          "c AS (SELECT event_id c_id, ts c_ts, value c_val FROM events WHERE event_type='click'), " +
          "j AS (SELECT p_id, c_id, c_val, row_number() OVER (PARTITION BY p_id ORDER BY c_ts DESC, c_id DESC) rn " +
          "FROM p JOIN c ON c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 1 HOUR) " +
          "SELECT p_id AS event_id, c_id AS prior_click_id, round(c_val,4) AS click_value " +
          "FROM j WHERE rn=1 ORDER BY event_id")),

    // pure range join — NO equi-key: every click (any user) inside each
    // purchase's 1-hour window. Catalyst has only a nested-loop plan for
    // this shape; RangeJoin buckets time so it runs as a shuffled equi-join
    // on the bucket id (RangeJoinSpec asserts the plan carries no
    // BroadcastNestedLoopJoin / CartesianProduct). DuckDB's IEJoin computes
    // the same relation natively — that is the oracle.
    DeclaredQuery(
      "q_join9",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("ts").as("c_ts"), col("value").as("c_val"))
        val windows = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("ts").as("lo"),
            (col("ts") + expr("INTERVAL 1 HOUR")).as("hi"))
        RangeJoin.probeBucketSkewOnce(s"${RangeJoin.datasetKey(s, s"$d/events.parquet")}|events.click.ts|3600", clicks, "c_ts", 3600L)
        RangeJoin.pointInInterval(clicks, "c_ts", windows, "lo", "hi", 3600L)
          .groupBy("p_id")
          .agg(count(lit(1)).as("n"), r4(sum(col("c_val"))).as("total"))
          .select(col("p_id").as("event_id"), col("n"), col("total"))
          .orderBy("event_id")
      },
      Some(
        "WITH p AS (SELECT event_id p_id, ts lo, ts + INTERVAL 1 HOUR hi FROM events WHERE event_type='purchase'), " +
          "c AS (SELECT ts c_ts, value c_val FROM events WHERE event_type='click') " +
          "SELECT p_id AS event_id, count(*) AS n, round(sum(c_val),4) AS total " +
          "FROM p JOIN c ON c_ts >= lo AND c_ts <= hi GROUP BY 1 ORDER BY 1")),

    // the same range-join relation with NO caller-picked bucket width: the
    // operator measures the interval side's median span (one quantile
    // sketch pass) and picks the width itself. Same oracle as q_join9 —
    // the width changes the physical bucketing, never the relation; this
    // puts the auto-width path on the driver's correctness gate.
    DeclaredQuery(
      "q_join11",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("ts").as("c_ts"), col("value").as("c_val"))
        val windows = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("ts").as("lo"),
            (col("ts") + expr("INTERVAL 1 HOUR")).as("hi"))
        // probe at the SEMANTIC width (the 1-hour window length), not the
        // auto-picked one: collapsed time would shrink the auto width to
        // ~1 s and hide the degeneracy from a probe at that width
        RangeJoin.probeBucketSkewOnce(s"${RangeJoin.datasetKey(s, s"$d/events.parquet")}|events.click.ts|3600", clicks, "c_ts", 3600L)
        RangeJoin.pointInInterval(clicks, "c_ts", windows, "lo", "hi")
          .groupBy("p_id")
          .agg(count(lit(1)).as("n"), r4(sum(col("c_val"))).as("total"))
          .select(col("p_id").as("event_id"), col("n"), col("total"))
          .orderBy("event_id")
      },
      Some(
        "WITH p AS (SELECT event_id p_id, ts lo, ts + INTERVAL 1 HOUR hi FROM events WHERE event_type='purchase'), " +
          "c AS (SELECT ts c_ts, value c_val FROM events WHERE event_type='click') " +
          "SELECT p_id AS event_id, count(*) AS n, round(sum(c_val),4) AS total " +
          "FROM p JOIN c ON c_ts >= lo AND c_ts <= hi GROUP BY 1 ORDER BY 1")),

    // interval×interval overlap join — purchase 1-hour windows against
    // click 30-minute windows, no equi-key. Wide spans co-occur in many
    // buckets; RangeJoin.intervalOverlap keeps each pair only in its
    // greatest-lo bucket so the equi-join output is exact without a
    // distinct() (RangeJoinSpec proves once-per-pair and the no-nested-loop
    // plan). Oracle: DuckDB IEJoin on the overlap predicate.
    DeclaredQuery(
      "q_join10",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("ts").as("p_lo"),
            (col("ts") + expr("INTERVAL 1 HOUR")).as("p_hi"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("ts").as("c_lo"), (col("ts") + expr("INTERVAL 30 MINUTE")).as("c_hi"),
            col("value").as("c_val"))
        RangeJoin.probeBucketSkewOnce(s"${RangeJoin.datasetKey(s, s"$d/events.parquet")}|events.click.ts|3600", clicks, "c_lo", 3600L)
        RangeJoin.intervalOverlap(purchases, "p_lo", "p_hi", clicks, "c_lo", "c_hi", 3600L)
          .groupBy("p_id")
          .agg(count(lit(1)).as("n"), r4(sum(col("c_val"))).as("total"))
          .select(col("p_id").as("event_id"), col("n"), col("total"))
          .orderBy("event_id")
      },
      Some(
        "WITH p AS (SELECT event_id p_id, ts p_lo, ts + INTERVAL 1 HOUR p_hi FROM events WHERE event_type='purchase'), " +
          "c AS (SELECT ts c_lo, ts + INTERVAL 30 MINUTE c_hi, value c_val FROM events WHERE event_type='click') " +
          "SELECT p_id AS event_id, count(*) AS n, round(sum(c_val),4) AS total " +
          "FROM p JOIN c ON p_lo <= c_hi AND c_lo <= p_hi GROUP BY 1 ORDER BY 1")))
}
