package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import QHelpers._

/** Aggregations (SURVEY.md §2.3 Q-AGG1..Q-AGG7, Q-DEDUP1).
  *
  * All are `groupBy.agg` → Spark plans partial (map-side) + final hash
  * aggregation automatically; no shuffle beyond the one on the group keys.
  * Money sums run in DECIMAL(18,2) for cross-engine exactness (QHelpers).
  */
object AggQueries {

  val all: Seq[DeclaredQuery] = Seq(
    // TPC-H Q1 shape
    DeclaredQuery(
      "q_agg1",
      (s, d) =>
        Tables.load(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            r4(sum(col("l_quantity"))).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base"),
            round(sum(money(col("l_extendedprice")) * money(lit(1) - col("l_discount"))).cast("double"), 4).as("sum_disc"),
            r4(avg(col("l_quantity"))).as("avg_qty"),
            round(sum(money(col("l_extendedprice"))).cast("double") / count(lit(1)), 4).as("avg_price"),
            r4(avg(col("l_discount"))).as("avg_disc"),
            count(lit(1)).as("n"),
            r4(min(col("l_quantity"))).as("min_qty"),
            r4(max(col("l_extendedprice"))).as("max_price"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some(
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity),4) AS sum_qty, " +
          "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),4) AS sum_base, " +
          "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE),4) AS sum_disc, " +
          "round(avg(l_quantity),4) AS avg_qty, " +
          "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*),4) AS avg_price, " +
          "round(avg(l_discount),4) AS avg_disc, count(*) AS n, round(min(l_quantity),4) AS min_qty, " +
          "round(max(l_extendedprice),4) AS max_price " +
          "FROM lineitem GROUP BY 1,2 ORDER BY 1,2")),

    DeclaredQuery(
      "q_agg2",
      (s, d) =>
        Tables.load(s, d, "orders")
          .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"))
          .orderBy("y", "m"),
      Some(
        "SELECT CAST(year(o_orderdate) AS INTEGER) AS y, CAST(month(o_orderdate) AS INTEGER) AS m, " +
          "count(DISTINCT o_custkey) AS n_cust FROM orders GROUP BY 1,2 ORDER BY 1,2")),

    // Exact distinct per group (the hash-matched variant of Q-AGG3; the HLL
    // approx variant is q_agg3_approx below, rows-only checked).
    DeclaredQuery(
      "q_agg3",
      (s, d) =>
        Tables.load(s, d, "events")
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
          .orderBy("event_type"),
      Some(
        "SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events " +
          "FROM events GROUP BY 1 ORDER BY 1")),

    // approx_count_distinct (HyperLogLog++) — the sketch value itself is
    // engine-specific, so it can't be hash-compared cross-engine. Oracle
    // strategy instead: compute approx AND exact in one aggregate, fail the
    // PLAN (raise_error) if any group's approx strays past 5× the declared
    // 2% rsd, and emit the exact count — deterministic, DuckDB-comparable,
    // and the approx path is on the gate because an out-of-tolerance sketch
    // turns the whole query into a FAIL row.
    DeclaredQuery(
      "q_agg3_approx",
      (s, d) =>
        Tables.load(s, d, "events")
          .groupBy("event_type")
          .agg(approx_count_distinct(col("user_id"), 0.02).as("approx"),
            countDistinct(col("user_id")).as("exact"))
          .withColumn("n_users",
            when(abs(col("approx") - col("exact")) <=
                greatest(col("exact") * 0.10, lit(5.0)), col("exact"))
              .otherwise(raise_error(concat(
                lit("q_agg3_approx: HLL++ estimate "), col("approx").cast("string"),
                lit(" strayed past 10% of exact "), col("exact").cast("string"),
                lit(" for event_type="), col("event_type")))))
          .select(col("event_type"), col("n_users"))
          .orderBy("event_type"),
      Some(
        "SELECT event_type, count(DISTINCT user_id) AS n_users " +
          "FROM events GROUP BY 1 ORDER BY 1")),

    DeclaredQuery(
      "q_agg4",
      (s, d) => {
        // Dataset.rollup over a fresh join trips Spark's ambiguous-self-join
        // check in 4.1; the SQL form plans the identical Expand + Aggregate.
        Tables.load(s, d, "region").createOrReplaceTempView("g_region")
        Tables.load(s, d, "nation").createOrReplaceTempView("g_nation")
        s.sql(
          "SELECT coalesce(r_name,'ALL') AS r, coalesce(n_name,'ALL') AS n, count(*) AS c " +
            "FROM g_region JOIN g_nation ON n_regionkey=r_regionkey " +
            "GROUP BY ROLLUP(r_name, n_name) ORDER BY r, n")
      },
      Some(
        "SELECT coalesce(r_name,'ALL') AS r, coalesce(n_name,'ALL') AS n, count(*) AS c " +
          "FROM region JOIN nation ON n_regionkey=r_regionkey " +
          "GROUP BY ROLLUP(r_name, n_name) ORDER BY 1,2")),

    DeclaredQuery(
      "q_agg4c",
      (s, d) => {
        Tables.load(s, d, "region").createOrReplaceTempView("g_region")
        Tables.load(s, d, "nation").createOrReplaceTempView("g_nation")
        s.sql(
          "SELECT coalesce(r_name,'ALL') AS r, coalesce(n_name,'ALL') AS n, count(*) AS c " +
            "FROM g_region JOIN g_nation ON n_regionkey=r_regionkey " +
            "GROUP BY CUBE(r_name, n_name) ORDER BY r, n")
      },
      Some(
        "SELECT coalesce(r_name,'ALL') AS r, coalesce(n_name,'ALL') AS n, count(*) AS c " +
          "FROM region JOIN nation ON n_regionkey=r_regionkey " +
          "GROUP BY CUBE(r_name, n_name) ORDER BY 1,2")),

    DeclaredQuery(
      "q_agg5",
      (s, d) =>
        Tables.load(s, d, "orders")
          .groupBy("o_orderpriority")
          .agg(
            round(sum(when(col("o_orderstatus") === "F", money(col("o_totalprice")))).cast("double"), 4).as("total_f"),
            count(when(col("o_orderstatus") === "F", lit(1))).as("n_f"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority"),
      Some(
        "SELECT o_orderpriority, " +
          "round(CAST(sum(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE),4) AS total_f, " +
          "count(CASE WHEN o_orderstatus='F' THEN 1 END) AS n_f, count(*) AS n " +
          "FROM orders GROUP BY 1 ORDER BY 1")),

    DeclaredQuery(
      "q_agg6",
      (s, d) =>
        Tables.load(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(r4(sum(col("l_quantity"))).as("total_qty"))
          .filter(col("total_qty") > 120)
          .orderBy("l_orderkey"),
      Some(
        "SELECT l_orderkey, round(sum(l_quantity),4) AS total_qty FROM lineitem " +
          "GROUP BY 1 HAVING sum(l_quantity) > 120 ORDER BY 1")),

    DeclaredQuery(
      "q_agg7",
      (s, d) =>
        Tables.load(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            r4(stddev_samp(col("l_quantity"))).as("sd"),
            r4(var_samp(col("l_quantity"))).as("vr"),
            r4(corr(col("l_quantity"), col("l_extendedprice"))).as("cr"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some(
        "SELECT l_returnflag, round(stddev_samp(l_quantity),4) AS sd, round(var_samp(l_quantity),4) AS vr, " +
          "round(corr(l_quantity,l_extendedprice),4) AS cr, count(*) AS n " +
          "FROM lineitem GROUP BY 1 ORDER BY 1")),

    // Exact dedup with deterministic keeper (Q-DEDUP1)
    DeclaredQuery(
      "q_dedup1",
      (s, d) =>
        Tables.load(s, d, "events")
          .groupBy("user_id", "event_type")
          .agg(min(col("event_id")).as("keep_id"), count(lit(1)).as("n_dups"))
          .orderBy("user_id", "event_type"),
      Some(
        "SELECT user_id, event_type, min(event_id) AS keep_id, count(*) AS n_dups " +
          "FROM events GROUP BY 1,2 ORDER BY 1,2")))
}
