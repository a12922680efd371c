package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import QHelpers._

/** Scans, projections, filters, scalar expressions (SURVEY.md §2.3
  * Q-SCAN1/Q-FILT1/Q-FILT2/Q-EXPR1/Q-STR1/Q-DATE1/Q-MATH1/Q-COND1).
  *
  * All plain `read.parquet → select/filter` — Catalyst pushes the filters and
  * the column projection down to the parquet scan (verify via
  * `.explain`: PushedFilters / ReadSchema).
  */
object ScanQueries {

  val all: Seq[DeclaredQuery] = Seq(
    DeclaredQuery(
      "q_scan1",
      (s, d) =>
        Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), r4(col("l_quantity")).as("l_quantity"))
          // (l_orderkey, l_linenumber) is NOT unique in the test data — order
          // by every output column so row order is fully deterministic.
          .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
      Some(
        "SELECT l_orderkey, l_linenumber, round(l_quantity,4) AS l_quantity " +
          "FROM lineitem ORDER BY 1,2,3")),

    DeclaredQuery(
      "q_filt1",
      (s, d) =>
        Tables.load(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp")
            && col("l_discount").between(0.05, 0.07)
            && col("l_quantity") < 24)
          .select(col("l_orderkey"), col("l_linenumber"),
            r4(col("l_extendedprice")).as("price"), r4(col("l_discount")).as("disc"))
          .orderBy("l_orderkey", "l_linenumber", "price", "disc"),
      Some(
        "SELECT l_orderkey, l_linenumber, round(l_extendedprice,4) AS price, round(l_discount,4) AS disc " +
          "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_discount BETWEEN 0.05 AND 0.07 " +
          "AND l_quantity < 24 ORDER BY 1,2,3,4")),

    DeclaredQuery(
      "q_filt2",
      (s, d) =>
        Tables.load(s, d, "part")
          .filter(col("p_type").like("%AR%") && col("p_size").isin(5, 10, 15, 20, 25, 30))
          .select("p_partkey", "p_type", "p_size")
          .orderBy("p_partkey"),
      Some(
        "SELECT p_partkey, p_type, p_size FROM part " +
          "WHERE p_type LIKE '%AR%' AND p_size IN (5,10,15,20,25,30) ORDER BY p_partkey")),

    DeclaredQuery(
      "q_expr1",
      (s, d) =>
        Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            // decimal product: exact cross-engine arithmetic AND identical
            // tie rounding (double products land on x.xxxx5 constantly here)
            round(money(col("l_extendedprice")) * money(lit(1) - col("l_discount")) * money(lit(1) + col("l_tax")), 4)
              .cast("double").as("net"))
          .orderBy("l_orderkey", "l_linenumber", "net"),
      Some(
        "SELECT l_orderkey, l_linenumber, CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "CAST(1-l_discount AS DECIMAL(18,2)) * CAST(1+l_tax AS DECIMAL(18,2)),4) AS DOUBLE) AS net " +
          "FROM lineitem ORDER BY 1,2,3")),

    DeclaredQuery(
      "q_str1",
      (s, d) =>
        Tables.load(s, d, "customer")
          .select(col("c_custkey"),
            upper(col("c_name")).as("uname"),
            substring(col("c_name"), 10, 8).as("tail"),
            length(col("c_name")).as("name_len"),
            concat(col("c_mktsegment"), lit("-"), col("c_name")).as("seg_name"),
            regexp_replace(col("c_name"), lit("Customer#"), lit("C")).as("short_name"),
            trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, upper(c_name) AS uname, substr(c_name,10,8) AS tail, " +
          "CAST(length(c_name) AS INTEGER) AS name_len, concat(c_mktsegment,'-',c_name) AS seg_name, " +
          "replace(c_name,'Customer#','C') AS short_name, trim(concat('  ',c_name,'  ')) AS trimmed " +
          "FROM customer ORDER BY c_custkey")),

    DeclaredQuery(
      "q_str2",
      (s, d) =>
        Tables.load(s, d, "part")
          .select(col("p_partkey"),
            regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
            // [0-9] rather than \d: identical semantics, but portable across
            // SQL string-literal escaping rules (Spark SQL collapses '\d'
            // to 'd' in a literal; DuckDB keeps it — a class needs neither)
            regexp_extract(col("p_brand"), "#([0-9]+)", 1).as("brand_num"))
          .orderBy("p_partkey"),
      Some(
        "SELECT p_partkey, regexp_extract(p_name,'^([a-z]+)',1) AS first_word, " +
          "regexp_extract(p_brand,'#([0-9]+)',1) AS brand_num FROM part ORDER BY p_partkey")),

    DeclaredQuery(
      "q_date1",
      (s, d) =>
        Tables.load(s, d, "orders")
          .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("y", "m"),
      Some(
        "SELECT CAST(year(o_orderdate) AS INTEGER) AS y, CAST(month(o_orderdate) AS INTEGER) AS m, " +
          "count(*) AS n, round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),4) AS total " +
          "FROM orders GROUP BY 1,2 ORDER BY 1,2")),

    DeclaredQuery(
      "q_math1",
      (s, d) =>
        Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            r4(abs(col("l_discount") - 0.05)).as("a"),
            r4(sqrt(col("l_quantity"))).as("s"),
            r4(log(col("l_quantity") + 1)).as("l"),
            r4(exp(col("l_discount"))).as("e"),
            r4(pow(lit(1) + col("l_tax"), 2)).as("p"),
            floor(col("l_extendedprice") / 1000).as("f"),
            ceil(col("l_extendedprice") / 1000).as("c"),
            (col("l_partkey") % 7).as("m"))
          .orderBy("l_orderkey", "l_linenumber", "s", "a", "e", "p", "f", "c", "m", "l"),
      Some(
        "SELECT l_orderkey, l_linenumber, round(abs(l_discount-0.05),4) AS a, round(sqrt(l_quantity),4) AS s, " +
          "round(ln(l_quantity+1),4) AS l, round(exp(l_discount),4) AS e, round(pow(1+l_tax,2),4) AS p, " +
          "CAST(floor(l_extendedprice/1000) AS BIGINT) AS f, CAST(ceil(l_extendedprice/1000) AS BIGINT) AS c, " +
          "l_partkey % 7 AS m FROM lineitem ORDER BY l_orderkey, l_linenumber, s, a, e, p, f, c, m, l")),

    DeclaredQuery(
      "q_cond1",
      (s, d) =>
        Tables.load(s, d, "orders")
          .select(col("o_orderkey"),
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
              .when(col("o_orderpriority") === "3-MEDIUM", "warm")
              .otherwise("cold").as("heat"),
            coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hot' " +
          "WHEN o_orderpriority = '3-MEDIUM' THEN 'warm' ELSE 'cold' END AS heat, " +
          "coalesce(nullif(o_orderstatus,'O'),'OPEN') AS status FROM orders ORDER BY o_orderkey")))
}
