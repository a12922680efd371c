package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import QHelpers._

/** Reshaping, order statistics, selector/boolean aggregates, extended
  * string/array function surface, analytic-window ratios, and deterministic
  * sampling — rounding out SURVEY.md §2.3 with the operator classes a
  * warehouse user expects beyond the round-1 inventory.
  */
object MiscQueries {

  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  val all: Seq[DeclaredQuery] = Seq(
    // pivot: revenue by order-year × market segment (explicit value list so
    // the output schema is static — no extra value-discovery scan)
    DeclaredQuery(
      "q_piv1",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val o = Tables.load(s, d, "orders")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(year(col("o_orderdate")).as("y"))
          .pivot("c_mktsegment", segments)
          .agg(dsum(col("o_totalprice")))
          .toDF("y" +: segments.map("seg_" + _.toLowerCase): _*)
          .orderBy("y")
      },
      Some(
        "SELECT CAST(year(o_orderdate) AS INTEGER) AS y, " + segments.map(seg =>
          s"round(CAST(sum(CASE WHEN c_mktsegment = '$seg' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE),4) AS seg_${seg.toLowerCase}")
          .mkString(", ") +
          " FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1")),

    // unpivot/melt: two measures into (key, value) rows
    DeclaredQuery(
      "q_unpiv1",
      (s, d) =>
        Tables.load(s, d, "part")
          .select(col("p_partkey"), col("p_size").cast("double").as("size"),
            col("p_retailprice").as("retailprice"))
          .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")), "k", "v")
          .select(col("p_partkey"), col("k"), r4(col("v")).as("v"))
          .orderBy("p_partkey", "k"),
      Some(
        "SELECT p_partkey, k, round(v,4) AS v FROM (" +
          "SELECT p_partkey, 'size' AS k, CAST(p_size AS DOUBLE) AS v FROM part " +
          "UNION ALL SELECT p_partkey, 'retailprice' AS k, p_retailprice AS v FROM part) " +
          "ORDER BY p_partkey, k")),

    // order statistics: exact interpolated percentiles (median / p90)
    DeclaredQuery(
      "q_agg8",
      (s, d) =>
        Tables.load(s, d, "lineitem")
          .groupBy(col("l_returnflag").as("flag"))
          .agg(r4(percentile(col("l_quantity"), lit(0.5))).as("med_qty"),
            r4(percentile(col("l_extendedprice"), lit(0.9))).as("p90_price"),
            r4(percentile(col("l_discount"), lit(0.25))).as("p25_disc"))
          .orderBy("flag"),
      Some(
        "SELECT l_returnflag AS flag, round(quantile_cont(l_quantity, 0.5),4) AS med_qty, " +
          "round(quantile_cont(l_extendedprice, 0.9),4) AS p90_price, " +
          "round(quantile_cont(l_discount, 0.25),4) AS p25_disc " +
          "FROM lineitem GROUP BY 1 ORDER BY 1")),

    // approx variant of q_agg8 (the 100 TB path where an exact sort-based
    // percentile is too expensive). The sketch value is engine-specific, so
    // the oracle gates it indirectly: approx AND exact in one aggregate, a
    // raise_error guard if the approx strays past 5% relative (the 10000
    // accuracy bound is far tighter), then emit the exact — deterministic,
    // DuckDB-comparable, and a drifted sketch fails the whole query.
    DeclaredQuery(
      "q_agg8_approx",
      (s, d) => {
        def guard(name: String, approx: org.apache.spark.sql.Column,
            exact: org.apache.spark.sql.Column) =
          when(abs(approx - exact) <= greatest(abs(exact) * 0.05, lit(0.01)), r4(exact))
            .otherwise(raise_error(concat(
              lit(s"q_agg8_approx: $name estimate "), approx.cast("string"),
              lit(" strayed past 5% of exact "), exact.cast("string")))).as(name)
        Tables.load(s, d, "lineitem")
          .groupBy(col("l_returnflag").as("flag"))
          .agg(
            guard("med_qty",
              percentile_approx(col("l_quantity"), lit(0.5), lit(10000)),
              percentile(col("l_quantity"), lit(0.5))),
            guard("p90_price",
              percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000)),
              percentile(col("l_extendedprice"), lit(0.9))))
          .orderBy("flag")
      },
      Some(
        "SELECT l_returnflag AS flag, round(quantile_cont(l_quantity, 0.5),4) AS med_qty, " +
          "round(quantile_cont(l_extendedprice, 0.9),4) AS p90_price " +
          "FROM lineitem GROUP BY 1 ORDER BY 1")),

    // selector aggregates: per customer, the orderkey of the priciest /
    // cheapest order. Tie-free ordering key: exact cents × 10^10 + orderkey.
    DeclaredQuery(
      "q_agg9",
      (s, d) => {
        val cents = round(col("o_totalprice") * 100).cast("long")
        val key = cents * 10000000000L + col("o_orderkey")
        Tables.load(s, d, "orders")
          .groupBy(col("o_custkey").as("cust"))
          .agg(max_by(col("o_orderkey"), key).as("best_order"),
            min_by(col("o_orderkey"), key).as("worst_order"),
            count(lit(1)).as("n"))
          .orderBy("cust")
      },
      Some(
        "SELECT o_custkey AS cust, " +
          // max_by/min_by: DuckDB's documented aliases for arg_max/arg_min,
          // and the names Spark's parser knows — the text runs on both
          "max_by(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)*10000000000 + o_orderkey) AS best_order, " +
          "min_by(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)*10000000000 + o_orderkey) AS worst_order, " +
          "count(*) AS n FROM orders GROUP BY 1 ORDER BY 1")),

    // boolean aggregates
    DeclaredQuery(
      "q_agg10",
      (s, d) =>
        Tables.load(s, d, "lineitem")
          .groupBy(col("l_returnflag").as("flag"))
          .agg(bool_and(col("l_quantity") < 50).as("all_small"),
            bool_or(col("l_discount") > 0.09).as("any_deep_disc"),
            count(lit(1)).as("n"))
          .orderBy("flag"),
      Some(
        "SELECT l_returnflag AS flag, bool_and(l_quantity < 50) AS all_small, " +
          "bool_or(l_discount > 0.09) AS any_deep_disc, count(*) AS n " +
          "FROM lineitem GROUP BY 1 ORDER BY 1")),

    // extended string functions
    DeclaredQuery(
      "q_str3",
      (s, d) =>
        Tables.load(s, d, "customer")
          .select(col("c_custkey"),
            lpad(col("c_name"), 25, "*").as("padded"),
            rpad(col("c_mktsegment"), 12, ".").as("seg_pad"),
            expr("left(c_name, 8)").as("l8"),
            expr("right(c_name, 4)").as("r4"),
            reverse(col("c_mktsegment")).as("rev"),
            repeat(lit("ab"), 3).as("rep"),
            instr(col("c_name"), "1").as("pos1"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, lpad(c_name, 25, '*') AS padded, rpad(c_mktsegment, 12, '.') AS seg_pad, " +
          "left(c_name, 8) AS l8, right(c_name, 4) AS r4, reverse(c_mktsegment) AS rev, " +
          "repeat('ab', 3) AS rep, CAST(instr(c_name, '1') AS INTEGER) AS pos1 " +
          "FROM customer ORDER BY c_custkey")),

    // extended array functions over tokenized text. Array-valued results are
    // serialized with array_join so the driver's scalar hash compare applies
    // (the HOF pipeline itself — slice/distinct/sort — is still under test).
    DeclaredQuery(
      "q_arr2",
      (s, d) =>
        Tables.load(s, d, "documents")
          .select(col("doc_id"),
            array_join(slice(split(col("text"), " "), 1, 5), " ").as("first5"),
            array_join(sort_array(array_distinct(slice(split(col("text"), " "), 1, 5))), " ")
              .as("first5_sorted"),
            array_contains(split(col("text"), " "), "the").as("has_the"),
            size(array_distinct(split(col("text"), " "))).as("n_uniq"))
          .orderBy("doc_id"),
      Some(
        "SELECT doc_id, array_to_string(string_split(text,' ')[1:5], ' ') AS first5, " +
          "array_to_string(list_sort(list_distinct(string_split(text,' ')[1:5])), ' ') AS first5_sorted, " +
          "list_contains(string_split(text,' '), 'the') AS has_the, " +
          "CAST(len(list_distinct(string_split(text,' '))) AS INTEGER) AS n_uniq " +
          "FROM documents ORDER BY doc_id")),

    // top-k per group via the bounded-buffer Aggregator (scale-optimized
    // alternative to q_topk1's window row_number: partial agg ships ≤ k
    // rows per group per partition instead of everything). Tie-free
    // composite key: cents·10^10 + inverted orderkey.
    DeclaredQuery(
      "q_topk2",
      (s, d) => {
        val topk = udaf(new graft.functions.Aggregators.TopKAgg(3))
        val cents = round(col("o_totalprice") * 100).cast("long")
        val key = cents * 10000000000L + (lit(9999999999L) - col("o_orderkey"))
        Tables.load(s, d, "orders")
          .groupBy(col("o_custkey").as("cust"))
          .agg(topk(key, col("o_orderkey")).as("top"))
          .select(col("cust"), posexplode(col("top")))
          .select(col("cust"), (col("pos") + 1).cast("int").as("rn"),
            col("col._2").as("o_orderkey"))
          .orderBy("cust", "rn")
      },
      Some(
        "WITH r AS (SELECT o_custkey cust, o_orderkey, row_number() OVER (" +
          "PARTITION BY o_custkey ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey) rn " +
          "FROM orders) SELECT cust, CAST(rn AS INTEGER) AS rn, o_orderkey " +
          "FROM r WHERE rn <= 3 ORDER BY cust, rn")),

    // typed JSON parse (from_json with an explicit schema, vs q_json1's
    // path extraction)
    DeclaredQuery(
      "q_json2",
      (s, d) =>
        Tables.load(s, d, "events")
          .select(col("event_id"),
            from_json(col("props"), lit("k INT")).getField("k").as("k"),
            (from_json(col("props"), lit("k INT")).getField("k") % 10).as("k_mod"))
          .orderBy("event_id"),
      Some(
        "SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k, " +
          "CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod " +
          "FROM events ORDER BY event_id")),

    // higher-order array functions end to end: filter + transform + slice.
    // Output serialized via array_join for the driver's scalar hash compare.
    DeclaredQuery(
      "q_arr3",
      (s, d) =>
        Tables.load(s, d, "documents")
          .select(col("doc_id"),
            array_join(slice(transform(filter(split(col("text"), " "), t => length(t) > 3),
              t => upper(t)), 1, 5), " ").as("long_tokens"),
            size(filter(split(col("text"), " "), t => length(t) > 3)).as("n_long"))
          .orderBy("doc_id"),
      Some(
        "SELECT doc_id, array_to_string(list_transform(list_filter(string_split(text,' '), t -> length(t) > 3), " +
          "t -> upper(t))[1:5], ' ') AS long_tokens, " +
          "CAST(len(list_filter(string_split(text,' '), t -> length(t) > 3)) AS INTEGER) AS n_long " +
          "FROM documents ORDER BY doc_id")),

    // analytic ratio windows
    DeclaredQuery(
      "q_win5",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        Tables.load(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("seg"),
            r4(percent_rank().over(w)).as("pr"),
            r4(cume_dist().over(w)).as("cd"))
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, c_mktsegment AS seg, " +
          "round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),4) AS pr, " +
          "round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),4) AS cd " +
          "FROM customer ORDER BY c_custkey")),

    // explicit GROUPING SETS (rollup/cube live in q_agg4/q_agg4c; this is
    // the free-form variant) — same SQL text on both engines
    DeclaredQuery(
      "q_agg11",
      (s, d) => {
        Tables.load(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(
          "SELECT o_orderstatus, o_orderpriority, count(*) AS n " +
            "FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ()) " +
            "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, n")
      },
      Some(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n " +
          "FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ()) " +
          "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, n")),

    // date arithmetic: day diffs, interval shift, month boundary
    DeclaredQuery(
      "q_date2",
      (s, d) =>
        Tables.load(s, d, "orders")
          .select(col("o_orderkey"),
            datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_to_2002"),
            (col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("date").as("due"),
            last_day(col("o_orderdate")).as("eom"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, CAST(date_diff('day', o_orderdate, DATE '2002-01-01') AS INTEGER) AS days_to_2002, " +
          "CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due, last_day(o_orderdate) AS eom " +
          "FROM orders ORDER BY o_orderkey")),

    // RANGE window frame: per segment, count of customers within ±100.0
    // acctbal of the current row (value-range frame, not row-count frame)
    DeclaredQuery(
      "q_win6",
      (s, d) =>
        Tables.load(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("seg"),
            // SQL form: the Scala rangeBetween API takes long boundaries
            // only, but the frame must be typed like the double order key
            expr("count(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal " +
              "RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING)").as("peers_within_100"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, c_mktsegment AS seg, " +
          "count(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal " +
          "RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING) AS peers_within_100 " +
          "FROM customer ORDER BY c_custkey")),

    // stratified sampling: per-segment fractions with a fixed seed
    // stratified sampling via per-stratum md5-bucket thresholds (the
    // Curation machinery): fully deterministic — across runs, partitioning,
    // AND engines — so unlike seeded sampleBy (an RNG artifact of split
    // order) it carries a full hash oracle
    DeclaredQuery(
      "q_samp2",
      (s, d) =>
        graft.operators.Curation.sampleByStrata(
            Tables.load(s, d, "customer"), "c_custkey", "c_mktsegment",
            Map("AUTOMOBILE" -> 0.5, "BUILDING" -> 0.2, "FURNITURE" -> 0.1,
              "HOUSEHOLD" -> 0.05, "MACHINERY" -> 0.0))
          .select("c_custkey", "c_mktsegment")
          .orderBy("c_custkey"),
      Some {
        def dv(k: Int) =
          s"(ascii(substr(md5(CAST(c_custkey AS STRING)),$k,1)) - " +
            s"CASE WHEN ascii(substr(md5(CAST(c_custkey AS STRING)),$k,1)) >= 97 THEN 87 ELSE 48 END)"
        val bucket = s"(${dv(1)}*4096 + ${dv(2)}*256 + ${dv(3)}*16 + ${dv(4)})"
        "SELECT c_custkey, c_mktsegment FROM customer " +
          s"WHERE $bucket < CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 32768 " +
          "WHEN 'BUILDING' THEN 13107 WHEN 'FURNITURE' THEN 6554 " +
          "WHEN 'HOUSEHOLD' THEN 3277 ELSE 0 END ORDER BY c_custkey"
      }),

    // deterministic hash-bucket sampling (reproducible across engines,
    // unlike TABLESAMPLE): Knuth multiplicative hash of the key, mod 100
    DeclaredQuery(
      "q_samp1",
      (s, d) =>
        Tables.load(s, d, "orders")
          .filter((col("o_orderkey") * 2654435761L) % 100 < 10)
          .select(col("o_orderkey"), col("o_custkey"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, o_custkey FROM orders " +
          "WHERE (o_orderkey * 2654435761) % 100 < 10 ORDER BY o_orderkey")))
}
