package graft.queries

import graft.Tables
import graft.schema.SchemaOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
import QHelpers._

/** Nested / array / map / JSON surface (SURVEY.md §2.3 Q-NEST1..3, Q-EXPL1,
  * Q-ARR1, Q-MAP1, Q-JSON1, Q-FL1) — the reference's core columnar
  * restructuring capabilities (§2.1 R12–R19) re-expressed as Spark
  * higher-order functions.
  *
  * The Spark side genuinely builds/destructures nested values
  * (struct / collect_list / transform / flatten / posexplode); the oracle SQL
  * states the equivalent flat relational result, which is what gets
  * hash-compared. collect_list order is made deterministic with
  * array_sort over a struct whose first field is a unique key.
  */
object NestedQueries {

  /** lineitems of one order as a sorted array of structs (ln is unique). */
  private def sites(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "lineitem")
      .groupBy("l_orderkey")
      .agg(array_sort(collect_list(struct(
        col("l_linenumber").as("ln"),
        col("l_quantity").as("qty"),
        col("l_discount").as("disc"),
        col("l_returnflag").as("flag")))).as("items"))

  val all: Seq[DeclaredQuery] = Seq(
    // struct assembly + nested field read-back (R18 + R12)
    DeclaredQuery(
      "q_nest1",
      (s, d) =>
        Tables.load(s, d, "orders")
          .withColumn("rec", struct(
            col("o_orderkey").as("k"),
            struct(col("o_totalprice").as("price"), col("o_orderstatus").as("st")).as("inner")))
          .select(col("rec.k").as("o_orderkey"),
            r4(col("rec.inner.price")).as("price"),
            col("rec.inner.st").as("status"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, round(o_totalprice,4) AS price, o_orderstatus AS status " +
          "FROM orders ORDER BY 1")),

    // list-of-struct projection keeping list shape (R13): transform(items, s -> s.qty)
    DeclaredQuery(
      "q_nest2",
      (s, d) =>
        sites(s, d)
          .select(col("l_orderkey"),
            r4(aggregate(transform(col("items"), x => x.getField("qty")), lit(0.0), (a, x) => a + x)).as("total_qty"),
            size(col("items")).as("n_items"))
          .orderBy("l_orderkey"),
      Some(
        "SELECT l_orderkey, round(sum(l_quantity),4) AS total_qty, CAST(count(*) AS INTEGER) AS n_items " +
          "FROM lineitem GROUP BY 1 ORDER BY 1")),

    // doubly-nested list flatten (R14): list<list<double>> -> flat list
    DeclaredQuery(
      "q_nest3",
      (s, d) =>
        sites(s, d)
          .withColumn("nested", transform(col("items"), x => array(x.getField("qty"), x.getField("disc"))))
          .withColumn("flat", flatten(col("nested")))
          .select(col("l_orderkey"),
            size(col("flat")).as("n"),
            r4(aggregate(col("flat"), lit(0.0), (a, x) => a + x)).as("total"))
          .orderBy("l_orderkey"),
      Some(
        "SELECT l_orderkey, CAST(2*count(*) AS INTEGER) AS n, " +
          "round(sum(l_quantity)+sum(l_discount),4) AS total " +
          "FROM lineitem GROUP BY 1 ORDER BY 1")),

    // explode/posexplode a built array back to rows (Q-EXPL1)
    DeclaredQuery(
      "q_expl1",
      (s, d) =>
        sites(s, d)
          .select(col("l_orderkey"), posexplode(transform(col("items"), x => x.getField("qty"))))
          .select(col("l_orderkey"), col("pos"), r4(col("col")).as("qty"))
          .orderBy("l_orderkey", "pos"),
      Some(
        // tie-breakers mirror the Spark side's lexicographic struct sort
        // (ln, qty, disc, flag) — (l_orderkey, l_linenumber) is not unique
        "SELECT l_orderkey, CAST(row_number() OVER (PARTITION BY l_orderkey " +
          "ORDER BY l_linenumber, l_quantity, l_discount, l_returnflag) - 1 AS INTEGER) AS pos, " +
          "round(l_quantity,4) AS qty FROM lineitem ORDER BY 1,2")),

    // array functions (Q-ARR1): size/contains/sort/distinct/slice
    DeclaredQuery(
      "q_arr1",
      (s, d) =>
        Tables.load(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(array_sort(collect_list(col("l_returnflag"))).as("flags"))
          .select(col("l_orderkey"),
            size(col("flags")).as("n"),
            array_contains(col("flags"), "R").as("has_r"),
            size(array_distinct(col("flags"))).as("n_uniq"),
            element_at(col("flags"), 1).as("first_flag"),
            array_join(slice(col("flags"), 1, 2), ",").as("first2"))
          .orderBy("l_orderkey"),
      Some(
        "SELECT l_orderkey, CAST(count(*) AS INTEGER) AS n, bool_or(l_returnflag='R') AS has_r, " +
          "CAST(count(DISTINCT l_returnflag) AS INTEGER) AS n_uniq, min(l_returnflag) AS first_flag, " +
          "array_to_string(list_slice(list_sort(list(l_returnflag)),1,2),',') AS first2 " +
          "FROM lineitem GROUP BY 1 ORDER BY 1")),

    // JSON -> map (Q-MAP1)
    DeclaredQuery(
      "q_map1",
      (s, d) =>
        Tables.load(s, d, "events")
          .withColumn("m", from_json(col("props"), MapType(StringType, IntegerType)))
          .select(col("event_id"),
            element_at(col("m"), "k").as("k"),
            size(map_keys(col("m"))).as("n_keys"))
          .orderBy("event_id"),
      Some(
        "SELECT event_id, CAST(json_extract(props,'$.k') AS INTEGER) AS k, " +
          "CAST(len(json_keys(props)) AS INTEGER) AS n_keys FROM events ORDER BY 1")),

    // raw JSON path extraction (Q-JSON1)
    DeclaredQuery(
      "q_json1",
      (s, d) =>
        Tables.load(s, d, "events")
          .select(col("event_id"), get_json_object(col("props"), "$.k").as("k_str"))
          .orderBy("event_id"),
      Some(
        "SELECT event_id, json_extract_string(props,'$.k') AS k_str FROM events ORDER BY 1")),

    // flatten -> dotted columns -> unflatten round-trip (Q-FL1, ParquetDB
    // rebuild_nested_struct semantics)
    DeclaredQuery(
      "q_fl1",
      (s, d) => {
        val nested = Tables.load(s, d, "customer")
          .select(col("c_custkey"),
            struct(col("c_mktsegment").as("seg"),
              struct(col("c_acctbal").as("bal"), col("c_nationkey").as("nk")).as("acct")).as("info"))
        val roundTripped = SchemaOps.unflatten(SchemaOps.flatten(nested))
        roundTripped
          .select(col("c_custkey"), col("info.seg").as("seg"),
            r4(col("info.acct.bal")).as("bal"), col("info.acct.nk").as("nk"))
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, c_mktsegment AS seg, round(c_acctbal,4) AS bal, c_nationkey AS nk " +
          "FROM customer ORDER BY 1")))
}
