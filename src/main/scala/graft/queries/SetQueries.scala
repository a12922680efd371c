package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import QHelpers._

/** Sort/limit and set operations (SURVEY.md §2.3 Q-SORT1, Q-SET1, Q-SET2). */
object SetQueries {

  val all: Seq[DeclaredQuery] = Seq(
    // Multi-key sort with explicit null ordering + LIMIT (TakeOrderedAndProject)
    DeclaredQuery(
      "q_sort1",
      (s, d) =>
        Tables.load(s, d, "customer")
          .select(col("c_custkey"),
            nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
            r4(col("c_acctbal")).as("bal"))
          .orderBy(col("seg").asc_nulls_first, col("bal").desc, col("c_custkey").asc)
          .limit(100),
      Some(
        "SELECT c_custkey, nullif(c_mktsegment,'BUILDING') AS seg, round(c_acctbal,4) AS bal " +
          "FROM customer ORDER BY seg ASC NULLS FIRST, bal DESC, c_custkey ASC LIMIT 100")),

    DeclaredQuery(
      "q_set1",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .unionAll(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING' " +
          "UNION ALL SELECT c_custkey FROM customer WHERE c_acctbal > 5000 ORDER BY 1")),

    DeclaredQuery(
      "q_set2",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .union(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
          .distinct()
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING' " +
          "UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000 ORDER BY 1")),

    DeclaredQuery(
      "q_set3",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .intersect(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING' " +
          "INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000 ORDER BY 1")),

    DeclaredQuery(
      "q_set4",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .except(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING' " +
          "EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 5000 ORDER BY 1")))
}
