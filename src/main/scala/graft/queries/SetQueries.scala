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

    // union by NAME with missing columns null-filled (schema-evolution-
    // friendly union; positional union would silently mis-align)
    DeclaredQuery(
      "q_set5",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val a = c.filter(col("c_custkey") <= 100).select(col("c_custkey"), col("c_acctbal").as("bal"))
        val b = c.filter(col("c_custkey") > 1400).select(col("c_custkey"), col("c_mktsegment").as("seg"))
        a.unionByName(b, allowMissingColumns = true)
          .select(col("c_custkey"), r4(col("bal")).as("bal"), col("seg"))
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, round(bal,4) AS bal, seg FROM (" +
          "SELECT c_custkey, c_acctbal AS bal FROM customer WHERE c_custkey <= 100 " +
          "UNION ALL BY NAME " +
          "SELECT c_custkey, c_mktsegment AS seg FROM customer WHERE c_custkey > 1400) " +
          "ORDER BY c_custkey")),

    // multiset semantics, AGGREGATION formulation: EXCEPT ALL keeps
    // max(cnt_a - cnt_b, 0) copies per key and INTERSECT ALL
    // min(cnt_a, cnt_b) — both multiplicities fall out of ONE groupBy over
    // the input (one shuffle), where the literal exceptAll/intersectAll
    // operators plan two aggregate+generate subtrees plus a join (4+
    // shuffles over the fact table). This is the shape the engine prefers
    // at fact scale; the LITERAL operators are declared + oracle-checked
    // on a dimension-sized input by q_set7 below, and the two forms'
    // equivalence is asserted in SetOpSpec.
    DeclaredQuery(
      "q_set6",
      (s, d) => {
        // multiplicities differ: `all` has one row per lineitem, `first`
        // one per order — EXCEPT ALL keeps (cnt-1) copies, INTERSECT ALL 1
        Tables.load(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("cnt_all"),
            count(when(col("l_linenumber") === 1, 1)).as("cnt_first"))
          .select(col("l_orderkey"),
            greatest(col("cnt_all") - col("cnt_first"), lit(0L)).as("n_exc"),
            least(col("cnt_all"), col("cnt_first")).as("n_int"))
          .filter(col("n_exc") >= 1)
          .orderBy("l_orderkey")
      },
      Some(
        "WITH alll AS (SELECT l_orderkey FROM lineitem), " +
          "firstl AS (SELECT l_orderkey FROM lineitem WHERE l_linenumber = 1), " +
          "exc AS (SELECT l_orderkey, count(*) n_exc FROM (SELECT * FROM alll EXCEPT ALL SELECT * FROM firstl) GROUP BY 1), " +
          "inte AS (SELECT l_orderkey, count(*) n_int FROM (SELECT * FROM alll INTERSECT ALL SELECT * FROM firstl) GROUP BY 1) " +
          "SELECT e.l_orderkey, e.n_exc, coalesce(i.n_int, 0) AS n_int " +
          "FROM exc e LEFT JOIN inte i ON e.l_orderkey = i.l_orderkey ORDER BY 1")),

    // the LITERAL exceptAll/intersectAll operators (multiset Dataset API),
    // oracle-checked — declared on the customer dimension where their
    // multi-shuffle plan is the natural choice (see q_set6's note for the
    // fact-scale alternative)
    DeclaredQuery(
      "q_set7",
      (s, d) => {
        val c = Tables.load(s, d, "customer")
        val a = c.select(col("c_mktsegment").as("seg"))
        val b = c.filter(col("c_acctbal") > 5000).select(col("c_mktsegment").as("seg"))
        val exc = a.exceptAll(b).groupBy("seg").agg(count(lit(1)).as("n_exc"))
        val inte = a.intersectAll(b).groupBy("seg").agg(count(lit(1)).as("n_int"))
        exc.join(inte, Seq("seg"), "left")
          .select(col("seg"), col("n_exc"), coalesce(col("n_int"), lit(0L)).as("n_int"))
          .orderBy("seg")
      },
      Some(
        "WITH a AS (SELECT c_mktsegment AS seg FROM customer), " +
          "b AS (SELECT c_mktsegment AS seg FROM customer WHERE c_acctbal > 5000), " +
          "exc AS (SELECT seg, count(*) n_exc FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1), " +
          "inte AS (SELECT seg, count(*) n_int FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1) " +
          "SELECT e.seg, e.n_exc, coalesce(i.n_int, 0) AS n_int " +
          "FROM exc e LEFT JOIN inte i ON e.seg = i.seg ORDER BY 1")),

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
