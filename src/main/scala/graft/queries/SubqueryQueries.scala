package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery / lateral-join coverage, run through `spark.sql` over temp views
  * — exercises the engine's SQL-parser entry point (scalar, IN, EXISTS,
  * correlated subqueries, LATERAL) with the same text DuckDB executes, so
  * the oracle compares parser+optimizer semantics end to end.
  */
object SubqueryQueries {

  private def sql(tables: Seq[String], text: String): (SparkSession, String) => DataFrame =
    (s, d) => {
      tables.foreach(t => Tables.load(s, d, t).createOrReplaceTempView(t))
      s.sql(text)
    }

  val all: Seq[DeclaredQuery] = Seq(
    // scalar subquery in WHERE
    DeclaredQuery(
      "q_sub1",
      sql(Seq("part"),
        "SELECT p_partkey, round(p_retailprice,4) AS price FROM part " +
          "WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part) ORDER BY p_partkey"),
      Some(
        "SELECT p_partkey, round(p_retailprice,4) AS price FROM part " +
          "WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part) ORDER BY p_partkey")),

    // IN subquery
    DeclaredQuery(
      "q_sub2",
      sql(Seq("customer", "orders"),
        "SELECT c_custkey, c_name FROM customer " +
          "WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') " +
          "ORDER BY c_custkey"),
      Some(
        "SELECT c_custkey, c_name FROM customer " +
          "WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') " +
          "ORDER BY c_custkey")),

    // correlated NOT EXISTS
    DeclaredQuery(
      "q_sub3",
      sql(Seq("customer", "orders"),
        "SELECT c_custkey FROM customer c " +
          "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
          "AND o.o_totalprice > 400000) ORDER BY c_custkey"),
      Some(
        "SELECT c_custkey FROM customer c " +
          "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
          "AND o.o_totalprice > 400000) ORDER BY c_custkey")),

    // correlated scalar subquery in SELECT (max, not avg: cent-precision
    // doubles subtract exactly, so no cross-engine float-summation ties)
    DeclaredQuery(
      "q_sub4",
      sql(Seq("orders"),
        "SELECT o_orderkey, round(o_totalprice - (SELECT max(o2.o_totalprice) FROM orders o2 " +
          "WHERE o2.o_custkey = o.o_custkey),4) AS diff_from_cust_max " +
          "FROM orders o ORDER BY o_orderkey"),
      Some(
        "SELECT o_orderkey, round(o_totalprice - (SELECT max(o2.o_totalprice) FROM orders o2 " +
          "WHERE o2.o_custkey = o.o_custkey),4) AS diff_from_cust_max " +
          "FROM orders o ORDER BY o_orderkey")),

    // RECURSIVE CTE (Spark 4 WITH RECURSIVE — same text on both engines):
    // transitive closure over a halving-derived hierarchy, each node
    // reached exactly once via its unique parent; depth < 15 covers keys
    // to ~229k, far beyond every test scale. The iterative-join execution
    // is the standard recursive-CTE shape (one shuffle join per level,
    // level count = hierarchy depth, not data size).
    DeclaredQuery(
      "q_sub5",
      sql(Seq("customer"),
        "WITH RECURSIVE anc AS (" +
          "SELECT c_custkey AS node, c_custkey AS root, 0 AS depth FROM customer WHERE c_custkey BETWEEN 1 AND 7 " +
          "UNION ALL " +
          "SELECT c.c_custkey, a.root, a.depth + 1 " +
          "FROM customer c JOIN anc a ON CAST(FLOOR(c.c_custkey / 2.0) AS BIGINT) = a.node " +
          "WHERE a.depth < 15 AND c.c_custkey >= 8) " +
          "SELECT node, root, CAST(depth AS INTEGER) AS depth FROM anc ORDER BY node"),
      Some(
        "WITH RECURSIVE anc AS (" +
          "SELECT c_custkey AS node, c_custkey AS root, 0 AS depth FROM customer WHERE c_custkey BETWEEN 1 AND 7 " +
          "UNION ALL " +
          "SELECT c.c_custkey, a.root, a.depth + 1 " +
          "FROM customer c JOIN anc a ON CAST(FLOOR(c.c_custkey / 2.0) AS BIGINT) = a.node " +
          "WHERE a.depth < 15 AND c.c_custkey >= 8) " +
          "SELECT node, root, CAST(depth AS INTEGER) AS depth FROM anc ORDER BY node")),

    // lateral join: top-2 orders per customer by price
    DeclaredQuery(
      "q_lat1",
      sql(Seq("customer", "orders"),
        "SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice,4) AS price " +
          "FROM customer c JOIN LATERAL (" +
          "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey = c.c_custkey " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o " +
          "ORDER BY c_custkey, o_orderkey"),
      Some(
        "SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice,4) AS price " +
          "FROM customer c JOIN LATERAL (" +
          "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey = c.c_custkey " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o ON true " +
          "ORDER BY c_custkey, o_orderkey")))
}
