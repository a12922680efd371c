package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QHelpers._

/** Window functions (SURVEY.md §2.3 Q-WIN1..Q-WIN4, Q-TOPK1).
  *
  * Every window orders by a unique key suffix (…, o_orderkey) so rank/ntile
  * assignments are deterministic across engines. Windows partition by a key
  * (customer) so the sort is per-partition — scales; the one global window
  * (q_win4 ntile over all customers) is inherently single-partition and is
  * only sane because `customer` is a dimension table.
  */
object WindowQueries {

  private val wCust = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))

  val all: Seq[DeclaredQuery] = Seq(
    DeclaredQuery(
      "q_win1",
      (s, d) =>
        Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            row_number().over(wCust).as("rn"),
            rank().over(wCust).as("rk"),
            dense_rank().over(wCust).as("dr"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, o_custkey, " +
          "CAST(row_number() OVER w AS INTEGER) AS rn, CAST(rank() OVER w AS INTEGER) AS rk, " +
          "CAST(dense_rank() OVER w AS INTEGER) AS dr FROM orders " +
          "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) ORDER BY o_orderkey")),

    DeclaredQuery(
      "q_win2",
      (s, d) =>
        Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            r4(lag(col("o_totalprice"), 1).over(wCust)).as("prev_price"),
            r4(lead(col("o_totalprice"), 1).over(wCust)).as("next_price"),
            r4(first(col("o_totalprice")).over(wCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))).as("first_price"),
            r4(last(col("o_totalprice")).over(wCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))).as("last_price"))
          .orderBy("o_orderkey"),
      Some(
        // two WINDOW clauses: lag/lead take the frameless one — a frame on
        // lag is a DuckDB-tolerated no-op that Spark's parser rejects, and
        // the oracle text should run on both engines
        "SELECT o_orderkey, o_custkey, round(lag(o_totalprice,1) OVER wo,4) AS prev_price, " +
          "round(lead(o_totalprice,1) OVER wo,4) AS next_price, " +
          "round(first_value(o_totalprice) OVER wf,4) AS first_price, " +
          "round(last_value(o_totalprice) OVER wf,4) AS last_price FROM orders " +
          "WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), " +
          "wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) ORDER BY o_orderkey")),

    DeclaredQuery(
      "q_win3",
      (s, d) =>
        Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            r4(sum(col("o_totalprice")).over(wCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))).as("running_total"),
            r4(avg(col("o_totalprice")).over(wCust.rowsBetween(-2, 0))).as("sliding_avg"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, o_custkey, " +
          "round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS running_total, " +
          "round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),4) AS sliding_avg FROM orders ORDER BY o_orderkey")),

    // global quartiles WITHOUT the single-partition global window: the
    // two-pass offset scheme (GlobalRank) range-partitions on the order
    // key, ranks within partitions, and broadcast-joins the per-partition
    // offsets — only one metadata row per partition ever converges to one
    // task. Same relation as `ntile(4) OVER (ORDER BY ...)`, proven by the
    // unchanged oracle; this was the inventory's one single-partition
    // point (VERDICT r7) and is now scale-shaped.
    DeclaredQuery(
      "q_win4",
      (s, d) =>
        graft.operators.GlobalRank.globalNtile(
            Tables.load(s, d, "customer"),
            Seq(col("c_acctbal"), col("c_custkey")), k = 4, out = "quartile")
          .select(col("c_custkey"), col("quartile"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile " +
          "FROM customer ORDER BY c_custkey")),

    DeclaredQuery(
      "q_topk1",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.load(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), r4(col("o_totalprice")).as("price"))
          .orderBy("o_custkey", "rn")
      },
      Some(
        "SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, round(o_totalprice,4) AS price FROM " +
          "(SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER " +
          "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn FROM orders) t " +
          "WHERE rn <= 3 ORDER BY o_custkey, rn")))
}
