package graft.queries

import graft.Tables
import graft.operators.{Curation, Graph, Quantize, TextRank}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QHelpers._

/** Corpus/behavior analytics on top of the operator layer: lexical retrieval
  * (BM25/TF-IDF), graph authority (PageRank), conversion attribution, robust
  * anomaly detection, lexical diversity, fixed-size deterministic sampling,
  * and embedding quantization.
  *
  * Every query here except q_ext_quant1's grouping carries a full DuckDB
  * oracle — the scoring math is plain double arithmetic both engines
  * evaluate identically, with rounding applied BEFORE any order-by that
  * feeds a LIMIT so ranking ties resolve the same way everywhere.
  */
object AnalyticsQueries {

  /** Doubled CTE text for the BM25 oracle (terms are inlined). */
  private val bm25Terms = Seq("spark", "join", "hash")

  /** Shared BM25 scoring CTE chain (`toks…sc`) — used verbatim by the
    * q_ext_rank1 and q_ext_rank2 oracles so the two scoring texts can't
    * drift (the `cosineTopKSql` rationale, applied to the sparse arm).
    */
  private val bm25ScoreCtes: String = {
    val in = bm25Terms.map(t => s"'$t'").mkString(", ")
    "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), " +
      "t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), " +
      "dl AS (SELECT doc_id, count(*) AS dl FROM t2 GROUP BY 1), " +
      "st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl), " +
      s"tf AS (SELECT doc_id, tok, count(*) AS tf FROM t2 WHERE tok IN ($in) GROUP BY 1, 2), " +
      "df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1), " +
      "sc AS (SELECT tf.doc_id, " +
      "sum(ln((st.n - df.df + 0.5)/(df.df + 0.5) + 1.0) " +
      "* tf.tf*(1.2+1.0)/(tf.tf + 1.2*(1.0-0.75+0.75*dl.dl/st.avgdl))) AS score " +
      "FROM tf JOIN df ON tf.tok = df.tok JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st " +
      "GROUP BY 1)"
  }

  /** Trade-flow edge list shared by the graph queries: customer nation →
    * supplier nation, weight = lineitems shipped along the flow.
    */
  private def tradeFlowEdges(s: org.apache.spark.sql.SparkSession, d: String) = {
    val li = Tables.load(s, d, "lineitem")
    val o = Tables.load(s, d, "orders")
    val c = Tables.load(s, d, "customer")
    val su = Tables.load(s, d, "supplier")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .groupBy(c("c_nationkey").as("src"), su("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Doubled CTE text for the graph oracles (the same 4-table flow join). */
  private val tradeFlowEdgesSql =
    "SELECT c_nationkey AS src, s_nationkey AS dst, CAST(count(*) AS DOUBLE) AS w " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey JOIN supplier ON l_suppkey = s_suppkey " +
      "GROUP BY 1, 2"

  val all: Seq[DeclaredQuery] = Seq(

    // ---- sparse retrieval ------------------------------------------------
    DeclaredQuery(
      "q_ext_rank1",
      (s, d) =>
        TextRank.bm25(Tables.load(s, d, "documents"), "doc_id", "text",
          bm25Terms, topK = 10),
      Some(
        s"WITH $bm25ScoreCtes " +
          "SELECT doc_id, round(score, 4) AS score FROM sc " +
          "ORDER BY round(score, 4) DESC, doc_id LIMIT 10")),

    // hybrid retrieval: BM25 sparse top-10 + exact-cosine dense top-10
    // (query = embedding 0, doc_id ≡ vec_id on the shared id prefix) fused
    // by reciprocal-rank fusion — the standard two-tower + lexical combiner
    // a retrieval stack runs before reranking. Both arms are top-10 lists,
    // so every post-arm frame is output-sized; the 10-row global rank
    // window on the lexical arm is metadata-sized by construction. RRF is
    // a two-term double add (order-insensitive), rounded before the final
    // ordering so ranking ties resolve identically across engines.
    DeclaredQuery(
      "q_ext_rank2",
      (s, d) => {
        val lexTop = TextRank.bm25(Tables.load(s, d, "documents"), "doc_id", "text",
          bm25Terms, topK = 10)
        val lex = lexTop.select(col("doc_id"),
          row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).as("rank"))
        val emb = Tables.load(s, d, "embeddings")
        // dense arm ranks on round(cos, 4) with nid tie-break — the grid on
        // which the two engines' cosine kernels provably agree (the
        // q_ext_sim4 pattern); a last-ulp divergence on unrounded cos could
        // flip a dense rank and change the fused output
        val dense = graft.operators.Similarity.cosineTopKRounded(emb,
            emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 10)
          .select(col("nid").as("doc_id"), col("rn").as("rank"))
        TextRank.rrfFuse(Seq(lex, dense), "doc_id", "rank")
          .select(col("doc_id"), col("n_lists"), round(col("rrf_score"), 6).as("rrf"))
          .orderBy(col("rrf").desc, col("doc_id"))
      },
      Some(
        s"WITH $bm25ScoreCtes, " +
          "lexr AS (SELECT doc_id, row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS lrank FROM sc), " +
          "lex AS (SELECT doc_id, lrank FROM lexr WHERE lrank <= 10), " +
          "q AS (SELECT vec_id qid, embedding qv FROM embeddings WHERE vec_id = 0), " +
          "s AS (SELECT q.qid, e.vec_id nid, " +
          "(SELECT sum(CAST(q.qv[i] AS DOUBLE)*CAST(e.embedding[i] AS DOUBLE)) FROM (SELECT unnest(generate_series(1,64)) i)) dot, " +
          "(SELECT sum(CAST(q.qv[i] AS DOUBLE)*CAST(q.qv[i] AS DOUBLE)) FROM (SELECT unnest(generate_series(1,64)) i)) nq, " +
          "(SELECT sum(CAST(e.embedding[i] AS DOUBLE)*CAST(e.embedding[i] AS DOUBLE)) FROM (SELECT unnest(generate_series(1,64)) i)) ne " +
          "FROM embeddings e, q WHERE e.vec_id <> q.qid), " +
          "t AS (SELECT nid, row_number() OVER (ORDER BY round(dot/(sqrt(nq)*sqrt(ne)), 4) DESC, nid) rn FROM s), " +
          "dense AS (SELECT nid AS doc_id, rn AS drank FROM t WHERE rn <= 10), " +
          "f AS (SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id, lex.lrank, dense.drank " +
          "FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id) " +
          "SELECT doc_id, CAST((CASE WHEN lrank IS NOT NULL THEN 1 ELSE 0 END " +
          "+ CASE WHEN drank IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER) AS n_lists, " +
          "round(coalesce(CAST(1 AS DOUBLE)/(60 + lrank), 0) " +
          "+ coalesce(CAST(1 AS DOUBLE)/(60 + drank), 0), 6) AS rrf " +
          "FROM f ORDER BY rrf DESC, doc_id")),

    DeclaredQuery(
      "q_ext_tfidf1",
      (s, d) =>
        TextRank.tfIdfTopTerms(Tables.load(s, d, "documents"), "doc_id", "text", k = 3),
      Some(
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), " +
          "t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), " +
          "tf AS (SELECT doc_id, tok, count(*) AS tf FROM t2 GROUP BY 1, 2), " +
          "df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1), " +
          "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents), " +
          "sc AS (SELECT tf.doc_id, tf.tok, round(tf.tf * ln(n.n / df.df), 6) AS tfidf " +
          "FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n), " +
          "rk AS (SELECT doc_id, tok, " +
          "row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rank, tfidf " +
          "FROM sc) " +
          "SELECT doc_id, tok, CAST(rank AS INTEGER) AS rank, round(tfidf, 4) AS tfidf " +
          "FROM rk WHERE rank <= 3 ORDER BY doc_id, rank")),

    // ---- graph authority -------------------------------------------------
    // trade-flow graph: customer nation → supplier nation, edge weight =
    // number of lineitems shipped along that flow; 5 damped iterations.
    DeclaredQuery(
      "q_ext_graph1",
      (s, d) => {
        val edges = tradeFlowEdges(s, d)
        val pr = Graph.pageRank(edges, "src", "dst", "w", iterations = 5)
        pr.join(broadcast(Tables.load(s, d, "nation")),
            pr("node") === col("n_nationkey"))
          .select(col("node").cast("int").as("nationkey"), col("n_name"), col("rank"))
          .orderBy(col("rank").desc, col("nationkey"))
      },
      Some {
        val base =
          "WITH e AS (SELECT c_nationkey AS src, s_nationkey AS dst, CAST(count(*) AS DOUBLE) AS w " +
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
            "JOIN customer ON o_custkey = c_custkey JOIN supplier ON l_suppkey = s_suppkey " +
            "GROUP BY 1, 2), " +
            "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
            "st AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes), " +
            "ow AS (SELECT src, sum(w) AS outw FROM e GROUP BY 1), " +
            "p AS (SELECT e.src, e.dst, e.w/ow.outw AS p FROM e JOIN ow ON e.src = ow.src), " +
            "r0 AS (SELECT node, 1.0/(SELECT n FROM st) AS rank FROM nodes)"
        val iters = (1 to 5).map { i =>
          s"c$i AS (SELECT p.dst AS node, sum(r${i - 1}.rank * p.p) AS s " +
            s"FROM p JOIN r${i - 1} ON p.src = r${i - 1}.node GROUP BY 1), " +
            s"r$i AS (SELECT nodes.node, 0.15/(SELECT n FROM st) + 0.85*coalesce(c$i.s, 0) AS rank " +
            s"FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node)"
        }.mkString(", ")
        s"$base, $iters " +
          "SELECT CAST(r5.node AS INTEGER) AS nationkey, n.n_name, round(r5.rank, 6) AS rank " +
          "FROM r5 JOIN nation n ON r5.node = n.n_nationkey " +
          "ORDER BY round(r5.rank, 6) DESC, nationkey"
      }),

    // ---- graph structure: triangles + clustering ------------------------
    // canonical-ordered (a<b<c) triangle enumeration over the undirected
    // trade-flow graph — the degree-ordered two-join formulation, never an
    // open wedge blow-up; exact integer arithmetic end to end, global
    // clustering coefficient integer-scaled (·10⁶ DIV wedges) so the oracle
    // is libm-free.
    DeclaredQuery(
      "q_ext_graph2",
      (s, d) => {
        val e = tradeFlowEdges(s, d)
        val und = e.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
        val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        val wedges = deg.agg(sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("wedges"))
        val ab = und.select(col("a"), col("b"))
        val bc = und.select(col("a").as("b2"), col("b").as("c"))
        val ac = und.select(col("a").as("a3"), col("b").as("c3"))
        val tri = ab.join(bc, col("b") === col("b2"))
          .join(ac, col("a") === col("a3") && col("c") === col("c3"))
          .agg(count(lit(1)).as("n_triangles"))
        val nEdges = und.agg(count(lit(1)).as("n_edges"))
        tri.crossJoin(broadcast(nEdges)).crossJoin(broadcast(wedges))
          .select(col("n_triangles"), col("n_edges"), col("wedges"),
            expr("n_triangles * 3 * 1000000 DIV wedges").as("clustering_x1e6"))
      },
      // MATERIALIZED: without it DuckDB 1.0 inlines `und` (and transitively
      // the 4-way-join `e`) at each of its 6 references and picks a plan that
      // runs >200 s / spills >80 GB at the sf1 rehearsal scale; with it the
      // same query is 0.6 s. Semantics identical — DuckDB-only hint.
      Some(
        s"WITH e AS MATERIALIZED ($tradeFlowEdgesSql), " +
          "und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b " +
          "FROM e WHERE src <> dst), " +
          "deg AS (SELECT node, count(*) AS deg FROM " +
          "(SELECT a AS node FROM und UNION ALL SELECT b FROM und) GROUP BY 1), " +
          "w AS (SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS wedges FROM deg), " +
          "tri AS (SELECT count(*) AS n_triangles FROM und ab " +
          "JOIN und bc ON ab.b = bc.a JOIN und ac ON ac.a = ab.a AND ac.b = bc.b), " +
          "ne AS (SELECT count(*) AS n_edges FROM und) " +
          "SELECT n_triangles, n_edges, wedges, " +
          "n_triangles * 3 * 1000000 // wedges AS clustering_x1e6 " +
          "FROM tri CROSS JOIN ne CROSS JOIN w")),

    // ---- conversion attribution -----------------------------------------
    // last-touch / first-touch: for each purchase, the nearest and the
    // earliest preceding non-purchase event of the same user; attribute the
    // conversion (count + revenue) to the touch types.
    DeclaredQuery(
      "q_ext_attr1",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val touch = when(col("event_type") =!= "purchase", col("event_type"))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        ev.withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
          .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase" && col("last_touch").isNotNull)
          .groupBy("last_touch", "first_touch")
          .agg(count(lit(1)).as("n_conv"), round(sum(col("value")), 4).as("revenue"))
          .orderBy("last_touch", "first_touch")
      },
      Some(
        "WITH t AS (SELECT event_type, value, " +
          "last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS) " +
          "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch, " +
          "first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS) " +
          "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch " +
          "FROM events) " +
          "SELECT last_touch, first_touch, count(*) AS n_conv, round(sum(value), 4) AS revenue " +
          "FROM t WHERE event_type = 'purchase' AND last_touch IS NOT NULL " +
          "GROUP BY 1, 2 ORDER BY 1, 2")),

    // ---- linear multi-touch attribution ---------------------------------
    // each purchase splits one credit (and its revenue) across its preceding
    // touches PROPORTIONALLY to per-type counts — computed with one window
    // pass of 4 conditional running sums (the touch alphabet is fixed), so
    // no self-join and no history list: the 100 TB-shaped formulation.
    DeclaredQuery(
      "q_ext_attr2",
      (s, d) => {
        val types = Seq("click", "error", "signup", "view")
        val ev = Tables.load(s, d, "events")
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val counted = types.foldLeft(ev) { (df, t) =>
          df.withColumn(s"n_$t", sum(when(col("event_type") === t, 1L).otherwise(0L)).over(w))
        }
        val tot = types.map(t => col(s"n_$t")).reduce(_ + _)
        val stackArgs = types.map(t => s"'$t', n_$t").mkString(", ")
        counted.filter(col("event_type") === "purchase" && tot > 0)
          .withColumn("tot", tot.cast("double"))
          .select(col("value"), col("tot"),
            expr(s"stack(${types.size}, $stackArgs)").as(Seq("touch", "n_t")))
          .groupBy("touch")
          .agg(round(sum(col("n_t") / col("tot")), 4).as("credit"),
            round(sum(col("value") * col("n_t") / col("tot")), 4).as("revenue"))
          .orderBy("touch")
      },
      Some {
        val types = Seq("click", "error", "signup", "view")
        val sums = types.map(t =>
          s"sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) OVER w AS n_$t").mkString(", ")
        val tot = types.map(t => s"n_$t").mkString(" + ")
        val arms = types.map(t => s"SELECT '$t' AS touch, n_$t AS n_t, value, tot FROM p")
          .mkString(" UNION ALL ")
        s"WITH t AS (SELECT event_type, value, $sums FROM events " +
          "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
          s"p AS (SELECT *, CAST($tot AS DOUBLE) AS tot FROM t " +
          s"WHERE event_type = 'purchase' AND $tot > 0), " +
          s"u AS ($arms) " +
          "SELECT touch, round(sum(n_t / tot), 4) AS credit, " +
          "round(sum(value * n_t / tot), 4) AS revenue " +
          "FROM u GROUP BY 1 ORDER BY 1"
      }),

    // ---- cohort retention ------------------------------------------------
    // users cohorted by first-activity week; retention = distinct active
    // users at each week offset / cohort size. One window min + two
    // distinct-aggregations + a weeks-cardinality broadcast join — the
    // product-analytics staple, with integer week offsets (no date
    // arithmetic ambiguity cross-engine).
    DeclaredQuery(
      "q_ext_coh1",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val wu = Window.partitionBy("user_id")
        val co = ev
          .withColumn("cohort_week", date_trunc("week", min(col("ts")).over(wu)))
          .withColumn("offset_w",
            ((unix_timestamp(date_trunc("week", col("ts"))) -
              unix_timestamp(col("cohort_week"))) / 604800L).cast("int"))
        val sizes = co.groupBy("cohort_week")
          .agg(countDistinct(col("user_id")).as("cohort_n"))
        co.groupBy("cohort_week", "offset_w")
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(broadcast(sizes), "cohort_week")
          .select(col("cohort_week").cast("date").as("cohort_week"), col("offset_w"),
            col("n_active"), col("cohort_n"),
            round(col("n_active") / col("cohort_n").cast("double"), 4).as("retention"))
          .orderBy("cohort_week", "offset_w")
      },
      Some(
        "WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1), " +
          "c AS (SELECT e.user_id, date_trunc('week', f.first_ts) AS cohort_week, " +
          "CAST((epoch(date_trunc('week', e.ts)) - epoch(date_trunc('week', f.first_ts))) // 604800 AS INTEGER) AS offset_w " +
          "FROM events e JOIN f ON e.user_id = f.user_id), " +
          "sz AS (SELECT cohort_week, count(DISTINCT user_id) AS cohort_n FROM c GROUP BY 1), " +
          "act AS (SELECT cohort_week, offset_w, count(DISTINCT user_id) AS n_active FROM c GROUP BY 1, 2) " +
          "SELECT CAST(act.cohort_week AS DATE) AS cohort_week, offset_w, n_active, cohort_n, " +
          "round(n_active / CAST(cohort_n AS DOUBLE), 4) AS retention " +
          "FROM act JOIN sz ON act.cohort_week = sz.cohort_week ORDER BY 1, 2")),

    // ---- time-series resample + forward fill -----------------------------
    // per-user daily grid from first to last activity, value carried
    // forward over gap days (last observation per day wins, deterministic
    // by (ts, event_id)); rolled up to a per-day corpus curve: users on
    // grid, users carried (no observation that day), forward-filled total.
    // Scale: sequence explode is per-user-row (no shuffle), the fill is one
    // window pass keyed by user — state never exceeds a partition.
    DeclaredQuery(
      "q_ext_ts1",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val wDay = Window.partitionBy("user_id", "day")
          .orderBy(col("ts").desc, col("event_id").desc)
        val daily = ev.withColumn("day", to_date(col("ts")))
          .withColumn("rn", row_number().over(wDay))
          .filter(col("rn") === 1).select("user_id", "day", "value")
        val grid = ev.groupBy("user_id")
          .agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
          .select(col("user_id"),
            explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        val wFill = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)
        grid.join(daily, Seq("user_id", "day"), "left")
          .withColumn("value_ff", last(col("value"), ignoreNulls = true).over(wFill))
          .groupBy("day")
          .agg(count(lit(1)).as("n_users"),
            sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_carried"),
            round(sum(col("value_ff")), 4).as("total_ff"))
          .orderBy("day")
      },
      Some(
        "WITH daily0 AS (SELECT user_id, CAST(ts AS DATE) AS day, value, " +
          "row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn FROM events), " +
          "d1 AS (SELECT user_id, day, value FROM daily0 WHERE rn = 1), " +
          "span AS (SELECT user_id, CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS dmax FROM events GROUP BY 1), " +
          "grid AS (SELECT user_id, CAST(unnest(generate_series(d0, dmax, INTERVAL 1 DAY)) AS DATE) AS day FROM span), " +
          "j AS (SELECT g.user_id, g.day, d1.value FROM grid g LEFT JOIN d1 " +
          "ON g.user_id = d1.user_id AND g.day = d1.day), " +
          "f AS (SELECT user_id, day, value, last_value(value IGNORE NULLS) " +
          "OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff FROM j) " +
          "SELECT day, count(*) AS n_users, " +
          "CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_carried, " +
          "round(sum(value_ff), 4) AS total_ff FROM f GROUP BY 1 ORDER BY 1")),

    // ---- behavior transition matrix --------------------------------------
    // first-order Markov transitions between consecutive event types per
    // user: one lag window pass, one groupBy, per-source probabilities from
    // a window over the (|alphabet|²)-sized grouped frame.
    DeclaredQuery(
      "q_ext_evt5",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        ev.withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("curr"))
          .agg(count(lit(1)).as("n"))
          .withColumn("prob",
            round(col("n") / sum(col("n")).over(Window.partitionBy("prev")).cast("double"), 4))
          .orderBy("prev", "curr")
      },
      Some(
        "WITH t AS (SELECT user_id, event_type, " +
          "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events), " +
          "g AS (SELECT prev, event_type AS curr, count(*) AS n FROM t WHERE prev IS NOT NULL GROUP BY 1, 2) " +
          "SELECT prev, curr, n, round(n / CAST(sum(n) OVER (PARTITION BY prev) AS DOUBLE), 4) AS prob " +
          "FROM g ORDER BY 1, 2")),

    // ---- robust anomaly detection ---------------------------------------
    // per-type MAD z-score: |value − median| > 3 · 1.4826 · MAD. Median/MAD
    // are exact interpolated percentiles (identical semantics both engines);
    // two grouped passes + two broadcast joins (the grouped frames are
    // type-cardinality-sized — metadata, not data).
    DeclaredQuery(
      "q_ext_anom1",
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        val med = ev.groupBy("event_type")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val mad = ev.join(broadcast(med), "event_type")
          .groupBy("event_type")
          .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
        ev.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(abs(col("value") - col("med")) > lit(3.0 * 1.4826) * col("mad"), 1L)
              .otherwise(0L)).as("n_out"),
            r4(max(col("med"))).as("med"), r4(max(col("mad"))).as("mad"))
          .orderBy("event_type")
      },
      Some(
        "WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1), " +
          "mad AS (SELECT e.event_type, quantile_cont(abs(e.value - med.med), 0.5) AS mad " +
          "FROM events e JOIN med ON e.event_type = med.event_type GROUP BY 1) " +
          "SELECT e.event_type, count(*) AS n, " +
          "CAST(sum(CASE WHEN abs(e.value - med.med) > 3.0*1.4826*mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_out, " +
          "round(max(med.med), 4) AS med, round(max(mad.mad), 4) AS mad " +
          "FROM events e JOIN med ON e.event_type = med.event_type " +
          "JOIN mad ON e.event_type = mad.event_type GROUP BY 1 ORDER BY 1")),

    // ---- lexical diversity ----------------------------------------------
    // per-language type/token stats: token count, vocabulary size,
    // type-token ratio, hapax (frequency-1) share of the vocabulary.
    DeclaredQuery(
      "q_ext_txt6",
      (s, d) => {
        val toks = Tables.load(s, d, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val freq = toks.groupBy("lang", "tok").agg(count(lit(1)).as("f"))
        freq.groupBy("lang")
          .agg(sum(col("f")).as("n_tokens"),
            count(lit(1)).as("n_types"),
            round(count(lit(1)) / sum(col("f")).cast("double"), 6).as("ttr"),
            round(sum(when(col("f") === 1, 1).otherwise(0)) / count(lit(1)).cast("double"), 6)
              .as("hapax_ratio"))
          .orderBy("lang")
      },
      Some(
        "WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents), " +
          "t2 AS (SELECT lang, tok FROM toks WHERE tok <> ''), " +
          "freq AS (SELECT lang, tok, count(*) AS f FROM t2 GROUP BY 1, 2) " +
          "SELECT lang, CAST(sum(f) AS BIGINT) AS n_tokens, count(*) AS n_types, " +
          "round(count(*) / CAST(sum(f) AS DOUBLE), 6) AS ttr, " +
          "round(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio " +
          "FROM freq GROUP BY 1 ORDER BY 1")),

    // ---- unigram LM quality scoring -------------------------------------
    // corpus-likelihood cross-entropy per document, rolled up per language:
    // the "is this text in-distribution" score a pretraining pipeline ranks
    // and filters by before training.
    DeclaredQuery(
      "q_ext_txt7",
      (s, d) =>
        TextRank.unigramLogLoss(Tables.load(s, d, "documents"), "doc_id", "text",
            keep = Seq("lang"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            round(avg(col("log_loss")), 4).as("avg_loss"),
            round(min(col("log_loss")), 4).as("min_loss"),
            round(max(col("log_loss")), 4).as("max_loss"))
          .orderBy("lang"),
      Some(
        "WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents), " +
          "t2 AS (SELECT doc_id, lang, tok FROM toks WHERE tok <> ''), " +
          "tf AS (SELECT doc_id, lang, tok, count(*) AS tf FROM t2 GROUP BY 1, 2, 3), " +
          "vocab AS (SELECT tok, sum(tf) AS ctf FROM tf GROUP BY 1), " +
          "tot AS (SELECT CAST(sum(ctf) AS DOUBLE) AS t FROM vocab), " +
          "doc AS (SELECT tf.doc_id, tf.lang, " +
          "sum(-tf.tf * ln(vocab.ctf / tot.t)) / sum(tf.tf) AS log_loss " +
          "FROM tf JOIN vocab ON tf.tok = vocab.tok CROSS JOIN tot GROUP BY 1, 2) " +
          "SELECT lang, count(*) AS n_docs, round(avg(log_loss), 4) AS avg_loss, " +
          "round(min(log_loss), 4) AS min_loss, round(max(log_loss), 4) AS max_loss " +
          "FROM doc GROUP BY 1 ORDER BY 1")),

    // ---- weight-proportional deterministic sampling ----------------------
    // Efraimidis–Spirakis A-ES with an md5-derived uniform: length-weighted
    // top-50 sample, exact budget, reproducible by any md5-capable engine.
    DeclaredQuery(
      "q_samp4",
      (s, d) =>
        Curation.sampleWeighted(Tables.load(s, d, "documents"), "doc_id",
            length(col("text")).cast("double"), k = 50)
          .select(col("doc_id"), col("lang"), col("es_key"))
          .orderBy(col("es_key").desc, col("doc_id")),
      Some {
        def dv(k: Int) =
          s"(ascii(substr(md5(CAST(doc_id AS STRING)),$k,1)) - " +
            s"CASE WHEN ascii(substr(md5(CAST(doc_id AS STRING)),$k,1)) >= 97 THEN 87 ELSE 48 END)"
        val bucket = s"(${dv(1)}*4096 + ${dv(2)}*256 + ${dv(3)}*16 + ${dv(4)})"
        s"WITH sc AS (SELECT doc_id, lang, round(ln(($bucket + 0.5) / 65536.0) " +
          "/ CAST(length(text) AS DOUBLE), 6) AS es_key FROM documents) " +
          "SELECT doc_id, lang, es_key FROM sc ORDER BY es_key DESC, doc_id LIMIT 50"
      }),

    // ---- fixed-size deterministic sampling -------------------------------
    DeclaredQuery(
      "q_samp3",
      (s, d) =>
        Curation.sampleFixedPerStratum(
            Tables.load(s, d, "documents"), "doc_id", "lang", k = 5)
          .select(col("lang"), col("sample_rank"), col("doc_id"))
          .orderBy("lang", "sample_rank"),
      Some(
        "WITH rk AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang " +
          "ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS sample_rank FROM documents) " +
          "SELECT lang, CAST(sample_rank AS INTEGER) AS sample_rank, doc_id " +
          "FROM rk WHERE sample_rank <= 5 ORDER BY 1, 2")),

    // ---- A/B experiment analysis ----------------------------------------
    // users deterministically assigned to two arms by md5-bucket parity
    // (the engine-independent randomization a real experiment framework
    // uses), conversion = any high-value purchase (>450 — every user has
    // SOME purchase at this event density, so plain "any purchase" would
    // degenerate to rate 1 and zero variance); two-proportion z-score,
    // guarded for the all-or-none variance-0 edge. Every arithmetic step is
    // an IEEE basic op (+,−,×,÷,sqrt — all correctly rounded by both
    // engines), so the z-score is bit-identical cross-engine with NO
    // rounding guard needed; rounded to 6 for display.
    DeclaredQuery(
      "q_ext_ab1",
      (s, d) => {
        val users = Tables.load(s, d, "events")
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase" && col("value") > 450.0, 1L)
            .otherwise(0L)).as("conv"))
          .withColumn("arm", Curation.uniformBucket16(col("user_id")) % 2)
        val arms = users.groupBy("arm")
          .agg(count(lit(1)).as("n"), sum(col("conv")).as("n_conv"))
        val a = arms.filter(col("arm") === 0)
          .select(col("n").as("n_a"), col("n_conv").as("conv_a"))
        val b = arms.filter(col("arm") === 1)
          .select(col("n").as("n_b"), col("n_conv").as("conv_b"))
        val pa = col("conv_a") / col("n_a").cast("double")
        val pb = col("conv_b") / col("n_b").cast("double")
        val pp = (col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b")).cast("double")
        a.crossJoin(b).select(
          col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
          round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
          round(when(pp > 0.0 && pp < 1.0,
            (pa - pb) / sqrt(pp * (lit(1.0) - pp) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))), 6).as("z"))
      },
      Some {
        def dv(k: Int) =
          s"(ascii(substr(md5(CAST(user_id AS STRING)),$k,1)) - " +
            s"CASE WHEN ascii(substr(md5(CAST(user_id AS STRING)),$k,1)) >= 97 THEN 87 ELSE 48 END)"
        val bucket = s"(${dv(1)}*4096 + ${dv(2)}*256 + ${dv(3)}*16 + ${dv(4)})"
        s"WITH u AS (SELECT user_id, $bucket % 2 AS arm, " +
          "max(CASE WHEN event_type = 'purchase' AND value > 450.0 THEN 1 ELSE 0 END) AS conv " +
          "FROM events GROUP BY 1), " +
          "arms AS (SELECT arm, count(*) AS n, CAST(sum(conv) AS BIGINT) AS n_conv FROM u GROUP BY 1), " +
          "a AS (SELECT n AS n_a, n_conv AS conv_a FROM arms WHERE arm = 0), " +
          "b AS (SELECT n AS n_b, n_conv AS conv_b FROM arms WHERE arm = 1), " +
          "s AS (SELECT n_a, n_b, conv_a, conv_b, " +
          "(conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE) AS pp FROM a CROSS JOIN b) " +
          "SELECT n_a, n_b, conv_a, conv_b, " +
          "round(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a, " +
          "round(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b, " +
          "round(CASE WHEN pp > 0.0 AND pp < 1.0 THEN " +
          "(conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE)) / " +
          "sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)) END, 6) AS z " +
          "FROM s"
      }),

    // ---- column profiling -------------------------------------------------
    // the ANALYZE-style profile a pipeline records per ingest: per column,
    // null count, exact distinct count, lexical min/max — only types whose
    // string form is engine-stable (strings, integers, dates; doubles
    // deliberately excluded: Double.toString differs across engines).
    DeclaredQuery(
      "q_ext_prof1",
      (s, d) => {
        val o = Tables.load(s, d, "orders")
        def prof(name: String) =
          o.agg(count(lit(1)).as("n"),
            sum(when(col(name).isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col(name)).as("n_distinct"),
            min(col(name).cast("string")).as("min_s"),
            max(col(name).cast("string")).as("max_s"))
            .select(lit(name).as("col_name"), col("n"), col("n_null"),
              col("n_distinct"), col("min_s"), col("max_s"))
        Seq("o_custkey", "o_orderdate", "o_orderpriority", "o_orderstatus")
          .map(prof).reduce(_ union _).orderBy("col_name")
      },
      Some {
        def arm(name: String) =
          s"SELECT '$name' AS col_name, count(*) AS n, " +
            s"CAST(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, " +
            s"count(DISTINCT $name) AS n_distinct, " +
            s"min(CAST($name AS STRING)) AS min_s, max(CAST($name AS STRING)) AS max_s " +
            "FROM orders"
        Seq("o_custkey", "o_orderdate", "o_orderpriority", "o_orderstatus")
          .map(arm).mkString("", " UNION ALL ", " ORDER BY col_name")
      }),

    // ---- referential-integrity audit ------------------------------------
    // the data-quality gate a pipeline runs after every ingest: per FK edge,
    // child row count and orphan count (left-anti against the distinct
    // parent key). Each arm is one anti-join that Catalyst plans broadcast
    // for dim parents and shuffle for fact parents; lazy end to end.
    DeclaredQuery(
      "q_ext_dq1",
      (s, d) => {
        def audit(edge: String, child: org.apache.spark.sql.DataFrame, key: String,
            parent: org.apache.spark.sql.DataFrame, pk: String) = {
          val orphans = child.select(col(key).as("k"))
            .join(parent.select(col(pk).as("k")).distinct(), Seq("k"), "left_anti")
            .agg(count(lit(1)).as("n_orphans"))
          child.agg(count(lit(1)).as("n_rows")).crossJoin(orphans)
            .select(lit(edge).as("fk"), col("n_rows"), col("n_orphans"))
        }
        val li = Tables.load(s, d, "lineitem"); val o = Tables.load(s, d, "orders")
        val c = Tables.load(s, d, "customer"); val su = Tables.load(s, d, "supplier")
        val p = Tables.load(s, d, "part"); val n = Tables.load(s, d, "nation")
        val r = Tables.load(s, d, "region")
        Seq(
          audit("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
          audit("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
          audit("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"),
          audit("lineitem.l_suppkey->supplier", li, "l_suppkey", su, "s_suppkey"),
          audit("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey"),
          audit("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
          audit("supplier.s_nationkey->nation", su, "s_nationkey", n, "n_nationkey")
        ).reduce(_ union _).orderBy("fk")
      },
      Some {
        def arm(edge: String, child: String, key: String, parent: String, pk: String) =
          s"SELECT '$edge' AS fk, (SELECT count(*) FROM $child) AS n_rows, " +
            s"(SELECT count(*) FROM $child ch WHERE NOT EXISTS " +
            s"(SELECT 1 FROM $parent pa WHERE pa.$pk = ch.$key)) AS n_orphans"
        Seq(
          arm("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
          arm("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          arm("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
          arm("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          arm("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
          arm("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
          arm("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey")
        ).mkString("", " UNION ALL ", " ORDER BY fk")
      }),

    // ---- rank-based normalization ---------------------------------------
    // per-type value deciles (ntile over a deterministic (value, event_id)
    // order): the rank-normalization a feature pipeline applies before
    // mixing heterogeneous quality scores.
    DeclaredQuery(
      "q_ext_scale1",
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
        Tables.load(s, d, "events")
          .withColumn("decile", ntile(10).over(w))
          .groupBy("event_type", "decile")
          .agg(count(lit(1)).as("n"),
            round(min(col("value")), 4).as("lo"), round(max(col("value")), 4).as("hi"))
          .orderBy("event_type", "decile")
      },
      Some(
        "WITH t AS (SELECT event_type, value, " +
          "ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile FROM events) " +
          "SELECT event_type, CAST(decile AS INTEGER) AS decile, count(*) AS n, " +
          "round(min(value), 4) AS lo, round(max(value), 4) AS hi " +
          "FROM t GROUP BY 1, 2 ORDER BY 1, 2")),

    // ---- embedding quantization -----------------------------------------
    // int8 per-vector scalar quantization: reconstruction error per label
    // cohort, plus the theoretical half-step bound it must stay under
    // (span/(2·255)); a 4× index-size cut whose quality is quantified
    // in-plan, not assumed.
    DeclaredQuery(
      "q_ext_quant1",
      (s, d) => {
        val e = Quantize.reconstructionError(
          Tables.load(s, d, "embeddings"), "embedding", levels = 256)
        val v = transform(col("embedding"), x => x.cast("double"))
        e.withColumn("half_step", (array_max(v) - array_min(v)) / 510.0)
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            round(avg(col("mean_abs_err")), 6).as("avg_err"),
            round(max(col("mean_abs_err") - col("half_step")), 6).as("max_excess"))
          .orderBy("label")
      },
      Some(
        "WITH q AS (SELECT label, " +
          "list_sum(list_transform(embedding, x -> CASE WHEN list_max(embedding) = list_min(embedding) THEN 0.0 " +
          "ELSE abs(CAST(x AS DOUBLE) - (CAST(list_min(embedding) AS DOUBLE) + " +
          "round((CAST(x AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) / " +
          "(CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) * 255.0) / 255.0 * " +
          "(CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)))) END)) " +
          "/ len(embedding) AS mean_abs_err, " +
          "(CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) / 510.0 AS half_step " +
          "FROM embeddings) " +
          "SELECT label, count(*) AS n, round(avg(mean_abs_err), 6) AS avg_err, " +
          "round(max(mean_abs_err - half_step), 6) AS max_excess " +
          "FROM q GROUP BY 1 ORDER BY 1")),

    // product-quantization-shaped variant: 4 independent 16-element
    // subvectors at 16 levels (4-bit codes — the classic PQ budget), error
    // aggregated per label cohort; per-subspace dynamic range is what PQ
    // buys over one global grid, and this measures it with the same
    // codegen'd HOF machinery.
    DeclaredQuery(
      "q_ext_quant2",
      (s, d) =>
        Quantize.subvectorReconstructionError(
            Tables.load(s, d, "embeddings"), "embedding", m = 4, subLen = 16, levels = 16)
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            round(avg(col("pq_mean_abs_err")), 6).as("avg_err"),
            round(max(col("pq_mean_abs_err")), 6).as("max_err"))
          .orderBy("label"),
      Some {
        def sub(j: Int) = {
          val (a, b) = (j * 16 + 1, j * 16 + 16)
          val sl = s"embedding[$a:$b]"
          s"list_sum(list_transform($sl, x -> CASE WHEN list_max($sl) = list_min($sl) THEN 0.0 " +
            s"ELSE abs(CAST(x AS DOUBLE) - (CAST(list_min($sl) AS DOUBLE) + " +
            s"round((CAST(x AS DOUBLE) - CAST(list_min($sl) AS DOUBLE)) / " +
            s"(CAST(list_max($sl) AS DOUBLE) - CAST(list_min($sl) AS DOUBLE)) * 15.0) / 15.0 * " +
            s"(CAST(list_max($sl) AS DOUBLE) - CAST(list_min($sl) AS DOUBLE)))) END))"
        }
        val total = (0 until 4).map(sub).mkString(" + ")
        s"WITH q AS (SELECT label, ($total) / 64.0 AS pq_mean_abs_err FROM embeddings) " +
          "SELECT label, count(*) AS n, round(avg(pq_mean_abs_err), 6) AS avg_err, " +
          "round(max(pq_mean_abs_err), 6) AS max_err " +
          "FROM q GROUP BY 1 ORDER BY 1"
      })
  )
}
