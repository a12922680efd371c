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

  val all: Seq[DeclaredQuery] = Seq(

    // ---- sparse retrieval ------------------------------------------------
    DeclaredQuery(
      "q_ext_rank1",
      (s, d) =>
        TextRank.bm25(Tables.load(s, d, "documents"), "doc_id", "text",
          bm25Terms, topK = 10),
      Some {
        val in = bm25Terms.map(t => s"'$t'").mkString(", ")
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), " +
          "t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), " +
          "dl AS (SELECT doc_id, count(*) AS dl FROM t2 GROUP BY 1), " +
          "st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl), " +
          s"tf AS (SELECT doc_id, tok, count(*) AS tf FROM t2 WHERE tok IN ($in) GROUP BY 1, 2), " +
          "df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1), " +
          "sc AS (SELECT tf.doc_id, " +
          "sum(ln((st.n - df.df + 0.5)/(df.df + 0.5) + 1.0) " +
          "* tf.tf*(1.2+1.0)/(tf.tf + 1.2*(1.0-0.75+0.75*dl.dl/st.avgdl))) AS score " +
          "FROM tf JOIN df ON tf.tok = df.tok JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st " +
          "GROUP BY 1) " +
          "SELECT doc_id, round(score, 4) AS score FROM sc " +
          "ORDER BY round(score, 4) DESC, doc_id LIMIT 10"
      }),

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
        val li = Tables.load(s, d, "lineitem")
        val o = Tables.load(s, d, "orders")
        val c = Tables.load(s, d, "customer")
        val su = Tables.load(s, d, "supplier")
        val edges = li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
          .groupBy(c("c_nationkey").as("src"), su("s_nationkey").as("dst"))
          .agg(count(lit(1)).as("w"))
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
          "FROM q GROUP BY 1 ORDER BY 1"))
  )
}
