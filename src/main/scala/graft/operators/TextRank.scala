package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval scoring over a document corpus: BM25 ranking for a
  * fixed term set and per-document TF-IDF top terms.
  *
  * Complements the vector-similarity family (`Similarity`): a real corpus
  * pipeline needs BOTH dense (embedding) and sparse (lexical) retrieval, and
  * BM25 is the standard sparse baseline.
  *
  * Scale design: everything stays in-plan — corpus statistics (N, avgdl) are
  * a 1-row aggregate crossJoined (auto-broadcast) rather than collected to
  * the driver; document frequencies are a terms-sized frame (broadcast);
  * the only data-sized shuffles are the two per-document groupBys. Token
  * explosion is a flatMap (no shuffle). At 100 TB the per-doc length table
  * and term-frequency table partition by doc id and never concentrate.
  */
object TextRank {

  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")

  /** BM25 top-k documents for `terms`.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene non-negative
    * variant). N and avgdl are computed over documents with ≥1 token.
    *
    * Output: (idCol, score DOUBLE rounded to 4) — ordered by the rounded
    * score descending then id, so ranking is deterministic across engines.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(terms.nonEmpty, "TextRank.bm25: terms must be non-empty")
    val toks = tokens(docs, idCol, textCol)
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("tok").isin(terms: _*))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(countDistinct(col(idCol)).as("df"))
    val idf: Column = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val norm: Column = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(df), "tok")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .groupBy(idCol)
      .agg(round(sum(idf * col("tf") * (k1 + 1.0) / norm), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Reciprocal-rank fusion of several rankings of the same id space — the
    * standard hybrid-retrieval combiner (sparse BM25 + dense ANN lists into
    * one ranking): score(id) = Σ_lists 1/(kRRF + rank(id)), absent ids
    * simply contribute nothing from that list.
    *
    * Each input is (idCol, rankCol) with rank 1-based. Scale: one union +
    * one groupBy keyed on id — the inputs are top-k lists (k·queries-sized),
    * so the fusion shuffle is output-sized, never corpus-sized; with
    * hundreds of lists the same plan holds (map-side partial sums).
    * Output: (idCol, n_lists, rrf_score) — rank it and cut to the fused
    * top-k downstream. Determinism: with two lists the score is a
    * two-term double add (order-insensitive); for many lists round before
    * ranking.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              kRRF: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "TextRank.rrfFuse: need at least one ranking")
    rankings
      .map(_.select(col(idCol), col(rankCol).cast("long").as("__rank")))
      .reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(count(lit(1)).cast("int").as("n_lists"),
        sum(lit(1.0) / (lit(kRRF.toDouble) + col("__rank"))).as("rrf_score"))
  }

  /** Per-document unigram language-model log-loss (cross-entropy in nats)
    * — the corpus-likelihood quality score a pretraining pipeline ranks
    * documents by (low = in-distribution text, high = noise/outliers):
    *
    *   p(tok) = corpus tf(tok) / total tokens
    *   loss(doc) = Σ_tok −tf(doc,tok) · ln p(tok)  /  dl(doc)
    *
    * `keep` columns (functionally dependent on the id, e.g. a language
    * label) ride through the grouping so no re-join is needed. Scale: the
    * vocabulary joins back keyed on token — a vocab-sized shuffle with
    * bounded fan-in, deliberately NOT a broadcast (a 100 TB corpus
    * vocabulary isn't driver-sized); the total token count enters as a
    * broadcast 1-row aggregate. Output: (idCol, keep…, dl, log_loss).
    */
  def unigramLogLoss(docs: DataFrame, idCol: String, textCol: String,
      keep: Seq[String] = Nil): DataFrame = {
    val keyCols = (idCol +: keep).map(col)
    val toks = docs.select(keyCols :+ explode(split(col(textCol), " ")).as("tok"): _*)
      .filter(col("tok") =!= "")
    val tf = toks.groupBy(keyCols :+ col("tok"): _*).agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy("tok").agg(sum(col("tf")).as("ctf"))
    val total = vocab.agg(sum(col("ctf")).cast("double").as("t"))
    tf.join(vocab, "tok").crossJoin(broadcast(total))
      .groupBy(keyCols: _*)
      .agg(sum(col("tf")).as("dl"),
        (sum(-col("tf") * log(col("ctf") / col("t"))) / sum(col("tf"))).as("log_loss"))
  }

  /** Top-`k` TF-IDF terms per document: tfidf = tf · ln(N/df), ties broken
    * by term text ascending. Output (idCol, tok, rank INT, tfidf rounded 4).
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(docs, idCol, textCol)
    val tf = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(countDistinct(col(idCol)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val scored = tf.join(broadcast(df), "tok").crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n") / col("df")), 6))
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("tok"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("tok"), col("rank"),
        round(col("tfidf"), 4).as("tfidf"))
      .orderBy(col(idCol), col("rank"))
  }
}
