package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame-level text-analysis operators (the Column-level building blocks
  * live in graft.functions.TextFunctions).
  */
object TextAnalysis {

  /** Top-k terms per document by TF-IDF.
    *
    * Uses an integer-scaled idf — `(N * 10000) DIV df` — instead of
    * `ln(N/df)`: same ranking behavior (monotone in N/df), but exact integer
    * arithmetic, so results are bit-identical across engines and runs (libm
    * `log` differs in the last ulp between implementations, which flips
    * ranks on near-ties). Score = tf · idf_scaled, ties broken by term.
    *
    * Dataflow: one shuffle for per-(doc,term) tf, one for per-term df, a
    * broadcast of the (small) df side? No — df join is keyed on term with
    * bounded fan-in, then a per-doc window top-k. All codegen.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // N as a broadcast 1-row aggregate, not a driver-side count() — the
    // operator stays fully lazy (no job at construction time)
    val nDf = docs.agg(count(lit(1)).as("n"))
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("tok"))
    tf.join(df, "tok")
      .crossJoin(broadcast(nDf))
      .withColumn("score", col("tf") * expr("(n * 10000) DIV df"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("id"), col("rn"), col("tok"), col("score"))
  }

  /** Per-document repetition signals for quality filtering (the
    * Gopher-report style "drop documents dominated by repeated content"
    * gate a pretraining pipeline applies before dedup): total words,
    * distinct words, duplicate-word fraction (1 − distinct/total) and
    * top-word dominance (most frequent word's share).
    *
    * Dataflow: one shuffle keyed (doc, word) for per-word counts, one keyed
    * doc for the roll-up — both map-side combinable, fan-in bounded by
    * per-doc vocabulary, so the operator is two cheap aggregations at any
    * corpus size. The ratios are exact integer divisions rounded at 4
    * decimals (cross-engine-stable; no libm involved).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perWord = docs
      .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("id", "word").agg(count(lit(1)).as("cnt"))
    perWord.groupBy("id").agg(
        sum(col("cnt")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"))
      .select(col("id"), col("n_words"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct") / col("n_words"), 4).as("dup_frac"),
        round(col("top_cnt") / col("n_words"), 4).as("top_frac"))
  }

  /** Train/eval n-gram decontamination — which training documents contain
    * any word n-gram that also appears in the (much smaller) eval/test set,
    * and how much of each document is contaminated. The GPT-3-style overlap
    * check, shaped for a 100 TB train side:
    *
    *  - the eval side collapses to its DISTINCT n-grams once (small by
    *    assumption — eval sets are thousands of docs, not billions);
    *  - the train side explodes to per-doc distinct n-grams (linear scan,
    *    no pairwise anything) and is BLOOM-PREFILTERED on the eval n-gram
    *    set before its shuffle ([[BloomJoin]]), so the join's exchange
    *    carries ~hits + fpp·N rows instead of every n-gram of the corpus;
    *  - the exact inner join then removes bloom false positives, and since
    *    the eval side is distinct, each surviving train n-gram matches
    *    exactly one row — per-pair fan-out cannot blow up.
    *
    * Output per contaminated train doc: n-gram hit count, the doc's total
    * distinct n-grams, the contamination share, and the alphabetically
    * first hit (deterministic evidence row). Clean docs are absent.
    */
  def ngramContamination(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3, expectedEvalNgrams: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val evalNgrams = eval
      .select(explode(TextFunctions.shingles(col(textCol), shingleN)).as("ev_tok"))
      .distinct()
    val trainTok = train.select(col(idCol),
      explode(array_distinct(TextFunctions.shingles(col(textCol), shingleN))).as("tok"))
    val perDoc = trainTok.groupBy(col(idCol)).agg(count(lit(1)).as("n_ngrams"))
    val hits = BloomJoin
      .reducedJoin(trainTok, evalNgrams, "tok", "ev_tok", expectedEvalNgrams, fpp,
        joinType = "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), min(col("tok")).as("first_hit"))
    hits.join(perDoc, idCol)
      .select(col(idCol), col("n_hits"), col("n_ngrams"),
        round(col("n_hits") / col("n_ngrams"), 4).as("contamination"),
        col("first_hit"))
  }

  /** Substring-level SELF-duplication coverage — the "duplicated training
    * data" measure of Lee et al. 2022 (Deduplicating Training Data Makes
    * Language Models Better), shaped for Spark: a token position is
    * duplicated if any word n-gram covering it occurs at least `minCount`
    * times in the whole corpus (same doc or another — catching both
    * self-repetition and cross-document boilerplate that document-level
    * dedup cannot see). Overlapping/adjacent duplicated n-gram spans merge
    * into maximal islands (the gaps-and-islands pass), and each document
    * reports its duplicated-token count, island count, and coverage
    * fraction — the per-doc signal a pipeline thresholds to drop or trim
    * boilerplate-heavy documents.
    *
    * Dataflow at 100 TB: positional n-grams are a codegen'd scan
    * (posexplode over [[TextFunctions.shingles]] — position i IS the
    * 1-based start token); the occurrence count shuffles keyed on the
    * n-gram string with fan-in bounded by true duplication; the semi-join
    * back is keyed the same way; island merging is one per-doc window
    * (running max of span end), never a self-join. No n², no driver state.
    * (A 100 TB run would key the count/join on xxhash64(ngram) to shrink
    * shuffle bytes; the string key keeps the operator engine-reproducible
    * for the oracle.)
    */
  def duplicatedNgramSpans(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minCount: Long = 2L): DataFrame = {
    val occ = OpUtils.spread(docs).select(col(idCol).as("id"),
        posexplode(TextFunctions.shingles(col(textCol), shingleN)))
      .select(col("id"), (col("pos") + 1).as("s"), col("col").as("ng"))
    val dup = occ.groupBy("ng").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
    // SALTED semi-join: a boilerplate n-gram can occur in ~every document,
    // and an unsalted semi-join would route all its occurrences to one
    // reducer. The duplicated-set side replicates over `salts` and the
    // occurrence side picks a deterministic salt, so the hottest key
    // spreads across `salts` partitions. (The count groupBy above is safe
    // unsalted — map-side partial aggregation collapses a hot n-gram to
    // one row per input partition before its shuffle.)
    val salts = 16
    val dupSalted = dup.select(col("ng"),
      explode(sequence(lit(0L), lit(salts - 1L))).as("__salt"))
    val spans = occ
      .withColumn("__salt", pmod(xxhash64(col("id")), lit(salts.toLong)))
      .join(dupSalted, Seq("ng", "__salt"), "left_semi")
      .select(col("id"), col("s"), (col("s") + (shingleN - 1)).as("e"))
    val w = Window.partitionBy("id").orderBy("s")
    val islands = spans
      .withColumn("maxe",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("maxe").isNull || col("s") > col("maxe") + 1, 1L).otherwise(0L))
      .withColumn("isl", sum(col("ni")).over(w))
      .groupBy(col("id"), col("isl"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    val perDoc = islands.groupBy("id")
      .agg(count(lit(1)).cast("int").as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"))
    docs.select(col(idCol).as("id"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("dl"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), col("dl"),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)) / col("dl"), 4).as("dup_frac"))
  }

  /** The corpus's most frequent word `n`-gram as a 1-row frame (`g`):
    * positional occurrences (NOT distinct-per-doc), count-desc with
    * lexicographic tie-break — deterministic across engines with exact
    * integer counts. Stays fully lazy; callers broadcast it, never
    * collect it.
    */
  def topPhrase(docs: DataFrame, textCol: String, n: Int = 3): DataFrame =
    docs.select(explode(TextFunctions.shingles(col(textCol), n)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("g"))
      .limit(1)
      .select(col("g"))

  /** Positional inverted-index PHRASE search: per-document occurrence
    * counts of an exact word sequence — the search-engine primitive over a
    * postings list (token, doc, position), not a substring scan.
    *
    * `phrase` is a 1-row frame with a space-separated phrase column `g`
    * (e.g. [[topPhrase]]'s output) so the whole query is one lazy plan —
    * no driver collect between phrase selection and search.
    *
    * Dataflow built for a 100 TB corpus:
    *  - the phrase explodes to its (offset, word) rows and BROADCASTS;
    *    the postings side (`posexplode` of the token array) joins against
    *    it map-side, so only postings of the phrase's words — a vanishing
    *    fraction of the corpus, bounded by those words' document
    *    frequency — ever reach a shuffle;
    *  - a matching posting at position p for offset o votes for candidate
    *    start p−o; a start with all `k` distinct offsets present is an
    *    occurrence (one aggregation keyed (doc, start), map-side
    *    combinable, correct even when the phrase repeats a word);
    *  - per-doc occurrence roll-up is the second (tiny) aggregation.
    *    A deployment would persist the postings table once and reuse it
    *    across queries; building it in-plan here keeps the operator
    *    self-contained.
    */
  def phraseOccurrences(docs: DataFrame, idCol: String, textCol: String,
                        phrase: DataFrame): DataFrame = {
    val words = broadcast(
      phrase.select(col("g"), posexplode(split(col("g"), " ")).as(Seq("off", "w")))
        .withColumn("k", size(split(col("g"), " "))))
    val postings = OpUtils.spread(docs).select(col(idCol).as("id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "tok")))
    postings.join(words, col("tok") === col("w"))
      .select(col("id"), col("g"), col("k"), (col("pos") - col("off")).as("start"), col("off"))
      .groupBy("id", "g", "k", "start")
      .agg(countDistinct(col("off")).as("hits"))
      .filter(col("hits") === col("k"))
      .groupBy(col("id"), col("g").as("phrase"))
      .agg(count(lit(1)).as("n_occ"))
  }
}
