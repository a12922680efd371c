package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines:
  * exact (hash-groupBy), exact n-gram Jaccard, MinHash+LSH banding, SimHash.
  *
  * Scale design: every variant is a constant number of shuffles, each keyed
  * on something with bounded fan-in (token, band hash, signature), never a
  * full cross-join. The exact-Jaccard pair join is quadratic per token group
  * — it is the *oracle/verify* path; the LSH banding path is the one that
  * holds at 100 TB (candidates ∝ true near-dups, not n²).
  */
object Dedup {

  /** Exact dedup with a deterministic keeper: one row per key group with the
    * minimal id (dropDuplicates keeps an arbitrary row — not reproducible).
    */
  def exact(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** doc_id -> distinct shingle set, exploded (one row per (id, shingle)). */
  private def tokenSets(docs: DataFrame, idCol: String, textCol: String, shingleN: Int) = {
    val sh = if (shingleN <= 1) TextFunctions.distinctTokens(col(textCol))
    else array_distinct(TextFunctions.shingles(col(textCol), shingleN))
    docs.select(col(idCol).as("id"), explode(sh).as("tok"))
  }

  /** All pairs with exact Jaccard similarity >= threshold over word
    * (shingleN=1) or n-gram shingle sets. Pair generation joins on shared
    * token, so cost is sum over tokens of group² — fine for selective
    * shingles, the reason `minHashPairs` exists otherwise.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shingleN: Int = 1): DataFrame = {
    val toks = tokenSets(docs, idCol, textCol, shingleN)
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = toks.as("a")
      .join(toks.withColumnRenamed("id", "id2").as("b"), col("a.tok") === col("b.tok") && col("a.id") < col("id2"))
      .groupBy(col("a.id").as("d1"), col("id2").as("d2"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("id").as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jac", col("c").cast("double") / (col("sz1") + col("sz2") - col("c")))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("jac"))
  }

  /** Deterministic MinHash signature: sig[i] = min over shingles of
    * xxhash64(i, shingle). Seeded by the literal hash index — reproducible
    * across runs/clusters, no RNG.
    */
  def minHashSignature(docs: DataFrame, idCol: String, textCol: String,
                       numHashes: Int, shingleN: Int): DataFrame = {
    val toks = tokenSets(docs, idCol, textCol, shingleN)
    val mins = (0 until numHashes).map(i => min(xxhash64(lit(i), col("tok"))).as(s"h$i"))
    toks.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding near-dup pairs, verified with exact Jaccard.
    *
    * bands × rowsPerBand hashes; candidate pairs share at least one band
    * hash; candidates are then exactly verified (join back to shingle sets)
    * so the output has no false positives — only the (tiny, tunable)
    * LSH miss probability (1-s^r)^b at similarity s.
    */
  def minHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, numBands: Int = 16, rowsPerBand: Int = 2,
                   shingleN: Int = 1): DataFrame = {
    val numHashes = numBands * rowsPerBand
    val sig = minHashSignature(docs, idCol, textCol, numHashes, shingleN)
    // band hash = xxhash64(bandIdx, h_k..h_k+r) — one row per (id, band)
    val bandCols = (0 until numBands).map { b =>
      val hs = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(lit(b) +: hs: _*).as("bh"))
    }
    val banded = sig.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val candidates = banded.as("x")
      .join(banded.withColumnRenamed("id", "id2").as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") && col("x.id") < col("id2"))
      .select(col("x.id").as("d1"), col("id2").as("d2"))
      .distinct()
    // exact verification of candidates only
    val toks = tokenSets(docs, idCol, textCol, shingleN)
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("sz"))
    candidates
      .join(toks.select(col("id").as("d1"), col("tok")), "d1")
      .join(toks.select(col("id").as("rid"), col("tok").as("tok2")),
        col("d2") === col("rid") && col("tok") === col("tok2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("c"))
      .join(sizes.select(col("id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("id").as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jac", col("c").cast("double") / (col("sz1") + col("sz2") - col("c")))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("jac"))
  }

  /** 64-bit SimHash over the token set: bit b is the sign of the vote
    * sum over tokens of ±1 by bit b of xxhash64(token). Expression-only.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.distinctTokens(col(textCol))
    val sig = aggregate(
      transform(sequence(lit(0), lit(63)), b => {
        val vote = aggregate(toks, lit(0L),
          (acc, t) => acc + when(call_function("shiftright", xxhash64(t), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        when(vote >= 0, call_function("shiftleft", lit(1L), b.cast("int"))).otherwise(0L)
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
    docs.select(col(idCol).as("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: hamming distance <= maxDist. The pair join is
    * banded on the 4 16-bit chunks of the signature (a pair within distance
    * <= 3 must agree on at least one chunk), so it scales like LSH rather
    * than n².
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "chunk banding assumes maxDist <= 3 (4 chunks)")
    val sig = simHash(docs, idCol, textCol)
    val chunked = sig.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("ci"), shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL).as("cv"))): _*)).as("ch"))
      .select(col("id"), col("simhash"), col("ch.ci").as("ci"), col("ch.cv").as("cv"))
    chunked.as("x")
      .join(chunked.select(col("id").as("id2"), col("simhash").as("simhash2"),
        col("ci").as("ci2"), col("cv").as("cv2")).as("y"),
        col("ci") === col("ci2") && col("cv") === col("cv2") && col("x.id") < col("id2"))
      .select(col("x.id").as("d1"), col("id2").as("d2"),
        bit_count(col("simhash").bitwiseXOR(col("simhash2"))).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
