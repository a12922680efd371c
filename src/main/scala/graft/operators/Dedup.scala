package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), exact n-gram Jaccard (self- and cross-corpus),
  * MinHash+LSH banding, SimHash, connected components.
  *
  * Scale design: every variant is a constant number of shuffles, each keyed
  * on something with bounded fan-in, never a full cross-join. The
  * exact-Jaccard pair join is bounded by the shingle document-frequency cap
  * (worst case cap² candidates per shingle, with an exact hot-shingle
  * correction term — see [[jaccardPairs]]); the LSH banding path
  * additionally bounds candidates ∝ true near-dups and is the preferred
  * shape at 100 TB.
  */
object Dedup {

  private def spread(df: DataFrame): DataFrame = OpUtils.spread(df)

  /** Exact dedup with a deterministic keeper: one row per key group with the
    * minimal id (dropDuplicates keeps an arbitrary row — not reproducible).
    */
  def exact(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** doc_id -> distinct shingle set as an array column. */
  private def tokenArrays(docs: DataFrame, idCol: String, textCol: String, shingleN: Int) = {
    val sh = if (shingleN <= 1) TextFunctions.distinctTokens(col(textCol))
    else array_distinct(TextFunctions.shingles(col(textCol), shingleN))
    spread(docs).select(col(idCol).as("id"), sh.as("toks"))
  }

  /** doc_id -> distinct shingle set, exploded (one row per (id, shingle)). */
  private def tokenSets(docs: DataFrame, idCol: String, textCol: String, shingleN: Int) =
    tokenArrays(docs, idCol, textCol, shingleN)
      .select(col("id"), explode(col("toks")).as("tok"))

  /** Exact Jaccard verification of candidate (d1, d2) pairs: re-shingle
    * ONLY the documents that appear in a candidate pair (semi-join first,
    * so the shingle pipeline never runs over the rest of the corpus), then
    * intersect per pair. Candidates are few by construction (LSH banding
    * bounds them ∝ true near-dups), so this touches a vanishing fraction of
    * the corpus. Used by `minHashPairs`; `jaccardPairs` reaches the same
    * exact values through its hot-shingle correction term instead.
    */
  /** Public form of the candidate confirm pass: exact word-`shingleN`-gram
    * Jaccard over the given (d1, d2) candidate pairs, keeping pairs at or
    * above `threshold`. Candidate-bounded — the cost driver is the pair
    * list, not the corpus — which is what makes externally-generated
    * candidates (e.g. [[graft.streaming.DocStreams.nearDupCandidateStream]]'s
    * online LSH discovery) exact after the fact.
    */
  def exactJaccardForPairs(candidates: DataFrame, docs: DataFrame,
                           idCol: String, textCol: String, shingleN: Int,
                           threshold: Double): DataFrame =
    verifyPairsExact(candidates, docs, idCol, textCol, shingleN, threshold)

  private def verifyPairsExact(candidates: DataFrame, docs: DataFrame,
                               idCol: String, textCol: String, shingleN: Int,
                               threshold: Double): DataFrame = {
    // candidates are small by construction (banding/cap bounds them) and
    // referenced twice below — materialize once so the generator pipeline
    // (e.g. the full MinHash signature computation) doesn't run per
    // reference
    val cand = candidates.localCheckpoint()
    val needed = cand.select(col("d1").as("needed_id"))
      .union(cand.select(col("d2")))
      .distinct()
    val arrays = tokenArrays(
      docs.join(needed, col(idCol) === col("needed_id"), "left_semi"),
      idCol, textCol, shingleN)
    cand
      .join(arrays.select(col("id").as("d1"), col("toks").as("t1")), "d1")
      .join(arrays.select(col("id").as("d2"), col("toks").as("t2")), "d2")
      .withColumn("c", size(array_intersect(col("t1"), col("t2"))).cast("long"))
      .withColumn("jac", col("c").cast("double") / (size(col("t1")) + size(col("t2")) - col("c")))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("jac"))
  }

  /** All pairs with exact Jaccard similarity >= threshold over word
    * (shingleN=1) or n-gram shingle sets.
    *
    * Pair generation joins only on shingles with document frequency
    * <= maxShingleDf, which bounds the self-join fan-in — worst-case
    * candidates per shingle is maxShingleDf², never n² — so one hot shingle
    * shared by 10⁶ documents generates nothing instead of 10¹² pairs. The
    * emitted jac values are still EXACT: the shared-hot-shingle count a
    * capped join misses is added back from per-doc hot-shingle sets (each
    * at most |hot shingles| long — tiny by construction, since the number
    * of distinct hot shingles is bounded by corpus_shingle_instances/cap).
    * A pair whose shared shingles are ALL hotter than the cap never forms
    * a candidate in the capped join — and mass duplication (a document
    * templated more than cap times, exactly what near-dedup targets at
    * 100 TB) makes EVERY shingle of the duplicates hot, so such jac=1.0
    * pairs are real. They are recovered by a second candidate route:
    * MinHash banding over the "hot-heavy" documents. If jac(A,B) >=
    * threshold and every shared shingle is hot, then (since
    * |A∩B| >= threshold·|A| and A's rare shingles all lie outside A∩B)
    * BOTH endpoints have rare-shingle fraction <= 1-threshold — so banding
    * the docs satisfying that test covers every structurally-missed pair.
    * The only remaining misses are the banding family's probabilistic ones
    * ((1-s^r)^b ≈ 3e-4 at s=0.8 with 8 bands × 2 rows), and banding cost
    * is ∝ hot-heavy docs, whose true pairs are output anyway. Emitted jac
    * values stay EXACT for every pair from either route (rare-shared count
    * from the capped join + hot-shared from the per-doc hot sets).
    *
    * Construction is EAGER: the shingle pass is `localCheckpoint()`ed (see
    * the body), so building the returned DataFrame already runs the full
    * tokenize+hash job and the checkpointed blocks are not recomputable on
    * executor loss — the same materialize-once/rerun-the-operator tradeoff
    * the persisted-store operators document. Callers that only want the
    * lazy plan shape (none in this repo) should not build it speculatively.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shingleN: Int = 1,
                   maxShingleDf: Int = 10000): DataFrame = {
    // 64-bit shingle hash, not the shingle string: the shuffle moves 8-byte
    // keys and the join compares longs. A cross-doc collision (P ≈ n²/2⁶⁴)
    // could only perturb a count by 1 — negligible at the 4-decimal compare.
    // Hashed ONCE and materialized: every downstream consumer (the df
    // census, both sides of the pair join, the per-doc rare counts) would
    // otherwise re-scan and re-shingle the raw corpus — measured at sf10 as
    // SIX full-text scans per run, each serialized on the input file's
    // split count rather than the cluster. The per-doc distinct-shingle
    // count rides each token row (`sz` = size of the distinct array BEFORE
    // explode — free, no shuffle): the r14 plan joined a doc→size relation
    // against the candidate-PAIR frame twice, and the pair frame is the
    // operator's largest intermediate (Σ C(df,2) rows ≈ 5–15× the token
    // rows on this corpus) — at ScaleGen sf30 those two joins alone
    // spilled ~3 GiB to disk. The checkpoint is 24 bytes per (doc, shingle)
    // — still the operator's working set either way.
    val toks = tokenArrays(docs, idCol, textCol, shingleN)
      .withColumn("sz", size(col("toks")).cast("long"))
      .select(col("id"), col("sz"), explode(col("toks")).as("tok"))
      .select(col("id"), col("sz"), xxhash64(col("tok")).as("th"))
      .localCheckpoint()
    // Zero-shingle docs drop out at the explode — safe: they can never
    // appear in a candidate pair.
    //
    // Pair-stage width: the candidate join's OUTPUT is Σ_{df≤cap} C(df,2)
    // rows — a multiple of the token input that a static session shuffle
    // width (sized for input-scan parallelism) cannot anticipate. Measured
    // at ScaleGen sf30: 3.8e8 candidate rows over the session's 32
    // partitions spilled 16 GiB to disk (the agg stage alone 114 s);
    // the same plan at sf10 (1.27e8 rows, exactly 3× less — ScaleGen holds
    // pair density constant, so candidate volume is LINEAR in corpus size)
    // ran spill-free. width<=0 means "session default + AQE" (the explicit
    // exchanges below pin their width, which would disable AQE coalescing
    // where it is the right tool — small corpora); a positive width targets
    // ~4M pair rows (~100 MB sort footprint) per partition so the pair
    // stages never outgrow executor memory, capped at 8192 (≈3e10 candidate
    // rows — beyond that, raise the session width with the cluster).
    def pairCounts(tokSrc: DataFrame, width: Int): DataFrame = {
      val src = if (width > 0) tokSrc.repartition(width, col("th")) else tokSrc
      val joined = src.as("a")
        .join(src.withColumnRenamed("id", "id2").withColumnRenamed("sz", "szb").as("b"),
          col("a.th") === col("b.th") && col("a.id") < col("id2"))
        .select(col("a.id").as("d1"), col("id2").as("d2"),
          col("a.sz").as("s1"), col("szb").as("s2"))
      val distributed =
        if (width > 0) joined.repartition(width, col("d1"), col("d2")) else joined
      distributed.groupBy("d1", "d2")
        .agg(count(lit(1)).as("c"), first(col("s1")).as("sz1"), first(col("s2")).as("sz2"))
    }
    // paired already carries sz1/sz2 from the token rows — no join against
    // the pair-sized frame, just row-local arithmetic at scan speed
    def finish(paired: DataFrame, cExact: org.apache.spark.sql.Column): DataFrame =
      paired
        .withColumn("cx", cExact)
        .withColumn("jac", col("cx").cast("double") / (col("sz1") + col("sz2") - col("cx")))
        .filter(col("jac") >= threshold)
        .select(col("d1"), col("d2"), col("jac"))
    // a shingle's df is bounded by the document count, so the cap is
    // provably a no-op when n_docs <= cap. Probe with limit(cap+1).count()
    // rather than count(): the limit short-circuits the scan after cap+1
    // rows, so the probe stays cheap at ANY corpus size (a plain count of a
    // filtered 100 TB input would be a full pass)
    if (docs.limit(maxShingleDf + 1).count() <= maxShingleDf) {
      finish(pairCounts(toks, 0), col("c"))
    } else {
      // full shingle df census, materialized eagerly and ONCE: the hot list
      // (df > cap) is referenced twice below, and the rare mass gives the
      // capped join's EXACT output volume for the width rule — both read
      // the same checkpoint (distinct-shingle-count rows of 16 bytes)
      val census = toks.groupBy("th").agg(count(lit(1)).as("df")).localCheckpoint()
      val candPairs = census.filter(col("df") <= maxShingleDf)
        // df*(df-1) is even, so the double division is exact (df ≤ cap =
        // 1e4 keeps each term ≤ 5e7, far under the 2^53 mantissa); cast
        // back to long per-term so the sum (and getLong) stays integral
        .agg(coalesce(sum((col("df") * (col("df") - lit(1)) / lit(2)).cast("long")), lit(0L)).as("cp"))
        .head().getLong(0)
      val sessionWidth = docs.sparkSession.sessionState.conf.numShufflePartitions
      val idealWidth = math.min(8192L, candPairs / 4000000L + 1).toInt
      val width = if (idealWidth > sessionWidth) idealWidth else 0
      val hotTokens = census.filter(col("df") > maxShingleDf).select("th")
      val capped = toks.join(hotTokens, Seq("th"), "left_anti")
      // per-doc hot-shingle sets — the exact correction term for pairs
      // whose shared shingles include hot ones
      val hotDocToks = toks.join(hotTokens, Seq("th"), "left_semi")
        .groupBy("id").agg(collect_set(col("th")).as("hot_ths"))
      // hot-heavy docs (rare fraction <= 1-threshold): the ONLY possible
      // endpoints of a pair the capped join structurally misses (see the
      // operator doc). Small by construction in a normal corpus; ∝ true
      // duplicates in a mass-dup one. localCheckpoint'd: the id list seeds
      // the banding route and an inline subplan would re-run tokenization.
      val sizes = toks.groupBy("id").agg(first(col("sz")).as("sz"))
      val rareCounts = capped.groupBy("id").agg(count(lit(1)).as("rc"))
      val hotHeavyIds = sizes.join(rareCounts, Seq("id"), "left")
        .filter(coalesce(col("rc"), lit(0L)) <= (lit(1.0) - threshold) * col("sz"))
        .select("id").localCheckpoint()
      // banding-route pairs are ∝ hot-heavy docs (small), so joining THEIR
      // sizes back is cheap — the main route carries sizes inline
      val extra = bandedCandidatePairs(
        toks.select("id", "th").join(hotHeavyIds, Seq("id"), "left_semi"))
        .join(sizes.select(col("id").as("d1"), col("sz").as("sz1")), "d1")
        .join(sizes.select(col("id").as("d2"), col("sz").as("sz2")), "d2")
        .withColumn("c", lit(0L))
      // merge the two candidate routes; the rare-shared count c comes from
      // the capped join (0 for banding-only pairs — all their shared
      // shingles are hot and re-enter via the correction term). The merge
      // agg is pair-frame-sized, so it takes the width rule too.
      val unioned = pairCounts(capped, width)
        .unionByName(extra.select("d1", "d2", "c", "sz1", "sz2"))
      val paired =
        (if (width > 0) unioned.repartition(width, col("d1"), col("d2")) else unioned)
          .groupBy("d1", "d2").agg(max(col("c")).as("c"),
            first(col("sz1")).as("sz1"), first(col("sz2")).as("sz2"))
      // exact intersection = shared rare shingles (counted by the join) +
      // shared hot shingles (intersect of the two per-doc hot sets)
      val cHot = when(col("h1").isNotNull && col("h2").isNotNull,
        size(array_intersect(col("h1"), col("h2"))).cast("long")).otherwise(0L)
      finish(
        paired
          .join(hotDocToks.select(col("id").as("d1"), col("hot_ths").as("h1")), Seq("d1"), "left")
          .join(hotDocToks.select(col("id").as("d2"), col("hot_ths").as("h2")), Seq("d2"), "left"),
        col("c") + cHot)
    }
  }

  /** MinHash-banded candidate (d1, d2) pairs from exploded (id, th) token
    * hashes — the fallback candidate route for hot-heavy docs. 8 bands × 2
    * rows: miss probability (1-s²)⁸ ≈ 3e-4 at s=0.8, ≈ 0 at s=1 (the mass
    * -duplication case it exists for). Permutations are a projection, not
    * aggregate-inlined (JIT method-size rule, cf. [[minHashSignature]]).
    */
  private def bandedCandidatePairs(tokHashes: DataFrame, numBands: Int = 8,
                                   rowsPerBand: Int = 2): DataFrame = {
    val banded = bandRows(tokHashes, numBands, rowsPerBand)
      .localCheckpoint() // self-joined below — don't run the signature twice
    banded.as("x")
      .join(banded.withColumnRenamed("id", "id2").as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") && col("x.id") < col("id2"))
      .select(col("x.id").as("d1"), col("id2").as("d2"))
      .distinct()
  }

  /** (id, band, bh) MinHash band-hash rows from exploded (id, th) token
    * hashes.
    */
  private def bandRows(tokHashes: DataFrame, numBands: Int, rowsPerBand: Int): DataFrame = {
    val numHashes = numBands * rowsPerBand
    val permuted = tokHashes.select(
      col("id") +: (0 until numHashes).map(i => xxhash64(lit(i), col("th")).as(s"p$i")): _*)
    val mins = (0 until numHashes).map(i => min(col(s"p$i")).as(s"h$i"))
    val sig = permuted.groupBy("id").agg(mins.head, mins.tail: _*)
    val bandCols = (0 until numBands).map { b =>
      val hs = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(lit(b) +: hs: _*).as("bh"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Cross-corpus exact Jaccard pairs: every (left doc, right doc) pair
    * with similarity >= threshold — the incremental-ingest form of
    * [[jaccardPairs]] (dedup an incoming batch against an existing corpus;
    * decontaminate a training set against an eval set). Same df-cap fan-in
    * bound, exact hot-shingle correction, and hot-heavy banding fallback
    * as [[jaccardPairs]], with document frequency measured over BOTH
    * corpora combined. Construction is EAGER for both corpora (the shared
    * shingle pass is `localCheckpoint()`ed — see [[jaccardPairs]]'s
    * contract note).
    */
  /** @param broadcastLeft hint that `left` is query-sized (an anchor/batch
    *        set, NOT a corpus): its hashed token postings are broadcast into
    *        the intersection join, so the corpus side is never shuffled on
    *        token hash — the join output (intersection-sized) is all that
    *        moves. Caller-asserted; a corpus-sized left would OOM the
    *        broadcast, which is why this is opt-in and default-off. */
  def jaccardPairsBetween(left: DataFrame, right: DataFrame, idCol: String,
                          textCol: String, threshold: Double, shingleN: Int = 1,
                          maxShingleDf: Int = 10000,
                          broadcastLeft: Boolean = false): DataFrame = {
    // hash-early + materialize-once, same rationale as jaccardPairs: each
    // side is consumed by the df census and the pair join — checkpointing
    // the hashed tokens keeps every consumer off the raw corpora. The
    // per-doc distinct-shingle count rides each token row (size of the
    // distinct array BEFORE explode — free, no shuffle), so the similarity
    // arithmetic never joins a size relation against the candidate-PAIR
    // frame, the operator's largest intermediate (see jaccardPairs).
    def hashed(src: DataFrame) = tokenArrays(src, idCol, textCol, shingleN)
      .withColumn("sz", size(col("toks")).cast("long"))
      .select(col("id"), col("sz"), explode(col("toks")).as("tok"))
      .select(col("id"), col("sz"), xxhash64(col("tok")).as("th"))
      .localCheckpoint()
    val (lt, rt) = (hashed(left), hashed(right))
    def sizesOf(toks: DataFrame) = toks.groupBy("id").agg(first(col("sz")).as("sz"))
    lazy val lsz = sizesOf(lt)
    lazy val rsz = sizesOf(rt)
    // pair-stage width, same rule as jaccardPairs (the cross-corpus
    // candidate volume is Σ_{df≤cap} df_left·df_right — exact, from the
    // same census pass that finds the hot shingles). width 0 = session
    // default + AQE; the broadcast path never shuffles on token hash, so
    // only the intersection-sized agg takes the width.
    def pairCounts(a: DataFrame, b: DataFrame, width: Int): DataFrame = {
      val aSide =
        if (broadcastLeft) broadcast(a)
        else if (width > 0) a.repartition(width, col("th"))
        else a
      val bSide = if (width > 0 && !broadcastLeft) b.repartition(width, col("th")) else b
      val joined = aSide.as("a")
        .join(bSide.withColumnRenamed("id", "id2").withColumnRenamed("sz", "szb").as("b"),
          col("a.th") === col("b.th"))
        .select(col("a.id").as("d1"), col("id2").as("d2"),
          col("a.sz").as("s1"), col("szb").as("s2"))
      val distributed =
        if (width > 0) joined.repartition(width, col("d1"), col("d2")) else joined
      distributed.groupBy("d1", "d2")
        .agg(count(lit(1)).as("c"), first(col("s1")).as("sz1"), first(col("s2")).as("sz2"))
    }
    // paired carries sz1/sz2 inline — row-local arithmetic, no pair-frame join
    def finish(paired: DataFrame, cExact: org.apache.spark.sql.Column): DataFrame =
      paired
        .withColumn("cx", cExact)
        .withColumn("jac", col("cx").cast("double") / (col("sz1") + col("sz2") - col("cx")))
        .filter(col("jac") >= threshold)
        .select(col("d1"), col("d2"), col("jac"))
    // limit-probed like jaccardPairs, but as ONE action: union the two
    // limited sides before counting instead of paying a job per side
    val probed = left.limit(maxShingleDf + 1).select(lit(1).as("one"))
      .unionAll(right.limit(maxShingleDf + 1).select(lit(1).as("one")))
      .count()
    if (probed <= maxShingleDf) {
      finish(pairCounts(lt, rt, 0), col("c"))
    } else {
      // one census pass over the union carries BOTH the combined df (the
      // hot cut) and the left-side df, so the exact cross candidate volume
      // Σ_{df≤cap} df_l·(df−df_l) costs no extra shuffle over the r14 plan
      val census = lt.select(col("th"), lit(1L).as("l"))
        .unionByName(rt.select(col("th"), lit(0L).as("l")))
        .groupBy("th").agg(count(lit(1)).as("df"), sum(col("l")).as("dfl"))
        .localCheckpoint()
      val candPairs = census.filter(col("df") <= maxShingleDf)
        .agg(coalesce(sum(col("dfl") * (col("df") - col("dfl"))), lit(0L)).as("cp"))
        .head().getLong(0)
      val sessionWidth = left.sparkSession.sessionState.conf.numShufflePartitions
      val idealWidth = math.min(8192L, candPairs / 4000000L + 1).toInt
      val width = if (idealWidth > sessionWidth) idealWidth else 0
      val hotTokens = census.filter(col("df") > maxShingleDf).select("th")
      def capped(t: DataFrame) = t.join(hotTokens, Seq("th"), "left_anti")
      def hotSets(t: DataFrame) = t.join(hotTokens, Seq("th"), "left_semi")
        .groupBy("id").agg(collect_set(col("th")).as("hot_ths"))
      // hot-heavy fallback, cross-corpus form (same math as jaccardPairs:
      // a structurally-missed pair at jac >= threshold forces BOTH
      // endpoints under the 1-threshold rare fraction, df measured over
      // the combined corpora) — band each side's hot-heavy docs, join
      // left × right on band hash
      def hotHeavyIds(toks: DataFrame, sizes: DataFrame) = {
        val rare = capped(toks).groupBy("id").agg(count(lit(1)).as("rc"))
        sizes.join(rare, Seq("id"), "left")
          .filter(coalesce(col("rc"), lit(0L)) <= (lit(1.0) - threshold) * col("sz"))
          .select("id").localCheckpoint()
      }
      val lBand = bandRows(
        lt.select("id", "th").join(hotHeavyIds(lt, lsz), Seq("id"), "left_semi"), 8, 2)
        .localCheckpoint()
      val rBand = bandRows(
        rt.select("id", "th").join(hotHeavyIds(rt, rsz), Seq("id"), "left_semi"), 8, 2)
        .localCheckpoint()
      // banding-route pairs are ∝ hot-heavy docs (small): joining THEIR
      // sizes back is cheap — the main route carries sizes inline
      val extra = lBand.as("x")
        .join(rBand.withColumnRenamed("id", "id2").as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
        .select(col("x.id").as("d1"), col("id2").as("d2"))
        .distinct()
        .join(lsz.select(col("id").as("d1"), col("sz").as("sz1")), "d1")
        .join(rsz.select(col("id").as("d2"), col("sz").as("sz2")), "d2")
        .withColumn("c", lit(0L))
      val unioned = pairCounts(capped(lt), capped(rt), width)
        .unionByName(extra.select("d1", "d2", "c", "sz1", "sz2"))
      val paired =
        (if (width > 0) unioned.repartition(width, col("d1"), col("d2")) else unioned)
          .groupBy("d1", "d2").agg(max(col("c")).as("c"),
            first(col("sz1")).as("sz1"), first(col("sz2")).as("sz2"))
      val cHot = when(col("h1").isNotNull && col("h2").isNotNull,
        size(array_intersect(col("h1"), col("h2"))).cast("long")).otherwise(0L)
      finish(
        paired
          .join(hotSets(lt).select(col("id").as("d1"), col("hot_ths").as("h1")), Seq("d1"), "left")
          .join(hotSets(rt).select(col("id").as("d2"), col("hot_ths").as("h2")), Seq("d2"), "left"),
        col("c") + cHot)
    }
  }

  /** ~`targetAnchors` deterministic anchor docs (`id % ceil(n/target) = 0`)
    * and their exact shingle-Jaccard ≥ `threshold` pairs against the WHOLE
    * corpus, normalized to `d1 < d2` (anchor×anchor pairs arrive in both
    * orientations with identical symmetric jac) — the O(target·n) exact arm
    * used by q_ext_dedup4's oracle AND by [[graft.tools.DedupRecallProbe]].
    * One definition so the probe measures the query's actual physical plan
    * (anchors broadcast into the token join, corpus never shuffled on token
    * hash). Pair-count-sized and localCheckpoint'd: callers reference it
    * from both an output and a recall guard, so the shingle join runs once.
    */
  def anchoredJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                           targetAnchors: Long = 500L, threshold: Double = 0.9,
                           shingleN: Int = 3): DataFrame = {
    val qDiv = docs.agg(
      greatest(lit(1L), floor(count(lit(1)) / targetAnchors.toDouble).cast("long")).as("qdiv"))
    val anchors = docs.crossJoin(broadcast(qDiv))
      .filter(col(idCol) % col("qdiv") === 0)
      .select(col(idCol), col(textCol))
    jaccardPairsBetween(anchors, docs, idCol, textCol, threshold, shingleN,
        broadcastLeft = true)
      .filter(col("d1") =!= col("d2"))
      .groupBy(least(col("d1"), col("d2")).as("d1"),
        greatest(col("d1"), col("d2")).as("d2"))
      .agg(max(col("jac")).as("jac"))
      .localCheckpoint()
  }

  /** Candidate (d1, d2) pairs sharing at least one shingle with document
    * frequency <= maxShingleDf. Public so tests and profiling can measure
    * the fan-in bound directly.
    */
  def jaccardCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, maxShingleDf: Int): DataFrame = {
    val toks = tokenSets(docs, idCol, textCol, shingleN)
      .select(col("id"), xxhash64(col("tok")).as("th"))
    val hotTokens = toks.groupBy("th").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDf).select("th")
    val capped = toks.join(hotTokens, Seq("th"), "left_anti")
    capped.as("a")
      .join(capped.withColumnRenamed("id", "id2").as("b"),
        col("a.th") === col("b.th") && col("a.id") < col("id2"))
      .select(col("a.id").as("d1"), col("id2").as("d2"))
      .distinct()
  }

  /** Deterministic MinHash signature: sig[i] = min over shingles of
    * xxhash64(i, xxhash64(shingle)).
    *
    * Each shingle is string-hashed ONCE; the i-th permutation re-mixes the
    * resulting 8-byte value (fixed-width, far cheaper than re-hashing the
    * string per permutation, and overflow-free under ANSI mode — a
    * multiply-shift family would throw on long overflow). Seeded by the
    * literal index — reproducible across runs/clusters, no RNG.
    */
  def minHashSignature(docs: DataFrame, idCol: String, textCol: String,
                       numHashes: Int, shingleN: Int): DataFrame = {
    val toks = tokenSets(docs, idCol, textCol, shingleN)
      .select(col("id"), xxhash64(col("tok")).as("th"))
    // permuted hashes as a PROJECTION, not inside the aggregate: codegen
    // splits wide projections into JIT-sized sub-methods, while a
    // HashAggregate update with N inlined hashes is one huge method that
    // HotSpot refuses to JIT (~10× slower). The aggregate then does N
    // trivial min() updates.
    val permuted = toks.select(
      col("id") +: (0 until numHashes).map(i => xxhash64(lit(i), col("th")).as(s"p$i")): _*)
    val mins = (0 until numHashes).map(i => min(col(s"p$i")).as(s"h$i"))
    permuted.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding near-dup pairs, verified with exact Jaccard.
    *
    * bands × rowsPerBand hashes; candidate pairs share at least one band
    * hash; candidates are then exactly verified (against the full shingle
    * sets) so the output has no false positives — only the (tiny, tunable)
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
    verifyPairsExact(candidates, docs, idCol, textCol, shingleN, threshold)
  }

  /** Persisted MinHash signature store — the INCREMENTAL dedup shape: a
    * continuously-growing corpus pays shingling + signatures ONCE per
    * document at ingest, and each new batch dedups against the whole
    * corpus by joining the store's band rows, never re-reading (let alone
    * re-shingling) corpus text. At 100 TB the alternative — re-running
    * [[jaccardPairsBetween]] per batch — re-tokenizes the full corpus on
    * every ingest tick.
    *
    * Layout at `dir`:
    *  - `toks/`  (id, ths array<long>) — distinct shingle hashes per doc,
    *    the exact-verification side (jac on 64-bit shingle hashes, same
    *    negligible-collision contract as [[jaccardPairs]]'s hashed join);
    *  - `bands/` (id, band, bh) — LSH band rows, the candidate-join side;
    *  - `_params` — banding/shingle params; probes validate against it so
    *    a store built with different banding fails loudly instead of
    *    silently missing candidates.
    *
    * Build runs the shingle pipeline once: `toks` is written first, and
    * `bands` derives from the STORED arrays (no second tokenization pass).
    */
  def buildMinHashStore(docs: DataFrame, idCol: String, textCol: String, dir: String,
                        numBands: Int = 16, rowsPerBand: Int = 2,
                        shingleN: Int = 3): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(docs.sparkSession.sessionState.newHadoopConf()).delete(p, true)
    appendToMinHashStore(docs, idCol, textCol, dir, numBands, rowsPerBand, shingleN)
  }

  /** Append a new batch's signatures to an existing store (after the caller
    * has dedup'd/kept them — the store should hold surviving docs). Params
    * are pinned by the store's `_params` marker.
    *
    * Crash safety (the shared persisted-store protocol, cf.
    * `DistinctSketch`'s retire-then-promote and `Similarity`'s pending-
    * marker append): each append is one SEGMENT — `toks` and `bands` are
    * staged together under `_staging/<uuid>` and made visible by a single
    * atomic directory rename to `seg-<uuid>`, so readers never observe
    * signatures without their band rows (the half-appended state the old
    * two-append layout could crash into). A crash before the rename leaves
    * only `_staging` debris, dropped by [[recoverMinHashStore]]; a crash
    * after it is a completed append. With `batchMarker` set, replaying the
    * same batch is a NO-OP when a committed segment already carries the
    * marker (the marker file rides inside the segment, so data and marker
    * commit in the same rename — re-delivery can't double-append).
    */
  def appendToMinHashStore(batch: DataFrame, idCol: String, textCol: String,
                           dir: String, numBands: Int = 16, rowsPerBand: Int = 2,
                           shingleN: Int = 3, batchMarker: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    // a store persisted by the pre-segment layout (root-level toks/ +
    // bands/) must be rebuilt, not appended to: segment readers only see
    // seg-* dirs, so a silent append here would make every later probe
    // dedup against the new batch alone and LOSE the legacy corpus
    require(!fs.exists(new org.apache.hadoop.fs.Path(root, "toks")),
      s"MinHash store at $dir uses the legacy root-level toks/bands layout — " +
        "rebuild it with buildMinHashStore before appending")
    readParams(dir, conf) match {
      case Some(stored) =>
        require(stored == (numBands, rowsPerBand, shingleN),
          s"store $dir was built with (bands,rows,shingleN)=$stored, " +
            s"got (${numBands},${rowsPerBand},${shingleN})")
      case None =>
        writeParams(dir, (numBands, rowsPerBand, shingleN), conf)
    }
    val alreadyCommitted = batchMarker.exists(m =>
      segmentDirs(fs, root).exists(seg =>
        fs.exists(new org.apache.hadoop.fs.Path(seg, s"_batch-$m"))))
    if (alreadyCommitted) return
    val segId = java.util.UUID.randomUUID.toString
    val staging = new org.apache.hadoop.fs.Path(s"$dir/_staging/$segId")
    val toks = tokenSets(batch, idCol, textCol, shingleN)
      .select(col("id"), xxhash64(col("tok")).as("th"))
    toks.groupBy("id").agg(collect_set(col("th")).as("ths"))
      .write.mode("overwrite").parquet(s"$staging/toks")
    // band rows derive from the STAGED arrays — one shingle pass total
    val stagedBatch = spark.read.parquet(s"$staging/toks")
    bandRows(stagedBatch.select(col("id"), explode(col("ths")).as("th")),
        numBands, rowsPerBand)
      .write.mode("overwrite").parquet(s"$staging/bands")
    batchMarker.foreach { m =>
      val out = fs.create(new org.apache.hadoop.fs.Path(staging, s"_batch-$m"), true)
      out.close()
    }
    val seg = new org.apache.hadoop.fs.Path(dir, s"seg-$segId")
    if (!fs.rename(staging, seg))
      throw new java.io.IOException(
        s"appendToMinHashStore: failed to commit $staging to $seg — staged data intact")
  }

  /** Compact all committed segments of a MinHash store into ONE — the
    * maintenance pass a streaming ingest needs:
    * [[graft.streaming.DocStreams.minHashStoreStream]] appends one segment
    * per micro-batch, so an unbounded ingest accumulates unbounded
    * small-parquet segment dirs and every probe unions them all. Compaction
    * rewrites the union as a single segment while preserving the store's
    * exactly-once contract: every replaced segment's `_batch-*` markers are
    * copied into the compacted segment, so a foreachBatch re-delivery of
    * ANY already-merged batch still no-ops afterwards (spec-asserted).
    *
    * Protocol (retire-then-promote, the `DistinctSketch` family):
    *  1. stage the compacted segment under `_staging/<uuid>`, including a
    *     `_replaces` manifest naming the segments it subsumes;
    *  2. RETIRE each replaced segment by renaming it under
    *     `_retired/<uuid>/` — per-segment atomic, and the live set only
    *     shrinks (no moment shows a doc's signatures twice);
    *  3. PROMOTE the staged segment with one atomic rename to `seg-<uuid>`;
    *  4. drop `_retired/<uuid>`.
    * Every crash window is repaired by [[recoverMinHashStore]]: a partial
    * retire rolls BACK (retired segments restored, staging dropped), a
    * full retire that never promoted rolls FORWARD (promote, then drop
    * retired), a promote that never cleaned up drops the leftovers.
    *
    * CONCURRENCY (round 11): compaction-vs-compaction is serialized by a
    * create-no-overwrite `_compact_pending` mutex — the second compactor
    * aborts loudly instead of corrupting the retire sequence. Concurrent
    * APPENDS are safe by construction (a newly-committed segment is not in
    * this compaction's `_replaces` manifest, so retire/promote never touch
    * it — two-writer drill in ConcurrentSketchWriterSpec). PROBES must
    * still quiesce: mid-retire the store is transiently incomplete for
    * readers.
    *
    * @return number of segments replaced (0 = already compact, no-op).
    */
  def compactMinHashStore(spark: org.apache.spark.sql.SparkSession,
                          dir: String): Int =
    compactMinHashStoreImpl(spark, dir, crashAfterRetires = Int.MaxValue)

  /** Test seam: `crashAfterRetires` = simulated crash (exception) once that
    * many segments have been retired; Int.MaxValue = never.
    */
  private[graft] def compactMinHashStoreImpl(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      crashAfterRetires: Int): Int = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val segs = segmentDirs(fs, root)
    if (segs.size <= 1) return 0
    // COMPACTION MUTEX (round 11, the appendToIvfIndex create-no-overwrite
    // pattern): two concurrent compactions list the same segments and the
    // loser's retire renames fail mid-sequence — resolvable only by a
    // quiesced recover. Fail the second compactor loudly at entry instead.
    // Concurrent APPENDS remain safe without the mutex (a new segment is
    // not in this compaction's _replaces manifest, so retire/promote never
    // touch it); the marker only serializes compaction against compaction.
    val mutex = new org.apache.hadoop.fs.Path(root, "_compact_pending")
    if (!graft.sources.HadoopText.writeIfAbsent(fs, mutex,
        java.util.UUID.randomUUID.toString))
      throw new java.util.ConcurrentModificationException(
        s"compactMinHashStore: another compaction is in flight on $dir " +
          "(_compact_pending exists) — retry after it completes, or run " +
          "recoverMinHashStore in a quiesced window if it crashed")
    try compactUnderMutex(spark, dir, segs, crashAfterRetires)
    finally fs.delete(mutex, false)
  }

  private def compactUnderMutex(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      segs: Seq[org.apache.hadoop.fs.Path], crashAfterRetires: Int): Int = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val segId = java.util.UUID.randomUUID.toString
    val staging = new org.apache.hadoop.fs.Path(s"$dir/_staging/$segId")
    spark.read.parquet(segs.map(p => s"$p/toks"): _*)
      .write.mode("overwrite").parquet(s"$staging/toks")
    spark.read.parquet(segs.map(p => s"$p/bands"): _*)
      .write.mode("overwrite").parquet(s"$staging/bands")
    // carry every replaced segment's batch markers forward
    segs.foreach { seg =>
      fs.listStatus(seg).filter(_.getPath.getName.startsWith("_batch-"))
        .foreach { m =>
          fs.create(new org.apache.hadoop.fs.Path(staging, m.getPath.getName),
            true).close()
        }
    }
    val replaces = segs.map(_.getName)
    val out = fs.create(new org.apache.hadoop.fs.Path(staging, "_replaces"), true)
    try out.write(replaces.mkString("\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val retired = new org.apache.hadoop.fs.Path(s"$dir/_retired/$segId")
    fs.mkdirs(retired)
    var done = 0
    segs.foreach { seg =>
      if (done >= crashAfterRetires)
        throw new java.io.IOException(
          s"compactMinHashStore: simulated crash after $done retire(s)")
      if (!fs.rename(seg, new org.apache.hadoop.fs.Path(retired, seg.getName)))
        throw new java.io.IOException(
          s"compactMinHashStore: failed to retire $seg — run recoverMinHashStore")
      done += 1
    }
    if (done >= crashAfterRetires)
      throw new java.io.IOException(
        s"compactMinHashStore: simulated crash after $done retire(s), before promote")
    val seg = new org.apache.hadoop.fs.Path(dir, s"seg-$segId")
    if (!fs.rename(staging, seg))
      throw new java.io.IOException(
        s"compactMinHashStore: failed to promote $staging — run recoverMinHashStore")
    fs.delete(retired, true)
    segs.size
  }

  /** Repair an interrupted [[appendToMinHashStore]] or
    * [[compactMinHashStore]]. Append debris (staged-but-uncommitted
    * segments with no `_replaces` manifest) is dropped — that batch never
    * became visible, re-append it. Interrupted compactions resolve by
    * their crash window: retired set == `_replaces` manifest → roll
    * FORWARD (promote the staged compacted segment, drop the retired
    * copies); anything less → roll BACK (restore retired segments, drop
    * the staging); a promoted compaction's leftover `_retired` dir is
    * dropped. Committed segments are never touched. Idempotent; returns
    * the staging ids removed plus `forward-`/`rollback-`/`dropped-retired-`
    * action tags for compaction repairs.
    *
    * QUIESCE CONTRACT (same as `ParquetDatabase.recover`): run only when no
    * writer is live on this store — staging debris is indistinguishable
    * from a live writer's in-flight staging, and deleting the latter
    * corrupts or kills that writer.
    */
  def recoverMinHashStore(spark: org.apache.spark.sql.SparkSession, dir: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val stagingRoot = new org.apache.hadoop.fs.Path(s"$dir/_staging")
    val retiredRoot = new org.apache.hadoop.fs.Path(s"$dir/_retired")
    val fs = stagingRoot.getFileSystem(conf)
    val actions = Seq.newBuilder[String]
    if (fs.exists(retiredRoot)) {
      fs.listStatus(retiredRoot).foreach { st =>
        val id = st.getPath.getName
        val promoted = new org.apache.hadoop.fs.Path(dir, s"seg-$id")
        val stg = new org.apache.hadoop.fs.Path(stagingRoot, id)
        val manifest = new org.apache.hadoop.fs.Path(stg, "_replaces")
        if (fs.exists(promoted)) {
          // crash between promote and cleanup — the compacted data is live
          fs.delete(st.getPath, true)
          actions += s"dropped-retired-$id"
        } else if (fs.exists(manifest)) {
          val replaces = graft.sources.HadoopText.read(fs, manifest)
            .split('\n').map(_.trim).filter(_.nonEmpty).toSet
          val retired = fs.listStatus(st.getPath).map(_.getPath.getName).toSet
          if (retired == replaces) {
            // all replaced segments retired — finish the promote
            if (!fs.rename(stg, promoted))
              throw new java.io.IOException(
                s"recoverMinHashStore: failed to promote $stg")
            fs.delete(st.getPath, true)
            actions += s"forward-$id"
          } else {
            // partial retire — restore and drop the staged compaction
            retired.foreach { n =>
              if (!fs.rename(new org.apache.hadoop.fs.Path(st.getPath, n),
                  new org.apache.hadoop.fs.Path(dir, n)))
                throw new java.io.IOException(
                  s"recoverMinHashStore: failed to restore $n")
            }
            fs.delete(st.getPath, true)
            fs.delete(stg, true)
            actions += s"rollback-$id"
          }
        } else {
          // retired dir with neither promote nor manifest: restore contents
          fs.listStatus(st.getPath).foreach { c =>
            fs.rename(c.getPath, new org.apache.hadoop.fs.Path(dir, c.getPath.getName))
          }
          fs.delete(st.getPath, true)
          actions += s"rollback-$id"
        }
      }
      if (fs.exists(retiredRoot) && fs.listStatus(retiredRoot).isEmpty)
        fs.delete(retiredRoot, true)
    }
    if (fs.exists(stagingRoot)) {
      val ids = fs.listStatus(stagingRoot).toSeq.map(_.getPath.getName)
      fs.delete(stagingRoot, true)
      actions ++= ids
    }
    // a compactor that DIED (not aborted) leaves the compaction mutex in
    // place and blocks all future compactions; this is a quiesced sweep,
    // so no live compactor can own it — release it
    val mutex = new org.apache.hadoop.fs.Path(dir, "_compact_pending")
    if (fs.exists(mutex)) {
      fs.delete(mutex, false)
      actions += "released-compact-mutex"
    }
    actions.result()
  }

  private def segmentDirs(fs: org.apache.hadoop.fs.FileSystem,
                          root: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toIndexedSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg-"))
      .map(_.getPath).sortBy(_.getName)

  /** All committed segments' `sub` (toks/bands) as one DataFrame. */
  private def readStore(spark: org.apache.spark.sql.SparkSession, dir: String,
                        sub: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = segmentDirs(fs, root).map(p => s"$p/$sub")
    require(parts.nonEmpty, s"MinHash store at $dir has no committed segments")
    spark.read.parquet(parts: _*)
  }

  private def paramsPath(dir: String) = new org.apache.hadoop.fs.Path(dir, "_params")

  private def readParams(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Option[(Int, Int, Int)] = {
    val p = paramsPath(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val Array(b, r, n) = graft.sources.HadoopText.read(fs, p)
        .trim.split('|').map(_.toInt)
      Some((b, r, n))
    }
  }

  private def writeParams(dir: String, params: (Int, Int, Int),
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = paramsPath(dir)
    graft.sources.HadoopText.write(p.getFileSystem(conf), p,
      s"${params._1}|${params._2}|${params._3}")
  }

  /** Near-dup pairs (batch doc, stored doc) with exact Jaccard >= threshold,
    * candidates from the store's LSH bands — the per-batch incremental step.
    * Only the BATCH is tokenized (once, checkpointed — its rows feed both
    * the band join and the verify join, and the checkpoint is ∝ batch
    * size); the corpus side comes entirely from the store. Emitted jac is
    * exact over the hashed shingle sets; misses are the banding family's
    * (1-s^r)^b — < 1e-7 at s≥0.8 with the default 16×2.
    *
    * Returns (d1 = batch id, d2 = stored id, jac). Batch-internal pairs are
    * the caller's [[minHashPairs]] step; appending survivors is
    * [[appendToMinHashStore]].
    */
  def minHashPairsAgainstStore(batch: DataFrame, idCol: String, textCol: String,
                               dir: String, threshold: Double): DataFrame = {
    val spark = batch.sparkSession
    val (numBands, rowsPerBand, shingleN) = readParams(dir,
      spark.sessionState.newHadoopConf()).getOrElse(
      throw new IllegalStateException(s"no MinHash store at $dir (missing _params)"))
    val batchToks = tokenSets(batch, idCol, textCol, shingleN)
      .select(col("id"), xxhash64(col("tok")).as("th"))
      .localCheckpoint()
    val batchBands = bandRows(batchToks, numBands, rowsPerBand)
    val candidates = batchBands.as("x")
      .join(readStore(spark, dir, "bands").withColumnRenamed("id", "sid").as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") =!= col("sid"))
      .select(col("x.id").as("d1"), col("sid").as("d2"))
      .distinct()
      .localCheckpoint() // tiny by construction; feeds two joins below
    val batchSets = batchToks.groupBy("id").agg(collect_set(col("th")).as("ths"))
    val storedSets = readStore(spark, dir, "toks")
      .join(candidates.select(col("d2").as("id")), Seq("id"), "left_semi")
    candidates
      .join(batchSets.select(col("id").as("d1"), col("ths").as("t1")), "d1")
      .join(storedSets.select(col("id").as("d2"), col("ths").as("t2")), "d2")
      .withColumn("c", size(array_intersect(col("t1"), col("t2"))).cast("long"))
      .withColumn("jac", col("c").cast("double") / (size(col("t1")) + size(col("t2")) - col("c")))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("jac"))
  }

  /** 64-bit SimHash over the token set: bit b is the sign of the vote
    * sum over tokens of ±1 by bit b of xxhash64(token).
    *
    * Shape: explode tokens → one hash per token → 64 codegen'd sum
    * aggregates (one per bit) → pack bits. A higher-order-function
    * formulation is more compact but `aggregate`/`transform` are
    * CodegenFallback (interpreted) — the exploded form stays inside
    * whole-stage codegen and is ~an order of magnitude faster.
    *
    * Docs whose token set is empty have no exploded rows and thus no
    * signature (they can't be near-duplicates of anything by this measure).
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = spread(docs).select(col(idCol).as("id"),
      explode(TextFunctions.distinctTokens(col(textCol))).as("tok"))
    val h = xxhash64(col("tok"))
    val votes = (0 until 64).map(b =>
      sum(when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"v$b"))
    val packed = (0 until 64).map(b =>
      when(col(s"v$b") >= 0, shiftleft(lit(1L), b)).otherwise(0L)).reduce(_ bitwiseOR _)
    toks.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"), packed.as("simhash"))
  }

  /** Connected components over near-duplicate pairs — the "keep one document
    * per duplicate cluster" step after any pair generator above.
    *
    * Min-label propagation: every vertex starts labelled with itself; each
    * round every vertex takes the min label among itself and its neighbors,
    * until fixpoint. Rounds needed = component diameter — near-dup clusters
    * are shallow (dups of dups), so this converges in a handful of rounds;
    * each round is one join + one aggregate, all shuffles keyed on vertex id.
    * Returns (id, rep) where rep = min id in the component.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // undirected edge list, both directions — materialized once
    // (localCheckpoint): the upstream pair generator may be an expensive
    // pipeline, and every propagation round re-reads the edges
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("rep"))
    var converged = false
    var iter = 0
    val superseded = scala.collection.mutable.ListBuffer[DataFrame]()
    while (!converged && iter < maxIter) {
      // candidate label per vertex: min over (own label, neighbors' labels)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("rep", "nrep"), "dst")
        .select(col("src").as("id"), col("nrep").as("rep"))
      val next = labels.union(viaNeighbors)
        .groupBy("id").agg(min(col("rep")).as("rep"))
        .localCheckpoint() // truncate the growing iteration lineage
      // convergence probe every OTHER round (and on the last allowed one):
      // fixpoint rounds are idempotent, so a skipped check just trades one
      // cheap extra propagation for halving the per-round probe jobs
      if (iter % 2 == 1 || iter == maxIter - 1) {
        val changed = next.join(labels.withColumnRenamed("rep", "old"), "id")
          .filter(col("rep") =!= col("old")).limit(1).count()
        converged = changed == 0
      }
      if (iter > 0) superseded += labels // iter 0's labels is un-checkpointed
      labels = next
      iter += 1
    }
    // silent truncation would return WRONG labels (far ends of a chain not
    // yet relabelled) — a component with diameter > maxIter must fail loudly
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          s"a component's diameter exceeds maxIter; raise maxIter")
    // release superseded per-round checkpoints (the session would otherwise
    // hold every round's blocks until it ends); the returned labels and the
    // edges stay cached only until callers are done — edges freed here
    superseded.foreach(df => df.rdd.unpersist(false))
    edges.rdd.unpersist(false)
    labels
  }

  /** Block-count rule for [[simHashPairs]] — the SimHash analogue of
    * `Similarity.autoSrpPlanes`: banded candidate volume per table is
    * Σ bucket² ≈ n²/2^keyBits for a well-mixed corpus, so the band KEY must
    * WIDEN as the corpus grows to hold per-bucket population (and with it
    * the banding join's fan-out) near `targetBucket`. With the combination
    * banding below, numBlocks B at distance d gives keys of
    * (B−d)·⌊64/B⌋ bits across C(B, B−d) tables, so the rule walks B up from
    * the completeness minimum d+1 until the key covers
    * ceil(log2(n/targetBucket)) bits, stopping when the table count would
    * pass `maxTables` (combinatorial growth — past the ceiling the
    * hot-bucket sub-split is the backstop). The 100× finding behind the
    * rule: at 500 k docs the frozen 8-block/8-bit geometry held ~2 000 docs
    * per bucket and the banding join's candidate volume grew ~n²/256 —
    * quadratic — while one extra block (B=9: 14-bit keys, 36 tables) cuts
    * the random collision mass 14×.
    */
  def autoSimHashBlocks(corpusRows: Long, maxDist: Int, targetBucket: Long = 256L,
                        maxTables: Int = 256): Int = {
    require(maxDist >= 1 && maxDist < 63, s"maxDist must be in [1, 62] (got $maxDist)")
    val neededBits = math.ceil(
      math.log(math.max(1.0, corpusRows.toDouble / targetBucket)) / math.log(2.0)).toInt
    def keyBits(b: Int) = (b - maxDist) * (64 / b)
    def tables(b: Int) =
      (1 to (b - maxDist)).foldLeft(1L)((acc, i) => acc * (maxDist + i) / i) // C(b, b-d)
    var b = maxDist + 1
    while (keyBits(b) < neededBits && b < 32 && 64 / (b + 1) >= 1 &&
      tables(b + 1) <= maxTables) b += 1
    b
  }

  /** Bucket-cap rule for [[simHashPairs]] — the cap analogue of
    * [[autoSimHashBlocks]]. A FIXED cap is as scale-wrong as a fixed block
    * count, in the opposite direction: the round-15 sf30 probe measured a
    * cap of 800 at 1.5 M docs putting 19% of all banded rows into over-cap
    * buckets, which drives the whole join down the map-carrying sub-split
    * path (per-survivor hot-band map probes — > 40 min) AND costs recall
    * (the sub-split's bounded-sample backstop drops split-apart pairs),
    * while a cap the census never reaches leaves the join on the complete
    * fast path — 11.8e9 raw candidates hamming-tested in ~35 s at the same
    * scale and geometry. Under auto geometry the expected bucket is near
    * `targetBucket` (256), so over-cap buckets are template artifacts whose
    * size grows with the corpus's clique structure, not with n — the cap
    * only needs to stay (a) above that artifact band so the backstop is
    * RARE, and (b) below any constant CORPUS FRACTION so a degenerate
    * mega-clique (the one genuine n² risk) is still sub-split. corpus/100
    * with a floor of 800 does both: the floor holds to 80 k rows — above
    * every driver-gate scale, and above the 65 536-row point where
    * [[autoSimHashBlocks]] first widens past 8 blocks — so small-scale
    * plans (and the measured hot-path coverage they exercise) are
    * byte-identical to the historical pinned-800 form.
    */
  def autoSimHashBucketCap(corpusRows: Long, floor: Long = 800L): Long =
    math.max(floor, corpusRows / 100L)

  /** SimHash near-dup pairs: hamming distance <= maxDist. The pair join is
    * banded COMBINATORIALLY on the `numBlocks` near-equal-width bit blocks
    * of the signature (the Manku–Jain–Sarma WWW'07 near-duplicate design):
    * a pair within distance d corrupts at most d blocks (pigeonhole), so it
    * agrees EXACTLY on at least numBlocks − d blocks — and therefore on at
    * least one specific (numBlocks − d)-subset. Banding on every such
    * subset (C(numBlocks, numBlocks−d) tables, keys the concatenation of
    * the subset's block values) is complete for d <= maxDist while the key
    * is (numBlocks−d)·⌊64/numBlocks⌋ bits wide — so EXTRA blocks widen the
    * keys and shrink random bucket collisions without giving up the
    * completeness bound (numBlocks = maxDist + 1 degenerates to the
    * classic one-block-per-band form, e.g. 4 blocks of 16 bits for d <= 3,
    * 8 blocks of 8 bits for d <= 7).
    *
    * `numBlocks = 0` (the default) sizes the geometry by
    * [[autoSimHashBlocks]] from the corpus count — the deployment rule;
    * pass an explicit value to pin a fixture geometry. `maxBucket = 0`
    * likewise sizes the hot-bucket cap by [[autoSimHashBucketCap]] from the
    * same count. The count runs on the already-checkpointed signature
    * frame, so it costs one metadata scan, not a corpus re-tokenize.
    *
    * Hot-bucket guard: a template-heavy corpus concentrates signatures, so
    * one (band, key) bucket can hold a large corpus fraction and its
    * self-join approaches n² (measured: 5k synthetic docs put 69% of all
    * pairs into shared 8-bit buckets). Buckets larger than `maxBucket` are
    * deterministically sub-split by xxhash64(id) so each member meets a
    * bounded sample of its bucket; a true pair suppressed in one hot band
    * still surfaces through any of its other agreeing bands. The bucket
    * census broadcast holds only the > maxBucket rows — bounded by
    * C(numBlocks, numBlocks−maxDist) · n / maxBucket, output-sized by
    * construction, never a driver collect.
    *
    * Emission-plan size switch (round 15): the census-active (hot) path has
    * two proven-output-identical plans. Emit-all + distinct() re-emits each
    * surviving pair once per met band and pays a duplicate-eliminating
    * shuffle — cheap while survivor volume is small, quadratic-prone on big
    * clustered corpora (measured 4.0× per-decade at sf10). Single-emission
    * min-band pays a fixed +2–6 s of per-candidate band selection at small
    * scale but holds the per-decade ratio at 1.5×. Corpora under
    * `emitAllBelowRows` take emit-all; at or above it, min-band. The default
    * crossover sits between the measured brackets — 50 k docs (sf1), where
    * emit-all wins by 2–6 s, and 500 k (sf10), where min-band wins 4.0×→1.5×
    * — at their geometric mean. Pass 0 to force min-band (specs),
    * Long.MaxValue to force emit-all.
    */
  val EmitAllCrossoverRows: Long = 150000L

  def simHashPairs(docs: DataFrame, idCol: String, textCol: String, maxDist: Int = 3,
                   numBlocks: Int = 0, maxBucket: Long = 100000L,
                   emitAllBelowRows: Long = EmitAllCrossoverRows): DataFrame = {
    // materialize the signature pass once: the geometry count, the
    // hot-bucket census and BOTH sides of the banding self-join would
    // otherwise each re-tokenize and re-hash the whole corpus (measured: 3
    // extra signature passes ≈ half the operator's steady-state cost at
    // sf0.1). The checkpoint is 16 bytes × n — negligible next to the
    // corpus it summarizes.
    val sig = simHash(docs, idCol, textCol).localCheckpoint()
    // one metadata-cheap count over the checkpoint serves both the geometry
    // rule and the hot-path emission-plan switch
    val sigRows = sig.count()
    val blocks =
      if (numBlocks > 0) numBlocks
      else autoSimHashBlocks(sigRows, maxDist)
    val bucketCap =
      if (maxBucket > 0) maxBucket
      else autoSimHashBucketCap(sigRows)
    require(blocks >= 2 && blocks <= 64,
      s"numBlocks must be in [2, 64] (got $blocks)")
    require(maxDist < blocks,
      s"block banding is complete only for maxDist < numBlocks (got $maxDist >= $blocks)")
    // near-equal block widths: the first (64 mod blocks) blocks get one
    // extra bit, offsets accumulate
    val widths = Array.tabulate(blocks)(i => 64 / blocks + (if (i < 64 % blocks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    def blockVal(i: Int) =
      shiftright(col("simhash"), offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1))
    // every (blocks − maxDist)-subset of block indices is one band; the key
    // concatenates the subset's block values (fits a long: total width
    // <= 64 − min block width since the subset is proper)
    val subsets = (0 until blocks).combinations(blocks - maxDist).toSeq
    val bands = subsets.zipWithIndex.map { case (subset, si) =>
      val key = subset.tail.foldLeft(blockVal(subset.head)) { (acc, i) =>
        shiftleft(acc, widths(i)).bitwiseOR(blockVal(i))
      }
      struct(lit(si).as("ci"), key.as("cv"))
    }
    val blocked = sig.select(col("id"), col("simhash"),
      explode(array(bands: _*)).as("ch"))
      .select(col("id"), col("simhash"), col("ch.ci").as("ci"), col("ch.cv").as("cv"))
    // census first, materialized: it is metadata-sized by construction
    // (only the > maxBucket rows survive, bounded by #tables · n/maxBucket)
    // and it decides the plan SHAPE below — the empty/non-empty probe is a
    // metadata-sized driver decision, not a data collect.
    val hot = blocked.groupBy("ci", "cv").agg(count(lit(1)).as("m"))
      .filter(col("m") > bucketCap)
      .withColumn("nsub", ceil(col("m").cast("double") / bucketCap).cast("long"))
      .select("ci", "cv", "nsub")
      .localCheckpoint()
    // ---- single-emission banding ----
    // A clustered corpus re-emits every surviving pair once per band where
    // the pair actually MET — up to C(blocks, blocks−maxDist) copies
    // (measured: the sf10 rehearsal corpus holds 13% of ALL doc pairs
    // within distance 7, so the banding join fed ~9e8 duplicated survivors
    // to the distinct and the dedup shuffle dominated the operator).
    // Instead, emit each pair from exactly ONE band — the lexicographically-
    // first band where the pair met ("met" = the band's blocks all agree,
    // and under sub-splitting neither endpoint was hashed away from the
    // other) — and skip the duplicate-eliminating shuffle entirely. Exact,
    // not a heuristic: met-ness is decidable in-join from the two
    // signatures + ids + the census, every copy of the pair computes the
    // same first-met band, and the copy produced BY that band exists by
    // definition — so exactly one copy survives and the output set is
    // identical to the emit-all + distinct() plan's.
    //
    // Codegen shape: the per-band agreement test is a 2-op mask test of a
    // single 64-bit block-agreement bitmask column (computed once per join
    // row from <= 64 shift/mask terms, one per block — numBlocks is capped
    // at 64 above), NOT a (blocks−maxDist)-conjunct
    // shift chain per band — so the band-selection CaseWhen stays far under
    // codegen method-size limits even at the 256-table geometry ceiling.
    val xorSig = col("simhash").bitwiseXOR(col("simhash2"))
    def blockAgreeMask: Column = (0 until blocks).map { i =>
      when(shiftright(xorSig, offsets(i))
        .bitwiseAND(lit((1L << widths(i)) - 1)) === 0L, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val subsetMasks = subsets.map(_.map(1L << _).sum)
    def bandAgrees(si: Int): Column =
      col("am").bitwiseAND(lit(subsetMasks(si))) === lit(subsetMasks(si))
    // Evaluation-position fence (measured, round 14): without it Catalyst
    // pushes the band-selection CaseWhen INTO the SortMergeJoin condition —
    // inlining the agreement-mask sum once per band — and the condition
    // grows past the codegen method limit, so the WHOLE join predicate
    // (hamming test included) falls back to interpreted evaluation on
    // every raw bucket candidate: 19.7s vs 1.4s for the identical
    // join+hamming at sf0.1. The fence is the always-true nondeterministic
    // conjunct `spark_partition_id() >= 0` INSIDE the selection filter: a
    // nondeterministic predicate is never pushed through the projection or
    // into the join (and the column it references can't be pruned away),
    // so the join-time conjuncts stay the equi-keys, id<id2 and the
    // one-instruction hamming test — small enough to stay codegen'd — and
    // band selection runs once per SURVIVOR, referencing `am` as a
    // computed-once column.
    def fencedBandSelect(joined: DataFrame, extra: Map[String, Column],
                         minMet: Column): DataFrame = joined
      .withColumn("dist", bit_count(xorSig))
      .filter(col("dist") <= maxDist)
      .withColumns(Map("__fence" -> spark_partition_id(),
        "am" -> blockAgreeMask) ++ extra)
      .filter(col("ci") === minMet && col("__fence") >= 0)
      .select(col("x.id").as("d1"), col("id2").as("d2"), col("dist"))

    if (hot.isEmpty) {
      // FAST PATH — no hot buckets (the deployment norm: autoSimHashBlocks
      // holds bucket populations near targetBucket ≪ maxBucket): a pair
      // met a band iff the band's blocks agree, so first-met = first
      // agreeing, with no census consulted.
      val minBand = subsets.indices.foldRight(lit(-1)) { (si, rest) =>
        when(bandAgrees(si), lit(si)).otherwise(rest)
      }
      fencedBandSelect(
        blocked.as("x")
          .join(blocked.select(col("id").as("id2"), col("simhash").as("simhash2"),
            col("ci").as("ci2"), col("cv").as("cv2")).as("y"),
            col("ci") === col("ci2") && col("cv") === col("cv2") &&
              col("x.id") < col("id2")),
        Map.empty, minBand)
    } else if (sigRows < emitAllBelowRows) {
      // SMALL-CORPUS HOT PATH — emit-all + distinct(). Below the crossover
      // the survivor set is small enough that the duplicate-eliminating
      // shuffle is cheaper than min-band's per-candidate band selection
      // (measured: 4.4 s vs 6.9 s at sf0.1 on the q_ext_dedup4 config).
      // Output-identical to the min-band plan: a pair is emitted from band
      // si iff si's blocks agree AND the sub-split keeps both endpoints
      // together there — the same met-at-si predicate — and distinct()
      // collapses the per-band copies (DedupSpec proves set equality on a
      // census-active fixture both sides of the switch).
      val sub = blocked.join(broadcast(hot), Seq("ci", "cv"), "left")
        .withColumn("sub", pmod(xxhash64(col("id")), coalesce(col("nsub"), lit(1L))))
        .select(col("id"), col("simhash"), col("ci"), col("cv"), col("sub"))
      sub.as("x")
        .join(sub.select(col("id").as("id2"), col("simhash").as("simhash2"),
          col("ci").as("ci2"), col("cv").as("cv2"), col("sub").as("sub2")).as("y"),
          col("ci") === col("ci2") && col("cv") === col("cv2") &&
            col("sub") === col("sub2") && col("x.id") < col("id2"))
        .select(col("x.id").as("d1"), col("id2").as("d2"),
          bit_count(col("simhash").bitwiseXOR(col("simhash2"))).as("dist"))
        // filter BEFORE the dedup shuffle: only the hamming<=maxDist
        // survivors (output-sized) need the distinct
        .filter(col("dist") <= maxDist)
        .distinct()
    } else {
      // HOT PATH — at least one bucket exceeded maxBucket, so its members
      // are deterministically sub-split and a pair can be split apart in
      // one agreeing band yet still meet in another. Met-at-si is still
      // in-join decidable: blocks agree AND (the band's bucket is not hot,
      // or xxhash64(id) lands both endpoints in the same sub-bucket —
      // nsub read from a per-id map of that id's HOT bands only). When the
      // pair agrees at si both endpoints share the bucket, so the LEFT
      // endpoint's map alone answers hotness. The map rows are bounded by
      // the hot buckets' total membership (a subset of the blocked frame —
      // linear), and each map holds only the id's hot bands (<= #tables
      // entries, near-empty off the template clusters). Pairs split apart
      // in EVERY agreeing band never meet anywhere and are dropped —
      // exactly the emit-all plan's bounded-sample backstop semantics.
      val hotPerId = blocked.join(broadcast(hot), Seq("ci", "cv"))
        .groupBy("id")
        .agg(map_from_entries(collect_list(struct(col("ci"), col("nsub")))).as("hm"))
      val sigH = sig.join(hotPerId, Seq("id"), "left")
      val xSide = sigH
        .select(col("id"), col("simhash"), col("hm"),
          explode(array(bands: _*)).as("ch"))
        .select(col("id"), col("simhash"), col("hm"),
          col("ch.ci").as("ci"), col("ch.cv").as("cv"))
        .join(broadcast(hot), Seq("ci", "cv"), "left")
        .withColumn("sub", pmod(xxhash64(col("id")), coalesce(col("nsub"), lit(1L))))
        .select("id", "simhash", "hm", "ci", "cv", "sub")
      val ySide = blocked.join(broadcast(hot), Seq("ci", "cv"), "left")
        .withColumn("sub", pmod(xxhash64(col("id")), coalesce(col("nsub"), lit(1L))))
        .select(col("id").as("id2"), col("simhash").as("simhash2"),
          col("ci").as("ci2"), col("cv").as("cv2"), col("sub").as("sub2"))
      // not-split-at-si: the band's bucket is hot for the pair iff the left
      // endpoint's hot map holds si (they share the bucket when agreeing);
      // a missing key makes element_at null and coalesce says "not hot".
      def notSplit(si: Int): Column = coalesce(
        pmod(col("hx"), element_at(col("hm"), si)) ===
          pmod(col("hy"), element_at(col("hm"), si)),
        lit(true))
      val minMetBand = subsets.indices.foldRight(lit(-1)) { (si, rest) =>
        when(bandAgrees(si) && notSplit(si), lit(si)).otherwise(rest)
      }
      fencedBandSelect(
        xSide.as("x")
          .join(ySide.as("y"),
            col("ci") === col("ci2") && col("cv") === col("cv2") &&
              col("sub") === col("sub2") && col("x.id") < col("id2")),
        Map("hx" -> xxhash64(col("x.id")), "hy" -> xxhash64(col("id2"))),
        minMetBand)
    }
  }
}
