package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight again"),
    (2L, "the quick brown fox jumps over the lazy dog tonight today"),   // near-dup of 1
    (3L, "completely different words about spark engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog tonight again")    // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup keeps deterministic min id per group") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
    assert(out.count() === 3)
    val dupGroup = out.filter(col("n_dups") === 2).head()
    assert(dupGroup.getAs[Long]("keep_id") === 1L)
  }

  test("jaccardPairs finds near and exact dups above threshold, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.6, shingleN = 3)
      .orderBy("d1", "d2").collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((1L, 4L)))            // exact dup, jac = 1.0
    assert(keys.contains((1L, 2L)))            // near dup
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    val exact = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 4L).get
    assert(exact.getAs[Double]("jac") === 1.0)
  }

  test("hot-shingle df cap bounds candidate fan-in; rare-shingle near-dups survive the cap") {
    // 20 docs sharing one hot sentence prefix; each tail is unique, so every
    // cross-doc shared shingle is hot (df = 20)
    val hot = (10L to 29L).map(i =>
      (i, s"common shared shingle text here unique$i tail$i end$i")).toDF("doc_id", "text")
    val uncapped = Dedup.jaccardCandidates(hot, "doc_id", "text", shingleN = 3,
      maxShingleDf = 10000).count()
    val capped = Dedup.jaccardCandidates(hot, "doc_id", "text", shingleN = 3,
      maxShingleDf = 5).count()
    assert(uncapped === 20L * 19 / 2) // hot shingles pair every doc with every other
    assert(capped === 0L)             // the cap drops all of it
    // true near-dups share plenty of rare shingles — unaffected by a tight cap
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6, shingleN = 3, maxShingleDf = 5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)) && pairs.contains((1L, 2L)))
  }

  test("capped jaccardPairs emits exact jac values (hot-shingle correction term)") {
    // 10 docs share a hot prefix (df=10 > cap=5); docs 100/101 additionally
    // share a rare tail, so their pair forms via rare shingles but its exact
    // intersection includes the hot prefix shingles — the correction term
    val filler = (0L until 8L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta filler$i only$i here$i"))
    val nearDup = Seq(
      (100L, "alpha beta gamma delta epsilon zeta shared rare tail content one"),
      (101L, "alpha beta gamma delta epsilon zeta shared rare tail content two"))
    val corpus = (filler ++ nearDup).toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(corpus, "doc_id", "text", 0.5, shingleN = 3,
        maxShingleDf = 1000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val capped = Dedup.jaccardPairs(corpus, "doc_id", "text", 0.5, shingleN = 3,
        maxShingleDf = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(capped.contains((100L, 101L)))
    // every pair the capped path emits carries the EXACT jac value
    capped.foreach { case (k, v) => assert(math.abs(uncapped(k) - v) < 1e-12,
      s"pair $k capped=$v uncapped=${uncapped(k)}") }
  }

  test("mass-duplicated docs (every shingle hot) are still found by the capped path") {
    // 12 identical copies of one template: with cap=5 every one of their
    // shingles is hot (df=12), so the capped join alone would silently
    // miss all 66 jac=1.0 pairs — the exact failure mode mass-dedup exists
    // for. The hot-heavy banding fallback must recover them, with exact jac.
    val template = (100L until 112L).map(i =>
      (i, "identical template body repeated verbatim across the whole batch"))
    val filler = (0L until 8L).map(i => (i, s"unrelated filler document number$i text$i body$i"))
    val corpus = (template ++ filler).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.9,
        shingleN = 3, maxShingleDf = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val templatePairs = pairs.keySet.filter(p => p._1 >= 100L && p._2 >= 100L)
    assert(templatePairs.size === 12 * 11 / 2,
      s"expected all 66 template pairs, got ${templatePairs.size}")
    templatePairs.foreach(p => assert(pairs(p) === 1.0, s"pair $p jac ${pairs(p)} != 1.0"))
    assert(!pairs.keySet.exists(p => p._1 < 100L || p._2 < 100L), "filler docs paired")
  }

  test("cross-corpus mass duplication survives the cap (jaccardPairsBetween fallback)") {
    val leftDocs = (0L until 8L).map(i =>
      (i, "contaminated evaluation passage shared across train and test splits"))
      .toDF("doc_id", "text")
    val rightDocs = ((100L until 106L).map(i =>
      (i, "contaminated evaluation passage shared across train and test splits")) :+
      (200L, "a clean unrelated training document with its own words entirely"))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairsBetween(leftDocs, rightDocs, "doc_id", "text",
        threshold = 0.9, shingleN = 3, maxShingleDf = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.size === 8 * 6, s"expected 48 cross pairs, got ${pairs.size}")
    pairs.foreach { case (p, j) => assert(j === 1.0, s"pair $p jac $j != 1.0") }
  }

  test("minHashPairs matches exact jaccardPairs at high threshold") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6, shingleN = 3)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashPairs(docs, "doc_id", "text", 0.6, numBands = 16, rowsPerBand = 2, shingleN = 3)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
  }

  test("MinHash store: batch-vs-store pairs match jaccardPairsBetween; appends extend it") {
    val dir = "target/tmp/minhash_store/spec"
    // corpus with a planted near-dup target; batch contains a near-dup of it
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight again"),
      (11L, "completely different words about spark engines and shuffles"),
      (12L, "yet another unrelated document describing parquet footers")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (20L, "the quick brown fox jumps over the lazy dog tonight today"),
      (21L, "nothing like anything stored before in any way whatsoever")
    ).toDF("doc_id", "text")
    Dedup.buildMinHashStore(corpus, "doc_id", "text", dir)
    val got = Dedup.minHashPairsAgainstStore(batch, "doc_id", "text", dir, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Dedup.jaccardPairsBetween(batch, corpus, "doc_id", "text",
        threshold = 0.6, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got.exists { case (d1, d2, _) => d1 == 20L && d2 == 10L })
    // append the batch; a later near-dup of doc 20 must now hit the store
    Dedup.appendToMinHashStore(batch, "doc_id", "text", dir)
    val later = Seq((30L, "the quick brown fox jumps over the lazy dog tonight today"))
      .toDF("doc_id", "text")
    val hits = Dedup.minHashPairsAgainstStore(later, "doc_id", "text", dir, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((30L, 20L)), s"appended doc not found: $hits")
    assert(hits.contains((30L, 10L)))
    // exact dup of an appended doc verifies at jac = 1.0 over stored sets
    val exact = Dedup.minHashPairsAgainstStore(later, "doc_id", "text", dir, threshold = 0.6)
      .filter(col("d2") === 20L).head().getAs[Double]("jac")
    assert(exact === 1.0)
  }

  test("MinHash store rejects mismatched banding params and missing stores") {
    val dir = "target/tmp/minhash_store/spec_params"
    val d = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    Dedup.buildMinHashStore(d, "doc_id", "text", dir, numBands = 16, rowsPerBand = 2)
    intercept[IllegalArgumentException] {
      Dedup.appendToMinHashStore(d, "doc_id", "text", dir, numBands = 8, rowsPerBand = 4)
    }
    intercept[IllegalStateException] {
      Dedup.minHashPairsAgainstStore(d, "doc_id", "text",
        "target/tmp/minhash_store/nowhere", threshold = 0.5)
    }
  }

  test("MinHash store crash drill: staged-but-uncommitted appends are invisible and recoverable; marker replay is a no-op") {
    val dir = "target/tmp/minhash_store/spec_crash"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    Dedup.buildMinHashStore(corpus, "doc_id", "text", dir)
    val probe = Seq((9L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    def pairs() = Dedup.minHashPairsAgainstStore(probe, "doc_id", "text", dir, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = pairs()
    assert(before === Set((9L, 1L)))
    // simulate a crash mid-append: staged segment exists, never renamed in
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/_staging/deadbeef/toks"))
    assert(pairs() === before, "staging debris leaked into the read path")
    assert(Dedup.recoverMinHashStore(spark, dir) === Seq("deadbeef"))
    assert(Dedup.recoverMinHashStore(spark, dir).isEmpty) // idempotent
    assert(pairs() === before)
    // marker-keyed replay: the same batch delivered twice appends ONCE —
    // a double-append would duplicate stored sets and emit duplicate pairs
    val batch = Seq((2L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    Dedup.appendToMinHashStore(batch, "doc_id", "text", dir, batchMarker = Some("b1"))
    Dedup.appendToMinHashStore(batch, "doc_id", "text", dir, batchMarker = Some("b1"))
    val rows = Dedup.minHashPairsAgainstStore(probe, "doc_id", "text", dir, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === rows.distinct.length, s"replay duplicated pairs: ${rows.toSeq}")
    assert(rows.toSet === Set((9L, 1L), (9L, 2L)))
  }

  test("connectedComponents labels every vertex with the min id of its component") {
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 8L), (3L, 9L), (9L, 4L), (4L, 3L))
      .toDF("d1", "d2")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 7L -> 7L, 8L -> 7L,
      3L -> 3L, 9L -> 3L, 4L -> 3L))
  }

  test("connectedComponents fails loudly when a chain outruns maxIter") {
    // path graph 1-2-3-4-5-6: min label needs 5 hops to reach the far end
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("d1", "d2")
    intercept[IllegalStateException](
      Dedup.connectedComponents(chain, maxIter = 2).collect())
    // and converges fine with enough rounds
    val ok = Dedup.connectedComponents(chain, maxIter = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet === Set(1L))
  }

  test("simHash is identical for identical docs and differs across unrelated docs") {
    val sig = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) === sig(4L))
    assert(sig(1L) !== sig(3L))
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("simHashPairs 8-block banding widens the guaranteed distance and rejects bad params") {
    val pairs8 = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 7, numBlocks = 8)
      .collect()
    val keys = pairs8.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((1L, 4L)))
    // precision of the dist filter: nothing past maxDist leaks through
    assert(pairs8.forall(_.getAs[Int]("dist") <= 7))
    // banding completeness is only claimed for maxDist < numBlocks
    intercept[IllegalArgumentException] {
      Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 8, numBlocks = 8)
    }
    intercept[IllegalArgumentException] {
      Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3, numBlocks = 5)
    }
  }

  test("simHashPairs hot-bucket sub-split bounds fan-out and degrades gracefully") {
    // 40 identical docs: every (block, value) bucket holds all 40 signatures,
    // so with maxBucket = 10 each block splits into ceil(40/10) = 4 subs.
    // A pair survives if its two ids share a sub in ANY of the 8 blocks
    // (per-block subs are identical here since nsub is equal across blocks,
    // so survival = same xxhash64 residue); the point is the candidate join
    // is bounded per bucket while most identical pairs still surface.
    val mass = (100L to 139L).map(i => (i, "the very same template document body"))
      .toDF("doc_id", "text")
    val all = Dedup.simHashPairs(mass, "doc_id", "text", maxDist = 7, numBlocks = 8)
      .count()
    assert(all === 40L * 39 / 2) // un-split: every identical pair found
    val split = Dedup.simHashPairs(mass, "doc_id", "text", maxDist = 7,
      numBlocks = 8, maxBucket = 10L).count()
    assert(split < all, "sub-split must drop some hot-bucket pairs (bounded fan-out)")
    // identical signatures make every block split the same way, so survival
    // is one same-residue-of-4 test (~1/4 of pairs expected); assert a loose
    // floor, not the exact census
    assert(split >= all / 8, s"sub-split kept only $split of $all identical pairs")
  }
}
