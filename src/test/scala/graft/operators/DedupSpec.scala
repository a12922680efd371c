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

  test("MinHash store compaction: one segment, identical probes, markers carried forward") {
    val dir = "target/tmp/minhash_store/spec_compact"
    val fsPath = new org.apache.hadoop.fs.Path(dir)
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(fsPath, true)
    val mk = (id: Long) => (id, s"alpha beta gamma delta epsilon zeta eta doc$id")
    val probe = Seq((99L, mk(1L)._2)).toDF("doc_id", "text")
    Dedup.appendToMinHashStore(Seq(mk(1)).toDF("doc_id", "text"),
      "doc_id", "text", dir, batchMarker = Some("0"))
    Dedup.appendToMinHashStore(Seq(mk(2)).toDF("doc_id", "text"),
      "doc_id", "text", dir, batchMarker = Some("1"))
    Dedup.appendToMinHashStore(Seq(mk(3)).toDF("doc_id", "text"),
      "doc_id", "text", dir, batchMarker = Some("2"))
    def pairs() = Dedup.minHashPairsAgainstStore(probe, "doc_id", "text", dir, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def segNames() = fs.listStatus(fsPath).map(_.getPath.getName)
      .filter(_.startsWith("seg-")).toSeq
    val before = pairs()
    // the one-word tail edit keeps jac = 5/7 ~ 0.714 >= 0.6 for every doc
    assert(before === Set((99L, 1L), (99L, 2L), (99L, 3L)), s"fixture drifted: $before")
    assert(segNames().size === 3)
    assert(Dedup.compactMinHashStore(spark, dir) === 3)
    assert(segNames().size === 1)
    assert(pairs() === before)
    assert(Dedup.compactMinHashStore(spark, dir) === 0) // already compact
    // a re-delivered pre-compaction batch still no-ops: its marker moved
    // into the compacted segment
    Dedup.appendToMinHashStore(Seq(mk(2)).toDF("doc_id", "text"),
      "doc_id", "text", dir, batchMarker = Some("1"))
    assert(segNames().size === 1, "re-delivered batch appended after compaction")
  }

  test("MinHash store compaction crash drill: every window repairs to an equivalent store") {
    val dirBase = "target/tmp/minhash_store/spec_compact_crash"
    val conf = spark.sessionState.newHadoopConf()
    def build(dir: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(conf).delete(p, true)
      (1L to 3L).foreach { i =>
        Dedup.appendToMinHashStore(
          Seq((i, s"alpha beta gamma delta epsilon zeta eta doc$i"))
            .toDF("doc_id", "text"),
          "doc_id", "text", dir, batchMarker = Some((i - 1).toString))
      }
    }
    val probe = Seq((99L, "alpha beta gamma delta epsilon zeta eta doc1"))
      .toDF("doc_id", "text")
    def pairs(dir: String) =
      Dedup.minHashPairsAgainstStore(probe, "doc_id", "text", dir, 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // window 1: crash after a PARTIAL retire -> roll back
    val d1 = s"$dirBase/w1"
    build(d1)
    val want = pairs(d1)
    intercept[java.io.IOException] {
      Dedup.compactMinHashStoreImpl(spark, d1, crashAfterRetires = 1)
    }
    val acts1 = Dedup.recoverMinHashStore(spark, d1)
    assert(acts1.exists(_.startsWith("rollback-")), s"got $acts1")
    assert(pairs(d1) === want)
    val fs1 = new org.apache.hadoop.fs.Path(d1).getFileSystem(conf)
    assert(fs1.listStatus(new org.apache.hadoop.fs.Path(d1))
      .map(_.getPath.getName).count(_.startsWith("seg-")) === 3)
    // window 2: crash after ALL retires, before promote -> roll forward
    val d2 = s"$dirBase/w2"
    build(d2)
    intercept[java.io.IOException] {
      Dedup.compactMinHashStoreImpl(spark, d2, crashAfterRetires = 3)
    }
    val acts2 = Dedup.recoverMinHashStore(spark, d2)
    assert(acts2.exists(_.startsWith("forward-")), s"got $acts2")
    assert(pairs(d2) === want)
    val fs2 = new org.apache.hadoop.fs.Path(d2).getFileSystem(conf)
    assert(fs2.listStatus(new org.apache.hadoop.fs.Path(d2))
      .map(_.getPath.getName).count(_.startsWith("seg-")) === 1)
    // recovery is idempotent in both windows
    assert(Dedup.recoverMinHashStore(spark, d1).isEmpty)
    assert(Dedup.recoverMinHashStore(spark, d2).isEmpty)
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
    // EXTRA blocks (numBlocks > maxDist + 1) widen the band keys via
    // combination banding without giving up completeness: same true pair,
    // unequal 12/13-bit blocks, C(5,2) = 10 bands
    val pairs5 = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3, numBlocks = 5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs5.contains((1L, 4L)))
  }

  test("simHashPairs hot path: single emission equals the met-band model on a census-active corpus") {
    // Template-heavy corpus: two near-identical 12-member clusters (their
    // signatures agree on most blocks, so cross-cluster buckets mix) plus
    // unrelated filler. maxBucket = 3 makes every cluster bucket hot
    // (census ACTIVE — the round-14 path under test), with band-varying
    // nsub where clusters share a bucket.
    val template = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = (
      (0L until 12L).map(i => (i, template + " clusterone")) ++
      (20L until 32L).map(i => (i, template + " clustertwo")) ++
      (100L until 105L).map(i => (i, s"totally unrelated words $i about engines " +
        s"and shuffles and partitions number$i item$i"))
    ).toDF("doc_id", "text")
    val maxBucket = 3L
    // emitAllBelowRows = 0 forces the single-emission min-band hot path —
    // the plan a >= crossover corpus takes (the default would route this
    // 29-doc fixture to the emit-all branch)
    val out = Dedup.simHashPairs(corpus, "doc_id", "text", maxDist = 7,
      numBlocks = 8, maxBucket = maxBucket, emitAllBelowRows = 0L).collect()
    // no duplicate-eliminating shuffle -> the operator itself must emit
    // each surviving pair exactly once
    val outKeys = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(outKeys.length === outKeys.distinct.length)

    // executable model of the emit-all + distinct() semantics, computed
    // from the ACTUAL signatures/hashes (8 single-block bands at this
    // geometry): pair survives iff dist <= 7 and SOME band has equal block
    // values AND (bucket not hot OR both ids land in the same sub-bucket)
    val sig = Dedup.simHash(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h = corpus.select(col("doc_id"), xxhash64(col("doc_id")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def block(s: Long, b: Int): Long = (s >>> (8 * b)) & 0xffL
    val census = (for { id <- sig.keys.toSeq; b <- 0 until 8 }
      yield (b, block(sig(id), b))).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(census.values.exists(_ > maxBucket), "fixture must activate the census")
    def metBands(a: Long, b: Long): Seq[Int] = (0 until 8).filter { bi =>
      block(sig(a), bi) == block(sig(b), bi) && {
        val m = census((bi, block(sig(a), bi)))
        m <= maxBucket ||
          java.lang.Math.floorMod(h(a), math.ceil(m.toDouble / maxBucket).toLong) ==
            java.lang.Math.floorMod(h(b), math.ceil(m.toDouble / maxBucket).toLong)
      }
    }
    val ids = sig.keys.toSeq.sorted
    val model = for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(sig(i) ^ sig(j)) <= 7
      if metBands(i, j).nonEmpty
    } yield (i, j)
    assert(outKeys.toSet === model.toSet)
    // the fixture must exercise the cross-band rescue the min-met rule has
    // to preserve: some surviving pair is sub-split apart in an AGREEING
    // band yet meets in a later one
    val rescued = model.exists { case (i, j) =>
      val agreeing = (0 until 8).filter(bi => block(sig(i), bi) == block(sig(j), bi))
      val met = metBands(i, j)
      agreeing.exists(bi => !met.contains(bi)) && met.nonEmpty
    }
    assert(rescued, "fixture must contain a pair split in one hot band but met in another")
    // precision: the dist column is the true hamming distance
    out.foreach { r =>
      assert(r.getAs[Int]("dist") ===
        java.lang.Long.bitCount(sig(r.getLong(0)) ^ sig(r.getLong(1))))
    }
    // size-switch equality (round 15): the emit-all + distinct branch —
    // what this sub-crossover corpus takes by default — must produce the
    // SAME pair set as the min-band plan proved against the model above
    val outEmitAll = Dedup.simHashPairs(corpus, "doc_id", "text", maxDist = 7,
        numBlocks = 8, maxBucket = maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(outEmitAll.length === outEmitAll.distinct.length)
    assert(outEmitAll.toSet === outKeys.toSet)
  }

  test("autoSimHashBlocks holds the completeness floor and widens keys with the corpus") {
    // small corpora keep the classic d+1 geometry exactly
    assert(Dedup.autoSimHashBlocks(1000L, maxDist = 7) === 8)
    assert(Dedup.autoSimHashBlocks(50000L, maxDist = 7) === 8)
    // 100x bench scale: one extra block -> 14-bit keys across C(9,2)=36
    // tables instead of 8-bit keys across 8
    assert(Dedup.autoSimHashBlocks(500000L, maxDist = 7) === 9)
    assert(Dedup.autoSimHashBlocks(5000000L, maxDist = 7) === 10)
    // the table-count ceiling stops combinatorial growth: C(11,4)=330 > 256,
    // so a 500M corpus maxes out at B=10 and the maxBucket backstop takes over
    assert(Dedup.autoSimHashBlocks(500000000L, maxDist = 7) === 10)
    // 16-bit single-block keys already cover small corpora at d=3
    assert(Dedup.autoSimHashBlocks(500000L, maxDist = 3) === 4)
    assert(Dedup.autoSimHashBlocks(100000000L, maxDist = 3) === 5)
    // auto geometry (numBlocks = 0 default) still finds the planted pair
    val auto = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 7)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.contains((1L, 4L)))
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
