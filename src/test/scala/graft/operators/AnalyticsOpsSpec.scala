package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit gates for the analytics operator batch: TextRank (BM25/TF-IDF),
  * Graph.pageRank, Quantize, and Curation.sampleFixedPerStratum. Each test
  * pins a hand-computable case so the oracle queries aren't the only line
  * of defense.
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- TextRank --------------------------------------------------------

  val corpus = Seq(
    (1L, "spark spark spark join"),
    (2L, "spark join hash join"),
    (3L, "hash table scan scan"),
    (4L, "totally unrelated words here")
  ).toDF("doc_id", "text")

  test("bm25 ranks the term-dense doc first and omits docs without any term") {
    val out = TextRank.bm25(corpus, "doc_id", "text", Seq("spark"), topK = 10).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out(0).getDouble(1) > out(1).getDouble(1))
  }

  test("bm25 matches the closed form on a single-term query") {
    // N=4 docs with tokens, df(spark)=2, idf = ln((4-2+0.5)/(2+0.5)+1) = ln 2.
    // doc1: tf=3, dl=4, avgdl=4 -> norm = 3 + 1.2*(0.25+0.75*1) = 4.2
    val out = TextRank.bm25(corpus, "doc_id", "text", Seq("spark"), topK = 1).head()
    val expected = math.log(2.0) * 3 * 2.2 / 4.2
    assert(math.abs(out.getDouble(1) - BigDecimal(expected).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("tfIdfTopTerms returns k terms per doc, rank 1 = highest tfidf, ties by token") {
    val out = TextRank.tfIdfTopTerms(corpus, "doc_id", "text", k = 2)
    val rows = out.collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length <= 2))
    // doc 1: spark tf=3 idf=ln(4/2); join tf=1 idf=ln(4/2) -> spark first
    val d1 = rows.filter(_.getLong(0) == 1L).sortBy(_.getInt(2))
    assert(d1.map(_.getString(1)).toSeq === Seq("spark", "join"))
    // terms appearing in every doc (df = N) score ln(1) = 0, never negative
    assert(rows.forall(_.getDouble(3) >= 0.0))
  }

  test("rrfFuse sums reciprocal ranks across lists and counts contributing lists") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val dense = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = TextRank.rrfFuse(Seq(lex, dense), "id", "rank")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(out(20L)._1 === 2)
    assert(math.abs(out(20L)._2 - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(out(10L) === ((1, 1.0 / 61)))
    assert(out(40L) === ((1, 1.0 / 62)))
    // a doc in both lists at mid ranks outranks either single-list head:
    // the fusion property hybrid retrieval exists for
    assert(out(20L)._2 > out(10L)._2)
  }

  // ---- Graph.pageRank --------------------------------------------------

  test("pageRank on a symmetric 2-cycle gives 0.5 each and sums to 1") {
    val edges = Seq((1L, 2L, 1.0), (2L, 1L, 1.0)).toDF("src", "dst", "w")
    val pr = Graph.pageRank(edges, "src", "dst", "w", iterations = 3).collect()
    assert(pr.length === 2)
    pr.foreach(r => assert(math.abs(r.getDouble(1) - 0.5) < 1e-9))
  }

  test("pageRank weights split proportionally and iteration matches hand-rolled update") {
    // star: 1 -> 2 (w 3), 1 -> 3 (w 1); 2 -> 1, 3 -> 1 (so no dangling mass)
    val edges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0))
      .toDF("src", "dst", "w")
    val pr1 = Graph.pageRank(edges, "src", "dst", "w", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val third = 1.0 / 3
    val base = 0.15 * third
    assert(math.abs(pr1(1L) - (base + 0.85 * (third + third))) < 5e-7)
    assert(math.abs(pr1(2L) - (base + 0.85 * third * 0.75)) < 5e-7)
    assert(math.abs(pr1(3L) - (base + 0.85 * third * 0.25)) < 5e-7)
    // mass conserved (no sinks): ranks sum to 1 at any iteration count
    val sum5 = Graph.pageRank(edges, "src", "dst", "w", iterations = 5)
      .agg(org.apache.spark.sql.functions.sum("rank")).head().getDouble(0)
    assert(math.abs(sum5 - 1.0) < 1e-4)
  }

  // ---- Quantize --------------------------------------------------------

  test("quantization error is zero for constant vectors and bounded by half a step") {
    val vecs = Seq(
      (1L, Array(2.0f, 2.0f, 2.0f)),          // constant -> exact
      (2L, Array(0.0f, 0.25f, 0.6f, 1.0f)),   // generic
      (3L, Array(-1.0f, 0.0f, 1.0f))          // grid-aligned at 256 levels? no: span 2
    ).toDF("id", "embedding")
    val out = Quantize.reconstructionError(vecs, "embedding", levels = 256)
      .withColumn("half_step",
        (array_max(transform(col("embedding"), x => x.cast("double"))) -
          array_min(transform(col("embedding"), x => x.cast("double")))) / 510.0)
      .collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Double]("mean_abs_err"), r.getAs[Double]("half_step"))).toMap
    assert(byId(1L)._1 === 0.0)
    assert(byId(2L)._1 <= byId(2L)._2 + 1e-12)
    assert(byId(3L)._1 <= byId(3L)._2 + 1e-12)
  }

  test("subvector (PQ) quantization beats one global grid on range-skewed vectors") {
    // subvector 1 spans [0,1], subvector 2 spans [0,1000]: a global 16-level
    // grid wrecks the small subspace; per-subvector grids keep both fine
    val vecs = Seq((1L, Array(0.0f, 0.33f, 0.66f, 1.0f, 0.0f, 330.0f, 660.0f, 1000.0f)))
      .toDF("id", "embedding")
    val pq = Quantize.subvectorReconstructionError(vecs, "embedding", m = 2, subLen = 4,
      levels = 16).head().getAs[Double]("pq_mean_abs_err")
    val flat = Quantize.reconstructionError(vecs, "embedding", levels = 16)
      .head().getAs[Double]("mean_abs_err")
    assert(pq < flat)
    // each subvector error respects its own half-step bound
    assert(pq <= (1.0 / 30 + 1000.0 / 30) / 2 + 1e-12)
  }

  test("quantization error shrinks as levels grow") {
    val vecs = Seq((1L, Array(0.13f, 0.57f, 0.91f, 0.04f))).toDF("id", "embedding")
    def err(levels: Int): Double =
      Quantize.reconstructionError(vecs, "embedding", levels)
        .head().getAs[Double]("mean_abs_err")
    assert(err(256) < err(16))
    assert(err(16) < err(4))
  }

  // ---- TextRank.unigramLogLoss ----------------------------------------

  test("unigramLogLoss matches the closed form and carries keep columns") {
    val docs = Seq((1L, "en", "a a b"), (2L, "de", "b c")).toDF("doc_id", "lang", "text")
    val out = TextRank.unigramLogLoss(docs, "doc_id", "text", keep = Seq("lang"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getAs[Double]("log_loss"))).toMap
    // corpus: a=2, b=2, c=1, T=5
    assert(out(1L)._1 === "en")
    assert(math.abs(out(1L)._2 - -math.log(2.0 / 5)) < 1e-12)          // all 3 toks have p=0.4
    assert(math.abs(out(2L)._2 - (-math.log(2.0 / 5) - math.log(1.0 / 5)) / 2) < 1e-12)
  }

  // ---- Curation.sampleWeighted ----------------------------------------

  test("sampleWeighted returns exactly k rows, stable under repartition, keys non-positive") {
    val df = (1 to 200).map(i => (i.toLong, 10.0 + (i % 7))).toDF("id", "w")
    val s1 = Curation.sampleWeighted(df, "id", col("w"), k = 25)
    val rows = s1.collect()
    assert(rows.length === 25)
    assert(rows.forall(_.getAs[Double]("es_key") <= 0.0))
    val s2 = Curation.sampleWeighted(df.repartition(11), "id", col("w"), k = 25)
    assert(rows.map(_.getLong(0)).sorted.toSeq ===
      s2.collect().map(_.getLong(0)).sorted.toSeq)
    // k larger than the table: every row survives
    assert(Curation.sampleWeighted(df, "id", col("w"), k = 500).count() === 200L)
  }

  test("sampleWeighted favors heavier rows at equal md5 draws") {
    // two ids with the SAME uniform draw can't exist; instead verify the
    // monotonicity contract directly: raising a row's weight never lowers
    // its rank, by sampling the same ids under two weight assignments
    val df = (1 to 100).map(i => (i.toLong, 1.0)).toDF("id", "w")
    val flat = Curation.sampleWeighted(df, "id", col("w"), k = 100)
      .collect().map(_.getLong(0)).toSeq
    val boosted = Curation.sampleWeighted(
        df.withColumn("w", when(col("id") === flat.last, lit(1000.0)).otherwise(col("w"))),
        "id", col("w"), k = 100).collect().map(_.getLong(0)).toSeq
    assert(boosted.indexOf(flat.last) < flat.indexOf(flat.last))
  }

  // ---- Curation.sampleFixedPerStratum ---------------------------------

  test("sampleFixedPerStratum returns exactly min(k, |stratum|) rows, stable under repartition") {
    val df = (1 to 40).map(i => (i.toLong, if (i <= 30) "big" else "small"))
      .toDF("id", "grp")
    val s1 = Curation.sampleFixedPerStratum(df, "id", "grp", k = 7)
    val counts = s1.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("big" -> 7L, "small" -> 7L))
    val s2 = Curation.sampleFixedPerStratum(df.repartition(13), "id", "grp", k = 7)
    assert(s1.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      s2.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }
}
