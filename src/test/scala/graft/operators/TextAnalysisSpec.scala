package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("ngram decontamination equals the plain exact-overlap join (bloom is sound)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val eval = docs.filter(col("doc_id") % 10 === 0)
    val got = TextAnalysis.ngramContamination(train, eval, "doc_id", "text",
        shingleN = 3, expectedEvalNgrams = 50000L)
      .orderBy("doc_id").collect().toSeq
    // reference computation with NO bloom prefilter: plain exact join
    val evTok = eval.select(explode(TextFunctions.shingles(col("text"), 3)).as("tok")).distinct()
    val trTok = train.select(col("doc_id"),
      explode(array_distinct(TextFunctions.shingles(col("text"), 3))).as("tok"))
    val sz = trTok.groupBy("doc_id").agg(count(lit(1)).as("n_ngrams"))
    val want = trTok.join(evTok, "tok")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"), min(col("tok")).as("first_hit"))
      .join(sz, "doc_id")
      .select(col("doc_id"), col("n_hits"), col("n_ngrams"),
        round(col("n_hits") / col("n_ngrams"), 4).as("contamination"), col("first_hit"))
      .orderBy("doc_id").collect().toSeq
    assert(got === want)
    assert(got.nonEmpty, "fixture degenerate: no contaminated docs")
    // contamination is a share: (0, 1]; hit counts never exceed the doc size
    assert(got.forall(r => r.getLong(1) <= r.getLong(2)))
    // the fixture must exercise the interesting region (partial overlap)
    assert(got.exists(r => r.getLong(1) < r.getLong(2)), "all docs fully contaminated")
    // clean docs are absent, not zero-rowed
    assert(got.size < train.count())
  }

  test("duplicatedNgramSpans merges overlapping spans and reports coverage") {
    import spark.implicits._
    // doc 1 repeats 'a b c' twice (positions 1 and 4 -> adjacent spans
    // merge into one 6-token island); doc 2 shares the 3-gram once; doc 3
    // is clean; doc 4 is too short to shingle
    val docs = Seq(
      (1L, "a b c a b c x"),
      (2L, "a b c q r s"),
      (3L, "u v w x y z"),
      (4L, "a b")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.duplicatedNgramSpans(docs, "doc_id", "text", shingleN = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) === ((7L, 1, 6L, 0.8571)))
    assert(out(2L) === ((6L, 1, 3L, 0.5)))
    assert(out(3L) === ((6L, 0, 0L, 0.0)))
    assert(out(4L) === ((2L, 0, 0L, 0.0)))
  }

  test("phrase search counts exact positional occurrences, overlapping and with repeated words") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a c"),      // "a b a" occurs at 1 and (overlapping) 3
      (2L, "a b a"),            // one occurrence
      (3L, "b a b a"),          // one occurrence at position 2
      (4L, "a b c a b"),        // zero: no "a b a"
      (5L, "x y z")             // zero, unrelated
    ).toDF("doc_id", "text")
    val phrase = Seq("a b a").toDF("g")
    val out = TextAnalysis.phraseOccurrences(docs, "doc_id", "text", phrase)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set((1L, "a b a", 2L), (2L, "a b a", 1L), (3L, "a b a", 1L)))
  }

  test("phrase search equals brute-force sliding-window counts on generated corpora (property)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny alphabet => dense repeats, overlaps, and repeated-word phrases
    val docGen: Gen[List[String]] =
      Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    (0 until 12).foreach { i =>
      val seed = Seed(i.toLong * 7 + 1)
      val docs = (1L to 8L).map { id =>
        (id, docGen(Gen.Parameters.default, seed.reseed(id)).get.mkString(" "))
      }
      val phraseWords = docGen(Gen.Parameters.default, seed.reseed(99))
        .get.take(3).padTo(2, "a") // length 2-3
      val phrase = phraseWords.mkString(" ")
      val expected = docs.flatMap { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val n = toks.sliding(phraseWords.length).count(_.sameElements(phraseWords))
        if (n > 0) Some((id, phrase, n.toLong)) else None
      }.toSet
      val got = TextAnalysis.phraseOccurrences(docs.toDF("doc_id", "text"),
          "doc_id", "text", Seq(phrase).toDF("g"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expected, s"iteration $i, phrase '$phrase', docs $docs")
    }
  }

  test("topPhrase picks the most frequent positional 3-gram with lexicographic tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r p q r"),      // "p q r" x2, "q r p" x1, "r p q" x1
      (2L, "p q r s")           // "p q r" x1 -> total 3
    ).toDF("doc_id", "text")
    val g = TextAnalysis.topPhrase(docs, "text", 3).collect().map(_.getString(0))
    assert(g.toSeq === Seq("p q r"))
  }
}
