package graft.functions

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val tok = BpeTokenizer.default

  test("round-trip: token concatenation reproduces every word exactly") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    val words = (1 to 500).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq("the", "there", "sings", "standing", "anderson", "a", "", "of", "to")
    words.foreach { w =>
      assert(tok.encodeWord(w).mkString("") === w, s"round-trip broke on '$w'")
    }
  }

  test("determinism and multi-level merges") {
    val texts = Seq("the cat sings in the rain", "standing orders are the rest",
      "a1b2 #tag! the-end")
    texts.foreach(t => assert(tok.encode(t).toSeq === tok.encode(t).toSeq))
    // three-level chain: i+n -> in+g -> ing+s
    assert(tok.encodeWord("sings").toSeq === Seq("s", "ings"))
    assert(tok.encodeWord("the").toSeq === Seq("the"))
    // counting = encode length, words segmented like bpeishPattern
    assert(tok.countTokens("the cat") === tok.encode("the cat").length)
  }

  test("greedy encode equals the rank-ordered replacement pass (the oracle-mirror semantics)") {
    // independent reference: apply each merge IN RANK ORDER to completion
    // with left-to-right non-overlapping replacement over one-char symbol
    // aliases — exactly what the DuckDB replace() chain computes
    val alias: Map[String, Char] =
      tok.merges.zipWithIndex.map { case ((l, r), i) => (l + r) -> ('A' + i).toChar }.toMap
    def repr(sym: String): String = if (sym.length == 1) sym else alias(sym).toString
    def referenceCount(word: String): Int =
      tok.merges.foldLeft(word) { case (acc, (l, r)) =>
        acc.replace(repr(l) + repr(r), alias(l + r).toString)
      }.length
    val rnd = new scala.util.Random(7)
    val letters = "aeinorst dghlmf" // weighted toward the fixture's pairs
    val words = (1 to 2000).map(_ =>
      (1 to (1 + rnd.nextInt(14))).map(_ => letters(rnd.nextInt(letters.length)))
        .mkString.replace(" ", "e"))
    words.foreach { w =>
      assert(tok.encodeWord(w).length === referenceCount(w),
        s"greedy vs in-order divergence on '$w': ${tok.encodeWord(w).toSeq}")
    }
  }

  test("ill-formed merges tables are rejected loudly") {
    val ex = intercept[IllegalArgumentException](
      new BpeTokenizer(Seq(("th", "e"), ("t", "h"))))
    assert(ex.getMessage.contains("producer-before-consumer"), ex.getMessage)
    intercept[IllegalArgumentException](new BpeTokenizer(Nil))
  }

  test("native expressions match the engine and stay null-safe") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "The cat SINGS in the rain"),
      (2L, "standing orders, the rest!"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val rows = docs.select($"id",
        TextFunctions.bpeTokenCount($"text").as("n"),
        size(TextFunctions.bpeTokens($"text")).as("m"))
      .orderBy("id").collect()
    assert(rows(0).getInt(1) === tok.countTokens("The cat SINGS in the rain"))
    assert(rows(0).getInt(1) === rows(0).getInt(2)) // tokens array agrees with count
    assert(rows(1).getInt(1) === rows(1).getInt(2))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
    // subword chunking via the tokenizer seam
    val chunks = docs.filter($"id" === 1)
      .select(explode(TextFunctions.chunkTokensBy(
        TextFunctions.bpeTokens($"text"), chunkSize = 4, overlap = 0)).as("c"))
      .select($"c.chunk", $"c.n_toks").collect()
    val expected = tok.encode("The cat SINGS in the rain").grouped(4).toSeq
    assert(chunks.length === expected.length)
    chunks.zip(expected).foreach { case (row, exp) =>
      assert(row.getString(0) === exp.mkString(" "))
      assert(row.getInt(1) === exp.length)
    }
  }

  test("LARGE resource table: well-formed at load, round-trips, greedy equals in-order replacement") {
    // the production-sized tier (q_ext_tok3): the resource load re-runs the
    // producer-before-consumer require, and the greedy ≡ rank-ordered-
    // replacement property — the oracle-equivalence argument — is re-proven
    // at 1500 ranks over the gate's own probe words plus random words.
    // Aliases come from a CJK codepoint block: 1500 ranks overflow the
    // 26-letter space the default table's replace-chain oracle uses (the
    // very bound that capped it at 24 merges).
    val big = BpeTokenizer.large
    assert(big.merges.size >= 1000, s"large table shrank to ${big.merges.size} merges")
    val alias: Map[String, Char] =
      big.merges.zipWithIndex.map { case ((l, r), i) => (l + r) -> (0x4E00 + i).toChar }.toMap
    def repr(sym: String): String = if (sym.length == 1) sym else alias(sym).toString
    def referenceCount(word: String): Int =
      big.merges.foldLeft(word) { case (acc, (l, r)) =>
        acc.replace(repr(l) + repr(r), alias(l + r).toString)
      }.length
    val rnd = new scala.util.Random(12)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    val words = BpeTokenizer.probeWords ++ (1 to 800).map(_ =>
      (1 to (1 + rnd.nextInt(14))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    words.foreach { w =>
      assert(big.encodeWord(w).mkString("") === w, s"round-trip broke on '$w'")
      assert(big.encodeWord(w).length === referenceCount(w),
        s"greedy vs in-order divergence on '$w': ${big.encodeWord(w).toSeq}")
    }
    // the digit merges are the table's deep end: a customer-id digit run
    // compresses well below its character count
    assert(big.encodeWord("000000001").length < 5)
    // native expression tier matches the engine and stays null-safe
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val rows = Seq((1L, "Customer#000000042 likes the fast table scan"),
        (2L, null.asInstanceOf[String])).toDF("id", "text")
      .select($"id", TextFunctions.bpeTokenCountLarge($"text").as("n"))
      .orderBy("id").collect()
    assert(rows(0).getInt(1) === big.countTokens("Customer#000000042 likes the fast table scan"))
    assert(rows(1).isNullAt(1))
  }

  test("oracleCountSqlExpr emits one replace per merge with distinct placeholders") {
    val sql = tok.oracleCountSqlExpr("w")
    assert(sql.startsWith("length(") && sql.contains("replace("))
    assert("replace\\(".r.findAllIn(sql).size === tok.merges.size)
    // every merge output has a distinct single-char placeholder
    val outs = tok.merges.map { case (l, r) => l + r }
    assert(outs.distinct.size === outs.size)
  }
}
