package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The compact bench line is the only part of the per-round artifact the
  * driver's ~2000-char stdout tail is guaranteed to retain, so its encoding
  * has a hard budget: every declared query key must be decodable from the
  * captured line itself (VERDICT r6 item 2).
  */
class BenchLineSpec extends AnyFunSuite {

  test("front-coding round-trips the real declared-query inventory") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val entries = names.zipWithIndex.map { case (n, i) => n -> (i.toLong * 37 - 500) }
    assert(Bench.decodeEntries(Bench.encodeEntries(entries)) == entries)
  }

  test("compact line stays under the 1985-char tail budget at the current inventory") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val header = 230 // measured envelope of the non-qs fields
    // typical case — sub-10 s queries, 1-3 digit centiseconds — must fit in
    // the preferred cs encoding without falling back
    val typical = Bench.encodeEntries(names.map(_ -> 999L))
    assert(typical.length + header <= 1985,
      s"typical cs line would be ${typical.length + header} chars at ${names.size} queries")
    // worst realistic case — EVERY query at 10-99 s — may exceed cs (the
    // runtime then degrades to deciseconds, Bench.scala's q_unit fallback);
    // the line the runtime would actually emit must still fit
    val worstCs = Bench.encodeEntries(names.map(_ -> 9999L))
    val worstDs = Bench.encodeEntries(names.map(_ -> 999L))
    val emitted = if (worstCs.length + header <= 1985) worstCs else worstDs
    assert(emitted.length + header <= 1985,
      s"compact line would be ${emitted.length + header} chars at ${names.size} queries " +
        "even in the deciseconds fallback; re-derive the encoding")
  }

  test("front-coding round-trips arbitrary sorted name lists") {
    val nameGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(cs => "q_" + cs.mkString.take(40))
    val listGen = for {
      names <- Gen.listOfN(60, nameGen)
      vals <- Gen.listOfN(60, Gen.chooseNum(-99999L, 99999L))
    } yield names.distinct.sorted.zip(vals)
    (1 to 200).foreach { i =>
      val entries = listGen(Gen.Parameters.default, Seed(i.toLong)).get
      assert(Bench.decodeEntries(Bench.encodeEntries(entries)) == entries,
        s"seed $i round-trip mismatch")
    }
  }

  test("prefix sharing is capped at 35 chars so B36(L) stays one char") {
    val long = "q_" + ("x" * 50)
    val entries = Seq(long + "a" -> 1L, long + "b" -> 2L)
    assert(Bench.decodeEntries(Bench.encodeEntries(entries)) == entries)
  }

  test("head truncation loses at most one restart block, never corrupts") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val entries = names.zipWithIndex.map { case (n, i) => n -> (i.toLong * 7 + 3) }
    val expected = entries.toMap
    val encoded = Bench.encodeEntries(entries)
    // the driver's tail capture cuts an arbitrary head off the line; the
    // decoder must skip the orphaned fragments and re-sync at the next
    // restart point (full-name entry), recovering everything after it
    (0 until encoded.length by 97).foreach { cut =>
      val decoded = Bench.decodeEntries(encoded.substring(cut))
      decoded.foreach { case (n, v) =>
        assert(expected.get(n).contains(v), s"cut=$cut corrupted entry $n -> $v")
      }
      val entriesLost = encoded.substring(0, cut).count(_ == ',') + 1
      assert(decoded.size >= entries.size - entriesLost - 16,
        s"cut=$cut recovered only ${decoded.size} of ${entries.size}")
    }
  }
}
