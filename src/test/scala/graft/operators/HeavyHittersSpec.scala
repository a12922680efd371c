package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def events = Tables.load(spark, sfDir, "events")

  test("exact top-k equals the window row_number formulation") {
    val got = HeavyHitters.exact(events, "user_id", 7)
      .orderBy("rank").collect().toSeq
    val w = Window.orderBy(col("n").desc, col("user_id"))
    val want = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 7)
      .select("rank", "user_id", "n")
      .orderBy("rank").collect().toSeq
    assert(got === want)
    assert(got.size === 7)
  }

  test("exact with k beyond the key space ranks every item once") {
    val nKeys = events.select("user_id").distinct().count()
    val all = HeavyHitters.exact(events, "user_id", (nKeys + 50).toInt).collect()
    assert(all.length.toLong === nKeys)
    assert(all.map(_.getLong(1)).distinct.length.toLong === nKeys)
    // counts are non-increasing down the ranking
    val ns = all.sortBy(_.getInt(0)).map(_.getLong(2))
    assert(ns.zip(ns.drop(1)).forall { case (a, b) => a >= b })
  }

  test("count-min never undercounts and stays inside the classical bound") {
    val depth = 5; val width = 256
    val sk = HeavyHitters.countMinSketch(events, "user_id", depth, width)
    // sketch never exceeds its fixed cell budget, and each row's cells sum
    // to the full stream length (every row increments one cell per row)
    val cells = sk.collect()
    assert(cells.length <= depth * width)
    val n = events.count()
    val perRow = cells.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perRow.values.toSet === Set(n))
    // estimate EVERY distinct item: est >= exact always (structural CM
    // guarantee), and for this fixed deterministic dataset the worst
    // overcount sits within the 2·e/width·N Markov bound
    val exact = events.groupBy("user_id").agg(count(lit(1)).as("n"))
    val est = HeavyHitters.estimate(exact.select("user_id"), sk, "user_id", depth, width)
    val joined = exact.join(est, "user_id")
      .select(col("user_id"), col("n"), col("est")).collect()
    assert(joined.forall(r => r.getLong(2) >= r.getLong(1)), "CM undercounted")
    val bound = math.ceil(2.0 * math.E / width * n).toLong
    val worst = joined.map(r => r.getLong(2) - r.getLong(1)).max
    assert(worst <= bound, s"worst overcount $worst exceeds bound $bound")
  }

  test("space-saving kernel: exact when m covers the key space, bounded when not") {
    val heavy = Seq.fill(1000)(7L)
    val tail = (0 until 100).flatMap(i => Seq.fill(5)(1000L + i))
    val xs = new scala.util.Random(42).shuffle(heavy ++ tail)
    val n = xs.length.toLong
    // m >= distinct: exact counts, zero error
    val exact = HeavyHitters.spaceSavingFold(Nil, xs.iterator, m = 256)
    assert(exact.size === 101)
    assert(exact.head === ((7L, 1000L, 0L)))
    assert(exact.forall(_._3 == 0L))
    // m = 8: summary bounded, counts conserve N, every error <= N/m, and
    // the one genuinely heavy item (freq > N/m) is tracked on top
    val m = 8
    val small = HeavyHitters.spaceSavingFold(Nil, xs.iterator, m)
    assert(small.size === m)
    assert(small.map(_._2).sum === n, "space-saving must conserve total count")
    assert(small.forall(_._3 <= n / m), s"err beyond N/m: $small")
    assert(small.head._1 === 7L && small.head._2 >= 1000L &&
      small.head._2 - small.head._3 <= 1000L)
    // folding in two chunks equals the streaming multi-batch transition
    val (a, b) = xs.splitAt(600)
    assert(HeavyHitters.spaceSavingFold(
      HeavyHitters.spaceSavingFold(Nil, a.iterator, m), b.iterator, m) === small)
  }

  test("space-saving invariants hold on generated skewed streams (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // zipf-ish streams: a few heavy items + a long tail, shuffled
    val streamGen: Gen[List[Long]] = for {
      nHeavy <- Gen.choose(1, 4)
      heavy <- Gen.listOfN(nHeavy, Gen.choose(50, 400).map(_.toLong))
      tail <- Gen.choose(50, 300)
    } yield {
      val hs = heavy.zipWithIndex.flatMap { case (c, i) => List.fill(c.toInt)(i.toLong) }
      val ts = (0 until tail).flatMap(i => List.fill(1 + i % 3)(100L + i))
      new scala.util.Random(hs.length * 31 + ts.length).shuffle(hs ++ ts.toList)
    }
    (0 until 25).foreach { i =>
      val xs = streamGen(Gen.Parameters.default, Seed(i.toLong)).get
      val n = xs.length.toLong
      val m = 4 + i % 13
      val summary = HeavyHitters.spaceSavingFold(Nil, xs.iterator, m)
      val exact = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      // bounded size, conservation, per-entry bounds
      assert(summary.size <= m)
      assert(summary.map(_._2).sum === n, s"seed $i: counts not conserved")
      summary.foreach { case (item, c, e) =>
        assert(e <= n / m, s"seed $i: err $e beyond N/m=${n / m}")
        val t = exact.getOrElse(item, 0L)
        assert(c >= t && c - e <= t, s"seed $i item $item: count $c err $e true $t")
      }
      // anything with true frequency > N/m must be tracked
      val tracked = summary.map(_._1).toSet
      exact.foreach { case (item, t) =>
        if (t > n / m) assert(tracked(item), s"seed $i: heavy item $item (freq $t) evicted")
      }
      // chunked fold equals the one-shot fold (streaming state transition)
      val (a, b) = xs.splitAt(xs.length / 3)
      assert(HeavyHitters.spaceSavingFold(
        HeavyHitters.spaceSavingFold(Nil, a.iterator, m), b.iterator, m) === summary)
    }
  }

  test("sketches merge cell-wise: sketch(a ∪ b) = sketch(a) + sketch(b)") {
    val a = events.where(col("event_id") % 2 === 0)
    val b = events.where(col("event_id") % 2 =!= 0)
    val whole = HeavyHitters.countMinSketch(events, "user_id", 3, 64)
    val merged = HeavyHitters.countMinSketch(a, "user_id", 3, 64)
      .unionByName(HeavyHitters.countMinSketch(b, "user_id", 3, 64))
      .groupBy("d", "idx").agg(sum("cnt").as("cnt"))
    val diff = whole.join(merged, Seq("d", "idx"), "full_outer")
      .where(not(whole("cnt") <=> merged("cnt")))
    assert(diff.count() === 0L)
  }
}
