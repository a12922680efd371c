package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("assignSplit is deterministic, covers every row, and lands near the weights") {
    val df = spark.range(10000).toDF("id")
    val out = Curation.assignSplit(df, "id", Seq("train" -> 8, "val" -> 1, "test" -> 1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 10000L)
    assert(counts("train") > 7500 && counts("train") < 8500, s"train share off: $counts")
    assert(counts("val") > 600 && counts("val") < 1400, s"val share off: $counts")
    // stable across shuffling/repartitioning
    val again = Curation.assignSplit(df.repartition(13), "id", Seq("train" -> 8, "val" -> 1, "test" -> 1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first === again)
  }

  test("packSequences fills bins contiguously and respects the capacity boundary") {
    val docs = Seq((0L, 100L), (8L, 900L), (16L, 1200L), (24L, 50L), (1L, 2000L), (9L, 100L))
      .toDF("doc_id", "n")
    val out = Curation.packSequences(docs, "doc_id", col("n"), numShards = 8, capacity = 1024)
      .select("doc_id", "shard", "bin", "bin_offset").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // shard 0 in id order: 100 → (bin0, off0); 900 → (bin0, off100);
    // 1200 starts at 1000 → bin0? floor(1000/1024)=0, off 1000; 50 starts at 2200 → bin2? floor(2200/1024)=2
    assert(out(0L) === (0L, 0L, 0L))
    assert(out(8L) === (0L, 0L, 100L))
    assert(out(16L) === (0L, 0L, 1000L))
    assert(out(24L) === (0L, 2L, 152L))
    // shard 1: 2000 at 0; next starts at 2000 → bin1
    assert(out(1L) === (1L, 0L, 0L))
    assert(out(9L) === (1L, 1L, 976L))
  }

  test("jaccardPairsBetween matches self-join pairs restricted to the cross cut") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight again"),
      (11L, "the quick brown fox jumps over the lazy dog tonight today"),
      (20L, "completely different words about spark engines and shuffles"),
      (21L, "completely different words about spark engines and shuffle планы")
    ).toDF("doc_id", "text")
    val left = docs.filter(col("doc_id") < 20)
    val right = docs.filter(col("doc_id") >= 20)
    // no near-dups ACROSS the cut in this fixture
    assert(Dedup.jaccardPairsBetween(left, right, "doc_id", "text", 0.6, shingleN = 3).count() === 0)
    // a cross near-dup is found with its exact value
    val left2 = docs.filter(col("doc_id") === 10)
    val right2 = docs.filter(col("doc_id") =!= 10)
    val cross = Dedup.jaccardPairsBetween(left2, right2, "doc_id", "text", 0.6, shingleN = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val self = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6, shingleN = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(cross.keySet === Set((10L, 11L)))
    assert(math.abs(cross((10L, 11L)) - self((10L, 11L))) < 1e-12)
  }

  test("exportShards writes deterministic shards and a disk-truth manifest") {
    val dir = "target/tmp/curation_shards"
    val docs = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"))
    val manifest = Curation.exportShards(docs, "doc_id", 8, dir)
    val m = manifest.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m.keySet === (0 until 8).toSet)
    assert(m.values.sum === 2000L)
    assert(m.values.forall(_ > 0), s"empty shard: $m")
    assert(manifest.collect().forall(_.getLong(2) > 0L), "zero-byte shard in manifest")
    // every row lands in exactly one shard, and membership equals the
    // declarative bucket — re-exporting an unchanged corpus is a no-op move
    val back = spark.read.parquet(dir)
    assert(back.count() === 2000L && back.select("doc_id").distinct().count() === 2000L)
    val expected = docs.withColumn("shard", Curation.splitBucket(col("doc_id"), 8))
      .select(col("doc_id"), col("shard").cast("int").as("shard"))
    assert(back.select(col("doc_id"), col("shard").cast("int").as("shard"))
      .exceptAll(expected).isEmpty)
    // JSON-lines export round-trips the same counts
    val mj = Curation.exportShards(docs, "doc_id", 8, dir + "_json", format = "json")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(mj === m)
  }

  test("exportShards manifests empty shards as zero rows, not missing rows") {
    // md5 buckets are not uniform: a tiny corpus leaves shards empty, and a
    // trainer enumerating shard=0..N-1 must see them as n_rows=0 (disk
    // truth: nothing landed) rather than absent-from-the-manifest (which
    // would be indistinguishable from a failed write)
    val dir = "target/tmp/curation_shards_empty"
    val docs = spark.range(3).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"))
    val manifest = Curation.exportShards(docs, "doc_id", 16, dir)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(manifest.keySet === (0 until 16).toSet, "manifest must enumerate every shard id")
    assert(manifest.values.map(_._1).sum === 3L)
    val (empty, full) = manifest.values.partition(_._1 == 0L)
    assert(empty.nonEmpty && empty.forall(_._2 == 0L), "empty shard with nonzero bytes")
    assert(full.forall(_._2 > 0L))
  }

  test("sampleByWeight is deterministic, near-expectation, and NESTED across weights") {
    val docs = spark.range(4000).select(col("id").as("doc_id"))
    def keep(f: Double): Set[Long] =
      Curation.sampleByWeight(docs, "doc_id", f).collect().map(_.getLong(0)).toSet
    val (k25, k50, k100) = (keep(0.25), keep(0.5), keep(1.0))
    assert(k100.size === 4000)
    // uniform 16-bit md5 buckets track the weight to binomial noise
    // (sd ≈ 27 at n=4000, f=0.25 — 150 is >5 sd)
    assert(math.abs(k25.size - 1000) < 150, s"0.25 kept ${k25.size}")
    assert(math.abs(k50.size - 2000) < 200, s"0.5 kept ${k50.size}")
    // nested: raising a weight only ADDS rows
    assert(k25.subsetOf(k50) && k50.subsetOf(k100), "samples not nested")
    // deterministic under repartitioning
    assert(Curation.sampleByWeight(docs.repartition(13), "doc_id", 0.25)
      .collect().map(_.getLong(0)).toSet === k25)
    assert(keep(0.0).isEmpty)
    intercept[IllegalArgumentException] { Curation.sampleByWeight(docs, "doc_id", 1.5) }
  }

  test("sampleByStrata honors per-stratum rates, nests, and defaults unlisted strata") {
    val docs = spark.range(6000).select(col("id").as("doc_id"),
      (col("id") % 3).cast("string").as("stratum"))
    def keep(f0: Double, f1: Double): Map[String, Set[Long]] =
      Curation.sampleByStrata(docs, "doc_id", "stratum", Map("0" -> f0, "1" -> f1))
        .collect().groupMap(_.getString(1))(_.getLong(0)).view.mapValues(_.toSet).toMap
    val k = keep(0.5, 0.1)
    // 2000 rows per stratum; binomial sd ≈ 22 at f=0.5, ≈ 13 at f=0.1
    assert(math.abs(k("0").size - 1000) < 120, s"stratum 0 kept ${k("0").size}")
    assert(math.abs(k("1").size - 200) < 80, s"stratum 1 kept ${k("1").size}")
    // unlisted stratum falls to the 0.0 default
    assert(!k.contains("2"))
    // per-stratum nesting: raising one stratum's rate only adds ITS rows
    val up = keep(0.8, 0.1)
    assert(k("0").subsetOf(up("0")) && k("1") === up("1"), "strata not independently nested")
    // within a stratum the flat machinery and the stratified one agree
    val flat = Curation.sampleByWeight(docs.where(col("stratum") === "0"), "doc_id", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(k("0") === flat)
    intercept[IllegalArgumentException] {
      Curation.sampleByStrata(docs, "doc_id", "stratum", Map("0" -> 2.0))
    }
  }

  test("mixCorpora unions weighted samples by name with null-fill") {
    val a = spark.range(100).select(col("id").as("doc_id"), lit("a").as("src"))
    val b = spark.range(100, 200).select(col("id").as("doc_id"), lit(5.0).as("score"))
    val mixed = Curation.mixCorpora(Seq((a, 1.0), (b, 0.5)), "doc_id")
    assert(mixed.columns.toSet === Set("doc_id", "src", "score"))
    val rows = mixed.collect()
    val (fromA, fromB) = rows.partition(_.getAs[Long]("doc_id") < 100)
    assert(fromA.length === 100 && fromA.forall(r => r.getAs[String]("src") == "a" &&
      r.isNullAt(r.fieldIndex("score"))))
    assert(fromB.nonEmpty && fromB.length < 100, s"weight 0.5 kept ${fromB.length}")
    assert(fromB.forall(_.isNullAt(1)))
  }

  test("maskTail hides all but the tail") {
    val out = Seq(("Customer#000000042", 1L)).toDF("c_name", "k")
      .select(Curation.maskTail("c_name", 4).as("m")).head().getString(0)
    assert(out === "**************0042")
  }

  test("assignSplitByGroup never splits a group across splits (no leakage)") {
    import org.apache.spark.sql.functions._
    // 300 rows in 60 groups of 5 (including singleton groups via %)
    val df = (0L until 300L).map(i => (i, s"text_${i % 60}")).toDF("id", "text")
    val out = Curation.assignSplitByGroup(df, "id", md5(col("text").cast("binary")),
      Seq("train" -> 8, "val" -> 1, "test" -> 1))
    // every group maps to exactly one split
    val perGroup = out.groupBy("text").agg(countDistinct(col("split")).as("k"))
    assert(perGroup.filter(col("k") =!= 1).count() === 0, "a group straddles splits")
    // all rows covered, and the split of each group equals assignSplit of
    // its representative (min id) — the declared bucketing contract
    assert(out.count() === 300)
    val reps = df.groupBy("text").agg(min("id").as("rep"))
    val wantByRep = Curation.assignSplit(reps, "rep", Seq("train" -> 8, "val" -> 1, "test" -> 1))
      .select(col("text"), col("split").as("want"))
    val joined = out.select(col("text"), col("split")).distinct().join(wantByRep, "text")
    assert(joined.filter(col("split") =!= col("want")).count() === 0)
  }

  test("sampleToTokenBudget keeps the md5-ordered prefix within budget per group") {
    import org.apache.spark.sql.functions._
    val df = (0L until 200L).map(i => (i, s"src_${i % 3}", 10L + i % 7)).toDF("id", "src", "nt")
    val out = Curation.sampleToTokenBudget(df, "id", "src", col("nt"), budgetTokens = 150L)
    val rows = out.select("id", "src", "n_tok", "cum_tok").collect()
    // within budget everywhere
    assert(rows.forall(_.getLong(3) <= 150L))
    // per group: the kept set is exactly the maximal md5-ordered prefix —
    // recompute it driver-side and compare ids
    val byHash = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2).map { case (src, xs) =>
        val ordered = xs.sortBy { case (id, _, _) =>
          (java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString, id)
        }
        var cum = 0L
        src -> ordered.takeWhile { case (_, _, nt) => { cum += nt; cum <= 150L } }.map(_._1).toSet
      }
    val got = rows.groupBy(_.getString(1)).map { case (src, rs) => src -> rs.map(_.getLong(0)).toSet }
    assert(got === byHash, "kept sets diverge from the driver-side reference")
  }

  test("sampleTemperature up-weights small groups by the sqrt rule, exactly") {
    // 400 'big' rows vs 16 'small': natural shares 96%/4%; sqrt-tempered
    // integer weights 20000/4000 -> budgets floor(120·5/6)=100 and
    // floor(120/6)=20 — small's share quintuples
    val df = ((0L until 400L).map(i => (i, "big")) ++ (1000L until 1016L).map(i => (i, "small")))
      .toDF("id", "grp")
    val out = Curation.sampleTemperature(df, "id", "grp", budgetRows = 120L)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("big" -> 100L, "small" -> 16L)) // small capped at its size
    // a group smaller than its tempered budget contributes everything;
    // ranks are the deterministic md5 prefix (re-run reproduces exactly)
    val again = Curation.sampleTemperature(df, "id", "grp", budgetRows = 120L)
      .select("id").collect().map(_.getLong(0)).sorted
    val first = Curation.sampleTemperature(df, "id", "grp", budgetRows = 120L)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(again.sameElements(first))
  }

  test("sampleTemperature fails loudly on null group keys instead of dropping them") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None: Option[String]))
      .toDF("id", "grp")
    val e = intercept[Exception] {
      Curation.sampleTemperature(df, "id", "grp", budgetRows = 2L).collect()
    }
    assert(e.getMessage.contains("null values in group column") ||
      Option(e.getCause).exists(_.getMessage.contains("null values in group column")))
  }

  test("lengthBucketStats: power-of-two round-up, truncation accounting, exact waste") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // token counts 5, 16, 17, 200 with buckets {16, 32}: 200 clamps to 32
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, ("w " * 15).trim + " x"),
      (3L, ("y " * 16).trim + " z"),
      (4L, ("q " * 200).trim)
    ).toDF("doc_id", "text")
    val out = Curation.lengthBucketStats(docs,
        graft.functions.TextFunctions.tokenCount(col("text")),
        minBucket = 16, maxBucket = 32)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // bucket 16: docs 1 (5 toks) and 2 (16) -> used 21 of 32 slots
    assert(out(0) === ((16L, 2L, 0L, 21L, 32L, 1.0 - 21.0 / 32)))
    // bucket 32: doc 3 (17) and doc 4 (200, TRUNCATED to 32) -> used 49 of 64
    assert(out(1) === ((32L, 2L, 1L, 49L, 64L, 1.0 - 49.0 / 64)))
  }

  test("lengthBucketStats fails loudly on a null token count (r10 advice)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a null count would otherwise be silently miscounted as a maxBucket
    // doc (null comparisons fall through every when branch)
    val docs = Seq((1L, Some(5L)), (2L, None)).toDF("doc_id", "n_tok")
    val ex = intercept[Exception] {
      Curation.lengthBucketStats(docs, col("n_tok"), minBucket = 16, maxBucket = 32)
        .collect()
    }
    assert(ex.getMessage.contains("null token count"), ex.getMessage)
  }
}
