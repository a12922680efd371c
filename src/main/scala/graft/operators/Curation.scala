package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline needs around the
  * dedup/similarity/text-analysis families: deterministic splits, sequence
  * packing, PII-style masking.
  *
  * Scale design: everything here is either a pure expression program
  * (split, masking — whole-stage codegen, no shuffle) or one window per
  * shard (packing — shuffle keyed on the shard id, shards chosen by the
  * caller to match write parallelism).
  */
object Curation {

  /** Deterministic split bucket in [0, totalWeight): fold the first two hex
    * chars of md5(key) to an int. Engine-portable (md5 hex + ascii are
    * identical across Spark and DuckDB) and stable under repartitioning and
    * re-ingestion — unlike `rand(seed)`, whose draw depends on the physical
    * partitioning.
    */
  def splitBucket(key: Column, totalWeight: Int): Column =
    (ascii(substring(md5(key.cast("string")), 1, 1)) * 256 +
      ascii(substring(md5(key.cast("string")), 2, 1))) % totalWeight

  /** Assign each row a named split (e.g. train/val/test at 8/1/1) from the
    * deterministic bucket of its key.
    */
  def assignSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty, "assignSplit: empty split spec")
    val total = splits.map(_._2).sum
    val b = splitBucket(col(keyCol), total)
    var acc = 0
    var cases: Column = null
    splits.init.foreach { case (name, w) =>
      acc += w
      cases = if (cases == null) when(b < acc, name) else cases.when(b < acc, name)
    }
    val split = if (cases == null) lit(splits.head._1) else cases.otherwise(splits.last._1)
    df.withColumn("split", split)
  }

  /** Leakage-safe split assignment: every row of a GROUP (e.g. an
    * exact-duplicate cluster) lands in the SAME split, decided by the
    * deterministic bucket of the group's representative key (its minimum).
    * The guard a training pipeline actually needs: per-row splitting puts
    * near-identical documents on both sides of train/test; splitting by
    * cluster representative cannot. One shuffle keyed on the group column
    * (a window min, map-side combined) — the same shape at any scale.
    */
  def assignSplitByGroup(df: DataFrame, keyCol: String, groupCol: Column,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty, "assignSplitByGroup: empty split spec")
    val rep = min(col(keyCol)).over(Window.partitionBy(groupCol))
    val total = splits.map(_._2).sum
    val b = splitBucket(rep, total)
    var acc = 0
    var cases: Column = null
    splits.init.foreach { case (name, w) =>
      acc += w
      cases = if (cases == null) when(b < acc, name) else cases.when(b < acc, name)
    }
    val split = if (cases == null) lit(splits.head._1) else cases.otherwise(splits.last._1)
    df.withColumn("split", split)
  }

  /** Deterministic token-budget sampling: per group (source/domain), order
    * rows by md5(key) — a stable "random" order both engines reproduce —
    * and keep rows while the running token total stays within the budget.
    * The corpus-mixing primitive ("up to N tokens of source X"): one
    * window per source partition, no global ordering, no collect.
    * Emits `n_tok` and the running `cum_tok` for audit.
    */
  def sampleToTokenBudget(df: DataFrame, keyCol: String, groupCol: String,
      nTokens: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"sampleToTokenBudget: budget must be positive, got $budgetTokens")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("n_tok", nTokens)
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= budgetTokens)
  }

  /** Temperature-weighted corpus mixing — the multilingual-LM sampling rule
    * (share ∝ n_i^alpha, alpha < 1 up-weights small sources relative to
    * their natural share; alpha = 0.5 is the common choice). Each group
    * contributes the md5-ordered deterministic prefix of its tempered
    * share, floor(budget · s_i / Σs_j) capped at the group's size — the
    * output can therefore UNDERSHOOT budgetRows by up to #groups−1 rows
    * from flooring, plus whatever capped groups couldn't fill (their
    * unused share is not redistributed; redistribution would make a row's
    * membership depend on other groups' sizes, breaking per-group
    * reproducibility under corpus growth).
    *
    * Determinism: weights are taken to the INTEGER domain per group
    * (floor(n^alpha · 1000)) and the budget split is integer rational
    * arithmetic (budget · s_i DIV Σs_j) — no cross-engine float summation
    * anywhere near a cut. For alpha = 0.5 the weight goes through sqrt,
    * which IEEE 754 requires correctly rounded, so the integer weights are
    * engine-exact; other alphas go through pow (within 1 ulp — a
    * floor-boundary flip is possible in principle, never observed).
    *
    * Scale: one group-sizes aggregate (group-cardinality-sized, broadcast
    * back), one 1-row total, one per-group window for the prefix — no
    * global order, no collect, no data-sized broadcast.
    */
  def sampleTemperature(df: DataFrame, keyCol: String, groupCol: String,
      budgetRows: Long, alpha: Double = 0.5): DataFrame = {
    require(budgetRows > 0, s"sampleTemperature: budget must be positive, got $budgetRows")
    require(alpha > 0 && alpha <= 1, s"sampleTemperature: alpha must be in (0, 1], got $alpha")
    val weight =
      if (alpha == 0.5) floor(sqrt(col("__n").cast("double")) * 1000)
      else floor(pow(col("__n").cast("double"), lit(alpha)) * 1000)
    // the budget join is an equi-join on the group key, under which a null
    // group would be SILENTLY dropped — fail loudly in-plan instead (the
    // groupBy keeps nulls as a group, so the guard sees them)
    val sizes = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__s",
        when(col(groupCol).isNull, raise_error(lit(
          s"sampleTemperature: null values in group column '$groupCol' — " +
            "null groups cannot be budgeted; filter or fill them first")))
          .otherwise(weight.cast("long")))
    val tot = sizes.agg(sum(col("__s")).as("__tot"))
    val budgets = sizes.crossJoin(broadcast(tot))
      .select(col(groupCol),
        // overflow guard: budget·s must stay in Long (s ≈ 1000·n^alpha, so
        // this binds only for extreme budget × group-size combinations);
        // fail loudly rather than wrap negative and silently drop a group
        when(lit(budgetRows) <= expr(s"${Long.MaxValue}L DIV __s"),
          least(col("__n"), expr(s"${budgetRows}L * __s DIV __tot")))
          .otherwise(raise_error(concat(
            lit(s"sampleTemperature: budgetRows=$budgetRows * weight "),
            col("__s").cast("string"), lit(" overflows Long — reduce the budget "),
            lit("or pre-scale the weights")))).as("grp_budget"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.join(broadcast(budgets), Seq(groupCol))
      .withColumn("grp_rank", row_number().over(w).cast("long"))
      .filter(col("grp_rank") <= col("grp_budget"))
  }

  /** Contiguous-fill sequence packing: shard rows by key mod numShards,
    * then fill fixed-capacity token bins in key order within each shard —
    * `bin` and `bin_offset` are running-sum window functions, so the whole
    * assignment is one shuffle keyed on the shard. Deterministic given the
    * key order. Docs longer than the capacity span bins (the trainer's
    * chunker handles intra-doc splits).
    */
  def packSequences(df: DataFrame, idCol: String, nTokens: Column,
                    numShards: Int, capacity: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col(idCol))
    df.withColumn("shard", pmod(col(idCol), lit(numShards.toLong)))
      .withColumn("n_tok", nTokens)
      .withColumn("start_tok", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin", floor(col("start_tok") / lit(capacity.toDouble)))
      .withColumn("bin_offset", col("start_tok") % capacity)
  }

  /** Power-of-two sequence-length bucketing with padding-waste accounting —
    * the batching-efficiency report a training pipeline runs before fixing
    * bucket boundaries: each doc rounds up to the smallest bucket in
    * {minBucket, 2·minBucket, …, maxBucket} that holds its token count
    * (longer docs clamp to maxBucket — the truncation column counts them),
    * and per bucket the report gives docs, used tokens (post-truncation),
    * padded slots (bucket × docs) and the waste fraction.
    *
    * One aggregation, map-side combinable, output bounded by the bucket
    * count — scale-free at any corpus size. All arithmetic is exact
    * integers until the final waste ratio (cross-engine-stable).
    */
  def lengthBucketStats(df: DataFrame, nTokens: Column,
                        minBucket: Int = 16, maxBucket: Int = 1024): DataFrame = {
    require(minBucket > 0 && Integer.bitCount(minBucket) == 1 &&
      Integer.bitCount(maxBucket) == 1 && maxBucket >= minBucket,
      s"lengthBucketStats: buckets must be powers of two with min <= max, " +
        s"got ($minBucket, $maxBucket)")
    val sizes = Iterator.iterate(minBucket.toLong)(_ * 2)
      .takeWhile(_ <= maxBucket).toSeq
    // a null token count would otherwise fall through every when(n <= b)
    // branch (null comparisons are false) into the maxBucket bucket with
    // its used_tok silently skipped by sum — miscounted, not flagged. An
    // audit must fail loudly on unauditable input instead.
    val n = when(nTokens.isNotNull, nTokens.cast("long"))
      .otherwise(raise_error(lit(
        "lengthBucketStats: null token count — filter or repair the input first")))
    val bucket = sizes.init.foldRight(lit(sizes.last): Column) { (b, acc) =>
      when(n <= b, lit(b)).otherwise(acc)
    }
    df.select(bucket.as("bucket"), n.as("n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("n") > col("bucket")).cast("long")).as("n_trunc"),
        sum(least(col("n"), col("bucket"))).as("used_tok"))
      .withColumn("padded_slots", col("bucket") * col("n_docs"))
      .withColumn("waste_frac",
        lit(1.0) - col("used_tok").cast("double") / col("padded_slots"))
  }

  /** Export a corpus as `numShards` deterministic shards under `dir`
    * (`shard=<k>/` directories) and return a manifest of what landed on
    * disk — the handoff format a trainer consumes: shards enumerable,
    * independently readable, membership reproducible.
    *
    * Shard assignment is the md5 bucket of the id ([[splitBucket]]'s
    * rationale: engine-portable, stable under repartitioning and
    * re-ingestion — re-exporting an unchanged corpus reproduces the same
    * membership, unlike anything rand()-based). The write repartitions on
    * the shard id so each shard is written by one task; `format` is
    * "parquet" or "json" (JSON-lines, the common text-corpus interchange).
    *
    * The manifest (shard, n_rows, n_bytes) is computed from what actually
    * LANDED on disk — it reports disk truth, not intent: a shard that
    * failed to write shows up as n_rows=0, not silently claimed. Every
    * shard id in [0, numShards) appears, so a trainer enumerating shards
    * can tell "legitimately empty" (the md5 bucket distribution is not
    * uniform; empty shards are plausible at small N) from "missing" — both
    * are n_rows=0 rows here, with the directory listing as the evidence.
    * For parquet the row counts come from file FOOTERS
    * (`ParquetStats.totalRows` per shard directory) — metadata-only, no
    * second pass over the data pages; a 100 TB export is not re-read to
    * describe it. JSON has no footer, so that format keeps the read-back
    * count (the price of a schemaless interchange format).
    */
  def exportShards(df: DataFrame, idCol: String, numShards: Int, dir: String,
                   format: String = "parquet"): DataFrame = {
    require(numShards > 0, s"exportShards: numShards must be positive, got $numShards")
    val spark = df.sparkSession
    df.withColumn("shard", splitBucket(col(idCol), numShards))
      .repartition(numShards, col("shard"))
      .write.mode("overwrite").format(format).partitionBy("shard").save(dir)
    // session Hadoop conf, not `new Configuration()`: session-configured
    // filesystem settings (credentials, endpoints) must reach the listing
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val shardDirs = fs.listStatus(p).toSeq.filter(_.isDirectory).map { d =>
      d.getPath.getName.stripPrefix("shard=").toInt -> d.getPath
    }.toMap
    val bytes = shardDirs.map { case (k, path) =>
      k -> fs.listStatus(path).filter(_.isFile).map(_.getLen).sum
    }
    val rows: Map[Int, Long] = format match {
      case "parquet" =>
        shardDirs.map { case (k, path) =>
          k -> graft.sources.ParquetStats.totalRows(path.toString, conf)
        }
      case _ =>
        spark.read.format(format).load(dir)
          .groupBy("shard").agg(count(lit(1)).as("n_rows"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    val manifest = (0 until numShards).map { k =>
      (k, rows.getOrElse(k, 0L), bytes.getOrElse(k, 0L))
    }
    spark.createDataFrame(manifest).toDF("shard", "n_rows", "n_bytes")
  }

  private def hexDigitVal(c: Column): Column =
    ascii(c) - when(ascii(c) >= 97, lit(87)).otherwise(lit(48))

  /** Uniform bucket in [0, 65536): the first four hex digits of md5(key)
    * parsed positionally. Unlike [[splitBucket]] (an ascii-pair fold with
    * only 256 distinct, skewed values — fine for naming splits/shards,
    * wrong for honoring a numeric rate), md5 hex digits are uniform, so a
    * `< round(f·65536)` threshold keeps fraction f of rows to within
    * binomial noise. Same portability: ascii/substr/md5/CASE exist
    * identically in Spark and DuckDB.
    */
  def uniformBucket16(key: Column): Column = {
    val h = md5(key.cast("string"))
    hexDigitVal(substring(h, 1, 1)) * 4096 + hexDigitVal(substring(h, 2, 1)) * 256 +
      hexDigitVal(substring(h, 3, 1)) * 16 + hexDigitVal(substring(h, 4, 1))
  }

  /** Deterministic weighted sampling — the mixture-weights step of
    * training-data assembly (keep corpus A at 100%, corpus B at 25%, …).
    * A row survives iff its [[uniformBucket16]] falls below
    * `round(fraction·65536)`, so the rate is honored to within binomial
    * noise (1/65536 granularity), the sample is reproducible across runs
    * and repartitioning, and samples are NESTED: the rows kept at weight w
    * are a subset of those kept at any w' > w — raising a corpus's weight
    * between runs only ADDS documents, it never churns the ones a trainer
    * already consumed. Pure expression filter: no shuffle,
    * pushdown-friendly, scales as a scan.
    */
  def sampleByWeight(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"sampleByWeight: fraction must be in [0, 1], got $fraction")
    df.filter(uniformBucket16(col(keyCol)) < math.round(fraction * 65536))
  }

  /** Stratified [[sampleByWeight]]: one md5-bucket threshold per stratum
    * value (unlisted strata fall to `defaultFraction`). Same properties as
    * the flat form — deterministic across runs/repartitioning, nested in
    * each fraction, pure pushdown-friendly expression filter, and (unlike
    * seeded `df.stat.sampleBy`, whose survivors are an RNG artifact of
    * split/iteration order) reproducible by ANY engine that can evaluate
    * md5 on the key — which is what makes it oracle-checkable.
    */
  def sampleByStrata(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"sampleByStrata: fraction must be in [0, 1], got $f"))
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultFraction * 65536)): Column) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(math.round(f * 65536))).otherwise(acc)
    }
    df.filter(uniformBucket16(col(keyCol)) < thr)
  }

  /** Fixed-SIZE per-stratum sample: exactly `min(k, |stratum|)` rows per
    * stratum, chosen as the k smallest md5(key) digests (ties broken by the
    * key itself). The rate-based forms above can't promise a row COUNT;
    * eval-set construction ("exactly 500 docs per language") needs one.
    *
    * Determinism story matches [[sampleByWeight]]: the md5 order is a
    * property of the key, not of partitioning or RNG state, so the same k
    * rows survive any repartition/re-ingest and any md5-capable engine
    * reproduces them. Scale: one window shuffle partitioned by stratum;
    * rank-k per partition never materializes more than the stratum's rows.
    */
  def sampleFixedPerStratum(df: DataFrame, keyCol: String, stratumCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"sampleFixedPerStratum: k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic weight-PROPORTIONAL sampling without replacement
    * (Efraimidis–Spirakis A-ES): top-k rows by the key u^(1/w) — computed
    * in its monotone log form ln(u)/w with u = (uniformBucket16(key)+0.5)
    * / 65536 — so longer/heavier rows are proportionally likelier while the
    * output size is EXACTLY min(k, count). The rate-based samplers above
    * honor a fraction; this honors per-row weights with a fixed budget (the
    * "sample 50 docs, length-weighted" eval-set shape). Determinism story
    * matches [[sampleByWeight]]: u is a property of the key, not RNG state,
    * so the sample survives repartition/re-ingest and any md5-capable
    * engine reproduces it. The score is rounded to 6 decimals BEFORE the
    * rank (ties broken by key) so cross-engine libm last-ulp differences in
    * `ln` can't flip ranks. Scale: orderBy+limit plans as TakeOrdered — a
    * per-partition top-k into one k-sized merge, never a global sort.
    */
  def sampleWeighted(df: DataFrame, keyCol: String, weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"sampleWeighted: k must be >= 1, got $k")
    val u = (uniformBucket16(col(keyCol)).cast("double") + 0.5) / 65536.0
    df.withColumn("es_key", round(log(u) / weight, 6))
      .orderBy(col("es_key").desc, col(keyCol))
      .limit(k)
  }

  /** Mix corpora at per-corpus weights into one relation (union by name,
    * missing columns null-filled — corpora rarely share exact schemas).
    * Each corpus is [[sampleByWeight]]-ed independently, so the mixture is
    * deterministic end-to-end and per-corpus weights can be retuned without
    * resampling the others.
    */
  def mixCorpora(corpora: Seq[(DataFrame, Double)], keyCol: String): DataFrame = {
    require(corpora.nonEmpty, "mixCorpora: no corpora given")
    corpora.map { case (df, w) => sampleByWeight(df, keyCol, w) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Mask all but the last `keep` characters of a column (PII-style
    * masking before a corpus leaves curation). SQL-expression based so the
    * identical text runs on the oracle engine.
    */
  def maskTail(colName: String, keep: Int): Column =
    expr(s"repeat('*', greatest(length($colName)-$keep,0)) || right($colName,$keep)")
}
