package graft

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.concurrent.TrieMap

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * One parquet file per table under /root/testdata/sf0.001 etc. At cluster scale
  * each would be a directory of parquet files — `spark.read.parquet` handles
  * both transparently, and filter/projection pushdown applies either way.
  *
  * The events table's `ts` column has changed physical encoding between data
  * drops (TIMESTAMP(NANOS) through round 6, TIMESTAMP(MICROS) from round 7) —
  * so ingestion is CONTRACT-DRIVEN, not assumption-driven: [[load]] reads the
  * parquet footer's declared logical type and picks the matching decode path,
  * and [[assertEventsTsSane]] fails loudly (footer-stats-only, no data scan)
  * if the decoded range lands outside [2000, 2100]. This mirrors the
  * reference's permissive-ingest ethos (crystpqdb/loaders/base.py:210-216 —
  * adapt to what the file declares, never hard-code one encoding).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Raw-long schema used only for the TIMESTAMP(NANOS) path, which Spark
    * rejects by default. Reading ts as LongType avoids touching the
    * session-global `spark.sql.legacy.parquet.nanosAsLong` conf (a leaked
    * conf would change how every later nanos parquet in the session is read).
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Footer truth about a timestamp column: the declared unit (None when
    * stored as plain INT64 with no annotation) and whether values are
    * UTC-adjusted (parquet `isAdjustedToUTC`; Spark maps true →
    * TimestampType, false → TIMESTAMP_NTZ). Probes the first parquet file
    * under `path` (a file or a directory).
    */
  final case class TsInfo(unit: Option[TimeUnit], adjustedToUTC: Boolean)

  def timestampInfo(path: String, column: String, conf: Configuration): TsInfo = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isFile) p
      else fs.listStatus(p).toIndexedSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath).headOption
        .getOrElse(throw new IllegalArgumentException(s"no parquet files under $path"))
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      if (!schema.containsField(column)) TsInfo(None, adjustedToUTC = false)
      else {
        val tpe = schema.getType(Seq(column): _*)
        val isInt96 = tpe.isPrimitive &&
          tpe.asPrimitiveType().getPrimitiveTypeName ==
            org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96
        tpe.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            TsInfo(Some(ts.getUnit), ts.isAdjustedToUTC)
          case _ if isInt96 =>
            // legacy INT96 (julian-day + nanos, unannotated): Spark decodes
            // it natively as TimestampType — report it as a natively-
            // readable adjusted timestamp so no raw-long branch fires
            TsInfo(Some(TimeUnit.MICROS), adjustedToUTC = true)
          case _ => TsInfo(None, adjustedToUTC = false)
        }
      }
    } finally reader.close()
  }

  def timestampUnit(path: String, column: String, conf: Configuration): Option[TimeUnit] =
    timestampInfo(path, column, conf).unit

  /** Explicit streaming read schema for natively-decodable (MICROS/MILLIS)
    * events: the ts field must mirror the file's isAdjustedToUTC flag —
    * TimestampType when adjusted, TIMESTAMP_NTZ when not — or the parquet
    * reader rejects the column as unconvertible.
    */
  def eventsDecodedSchema(adjustedToUTC: Boolean): StructType =
    StructType(eventsRawSchema.fields.map(f =>
      if (f.name == "ts")
        StructField("ts", if (adjustedToUTC) TimestampType else TimestampNTZType)
      else f))

  /** Footer-detection cache: the ts encoding of one immutable input file
    * never changes within a session, and `load` runs once per query per
    * table — re-opening the footer every time would add a metadata read
    * per query. Keyed by (path, mtime, length), NOT path alone: streaming
    * fixtures delete and re-stage scratch dirs at the same path in-session,
    * and a path-only key would keep serving the dead staging's decode
    * branch if a later producer staged a different encoding there. The
    * status probe is one FS metadata call per load — far cheaper than the
    * footer open it saves; superseded entries are bounded by the handful of
    * staged paths a session touches.
    */
  private val unitCache = TrieMap.empty[(String, Long, Long), TsInfo]

  /** Footer-negotiated (cached + sanity-checked) ts encoding of an events
    * parquet path — a file, or a directory of staged event chunks. The
    * single source of truth for batch AND streaming decode branches, so
    * the two paths can never drift.
    */
  def eventsTsInfo(spark: SparkSession, path: String): TsInfo = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val st = p.getFileSystem(conf).getFileStatus(p)
    unitCache.getOrElseUpdate((path, st.getModificationTime, st.getLen), {
      val info = timestampInfo(path, "ts", conf)
      assertEventsTsSane(path, info.unit, conf)
      info
    })
  }

  /** True when the path's events need the raw-long nanos→micros decode
    * (TIMESTAMP(NANOS) or unannotated INT64); false when Spark's native
    * timestamp read is correct (MICROS/MILLIS).
    */
  def eventsNeedsNanosDecode(spark: SparkSession, path: String): Boolean =
    eventsTsInfo(spark, path).unit match {
      case Some(TimeUnit.MICROS) | Some(TimeUnit.MILLIS) => false
      case _ => true
    }

  /** Loud guard against the round-7 failure mode (a silent unit change
    * collapsing 30 days of events into 43 minutes of 1970): checks the
    * DECODED max(ts) falls in [2000, 2100] using footer column statistics
    * only — no data pages are read.
    */
  private def assertEventsTsSane(path: String, unit: Option[TimeUnit], conf: Configuration): Unit = {
    val lo = 946684800L * 1000000L   // 2000-01-01 in micros since epoch
    val hi = 4102444800L * 1000000L  // 2100-01-01 in micros since epoch
    val ranges = sources.ParquetStats.columnRanges(
      new org.apache.hadoop.fs.Path(path).toString, "ts", conf)
    if (ranges.nonEmpty) {
      val maxRaw = ranges.map(_._2).max
      val maxMicros = unit match {
        case Some(TimeUnit.MICROS) => maxRaw
        case Some(TimeUnit.MILLIS) => maxRaw * 1000L
        case _                     => maxRaw / 1000L // raw/annotated nanos
      }
      require(maxMicros >= lo && maxMicros <= hi,
        s"events.ts contract violation: decoded max(ts) ≈ year ${maxMicros / (86400L * 1000000L) / 365 + 1970}" +
          s" (unit=$unit, rawMax=$maxRaw) outside [2000, 2100] — the data's timestamp" +
          " encoding changed; fix Tables.load's unit branch before trusting any result")
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      val path = s"$dir/$name.parquet"
      if (!eventsNeedsNanosDecode(spark, path)) {
        // MICROS/MILLIS decode natively; the file is isAdjustedToUTC=false
        // so Spark surfaces TIMESTAMP_NTZ — cast to TimestampType (session
        // TZ is UTC, so values are numerically identical) to keep the ts
        // type every downstream operator was written against.
        spark.read.parquet(path)
          .withColumn("ts", col("ts").cast(TimestampType))
      } else {
        // TIMESTAMP(NANOS) (or unannotated INT64 nanos): Spark rejects /
        // misreads it, so read raw longs and truncate-toward-zero to
        // micros — exactly what DuckDB (and any microsecond-native
        // engine) does with nanos input, keeping both oracle sides equal.
        spark.read.schema(eventsRawSchema).parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Expected column→allowed-types contract per table (Spark-side read
    * schema). `events.ts` is intentionally absent from the exact-match
    * set — its encoding is footer-negotiated in [[load]]; [[verifyContract]]
    * instead checks it decodes into a sane range. Date-like columns accept
    * any calendar type (DATE / TIMESTAMP / TIMESTAMP_NTZ): both oracle
    * sides read the same file, so a drift among those is benign — only a
    * change that breaks temporal semantics (e.g. date-as-string or a raw
    * long) should fail the round.
    */
  private val dateLike: Set[DataType] = Set(DateType, TimestampType, TimestampNTZType)
  private val expectedKeyColumns: Map[String, Map[String, Set[DataType]]] = Map(
    "region"     -> Map("r_regionkey" -> Set(IntegerType, LongType), "r_name" -> Set(StringType)),
    "nation"     -> Map("n_nationkey" -> Set(IntegerType, LongType),
                        "n_regionkey" -> Set(IntegerType, LongType)),
    "customer"   -> Map("c_custkey" -> Set(LongType), "c_acctbal" -> Set(DoubleType)),
    "supplier"   -> Map("s_suppkey" -> Set(LongType)),
    "part"       -> Map("p_partkey" -> Set(LongType), "p_retailprice" -> Set(DoubleType)),
    "orders"     -> Map("o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
                        "o_totalprice" -> Set(DoubleType), "o_orderdate" -> dateLike),
    "lineitem"   -> Map("l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
                        "l_quantity" -> Set(DoubleType), "l_shipdate" -> dateLike),
    "events"     -> Map("event_id" -> Set(LongType), "user_id" -> Set(LongType),
                        "event_type" -> Set(StringType), "value" -> Set(DoubleType),
                        "props" -> Set(StringType)),
    "documents"  -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType),
                        "lang" -> Set(StringType), "source" -> Set(StringType),
                        "n_chars" -> Set(LongType)),
    "embeddings" -> Map("vec_id" -> Set(LongType),
                        "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false))))

  /** The vector length the similarity family (and its DuckDB oracles, which
    * hard-code `generate_series(1,64)`) is written against.
    */
  val ExpectedEmbeddingDim = 64

  /** Verifies every table in `dir` against the expected contract; throws
    * with a full diff of ALL violations (not just the first) so one run
    * reports the whole drift. Footer/metadata-only — no data scanned except
    * events' footer stats. The round-7 lesson institutionalized: the driver
    * changed the data under the engine once; when it does again, this fails
    * the round at setup with a named diff instead of 20 silent wrong answers.
    */
  def verifyContract(spark: SparkSession, dir: String): Unit = {
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    names.foreach { t =>
      val path = s"$dir/$t.parquet"
      try {
        val actual = load(spark, dir, t).schema
        val actualMap = actual.fields.map(f => f.name -> f.dataType).toMap
        expectedKeyColumns.getOrElse(t, Map.empty).foreach { case (col, allowed) =>
          actualMap.get(col) match {
            case None => problems += s"$t: missing column $col (have: ${actual.fieldNames.mkString(", ")})"
            case Some(a) if !allowed(a) =>
              problems += s"$t.$col: expected ${allowed.mkString(" or ")}, found $a"
            case _ => ()
          }
        }
        if (t == "events") {
          actualMap.get("ts") match {
            case Some(TimestampType) => () // sane-range check already ran inside load
            case Some(other) => problems += s"events.ts: expected TimestampType after decode, found $other"
            case None => problems += "events: missing column ts"
          }
        }
        if (t == "embeddings" && actualMap.get("embedding").exists(_.isInstanceOf[ArrayType])) {
          // the similarity family + its oracles hard-code the vector width;
          // a dim change must be a named diff, not 60k silently-wrong dots.
          // One-row probe — footers don't carry list lengths.
          val dims = load(spark, dir, t)
            .select(size(col("embedding")).as("d")).limit(1).collect()
          dims.headOption.map(_.getInt(0)).filter(_ != ExpectedEmbeddingDim).foreach(d =>
            problems += s"embeddings.embedding: expected $ExpectedEmbeddingDim elements " +
              s"(the similarity oracles hard-code the width), found $d")
        }
      } catch {
        // any load failure (missing file, unreadable footer, the ts sanity
        // require) becomes a named diff line, never a half-reported abort
        case scala.util.control.NonFatal(e) =>
          problems += s"$t: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(2).mkString(" | ")}"
      }
    }
    if (problems.nonEmpty)
      throw new IllegalStateException(
        s"data contract violations in $dir:\n  ${problems.mkString("\n  ")}")
  }
}
