package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic local scale-up of a driver testdata dir (dev tool — the
  * round-9 "scale rehearsal" harness, not part of the query library).
  *
  * `ScaleGen <srcSfDir> <outDir> <factor>` writes a `factor`× larger copy of
  * every table by unioning `factor` key-shifted replicas of the source
  * (replica 0 is byte-identical values, so id-pinned query sets like
  * q_ext_sim1's `vec_id < 5` stay constant-size while the corpus grows).
  * No RNG anywhere — re-runs are bit-stable and need no seed plumbing:
  *
  *  - fact/dim keys shift by a per-table stride (strides sit well above the
  *    sf0.1 key ranges), with foreign keys shifted by the SAME stride so
  *    each replica is referentially closed (orders↔lineitem↔part/supplier,
  *    orders↔customer); `nation`/`region` stay fixed-size like TPC-H
  *  - `events` keeps its 30-day time axis (10× density — the honest
  *    range-join/sessionization stress) and shifts event/user ids
  *  - `documents` suffixes every word with a per-replica salt: a bijection
  *    on word 3-gram shingles, so WITHIN-replica Jaccard/near-dup structure
  *    is preserved exactly while replicas share zero shingles (near-dup
  *    pair density stays constant per doc → total pairs scale linearly,
  *    not quadratically as raw duplication would); n_chars is recomputed
  *  - `embeddings` adds a deterministic sin-based jitter (±0.01/dim) so
  *    replicas aren't exact duplicates (cos ≈ 0.9998 to the original —
  *    below any dedup τ in the inventory) and k-means sees 10× points,
  *    not 10× multiplicity
  */
object ScaleGen {

  private def shift(df: DataFrame, stride: Long, copy: Int, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val t = d.schema(c).dataType
      d.withColumn(c, (col(c) + lit(stride * copy)).cast(t))
    }

  /** Suffix every whitespace-delimited word with `_r<copy>` (copy 0: identity). */
  private def saltText(df: DataFrame, copy: Int): DataFrame =
    if (copy == 0) df
    else df
      .withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1_r" + copy))
      .withColumn("n_chars", length(col("text")).cast(df.schema("n_chars").dataType))

  /** ±0.01 deterministic per-(vector, dim, copy) jitter; keeps float type. */
  private def jitter(df: DataFrame, copy: Int): DataFrame =
    if (copy == 0) df
    else df.withColumn("embedding",
      expr(s"transform(embedding, (x, j) -> cast(x + sin(vec_id * 31 + $copy * 7 + j) * 0.01 as float))"))

  def scaleTable(name: String, df: DataFrame, copy: Int): DataFrame = name match {
    case "region" | "nation" => if (copy == 0) df else df.limit(0)
    case "customer"  => shift(df, 1000000L, copy, "c_custkey")
    case "supplier"  => shift(df, 100000L, copy, "s_suppkey")
    case "part"      => shift(df, 1000000L, copy, "p_partkey")
    case "orders"    => shift(shift(df, 10000000L, copy, "o_orderkey"), 1000000L, copy, "o_custkey")
    case "lineitem"  =>
      shift(shift(shift(df, 10000000L, copy, "l_orderkey"),
        1000000L, copy, "l_partkey"), 100000L, copy, "l_suppkey")
    case "events"    => shift(shift(df, 10000000L, copy, "event_id"), 100000L, copy, "user_id")
    case "documents" => saltText(shift(df, 1000000L, copy, "doc_id"), copy)
    case "embeddings" => jitter(shift(df, 1000000L, copy, "vec_id"), copy)
    case other => throw new IllegalArgumentException(s"unknown table $other")
  }

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def generate(spark: SparkSession, srcDir: String, outDir: String, factor: Int): Unit =
    tables.foreach { t =>
      val src = spark.read.parquet(s"$srcDir/$t.parquet")
      val out = (0 until factor).map(scaleTable(t, src, _)).reduce(_.unionByName(_))
      // file sizing: big facts get one file per replica (~row-group scale
      // locally), dims stay single-file — mirrors the driver layout
      val parts = if (Set("lineitem", "orders", "events").contains(t)) factor else 1
      out.repartition(parts).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }

  def main(args: Array[String]): Unit = {
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, factor)
    Tables.verifyContract(spark, out) // the scaled dir must honor the same contract
    tables.foreach { t =>
      println(s"[scalegen] $t rows=" + spark.read.parquet(s"$out/$t.parquet").count())
    }
    spark.stop()
  }
}
