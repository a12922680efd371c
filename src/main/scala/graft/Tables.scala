package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * One parquet file per table under /root/testdata/sf0.001 etc. At cluster scale
  * each would be a directory of parquet files — `spark.read.parquet` handles
  * both transparently, and filter/projection pushdown applies either way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
      // rejects. Read it as nanos-since-epoch (legacy conf) and convert to a
      // microsecond TimestampType. The test data has no sub-microsecond
      // components, so the conversion is lossless (verified).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
