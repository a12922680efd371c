package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by default.
    * Supplying an explicit schema with ts:LongType reads the raw nanos
    * without touching the session-global
    * `spark.sql.legacy.parquet.nanosAsLong` conf (a leaked conf would change
    * how every later nanos parquet in the session is read).
    *
    * The DIV-1000 conversion to a microsecond TimestampType deliberately
    * truncates sub-microsecond components (the sf0.01+ data has them):
    * truncation-toward-zero is exactly what DuckDB (and any
    * microsecond-native engine) does when reading TIMESTAMP(NANOS), so both
    * sides of the oracle compare see identical values.
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.read.schema(eventsRawSchema).parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
