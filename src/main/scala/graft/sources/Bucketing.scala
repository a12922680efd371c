package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: pre-shuffle a table ONCE at write time so every
  * subsequent equi-join/aggregation on the bucket key runs with zero
  * exchange on that side. At 100 TB this converts the recurring shuffle of
  * a fact-fact join into a one-time layout cost — the biggest single win
  * for repeated join workloads.
  *
  * Spark bucketing metadata lives in the session catalog (data source
  * tables; no Hive required), so writers use saveAsTable rather than raw
  * parquet paths.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // the warehouse location can outlive the (in-memory) catalog across
    // JVMs — clear both so overwrite is genuinely idempotent
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True iff the physical plan contains no shuffle exchange — the check
    * that a bucketed join actually co-located (ShuffleExchange-free; sort
    * and broadcast are fine).
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
