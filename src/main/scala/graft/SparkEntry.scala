package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2.3 is declared here as a named
  * query; SQL-expressible ones carry a DuckDB oracle text with identical
  * output column names (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Full declared-query registry, grouped by SURVEY.md §2.3 section. */
  def registry: Seq[DeclaredQuery] =
    ScanQueries.all ++ JoinQueries.all ++ AggQueries.all ++
      WindowQueries.all ++ SetQueries.all ++ NestedQueries.all ++ ExtQueries.all ++
      IngestQueries.all ++ SubqueryQueries.all ++ MiscQueries.all ++ AnalyticsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
