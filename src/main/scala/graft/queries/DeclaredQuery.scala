package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared query from SURVEY.md §2.3: a Spark DataFrame program plus,
  * when SQL-expressible, an equivalent DuckDB oracle SQL text.
  *
  * Determinism contract (SURVEY.md §2.3 preamble): every query ends with an
  * ORDER BY over a unique key (or all output columns) and rounds floating
  * outputs with round(x, 4). Column names match the oracle exactly.
  */
final case class DeclaredQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

private[queries] object QHelpers {
  /** Exact money arithmetic: cast to DECIMAL(18,2) so sums are exact in both
    * Spark and DuckDB (float summation order would otherwise make large sums
    * differ in the 4th decimal between engines / between runs).
    */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** round(cast(sum(decimal) as double), 4) — deterministic money sum. */
  def dsum(c: Column): Column = round(sum(money(c)).cast("double"), 4)

  def r4(c: Column): Column = round(c, 4)

  /** floor-to-4-decimals: unlike round(), floor of the same double is
    * identical in every engine (no tie-breaking semantics). Use for derived
    * ratios/scores that can land exactly on a x.xxxx5 boundary.
    */
  def f4(c: Column): Column = floor(c * 10000) / 10000
}
