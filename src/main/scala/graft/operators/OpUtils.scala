package graft.operators

import org.apache.spark.sql.DataFrame

private[operators] object OpUtils {
  /** Round-robin repartition to the cluster's parallelism before per-row
    * heavy compute (shingling, hashing, scoring). A small table often
    * arrives as a single parquet row group = a single task; without this
    * every signature/projection computes on one core. The shuffle moves
    * only the input rows — cheap relative to the compute it parallelizes.
    * On a real cluster defaultParallelism = total executor cores, so this
    * is right-sized there too.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
