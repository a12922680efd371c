package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression: per-vector scalar quantization (the row-wise
  * int8 scheme used to shrink ANN indexes ~4× before IVF/LSH bucketing).
  *
  * Everything is expressed with codegen'd higher-order functions
  * (`transform`/`aggregate`) over the array column — no UDF, no shuffle:
  * quantization is embarrassingly row-local, so at 100 TB it runs entirely
  * map-side at scan speed. All arithmetic is forced to DOUBLE up front so
  * the reconstruction error is bit-deterministic and reproducible by any
  * double-native engine evaluating the same expression tree.
  */
object Quantize {

  /** Per-element absolute reconstruction error of `levels`-level per-vector
    * min/max scalar quantization:
    *
    *   q(x)  = round((x − mn)/(mx − mn) · (levels−1))
    *   x̂(x) = mn + q(x)/(levels−1) · (mx − mn)
    *
    * Constant vectors (mx = mn) reconstruct exactly (error 0). Appends
    * `mean_abs_err` (mean |x − x̂| over the vector's elements, DOUBLE).
    */
  def reconstructionError(df: DataFrame, vecCol: String, levels: Int = 256): DataFrame = {
    require(levels >= 2, "Quantize.reconstructionError: levels must be >= 2")
    val steps = lit((levels - 1).toDouble)
    val v: Column = transform(col(vecCol), x => x.cast("double"))
    val mn = array_min(v)
    val mx = array_max(v)
    val span = mx - mn
    val dequant: Column => Column = x =>
      mn + round((x - mn) / span * steps) / steps * span
    val absErr = transform(v, x => when(span === 0.0, lit(0.0)).otherwise(abs(x - dequant(x))))
    df.withColumn("mean_abs_err",
      aggregate(absErr, lit(0.0), (acc, e) => acc + e) / size(col(vecCol)))
  }

  /** Product-quantization-shaped reconstruction error: the vector splits
    * into `m` contiguous subvectors of `subLen` elements and each subvector
    * is min/max scalar-quantized INDEPENDENTLY at `levels` levels — the
    * grid-codebook special case of PQ, which already captures PQ's defining
    * property (per-subspace dynamic range: a vector with one wild dimension
    * quantizes the other subspaces finely instead of stretching one global
    * grid). Appends `pq_mean_abs_err` (mean |x − x̂| over all m·subLen
    * elements). Caller asserts m·subLen = vector length (dims are a schema
    * property). Same row-local/codegen story as [[reconstructionError]].
    */
  def subvectorReconstructionError(df: DataFrame, vecCol: String, m: Int,
      subLen: Int, levels: Int = 16): DataFrame = {
    require(m >= 1 && subLen >= 1 && levels >= 2,
      s"Quantize.subvectorReconstructionError: bad shape m=$m subLen=$subLen levels=$levels")
    val steps = lit((levels - 1).toDouble)
    val v: Column = transform(col(vecCol), x => x.cast("double"))
    val subErr = (0 until m).map { j =>
      val sub = slice(v, j * subLen + 1, subLen)
      val mn = array_min(sub)
      val span = array_max(sub) - mn
      val dequant: Column => Column = x =>
        mn + round((x - mn) / span * steps) / steps * span
      val absErr = transform(sub, x =>
        when(span === 0.0, lit(0.0)).otherwise(abs(x - dequant(x))))
      aggregate(absErr, lit(0.0), (acc, e) => acc + e)
    }.reduce(_ + _)
    df.withColumn("pq_mean_abs_err", subErr / lit((m * subLen).toDouble))
  }
}
