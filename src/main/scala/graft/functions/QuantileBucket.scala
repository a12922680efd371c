package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Rank a numeric value into its quantile bucket: the number of split points
  * <= the value, i.e. a monotone map from the column's value domain onto
  * `[0, splits.length]`. With splits = the (2^b - 1) approximate quantiles
  * of the column, this is the equi-depth binning a Z-order layout needs —
  * equal row mass per bucket regardless of value skew (a min/max linear
  * scale would collapse a skewed column into a handful of cells and destroy
  * the curve's locality).
  *
  * Why a custom Expression (prompt tier (b)): the pure-API formulation
  * `aggregate(lit(splits), 0, (acc, s) -> acc + if(v >= s, 1, 0))` is a
  * CodegenFallback that walks all 2^b splits per row; this emits a
  * binary-search over a referenced double[] inside whole-stage codegen —
  * O(b) per row and no interpreted dispatch. Used on the write path of
  * `ParquetDatabase.normalizeZOrder`, where every table row passes through.
  *
  * The splits argument must be a foldable array<double> (a `lit(...)`): the
  * sorted search array is extracted once at plan time, never per row. Ties
  * and duplicate splits (constant/low-cardinality columns) are fine — the
  * map stays monotone. Null input → null (callers decide a null bucket).
  */
case class QuantileBucket(value: Expression, splits: Expression)
    extends BinaryExpression {

  override def left: Expression = value
  override def right: Expression = splits

  override def checkInputDataTypes(): TypeCheckResult =
    if (!value.dataType.isInstanceOf[NumericType] || value.dataType.isInstanceOf[DecimalType])
      TypeCheckResult.TypeCheckFailure(
        s"quantile_bucket value must be a primitive numeric (cast decimals to double), " +
          s"got ${value.dataType.simpleString}")
    else if (!splits.foldable ||
        !org.apache.spark.sql.catalyst.types.DataTypeUtils.sameType(
          splits.dataType, ArrayType(DoubleType)))
      TypeCheckResult.TypeCheckFailure(
        "quantile_bucket splits must be a foldable array<double> literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType

  /** Plan-time-constant sorted search array (foldability checked above). */
  private lazy val splitArr: Array[Double] = {
    val arr = splits.eval(null).asInstanceOf[ArrayData].toDoubleArray()
    require(arr.sameElements(arr.sorted), "quantile_bucket splits must be sorted ascending")
    arr
  }

  private def bucketOf(v: Double): Int = {
    val r = java.util.Arrays.binarySearch(splitArr, v)
    // count of splits <= v: exact hit at i means splits(0..i) <= v (ties
    // resolved by scanning forward over equal splits)
    if (r >= 0) {
      var i = r
      while (i + 1 < splitArr.length && splitArr(i + 1) == v) i += 1
      i + 1
    } else -r - 1
  }

  override def nullSafeEval(v: Any, s: Any): Any =
    bucketOf(v.asInstanceOf[java.lang.Number].doubleValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the pre-sorted array from generated code; no per-row allocation
    val arrRef = ctx.addReferenceObj("splits", splitArr, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val r = ctx.freshName("r")
      val d = ctx.freshName("d")
      s"""
         |double $d = (double) $v;
         |int $r = java.util.Arrays.binarySearch($arrRef, $d);
         |if ($r >= 0) {
         |  while ($r + 1 < $arrRef.length && $arrRef[$r + 1] == $d) $r++;
         |  $r = $r + 1;
         |} else {
         |  $r = -$r - 1;
         |}
         |${ev.value} = $r;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(value = newLeft, splits = newRight)

  override def prettyName: String = "quantile_bucket"
}
