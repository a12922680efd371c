package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product of two numeric arrays (float or double), with
  * whole-stage codegen.
  *
  * Why a custom Catalyst Expression (SURVEY.md §4 / prompt tier (b)): the
  * pure-API formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
  * correct but `ArrayAggregate`/`ZipWith` are CodegenFallback — every
  * element bounces through interpreted lambda dispatch with boxing. For ANN
  * scoring the dot product IS the inner loop, so this is the one place the
  * built-ins genuinely can't express the semantics efficiently. The codegen
  * emits a tight primitive loop; eval mirrors it for the interpreted path.
  *
  * Semantics: length = min(len(a), len(b)) (zip semantics); null array →
  * null; array elements are assumed non-null (embedding contract).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isNumericArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumericArray(left.dataType) && isNumericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vector_dot requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (isFloat(left), isFloat(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double)$a.$lGet($i) * (double)$b.$rGet($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

/** Sign-random-projection bucket id with whole-stage codegen: bit p of the
  * result is the sign of the vector's projection onto pseudo-random ±1
  * hyperplane `planeOffset + p`, component signs derived from the parity of
  * xxhash64(plane, componentIdx) — bit-for-bit identical to the
  * higher-order-function formulation it replaces (asserted in
  * VectorDotSpec), but the HOF form pays interpreted lambda dispatch per
  * (plane × component) in the LSH bucketing inner loop.
  */
case class VectorSrpBucket(vec: Expression, planeOffset: Int, numPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def child: Expression = vec

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_srp_bucket requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  private def isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var bits = 0L
    var p = 0
    while (p < numPlanes) {
      // reproduce xxhash64(plane, j): seed 42, fold ints left-to-right
      // (XXH64 static methods are the public surface of Spark's xxhash64)
      val seed = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashInt(planeOffset + p, 42L)
      var proj = 0.0
      var j = 0
      while (j < n) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(j, seed)
        val v = if (isFloat) x.getFloat(j).toDouble else x.getDouble(j)
        proj += (if ((h & 1L) == 1L) v else -v)
        j += 1
      }
      if (proj >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val proj = ctx.freshName("proj")
      val seed = ctx.freshName("seed")
      val n = ctx.freshName("n")
      val hashFn = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |long $bits = 0L;
         |int $n = $a.numElements();
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  long $seed = $hashFn.hashInt($planeOffset + $p, 42L);
         |  double $proj = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long h = $hashFn.hashInt($j, $seed);
         |    double v = (double)$a.$get($j);
         |    $proj += ((h & 1L) == 1L) ? v : -v;
         |  }
         |  if ($proj >= 0) $bits |= (1L << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vec = newChild)

  override def prettyName: String = "vector_srp_bucket"
}

/** Registration of graft-native functions into a session's function
  * registry, callable via `call_function(...)` / SQL. Idempotent —
  * operators call it defensively because the harness may hand them a
  * session built outside GraftSession.
  */
object GraftFunctions {
  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_srp_bucket", exprs => VectorSrpBucket(exprs(0),
        intLit(exprs(1), "planeOffset"), intLit(exprs(2), "numPlanes")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_bucket", exprs => QuantileBucket(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_token_count", exprs => BpeTokenCount(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_token_count_large", exprs => BpeTokenCountLarge(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_tokens", exprs => BpeTokens(exprs(0)), "built-in")
    // Spark's own runtime-filter expressions, exposed for explicit use by
    // BloomJoin (the optimizer only injects them under its cost heuristics)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg", exprs =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", exprs =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1)), "built-in")
  }
}
