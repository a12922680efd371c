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

/** Registration of graft-native functions into a session's function
  * registry, callable via `call_function("vector_dot", a, b)` / SQL
  * `vector_dot(a, b)`. Idempotent — operators call it defensively because
  * the harness may hand them a session built outside GraftSession.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
}
