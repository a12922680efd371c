package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library integration point (`SparkSessionExtensions`): enable graft's
  * native expressions in ANY session — spark-shell, thriftserver, a
  * notebook, spark-submit — with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`, no host
  * code changes. In-process callers get the same registrations from
  * [[GraftFunctions.register]]; this is the deployment-side door.
  *
  * Only expression injection is used: the engine deliberately has no custom
  * optimizer rules or strategies — every operator is expressed through
  * Catalyst's own plans so the optimizer's reasoning (pushdown, pruning,
  * join selection, AQE) applies unimpeded, and the custom surface is
  * confined to codegen'd scalar expressions the built-ins can't express
  * efficiently.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
      org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def entry(name: String, usage: String, builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", null, name, usage, ""), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(entry("vector_dot",
      "dot product of two float/double arrays",
      es => VectorDot(es(0), es(1))))
    ext.injectFunction(entry("vector_srp_bucket",
      "sign-random-projection LSH bucket id",
      es => VectorSrpBucket(es(0), intLit(es(1), "planeOffset"), intLit(es(2), "numPlanes"))))
    ext.injectFunction(entry("quantile_bucket",
      "count of sorted splits <= value (equi-depth rank)",
      es => QuantileBucket(es(0), es(1))))
    ext.injectFunction(entry("bloom_agg",
      "bloom filter aggregate over xxhash64 keys",
      es => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        es(0), es(1), es(2))))
    ext.injectFunction(entry("bloom_might_contain",
      "bloom membership probe",
      es => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))))
    ext.injectFunction(entry("bpe_token_count",
      "greedy merges-table BPE subword token count",
      es => BpeTokenCount(es(0))))
    ext.injectFunction(entry("bpe_tokens",
      "greedy merges-table BPE subword tokens",
      es => BpeTokens(es(0))))
  }
}
