package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = GraftFunctions.register(spark)

  test("vector_dot matches the HOF formulation on float arrays") {
    registered()
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(0.5f, -0.5f), Seq(2.0f, 2.0f)),
      (Seq.empty[Float], Seq.empty[Float]))
      .toDF("a", "b")
    val out = df.select(
      call_function("vector_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
      s"native=${r.getDouble(0)} hof=${r.getDouble(1)}"))
    assert(out(0).getDouble(0) === 32.0)
    assert(out(2).getDouble(0) === 0.0)
  }

  test("vector_dot handles double arrays and zip (min-length) semantics") {
    registered()
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 10.0))).toDF("a", "b")
    assert(df.select(call_function("vector_dot", col("a"), col("b")))
      .head().getDouble(0) === 30.0)
  }

  test("vector_dot is null-safe and rejects non-array inputs at analysis") {
    registered()
    val df = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(call_function("vector_dot", col("a"), col("b"))).head().isNullAt(0))
    val bad = Seq((1, 2)).toDF("a", "b")
    intercept[Exception](bad.select(call_function("vector_dot", col("a"), col("b"))).head())
  }

  test("vector_srp_bucket is bit-identical to the HOF sign-projection formulation") {
    registered()
    // the HOF form vector_srp_bucket replaces (from Similarity round 1)
    def hofBucket(vec: org.apache.spark.sql.Column, planeOffset: Int, numPlanes: Int, dim: Int) =
      aggregate(
        transform(sequence(lit(planeOffset), lit(planeOffset + numPlanes - 1)), p => {
          val proj = aggregate(zip_with(vec, sequence(lit(0), lit(dim - 1)),
            (x, j) => x.cast("double") * when(xxhash64(p, j).bitwiseAND(1L) === 1L, 1.0).otherwise(-1.0)),
            lit(0.0), (acc, x) => acc + x)
          when(proj >= 0, call_function("shiftleft", lit(1L), (p - planeOffset).cast("int"))).otherwise(0L)
        }),
        lit(0L), (acc, x) => acc.bitwiseOR(x))
    val rng = new java.util.SplittableRandom(11L)
    val vecs = (0 until 40).map(i => (i.toLong, Seq.fill(16)((rng.nextDouble() * 2 - 1).toFloat)))
    val df = vecs.toDF("id", "v")
    val out = df.select(
      call_function("vector_srp_bucket", col("v"), lit(3), lit(8)).as("native"),
      hofBucket(col("v"), 3, 8, 16).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1),
      s"native=${r.getLong(0).toBinaryString} hof=${r.getLong(1).toBinaryString}"))
  }

  test("vector_dot participates in whole-stage codegen") {
    registered()
    // derive arrays from range so the projection isn't constant-folded away
    val df = spark.range(8).select(
      array(col("id").cast("float"), lit(2.0f)).as("a"),
      array(lit(3.0f), col("id").cast("float")).as("b"))
    val q = df.select(call_function("vector_dot", col("a"), col("b")).as("d"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vector_dot"), plan)
    // and the codegen path computes the right values: 3*id + 2*id = 5*id
    val out = q.collect().map(_.getDouble(0)).sorted
    assert(out.toSeq === (0 until 8).map(_ * 5.0))
  }
}
