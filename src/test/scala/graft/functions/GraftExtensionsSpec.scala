package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions=GraftExtensions exposes graft functions to plain SQL") {
    val base = spark // materialize the shared context first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // a FRESH session on the same JVM context. `spark.sql.extensions` is a
      // STATIC conf — it cannot attach to an already-running context, so the
      // test goes through builder.withExtensions, which is exactly what
      // Spark's own conf path calls (applyExtensions) on a cold start
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne base, "getOrCreate returned the shared session — test is vacuous")
      val dot = s2.sql("SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) v")
        .head().getDouble(0)
      assert(dot === 11.0)
      val bucket = s2.sql("SELECT quantile_bucket(CAST(25 AS DOUBLE), array(10.0D, 20.0D, 30.0D)) b")
        .head().getInt(0)
      assert(bucket === 2)
      val bloom = s2.sql(
        "SELECT bloom_might_contain((SELECT bloom_agg(xxhash64(id), 10L, 640L) FROM range(3)), " +
          "xxhash64(1L)) hit").head().getBoolean(0)
      assert(bloom)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
