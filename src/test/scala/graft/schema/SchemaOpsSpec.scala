package graft.schema

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

class SchemaOpsSpec extends SparkSpec {
  import spark.implicits._

  test("conformToSchema null-fills missing fields recursively, incl. inside arrays of structs") {
    val df = spark.read.json(spark.createDataset(Seq(
      """{"source_id":"x","structure":{"sites":[{"label":"A","abc":[0.1]}]},"data":{"band_gap":1.5}}""")))
    val out = SchemaOps.conformToSchema(df, CrystalSchema.schema)
    assert(out.schema === CrystalSchema.schema)
    val row = out.select(
      col("source_id"),
      col("structure.sites")(0).getField("label"),
      col("structure.sites")(0).getField("properties").isNull,
      col("data.band_gap"), col("data.energy_total").isNull,
      col("symmetry").isNull).head()
    assert(row === Row("x", "A", true, 1.5, true, true))
  }

  test("conformToSchema is idempotent") {
    val df = spark.read.json(spark.createDataset(Seq(
      """{"source_id":"x","species":["A","B"],"lattice":{"a":1.0,"volume":2.0}}""")))
    val once = SchemaOps.conformToSchema(df, CrystalSchema.schema)
    val twice = SchemaOps.conformToSchema(once, CrystalSchema.schema)
    assert(once.schema === twice.schema)
    assert(once.collect() === twice.collect())
  }

  test("conformToSchema preserves null structs (no structs-of-nulls)") {
    val df = spark.read.json(spark.createDataset(Seq(
      """{"source_id":"a","symmetry":{"number":221}}""", """{"source_id":"b"}""")))
    val out = SchemaOps.conformToSchema(df, CrystalSchema.schema).orderBy("source_id")
    val rows = out.select(col("symmetry").isNull, col("symmetry.number")).collect()
    assert(rows(0) === Row(false, 221))
    assert(rows(1) === Row(true, null))
  }

  test("unflatten(flatten(df)) round-trips schema and data") {
    val df = Seq((1L, "s1", 2.0, 3L), (2L, "s2", 4.0, 5L))
      .toDF("k", "a", "b", "c")
      .select(col("k"), struct(col("a"), struct(col("b"), col("c")).as("inner")).as("nested"))
    val flat = SchemaOps.flatten(df)
    assert(flat.columns.toSeq === Seq("k", "nested.a", "nested.inner.b", "nested.inner.c"))
    val back = SchemaOps.unflatten(flat)
    assert(back.schema === df.schema)
    assert(back.orderBy("k").collect() === df.orderBy("k").collect())
  }

  test("flatten leaves arrays intact") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("k", "xs")
      .select(col("k"), struct(col("xs")).as("s"))
    val flat = SchemaOps.flatten(df)
    assert(flat.columns.toSeq === Seq("k", "s.xs"))
    assert(flat.select(col("`s.xs`")).head().getSeq[Double](0) === Seq(1.0, 2.0))
  }
}
