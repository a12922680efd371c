package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_set6 computes EXCEPT ALL / INTERSECT ALL multiplicities with a single
  * groupBy (one shuffle). This spec pins that rewrite to the literal Dataset
  * set-op operators on a fixture with every multiplicity shape: a-only,
  * b-only, equal counts, a-heavy, b-heavy.
  */
class SetOpSpec extends SparkSpec {
  import spark.implicits._

  test("single-pass multiset counts equal exceptAll/intersectAll") {
    // key -> (count in a, count in b)
    val shapes = Map(1L -> (3, 0), 2L -> (0, 2), 3L -> (2, 2), 4L -> (5, 1), 5L -> (1, 4))
    val a = shapes.toSeq.flatMap { case (k, (na, _)) => Seq.fill(na)(k) }.toDF("k")
    val b = shapes.toSeq.flatMap { case (k, (_, nb)) => Seq.fill(nb)(k) }.toDF("k")

    val viaSetOps = a.exceptAll(b).groupBy("k").agg(count(lit(1)).as("n_exc"))
      .join(a.intersectAll(b).groupBy("k").agg(count(lit(1)).as("n_int")), Seq("k"), "left")
      .select(col("k"), col("n_exc"), coalesce(col("n_int"), lit(0L)).as("n_int"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val singlePass = a.select(col("k"), lit(1L).as("in_a"), lit(0L).as("in_b"))
      .unionAll(b.select(col("k"), lit(0L), lit(1L)))
      .groupBy("k")
      .agg(sum("in_a").as("cnt_a"), sum("in_b").as("cnt_b"))
      .select(col("k"),
        greatest(col("cnt_a") - col("cnt_b"), lit(0L)).as("n_exc"),
        least(col("cnt_a"), col("cnt_b")).as("n_int"))
      .filter(col("n_exc") >= 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(viaSetOps === singlePass)
    // and the expected values by hand
    assert(singlePass === Map(1L -> (3L, 0L), 4L -> (4L, 1L)))
  }
}
