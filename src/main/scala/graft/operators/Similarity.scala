package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[cosineTopK]] — exact brute force: broadcast the (small) query set,
  *    score every row, per-query top-k via window. O(n·q·dim) but one scan,
  *    no shuffle of the big side except the final top-k; the correctness
  *    baseline at any scale where q is small.
  *  - [[lshCosineTopK]] — sign-random-projection LSH: bucket vectors by the
  *    signs of dot products with deterministic pseudo-random hyperplanes,
  *    then score only same-bucket candidates. The 100 TB path: candidates
  *    per query ∝ bucket size, not n.
  *
  * Dot products and SRP bucket ids run through the native codegen
  * expressions `vector_dot` / `vector_srp_bucket`
  * (graft.functions.VectorDot) — tight primitive loops inside whole-stage
  * codegen, no UDFs, no interpreted higher-order functions in the inner
  * loops.
  */
object Similarity {

  /** OpUtils.spread plus defensive registration of the native vector
    * functions every operator below depends on.
    */
  private def spread(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    OpUtils.spread(df)
  }

  /** Double-precision dot product via the native codegen'd
    * [[graft.functions.VectorDot]] expression (the HOF formulation
    * `aggregate(zip_with(...))` is CodegenFallback — interpreted per
    * element). Requires `GraftFunctions.register` on the session; every
    * DataFrame-level operator here does so defensively.
    */
  def dot(a: Column, b: Column): Column = call_function("vector_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))


  /** Exact top-k cosine neighbors for each query row.
    *
    * @param vectors  corpus (idCol, vecCol)
    * @param queries  query rows, same schema — must be small enough to
    *                 broadcast (it is hinted)
    */
  def cosineTopK(vectors: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val v = spread(vectors).select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("rn"), col("cos"))
  }

  /** Sign-random-projection bucket id: numPlanes sign bits packed into a
    * long, via the native codegen'd [[graft.functions.VectorSrpBucket]]
    * (bit-identical to the HOF formulation it replaced — VectorDotSpec —
    * but without interpreted lambda dispatch per plane × component, and
    * sized from the actual array instead of a caller-supplied dim).
    */
  def srpBucket(vec: Column, numPlanes: Int): Column =
    srpBucketOffset(vec, 0, numPlanes)

  /** One (table, bucket) struct per LSH table. Multi-table is the standard
    * recall lever: a neighbor is a candidate if it shares the bucket in ANY
    * table — P(candidate) = 1-(1-(1-θ/π)^planes)^tables, vs a single table's
    * (1-θ/π)^planes which decays fast.
    */
  private def srpTables(vec: Column, numTables: Int, planesPerTable: Int): Column =
    array((0 until numTables).map(t =>
      struct(lit(t).as("tbl"),
        srpBucketOffset(vec, t * planesPerTable, planesPerTable).as("bkt"))): _*)

  private def srpBucketOffset(vec: Column, planeOffset: Int, numPlanes: Int): Column =
    call_function("vector_srp_bucket", vec, lit(planeOffset), lit(numPlanes))

  /** Approximate top-k cosine via multi-table SRP-LSH: candidates = union of
    * same-bucket rows over `numTables` independent sign-projection tables,
    * then exact scoring of candidates only. Recall vs [[cosineTopK]] is
    * asserted in the test suite.
    */
  def lshCosineTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, numTables: Int = 8,
                    planesPerTable: Int = 4): DataFrame = {
    val v = spread(vectors).select(col(idCol).as("nid"), col(vecCol).as("nv"),
        explode(srpTables(col(vecCol), numTables, planesPerTable)).as("h"))
      .select(col("nid"), col("nv"), col("h.tbl").as("tbl"), col("h.bkt").as("bkt"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
        explode(srpTables(col(vecCol), numTables, planesPerTable)).as("h"))
      .select(col("qid"), col("qv"), col("h.tbl").as("qtbl"), col("h.bkt").as("qbkt"))
    val candidates = v.join(broadcast(q),
        col("tbl") === col("qtbl") && col("bkt") === col("qbkt") && col("qid") =!= col("nid"))
      .select(col("qid"), col("qv"), col("nid"), col("nv"))
      .dropDuplicates("qid", "nid")
    val scored = candidates.withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("rn"), col("cos"))
  }

  /** IVF-style ANN: partition the corpus into `numCentroids` Voronoi cells,
    * probe the `nprobe` cells nearest each query, score only those cells.
    *
    * Centroid selection here is the deterministic baseline (the first
    * `numCentroids` vectors by id); a production index would k-means them —
    * the assignment/probe/scoring dataflow is identical. Candidates per
    * query ≈ n·nprobe/numCentroids, the scale lever at 100 TB: centroids are
    * broadcast, the corpus is scanned once for assignment (a write-time,
    * amortizable step) and the query join touches only probed cells.
    */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numCentroids: Int = 16,
              nprobe: Int = 4): DataFrame = {
    val cent = vectors.orderBy(col(idCol)).limit(numCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    // nearest centroid per corpus vector (ties broken by lowest cid)
    val v = spread(vectors).select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val assigned = v.crossJoin(broadcast(cent))
      .withColumn("ccos", cosine(col("nv"), col("cv")))
      .groupBy("nid")
      .agg(max_by(struct(col("nv"), col("cid")), struct(col("ccos"), -col("cid"))).as("best"))
      .select(col("nid"), col("best.nv").as("nv"), col("best.cid").as("cell"))
    // nprobe nearest centroids per query
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy("qid").orderBy(col("pcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("pcos", cosine(col("qv"), col("cv")))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid").as("cell"))
    // exact scoring within probed cells only
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("rn"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine >= tau,
    * multi-table LSH-bucketed so the pair join is per-bucket, not n². High
    * tau means tiny angle, so per-table collision probability is high and
    * recall is near-1 with a handful of tables.
    */
  def cosineNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                         tau: Double, numTables: Int = 8, planesPerTable: Int = 8,
): DataFrame = {
    val v = spread(vectors).select(col(idCol).as("id"), col(vecCol).as("v"),
        explode(srpTables(col(vecCol), numTables, planesPerTable)).as("h"))
      .select(col("id"), col("v"), col("h.tbl").as("tbl"), col("h.bkt").as("bkt"))
    v.as("a")
      .join(v.select(col("id").as("id2"), col("v").as("v2"),
        col("tbl").as("tbl2"), col("bkt").as("bkt2")).as("b"),
        col("tbl") === col("tbl2") && col("bkt") === col("bkt2") && col("a.id") < col("id2"))
      .select(col("a.id").as("d1"), col("id2").as("d2"), col("v"), col("v2"))
      .dropDuplicates("d1", "d2")
      .withColumn("cos", cosine(col("v"), col("v2")))
      .filter(col("cos") >= tau)
      .select(col("d1"), col("d2"), col("cos"))
  }
}
