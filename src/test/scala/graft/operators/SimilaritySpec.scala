package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random unit-ish vectors in `dim` dims, clustered:
    * vector i belongs to cluster i % clusters; cluster base + small
    * per-vector jitter, so same-cluster vectors have high cosine.
    */
  private def clustered(n: Int, dim: Int, clusters: Int, jitter: Double): Seq[(Long, Seq[Float])] = {
    val rng = new java.util.SplittableRandom(42L)
    val bases = Seq.fill(clusters)(Seq.fill(dim)(rng.nextDouble() * 2 - 1))
    (0 until n).map { i =>
      val base = bases(i % clusters)
      val v = base.map(x => (x + (rng.nextDouble() * 2 - 1) * jitter).toFloat)
      (i.toLong, v)
    }
  }

  test("cosineTopK ranks an identical vector first") {
    val vecs = clustered(40, 16, 4, jitter = 0.05)
    // vector 36 is in cluster 0 alongside 0, 4, 8...
    val df = vecs.toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(df, df.filter($"vec_id" === 0), "vec_id", "embedding", k = 5)
      .orderBy("rn").collect()
    assert(top.length === 5)
    // all top-5 neighbors of a cluster-0 member are cluster-0 members
    assert(top.forall(r => r.getAs[Long]("nid") % 4 === 0))
    assert(top.head.getAs[Double]("cos") > 0.99)
  }

  test("lshCosineTopK recalls most exact top-k on clustered data") {
    val df = clustered(60, 16, 4, jitter = 0.05).toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" < 3)
    val exact = Similarity.cosineTopK(df, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val approx = Similarity.lshCosineTopK(df, q, "vec_id", "embedding", k = 5,
        numTables = 8, planesPerTable = 4)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall below 0.8")
  }

  test("ivfTopK achieves high recall when probing covers the query's cluster") {
    val df = clustered(80, 16, 4, jitter = 0.05).toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" < 3)
    val exact = Similarity.cosineTopK(df, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val ivf = Similarity.ivfTopK(df, q, "vec_id", "embedding", k = 5,
        numCentroids = 8, nprobe = 4)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall below 0.8")
  }

  test("cosineNearDupPairs finds planted near-duplicates and no unrelated pairs") {
    val rng = new java.util.SplittableRandom(7L)
    val base = Seq.fill(32)(rng.nextDouble() * 2 - 1)
    val dup1 = base.map(x => (x + 0.001).toFloat)
    val dup2 = base.map(x => (x - 0.001).toFloat)
    val others = (0 until 20).map(i => Seq.fill(32)((rng.nextDouble() * 2 - 1).toFloat))
    val df = ((100L, dup1) +: (101L, dup2) +: others.zipWithIndex.map { case (v, i) => (i.toLong, v) })
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", tau = 0.99,
        numTables = 8, planesPerTable = 8)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(pairs === Set((100L, 101L)))
  }
}
