package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames.
  *
  * Sits beside the connected-components machinery in [[Dedup]] (min-label
  * propagation): PageRank is the other graph primitive a corpus pipeline
  * reaches for — source/domain authority weighting for quality scoring.
  *
  * Scale design: the edge list is normalized ONCE (w/outw) and reused every
  * iteration; each iteration is one shuffle join (edges ⋈ ranks on src) plus
  * one aggregation (sum by dst) — the canonical distributed PageRank shape.
  * Ranks are cached per iteration and the previous iteration is unpersisted,
  * so lineage stays shallow without checkpoint IO at small iteration counts
  * (callers doing 50+ iterations should localCheckpoint every ~10). The
  * node count N enters the plan as a broadcast 1-row aggregate, never a
  * driver-side collect.
  */
object Graph {

  /** Weighted PageRank with damping `d`:
    *
    *   rank₀(v)   = 1/N
    *   rankₖ₊₁(v) = (1−d)/N + d · Σ_{(u,v)∈E} rankₖ(u) · w(u,v)/outw(u)
    *
    * Dangling-node mass is NOT redistributed (documented semantics — ranks
    * sum to slightly under 1 when sinks exist; the test graphs have none).
    * Output: (node, rank DOUBLE rounded to 6), one row per distinct node.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "Graph.pageRank: iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n1 = nodes.agg(count(lit(1)).cast("double").as("n"))
    val outw = e.groupBy("src").agg(sum(col("w")).as("outw"))
    val p = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("outw")).as("p"))
      .cache()

    var ranks = nodes.crossJoin(broadcast(n1))
      .select(col("node"), (lit(1.0) / col("n")).as("rank")).cache()
    for (_ <- 1 to iterations) {
      val contrib = p.join(ranks, p("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("p")).as("in_mass"))
      val prev = ranks
      ranks = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(n1))
        .select(col("node"),
          (lit(1.0 - damping) / col("n") + lit(damping) * coalesce(col("in_mass"), lit(0.0)))
            .as("rank"))
        .cache()
      // materialize before dropping the parent so the cut lineage is never
      // recomputed from an unpersisted frame
      ranks.count()
      prev.unpersist()
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
