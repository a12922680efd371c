package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handles most runtime skew;
  * explicit salting remains the tool when a single join/grouping key is so
  * hot that even split shuffle blocks overwhelm one task (power-law keys at
  * 100 TB).
  */
object SkewOps {

  /** Salted equi-join: the skewed (big) side gets a deterministic per-row
    * salt in [0, saltFactor); the small side is replicated once per salt
    * value; the join runs on (key, salt), spreading each hot key over
    * `saltFactor` tasks.
    *
    * The salt is a content hash (not rand()/monotonic id), so task retries
    * and replays produce identical partitioning — required for correctness
    * under speculative execution.
    *
    * Result equals `big.join(small, key, joinType)` exactly (verified in
    * SkewOpsSpec). Supported joinTypes: the ones where replicating the
    * small side is sound — inner, left_outer, left_semi.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer", "left", "left_semi").contains(joinType),
      s"saltedJoin: replicating the right side is unsound for $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(c => col(s"`$c`")): _*), lit(saltFactor)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedBig.join(replicatedSmall,
        saltedBig(key) === replicatedSmall(key) && saltedBig("__salt") === replicatedSmall("__salt"),
        joinType)
      .drop(replicatedSmall(key)).drop(saltedBig("__salt")).drop(replicatedSmall("__salt"))
  }
}
