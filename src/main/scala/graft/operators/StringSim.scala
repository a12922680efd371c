package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** String-similarity self-join: all pairs within edit distance ≤ 1, without
  * the quadratic all-pairs comparison Catalyst would otherwise plan (a
  * levenshtein theta-join has no equi-key, so the naive formulation is a
  * BroadcastNestedLoopJoin — the same cliff RangeJoin removes for intervals).
  *
  * Candidate generation uses deletion neighborhoods (the SymSpell trick):
  * for any two strings u, v with levenshtein(u, v) ≤ 1, the sets
  * {u} ∪ {u minus one char} and {v} ∪ {v minus one char} intersect —
  * a substitution at position i makes both i-deletions equal, an
  * insertion/deletion makes one string a member of the other's neighborhood,
  * and equality is the shared original. So an equi-join on the variant
  * string finds every true pair, and an exact `levenshtein` verify on the
  * candidates only discards the false positives (unrelated strings that
  * happen to share a deletion).
  *
  * Scale shape: fan-out is length+1 variants per row (array_distinct'd), the
  * join is a shuffled equi-join on the variant string, and verification cost
  * is proportional to candidate pairs, not N². A pathologically hot variant
  * (millions of strings sharing one deletion) would skew the shuffle — at
  * that point the same df-cap used by Dedup.jaccardPairs applies; for
  * key-like and natural-text columns the variant distribution is flat.
  */
object StringSim {

  /** Pairs (k1 < k2) from `df` whose `strCol` values are within edit
    * distance ≤ 1, with the exact distance. Output: k1, k2, s1, s2, dist.
    */
  def editDistance1Join(df: DataFrame, keyCol: String, strCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("k"), col(strCol).as("s"))
    // {s} ∪ {s with char i removed}, deduplicated (repeated chars collapse)
    val variants = base.withColumn(
      "v",
      explode(array_distinct(array_union(
        array(col("s")),
        transform(sequence(lit(1), length(col("s"))), i =>
          concat(col("s").substr(lit(1), i - 1),
            col("s").substr(i + 1, length(col("s")) - i)))))))
    val left = variants.select(col("k").as("k1"), col("s").as("s1"), col("v"))
    val right = variants.select(col("k").as("k2"), col("s").as("s2"), col("v"))
    left.join(right, "v")
      .where(col("k1") < col("k2"))
      .select("k1", "k2", "s1", "s2")
      .distinct() // a true pair can share several variants (one per position)
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .where(col("dist") <= 1)
  }
}
