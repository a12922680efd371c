package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * (millions of strings sharing one deletion — near-empty strings, a
  * boilerplate column) would make one join key quadratic; `maxVariantGroup`
  * fails loudly BEFORE the pair explosion with the offending variant named,
  * the RangeJoin-span-guard pattern — a silent skew cliff becomes a clear
  * data-quality error.
  */
object StringSim {

  /** All single-character deletions of `s` (length(s) variants). */
  private def del1(s: Column): Column =
    transform(sequence(lit(1), length(s)), i =>
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s) - i)))

  /** Pairs (k1 < k2) from `df` whose `strCol` values are within edit
    * distance ≤ 1, with the exact distance. Output: k1, k2, s1, s2, dist.
    */
  def editDistance1Join(df: DataFrame, keyCol: String, strCol: String,
      maxVariantGroup: Int = 100000): DataFrame =
    editDistanceJoin(df, keyCol, strCol, maxDist = 1, maxVariantGroup)

  /** Pairs (k1 < k2) from `df` whose `strCol` values are within edit
    * distance ≤ `maxDist` (1 or 2), with the exact distance.
    *
    * The deletion-neighborhood candidate set is COMPLETE for dist ≤ k (an
    * edit script of cost ≤ k deletes ≤ k characters from each side to reach
    * a common ancestor string) and over-approximates up to dist 2k — the
    * exact `levenshtein` verify discards the overshoot. Radius-2 fan-out is
    * ~L²/2 variants per string (the SymSpell trade: candidate-generation
    * cost for join-key locality); radius 1 is L+1.
    *
    * `maxVariantGroup` bounds the rows any single variant may group
    * (candidate pairs per variant ≤ bound²); exceeding it raises a clear
    * error instead of letting one hot key OOM the shuffle.
    */
  def editDistanceJoin(df: DataFrame, keyCol: String, strCol: String,
      maxDist: Int, maxVariantGroup: Int = 100000): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"editDistanceJoin: maxDist must be 1 or 2, got $maxDist")
    val base = df.select(col(keyCol).as("k"), col(strCol).as("s"))
    val s = col("s")
    // {s} ∪ {s minus one char} (∪ {s minus two chars} at radius 2),
    // deduplicated (repeated chars collapse)
    val radius1 = array_union(array(s), del1(s))
    val nbhd =
      if (maxDist == 1) radius1
      else array_union(radius1, flatten(transform(del1(s), t => del1(t))))
    val variants = base.withColumn("v", explode(array_distinct(nbhd)))
    // per-variant group-size guard: one window count over the same key the
    // join shuffles on (no second scan of the variant stream). The guard
    // lives INSIDE the join key itself — not a separate assert column
    // Catalyst could prune away: within-bound rows pass `v` through
    // untouched, a hot group routes the key through `raise_error`, so the
    // task fails naming the offending variant before any pair is built.
    val byVariant = org.apache.spark.sql.expressions.Window.partitionBy("v")
    val guarded = variants
      .withColumn("_vdf", count(lit(1)).over(byVariant))
      .withColumn("v", when(col("_vdf") <= maxVariantGroup, col("v"))
        .otherwise(raise_error(concat(
          lit(s"StringSim.editDistanceJoin(maxDist=$maxDist): variant group exceeds maxVariantGroup=$maxVariantGroup for variant '"),
          col("v"), lit("' — cap, pre-filter, or shard the hot value")))))
      .drop("_vdf")
    val left = guarded.select(col("k").as("k1"), col("s").as("s1"), col("v"))
    val right = guarded.select(col("k").as("k2"), col("s").as("s2"), col("v"))
    left.join(right, "v")
      .where(col("k1") < col("k2"))
      .select("k1", "k2", "s1", "s2")
      .distinct() // a true pair can share several variants (one per position)
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .where(col("dist") <= maxDist)
  }
}
