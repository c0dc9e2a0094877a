package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy self-join (d19) — FastSS deletion
  * neighborhoods (Bocek et al. '07), the spelling-variant miner:
  * two strings are within edit distance 1 iff they share a member of
  * their deletion neighborhoods (the string itself plus every
  * single-character deletion) — substitutions meet at the deletion of
  * the differing position, insert/delete pairs meet at the shorter
  * string itself. So candidates come from an EQUI-join on variants —
  * |s|+1 variant rows per string, never the O(n²) cross join — and a
  * cheap levenshtein verify (codegen'd built-in on both engines)
  * removes the false candidates — pairs whose deletions at DIFFERENT
  * positions produce the same variant sit at edit distance 2 (e.g.
  * "aab"/"abb" meet at "ab") — keeping only true ≤1 pairs.
  *
  * Verify-then-distinct (SURVEY §4): levenshtein is row-local-cheap
  * and runs BELOW the pair-dedup exchange, so only survivors shuffle.
  * At 100 TB the variant fan-out is (avg length + 1)× the keys — the
  * price of never materializing a cross join; for longer strings cap
  * the neighborhood to a prefix or hash the variants (same join, 8-
  * byte keys). */
object FuzzyJoin {

  /** All (id_a < id_b) pairs of non-empty strings within edit
    * distance `maxDist` ∈ {0, 1}. Output: (id_a, id_b, dist). */
  def editDistance1Pairs(df: DataFrame, id: Column, str: Column): DataFrame = {
    val base = df.select(id.cast("long").as("id"), str.as("s"))
      .filter(col("s").isNotNull && length(col("s")) > 0)
    // the string itself (0-deletion) + every 1-deletion variant;
    // sequence() would run DESCENDING for the empty string, hence the
    // non-empty guard above. array_distinct is load-bearing, not
    // cosmetic: deleting any char of an m-long run yields the SAME
    // variant, so a string with run length r emits r duplicate rows
    // and the candidate join multiplies r_a·r_b per true pair —
    // measured 36× pair inflation on zero-padded supplier names at
    // sf1. Row-local dedup keeps the fan-out at distinct variants.
    val vars = base.select(col("id"), col("s"),
      explode(array_distinct(concat(array(col("s")),
        expr("transform(sequence(1, length(s)), " +
          "i -> concat(substr(s, 1, i-1), substr(s, i+1)))")))).as("v"))
    // the bounded two-pointer check, not the DP levenshtein: the DP
    // on the candidate stream measured ~19 s of the sf1 wall (4.35M
    // pairs); edit_within_1 answers the same predicate in one pass
    vars.as("a").join(vars.as("b"),
        col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .filter(graft.functions.EditDistanceFunctions
        .editWithin1(col("a.s"), col("b.s")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        when(col("a.s") === col("b.s"), 0).otherwise(1).as("dist"))
      .distinct()
  }
}
