package graft

import org.apache.spark.sql.functions._
import graft.functions.EditDistanceUtil
import graft.operators.FuzzyJoin
import org.apache.spark.unsafe.types.UTF8String

class FuzzyJoinSpec extends TestSpark {
  import spark.implicits._

  private def w1(a: String, b: String): Boolean =
    EditDistanceUtil.within1(UTF8String.fromString(a),
      UTF8String.fromString(b))

  test("edit_within_1 agrees with levenshtein on every boundary case") {
    assert(w1("abc", "abc"))        // equal
    assert(w1("abc", "axc"))        // substitution
    assert(w1("abc", "abcd"))       // append
    assert(w1("abc", "xabc"))       // prepend
    assert(w1("abc", "ac"))         // deletion
    assert(w1("", "a") && w1("", ""))
    assert(!w1("abc", "axx"))       // two substitutions
    assert(!w1("abc", "abcde"))     // length gap 2
    assert(!w1("abc", "cab"))       // rotation = distance 2
    assert(!w1("ab", "ba"))         // transposition = distance 2
    // run-heavy strings (the variant-collision shape)
    assert(w1("aaab", "aabb"))
    assert(!w1("aaab", "abbb"))
  }

  test("FastSS pairs equal the brute-force levenshtein truth") {
    val names = Seq("alpha", "alphb", "alpa", "xalpha", "beta", "betas",
      "gamma", "gamma", "delta", "delt", "delty", "aab", "abb", "ab")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = names.toDF("id", "name")
    val got = FuzzyJoin.editDistance1Pairs(df, col("id"), col("name"))
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().toSet
    val want = (for {
      (ia, sa) <- names; (ib, sb) <- names if ia < ib
      d = levenshteinRef(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got === want)
    assert(want.exists(_._3 == 0)) // the duplicate "gamma" pair
    assert(want.exists(_._3 == 1))
  }

  /** Textbook DP reference, test-only. */
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
