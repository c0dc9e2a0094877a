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

  test("edit_within_1 counts CODE POINTS like levenshtein, not char " +
      "units — supplementary-plane text agrees with the contract") {
    // U+1F600 is two Java chars; substituting it for a BMP char is
    // ONE code-point edit (levenshtein = 1) but TWO char edits — a
    // char-unit implementation answers false on every case below
    assert(w1("😀", "x"))            // astral -> BMP substitution
    assert(w1("😀x", "😀")) // BMP append after astral
    assert(w1("😀😀", "😀x")) // substitution
    assert(w1("😀", "😁")) // astral <-> astral
    assert(!w1("😀😀", "xy")) // two cp substitutions
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

  test("the variant-bucket cap drops hot-variant candidates; pairs with " +
      "a selective shared variant survive") {
    // ten strings "a0".."a9": every pair is distance 1 ONLY through
    // the hot variant "a" (deleting the digit) — bucket size 10.
    // Two strings "zzx"/"zzy" pair through selective variants too.
    val rows = ((0L to 9L).map(i => (i, s"a$i")) ++
      Seq((20L, "zzx"), (21L, "zzy"))).toDF("id", "name")
    val uncapped = FuzzyJoin.editDistance1Pairs(rows, col("id"), col("name"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size === 45 + 1) // C(10,2) digit pairs + the zz pair
    val capped = FuzzyJoin.editDistance1Pairs(rows, col("id"), col("name"),
      maxBucket = Some(4L)).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    // the "a" bucket (10 > 4) is dropped -> all 45 digit pairs gone;
    // "zzx"/"zzy" still meet at variant "zz" (bucket size 2)
    assert(capped === Set((20L, 21L)))
  }

  test("bare editDistance1Pairs frees its variant stage (no corpus-" +
      "sized cache left behind for the session lifetime)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val rows = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz")).toDF("id", "name")
    val out = FuzzyJoin.editDistance1Pairs(rows, col("id"), col("name"))
    assert(out.select("id_a", "id_b").as[(Long, Long)]
      .collect().toSet === Set((1L, 2L)))
    // only the eager result checkpoint may remain persisted — the
    // corpus-sized variant stage must be gone
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"leaked persisted RDDs: $leaked")
  }

  test("Staged variant: the variant table is persisted once and freed " +
      "by cleanup()") {
    val rows = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz")).toDF("id", "name")
    val staged = FuzzyJoin.editDistance1PairsStaged(rows, col("id"),
      col("name"), maxBucket = Some(4L))
    assert(staged.result.select("id_a", "id_b").as[(Long, Long)]
      .collect().toSet === Set((1L, 2L)))
    assert(staged.stages.size === 1)
    assert(staged.stages.head.storageLevel.useMemory)
    staged.cleanup()
    assert(!staged.stages.head.storageLevel.useMemory)
  }
}
