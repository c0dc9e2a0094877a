package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixing

/** Temperature mixing (Mixing.mixtureCopies): exact integer rates,
  * rare-source upsampling via repetition, and content-keyed selection
  * invariant under partitioning.
  */
class MixingSpec extends TestSpark {
  import spark.implicits._

  // 400 common docs vs 16 rare: c=(400,16) → w=isqrt=(20,4), Σw=24,
  // N = 416/2 = 208 → rate_ppm common = 208e6·20/(24·400) = 433_333,
  // rare = 208e6·4/(24·16) = 2_166_666 (floor) — rare docs upsample.
  private def skewed = (
    (1 to 400).map(i => (s"common doc number $i", "common")) ++
      (1 to 16).map(i => (s"rare doc number $i", "rare"))
    ).toDF("text", "src")

  test("integer rates match the closed form; rare source upsamples") {
    val rates = Mixing.mixtureCopies(skewed, "src", col("text"))
      .select("src", "rate_ppm").distinct().as[(String, Long)].collect().toMap
    assert(rates("common") == 433333L)
    assert(rates("rare") == 2166666L)
    // every rare doc gets >= floor(rate) = 2 copies; some get 3
    val rare = Mixing.mixtureCopies(skewed, "src", col("text"))
      .filter(col("src") === "rare").select("copies").as[Long].collect()
    assert(rare.forall(_ >= 2L))
    // rate frac = 166666 ppm ≈ 1/6, so ~16/6 ≈ 2.7 docs get the extra
    // copy — and the fingerprint is deterministic, so the exact count
    // is fixed and asserted exactly (3 of 16 docs hash below the frac)
    assert(rare.count(_ == 3L) == 3, s"3-copy docs: ${rare.count(_ == 3L)}")
  }

  test("total copies land near the target N") {
    val total = Mixing.mixtureCopies(skewed, "src", col("text"))
      .agg(sum("copies")).as[Long].head()
    // N = 208; hash selection is binomial around the fractional rates
    assert(math.abs(total - 208L) <= 40L, s"total=$total")
  }

  test("per-doc copies are content-keyed: invariant under partitioning") {
    val a = Mixing.mixtureCopies(skewed, "src", col("text"))
      .select("text", "copies").as[(String, Long)].collect().toMap
    val b = Mixing.mixtureCopies(skewed.repartition(7), "src", col("text"))
      .select("text", "copies").as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("q52 plan: rates broadcast, corpus never shuffle-joined") {
    val p = SparkEntry.queries("q52_mixture_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
