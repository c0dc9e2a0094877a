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

  // domainCap on the same skew: c=(400,16) → w=(20,4), Σw=24, N=208
  // → cap_common = 208·20/24 = 173 (floor), cap_rare = max(4, 208·4/24
  // = 34) = 34, but only 16 rare docs exist → all 16 kept.
  private def withIds = skewed.withColumn("doc_id",
    xxhash64(col("text")))

  test("domainCap: caps match the closed form; kept = min(cap, count)") {
    val kept = Mixing.domainCap(withIds, "src", col("text"), "doc_id")
    val caps = kept.select("src", "cap").distinct()
      .as[(String, Long)].collect().toMap
    assert(caps("common") == 173L, caps)
    assert(caps("rare") == 34L, caps)
    val counts = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts("common") == 173L, counts)
    assert(counts("rare") == 16L, counts)
  }

  test("domainCap: the floor keeps tail domains alive") {
    // a 2-doc tail domain: share-cap would be 208·1/25 = 8 ≥ floor
    // here, so shrink the budget instead: 3 domains of 3 docs each →
    // N = 4, w = 1 each, share = 4·1/3 = 1 < floor 4 → floor binds,
    // every domain keeps all 3 docs.
    val tiny = (1 to 9).map(i => (s"doc $i", s"dom${i % 3}"))
      .toDF("text", "src").withColumn("doc_id", xxhash64(col("text")))
    val kept = Mixing.domainCap(tiny, "src", col("text"), "doc_id")
    assert(kept.count() == 9L)
    assert(kept.select("cap").distinct().as[Long].collect().toSeq == Seq(4L))
  }

  test("domainCap: selection is content-keyed — invariant under partitioning") {
    val a = Mixing.domainCap(withIds, "src", col("text"), "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Mixing.domainCap(withIds.repartition(7), "src", col("text"), "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("d15 plan: caps broadcast back — the corpus is never shuffle-joined") {
    val p = SparkEntry.queries("d15_domain_cap")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ppsSystematicSample: exactly k grid hits, multiplicity for " +
      "items heavier than the stride, invariant under partitioning") {
    // total weight 1003, k = 4 → stride ≈ 250.75: the 1000-weight
    // item must absorb at least 3 grid points whatever the order
    val items = Seq((1L, 1000L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("doc_id", "n")
    val out = Mixing.ppsSystematicSample(items, col("doc_id"), col("n"), 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out.values.sum === 4, s"systematic must hit exactly k: $out")
    assert(out(1L) >= 3, s"heavy item under-sampled: $out")
    // corpus-scale: exactly k, and the selection is content-keyed —
    // identical under a different input partitioning
    val docs = Tables(spark, sfDir, "documents")
    val a = Mixing.ppsSystematicSample(docs, col("doc_id"),
      col("n_chars"), 50).collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(a.map(_._2).sum === 50)
    val b = Mixing.ppsSystematicSample(docs.repartition(7), col("doc_id"),
      col("n_chars"), 50).collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
  }

  test("ppsSystematicSample fails loudly on a non-castable id and on a " +
      "total weight that would overflow the 2k*W grid arithmetic") {
    import spark.implicits._
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    // id.cast(long) would silently NULL a non-numeric id and drop it
    val e1 = intercept[Exception] {
      Mixing.ppsSystematicSample(
        Seq(("doc-1", 10L)).toDF("id", "w"), col("id"), col("w"), 2)
        .collect()
    }
    assert(msgs(e1).contains("not castable"), e1.toString)
    // 2k*W beyond Long.MaxValue silently wrapped before; now loud
    val e2 = intercept[Exception] {
      Mixing.ppsSystematicSample(
        Seq((1L, 3000000000000000000L), (2L, 3000000000000000000L))
          .toDF("id", "w"), col("id"), col("w"), 2)
        .collect()
    }
    assert(msgs(e2).contains("overflows"), e2.toString)
  }
}
