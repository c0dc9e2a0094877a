package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftInternal}
import org.apache.spark.sql.functions._
import graft.functions.{BloomFunctions, BloomUtil}

/** Bloom-prefiltered shuffle join — explicit semi-join reduction.
  *
  * In a 100 TB fact ⋈ selective-dim join, most fact rows have no
  * partner, yet a plain shuffle join pays to shuffle ALL of them.
  * Spark's runtime filter injection does this transparently when
  * statistics cooperate (demonstrated in RuntimeFilterSpec); this is
  * the LIBRARY-LEVEL version a pipeline author controls: build a
  * Bloom bit array of the build side's join keys (one fixed-size
  * aggregate), broadcast it, and drop probe rows row-locally BEFORE
  * the shuffle. False positives only cost their shuffle bytes — the
  * real join still discards them — and false negatives cannot happen,
  * so the result is IDENTICAL to the plain join (q47's oracle is
  * literally the plain join).
  *
  * Keys are hashed with `pmod(xxhash64(key), 2^31-1)` on BOTH sides —
  * collisions only add false positives, never drop a matching row
  * (equal keys always hash equal). */
object BloomJoin {

  private def keyHash(k: Column): Column =
    pmod(xxhash64(k), lit(BloomUtil.P))

  /** Inner-join `probe` (big side) to `build` on
    * `probeKey === buildKey`, prefiltering probe rows against a Bloom
    * sketch of the build keys before the join's shuffle.
    *
    * LAZY: the build side's sketch aggregate rides the probe filter as
    * an uncorrelated scalar subquery ([[GraftInternal.scalarSubquery]])
    * — no job runs when this is called; the first action on the
    * returned plan runs the sketch aggregate as one extra (small) job
    * and inlines the bytes as a constant in the generated probe filter
    * (one reference — NOT a column from a broadcast cross join:
    * attaching a 128 KiB binary column to every probe row copies it
    * into every UnsafeRow; measured, a 600k-row probe went from
    * sub-second to 20+ s on exactly that). This is the same shape as
    * Spark's own InjectRuntimeFilter, with the operator — and the
    * sketch parameters — under the pipeline author's control, and it
    * composes inside uncollected pipelines (BloomSpec counts jobs with
    * a SparkListener: zero at composition time, and exactly one sketch
    * job — plus one hot-key job — on the first action of a
    * BloomJoin-over-SkewJoin pipeline). The build side is the small side by contract;
    * the sketch is mBits/8 bytes regardless of its row count. */
  def prefilteredJoin(probe: DataFrame, probeKey: Column,
                      build: DataFrame, buildKey: Column,
                      mBits: Int = 1 << 20, numHashes: Int = 3,
                      seed: Long = 42L): DataFrame = {
    val bits = GraftInternal.scalarSubquery(build
      .select(keyHash(buildKey).as("__h"))
      .agg(BloomFunctions.bloomAgg(col("__h"), mBits, numHashes, seed)
        .as("__bloom")))
    // The probe filter goes through a PROJECTED column, not a direct
    // predicate on the join key: InferFiltersFromConstraints mirrors
    // any join-key predicate onto the OTHER side of the equi-join, so
    // the direct spelling re-probed every BUILD row against the Bloom
    // of its own keys (all pass — pure per-row cost) and duplicated
    // the sketch subquery into a second instance (the build-side
    // filter can't reuse the probe side's). The constraint on a
    // derived `__keep` attribute transfers nowhere; the filter still
    // sits directly above the probe scan, before the join exchange —
    // which is the only placement that matters.
    val kept = probe
      .withColumn("__keep", BloomFunctions.bloomHitCount(bits,
        array(keyHash(probeKey)), mBits, numHashes, seed))
      .filter(col("__keep") === 1L)
      .drop("__keep")
    kept.join(build, probeKey === buildKey)
  }

  /** [[prefilteredJoin]] with the Bloom SIZED from the build side's
    * measured key cardinality instead of a fixed `mBits`.
    *
    * A fixed-size Bloom is a scale bug waiting a decade to fire: the
    * 2^20-bit default holds ~75k keys at 14 bits/key (fpp ≈ 0.7%),
    * but the SAME query at 10× data pushes ~750k keys into the same
    * bitset — 1.4 bits/key, fpp ≈ 0.69 — and the prefilter silently
    * degrades into pure per-row overhead: every probe row pays the
    * hash+probe cost and ~70% of non-matching rows still ride the
    * shuffle (measured: q47 at sf10 was 6.6 s saturated vs 2.7 s
    * sized). Sizing makes fpp scale-invariant: `mBits` is the next
    * power of two ≥ `bitsPerKey × n` where `n` is a one-job
    * `approx_count_distinct` over the build keys — the build side is
    * dim-sized by contract, so the counting job is the same class of
    * planning action AQE runs between stages (and in production the
    * count is a standing ingest statistic, not a per-query job).
    * At 16 bits/key with 3 hashes fpp ≈ 0.6% at every scale; the cap
    * (default 2^27 bits = 16 MiB) bounds what gets broadcast into the
    * generated filter — past ~8M build keys the capped sketch
    * degrades gracefully toward the saturated regime, which is the
    * signal the build side stopped being "selective dim" and the
    * plain join (q47's oracle) is the right plan anyway. */
  def autoSizedPrefilteredJoin(probe: DataFrame, probeKey: Column,
                               build: DataFrame, buildKey: Column,
                               bitsPerKey: Int = 16, maxBits: Int = 1 << 27,
                               numHashes: Int = 3,
                               seed: Long = 42L): DataFrame = {
    val n = build.agg(approx_count_distinct(buildKey)).head().getLong(0)
    prefilteredJoin(probe, probeKey, build, buildKey,
      sizedBits(n, bitsPerKey, maxBits), numHashes, seed)
  }

  /** [[autoSizedPrefilteredJoin]] without the separate sizing job: the
    * SELF-SIZING sketch ([[graft.functions.BloomSketchAuto]]) counts
    * its build rows while accumulating bit positions mod `maxBits`
    * and folds itself to the next power of two ≥ bitsPerKey·n at eval
    * — exactly the size the two-job spelling would have picked
    * (sizing by row count, an upper bound of the key count), in ONE
    * build-side job. The probe takes its modulus from the sketch's
    * own length. Measured at sf10 (q47's shape over bucketed
    * layouts): the acd sizing job alone cost ~0.5–1 s, comparable to
    * the entire remaining join. Partials stay sparse (append-only
    * positions), so tasks also skip the 8–16 MiB random-access bitmap
    * of the fixed-size aggregate. */
  def selfSizedPrefilteredJoin(probe: DataFrame, probeKey: Column,
                               build: DataFrame, buildKey: Column,
                               bitsPerKey: Int = 16, maxBits: Int = 1 << 27,
                               numHashes: Int = 3,
                               seed: Long = 42L): DataFrame = {
    // Regime check BEFORE selectivity: a Bloom prefilter pays for
    // itself by shrinking the join's shuffle, so when the plain join
    // plans with NO shuffle at all — both sides co-bucketed on the
    // key (q65's layouts) — there are no shuffle bytes to save and
    // the sketch's build job + per-row probes are pure overhead.
    // Measured at sf10 over the shared bucketed layouts: 0.8 s plain
    // vs 0.95 s with the best-tuned filter. Planning-time only (one
    // extra Catalyst pass, no job); semantics identical either way.
    val plain = probe.join(build, probeKey === buildKey)
    if (isExchangeFree(plain)) return plain
    val bits = GraftInternal.scalarSubquery(build
      .select(keyHash(buildKey).as("__h"))
      .agg(graft.functions.BloomFunctions.bloomAggAuto(col("__h"), maxBits,
        bitsPerKey, numHashes, seed).as("__bloom")))
    val kept = probe
      .withColumn("__keep", graft.functions.BloomFunctions.bloomHitCountAuto(
        bits, array(keyHash(probeKey)), numHashes, seed))
      .filter(col("__keep") === 1L)
      .drop("__keep")
    kept.join(build, probeKey === buildKey)
  }

  /** True iff `joined` plans as a shuffle-CLASS join (sort-merge /
    * shuffled-hash) with zero hash Exchanges — the co-bucketed regime
    * where a probe prefilter has no shuffle bytes to save. Broadcast
    * plans are deliberately NOT this regime: they are exchange-free
    * too, but there the probe side never shuffles regardless and the
    * selectivity rule keeps making the call. Inspects the INITIAL
    * physical plan (planning time, no job); AQE can only remove
    * exchanges later, never add them. */
  private[graft] def isExchangeFree(joined: DataFrame): Boolean = {
    // walk the physical plan TREE (round-13 advisory: the previous
    // toString match was brittle to plan rendering changes) — a
    // mis-detection is perf-only (both branches are semantically
    // identical joins), but node-type matching can't rot with the
    // text format
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    // AdaptiveSparkPlanExec is a LeafExecNode — unwrap to its current
    // (here: initial, nothing has run) inner plan or the walk sees
    // nothing
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffleClassJoin = plan.exists {
      case _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
      case _ => false
    }
    val hashExchange = plan.exists {
      case e: ShuffleExchangeLike =>
        e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
      case _ => false
    }
    shuffleClassJoin && !hashExchange
  }

  /** Next power of two ≥ `bitsPerKey × n`, floored at 2^16 (the
    * sketch is never worth shrinking below 8 KiB) and capped at
    * `maxBits`. Power-of-two so `pmod(hash, m)` distributes evenly
    * for every geometry this library composes with. All arithmetic in
    * Long with the cap applied BEFORE the narrowing: a caller-supplied
    * maxBits near Int.MaxValue must clamp, not wrap negative; and an
    * exactly-power-of-two `want` is returned as itself, not doubled. */
  private[graft] def sizedBits(n: Long, bitsPerKey: Int, maxBits: Int): Int = {
    val want = math.max(1L, n) * bitsPerKey
    val next = math.max(1L << 16,
      java.lang.Long.highestOneBit(math.max(1L, want - 1)) << 1)
    math.min(maxBits.toLong, next).toInt
  }

  /** [[prefilteredJoin]] with the decision to filter made from the
    * sketch-statistic family instead of hoped-for selectivity: the
    * Bloom pass only pays off when it DROPS most probe rows, and
    * whether it will is exactly the q64 join-size question.
    *
    * `probeKeyCms` is a Count-Min sketch of `pmod(xxhash64(probeKey),
    * P)` — in production a STANDING statistic (maintained at ingest;
    * st12 is its streaming gauge), so the decision costs no probe
    * scan. The estimator: build a same-geometry CMS over the build
    * side's DISTINCT hashed keys (one dim-sized job, the same class
    * of planning action AQE runs between stages), then
    * `est_survivors = cms_join_size(probeCms, buildDistinctCms)` —
    * with 0/1 build counts the q64 dot product estimates Σ c_probe(k)
    * over matching keys, i.e. exactly the rows the Bloom would keep —
    * and `selectivity = est_survivors / total(probeCms)`. CMS never
    * underestimates, so the selectivity estimate is an UPPER bound:
    * the filter is skipped only when even the optimistic view of its
    * benefit is below `1 - maxSelectivity` — collisions can only make
    * the decision more conservative (skip when marginal), never
    * install a filter that cannot help... and never the reverse.
    *
    * Semantics are identical on both paths (the Bloom admits false
    * positives only), so the choice is invisible to results — the
    * spec pins both regimes and the equality. */
  def adaptivePrefilteredJoin(probe: DataFrame, probeKey: Column,
                              build: DataFrame, buildKey: Column,
                              probeKeyCms: Array[Byte],
                              depth: Int = 3, width: Int = 8192,
                              cmsSeed: Long = 42L,
                              maxSelectivity: Double = 0.5,
                              mBits: Int = 1 << 20, numHashes: Int = 3,
                              seed: Long = 42L): DataFrame = {
    import graft.functions.{CmsFunctions, CmsUtil}
    // regime first, selectivity second: in the co-bucketed plan there
    // is no probe-side Exchange for the filter to shrink, so even a
    // highly selective Bloom is a measured net loss — skip without
    // paying the build-side CMS job
    val plain = probe.join(build, probeKey === buildKey)
    if (isExchangeFree(plain)) return plain
    val buildCms = build
      .select(keyHash(buildKey).as("__h")).distinct()
      .agg(CmsFunctions.cmsAgg(col("__h"), depth, width, cmsSeed))
      .head().getAs[Array[Byte]](0)
    val est = CmsUtil.joinSizeEst(probeKeyCms, buildCms, depth, width)
    val total = CmsUtil.totalCount(probeKeyCms, depth, width)
    if (total > 0L && est.toDouble / total > maxSelectivity)
      plain
    else
      prefilteredJoin(probe, probeKey, build, buildKey,
        mBits, numHashes, seed)
  }

  /** The probe-side standing statistic [[adaptivePrefilteredJoin]]
    * consumes: a CMS over the hashed join key. One map-side-combined
    * pass; at 100 TB this is maintained incrementally, not rebuilt
    * per query. */
  def probeKeyCms(probe: DataFrame, probeKey: Column,
                  depth: Int = 3, width: Int = 8192,
                  cmsSeed: Long = 42L): Array[Byte] =
    probe.select(keyHash(probeKey).as("__h"))
      .agg(graft.functions.CmsFunctions.cmsAgg(col("__h"), depth, width,
        cmsSeed))
      .head().getAs[Array[Byte]](0)
}
