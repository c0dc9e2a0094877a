package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomFunctions
import graft.operators.Dedup

/** Bloom-sketch decontamination (d09): bit-array determinism under
  * repartitioning, the no-false-negative guarantee, false positives
  * appearing exactly when the array saturates, and the corpus-side
  * plan staying shuffle-free. */
class BloomSpec extends TestSpark {
  import spark.implicits._

  private def docs = Tables(spark, sfDir, "documents")

  private def benchHashes = docs.filter(col("doc_id") % 29 === 0)
    .select(explode(Dedup.shingleHashes(col("text"))).as("h"))

  test("bloom sketch bytes are identical under any partitioning") {
    def bytesOf(parts: Int) = benchHashes.repartition(parts, col("h"))
      .agg(BloomFunctions.bloomAgg(col("h"), mBits = 1 << 14).as("b"))
      .as[Array[Byte]].head()
    val one = bytesOf(1)
    val many = bytesOf(7)
    assert(java.util.Arrays.equals(one, many))
    assert(one.length === (1 << 14) / 8)
  }

  test("bloomContamination never misses: hits >= exact membership, " +
       "equal when the array is large enough") {
    val bench = docs.filter(col("doc_id") % 29 === 0)
    // exact counterpart of the bloom semantics: # doc shingles present
    // in the UNION of benchmark shingles
    val corpusH = docs.select(col("doc_id"),
      explode(Dedup.shingleHashes(col("text"))).as("h"))
    val benchH = bench.select(explode(Dedup.shingleHashes(col("text"))).as("h"))
      .distinct()
    val exact = corpusH.join(benchH, "h").groupBy("doc_id")
      .agg(count(lit(1)).as("n_exact"))
    def bloomAt(mBits: Int) = Dedup.bloomContamination(
      docs, col("doc_id"), col("text"), bench, col("text"),
      mBits = mBits, minHitMilli = 0L)
    // big array: no false positive on this corpus — exact equality
    val big = bloomAt(1 << 20).join(exact, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_hits"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
      .as[(Long, Long, Long)].collect()
    assert(big.nonEmpty)
    assert(big.forall { case (_, hits, ex) => hits === ex })
    // tiny array (64 bits, mostly saturated): still never BELOW exact
    // (no false negatives), and false positives must appear
    val tiny = bloomAt(64).join(exact, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_hits"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
      .as[(Long, Long, Long)].collect()
    assert(tiny.forall { case (_, hits, ex) => hits >= ex })
    assert(tiny.exists { case (_, hits, ex) => hits > ex })
  }

  test("benchmark docs flag themselves at exactly 1000 per-mille") {
    val flagged = Dedup.bloomContamination(
      docs, col("doc_id"), col("text"),
      docs.filter(col("doc_id") % 29 === 0), col("text"),
      minHitMilli = 1000L)
      .select("doc_id").as[Long].collect().toSet
    val benchIds = docs.filter(col("doc_id") % 29 === 0)
      .select("doc_id").as[Long].collect().toSet
    assert((benchIds -- flagged).isEmpty,
      s"benchmark members missing from their own bloom: ${benchIds -- flagged}")
  }

  test("out-of-range hash input fails loudly") {
    val e = intercept[Exception] {
      Seq(5L, -1L).toDF("h")
        .agg(BloomFunctions.bloomAgg(col("h")))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("outside")), e)
  }

  test("bloom-prefiltered join: identical to the plain join, filter " +
       "drops rows before the shuffle") {
    import graft.operators.BloomJoin
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // fact-fact shape
      val li = Tables(spark, sfDir, "lineitem")
      val hot = Tables(spark, sfDir, "orders")
        .filter(col("o_totalprice") > 400000)
      val pre = BloomJoin.prefilteredJoin(li, col("l_orderkey"),
        hot, col("o_orderkey"))
      val plain = li.join(hot, col("l_orderkey") === col("o_orderkey"))
      assert(pre.count() === plain.count())
      assert(pre.select("l_orderkey", "l_linenumber")
        .exceptAll(plain.select("l_orderkey", "l_linenumber")).isEmpty)
      // the prefilter really reduces the shuffled probe side
      val bloom = hot.select(
          org.apache.spark.sql.functions.pmod(xxhash64(col("o_orderkey")),
            lit(graft.functions.BloomUtil.P)).as("h"))
        .agg(graft.functions.BloomFunctions.bloomAgg(col("h")).as("b"))
      val kept = li.crossJoin(broadcast(bloom))
        .filter(graft.functions.BloomFunctions.bloomHitCount(col("b"),
          array(org.apache.spark.sql.functions.pmod(xxhash64(col("l_orderkey")),
            lit(graft.functions.BloomUtil.P)))) === 1L)
        .count()
      assert(kept < li.count() / 2, s"prefilter kept $kept of ${li.count()}")
      // ... and it runs BELOW the join's Exchange on the probe branch
      val p = pre.queryExecution.executedPlan.toString
      val lines = p.linesIterator.toVector
      val filtIdx = lines.indexWhere(_.contains("bloom_hit_count"))
      val scanIdx = lines.indexWhere(l => l.contains("FileScan parquet") &&
        l.contains("lineitem"), filtIdx)
      assert(filtIdx >= 0 && scanIdx > filtIdx, p)
      assert(!lines.slice(filtIdx + 1, scanIdx)
        .exists(_.contains("Exchange hashpartitioning")), p)
    } finally saved match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("auto-sized bloom: mBits tracks the build key count so fpp is " +
       "scale-invariant — the fixed-size sketch saturates on a 10x " +
       "key decade, the sized one keeps pruning") {
    import graft.operators.BloomJoin
    // the sizing law itself: power-of-two, floored, capped
    assert(BloomJoin.sizedBits(30101L, 16, 1 << 27) === (1 << 19),
      "30k keys -> 512 Kib")
    assert(BloomJoin.sizedBits(3010100L, 16, 1 << 27) === (1 << 26),
      "3M keys -> 64 Mib")
    assert(BloomJoin.sizedBits(0L, 16, 1 << 27) === (1 << 16), "floor")
    assert(BloomJoin.sizedBits(100_000_000L, 16, 1 << 27) === (1 << 27),
      "cap")
    // monotone: more keys never shrink the sketch
    assert((1 to 30).forall(i =>
      BloomJoin.sizedBits(1L << i, 16, 1 << 27) <=
        BloomJoin.sizedBits(1L << (i + 1), 16, 1 << 27)))
    // an exactly-power-of-two want is itself, not doubled
    assert(BloomJoin.sizedBits(1L << 16, 16, 1 << 27) === (1 << 20),
      "2^16 keys x 16 b/key = exactly 2^20 bits")
    // a near-Int.MaxValue cap clamps instead of wrapping negative
    assert(BloomJoin.sizedBits(200_000_000L, 16, Int.MaxValue) ===
      Int.MaxValue, "cap above 2^30 clamps in Long, no Int wrap")
    assert(BloomJoin.sizedBits((1L << 27) + 5L, 16, Int.MaxValue) > 0,
      "want in (2^30, maxBits) must not wrap to Int.MinValue")
    // end to end: 20k distinct build keys vs a 100k-row probe where
    // 20% match. A 2^12-bit sketch is 0.2 bits/key — saturated, keeps
    // ~everything; the sized sketch keeps ~the true 20%.
    import spark.implicits._
    val probe = spark.range(100000)
      .select((col("id") % 100000).as("k"), col("id").as("v"))
    val build = spark.range(20000).select((col("id") * 5).as("bk"))
    def keptRows(m: Int): Long = {
      val bits = broadcast(build.select(
          pmod(xxhash64(col("bk")), lit(graft.functions.BloomUtil.P)).as("h"))
        .agg(graft.functions.BloomFunctions.bloomAgg(col("h"), m, 3, 42L)
          .as("b")))
      probe.crossJoin(bits)
        .filter(graft.functions.BloomFunctions.bloomHitCount(col("b"),
          array(pmod(xxhash64(col("k")), lit(graft.functions.BloomUtil.P))),
          m, 3, 42L) === 1L)
        .count()
    }
    val saturated = keptRows(1 << 12)
    val sized = keptRows(BloomJoin.sizedBits(20000L, 16, 1 << 27))
    assert(saturated > 90000L,
      s"2^12 bits over 20k keys should pass ~all rows, kept $saturated")
    assert(sized < 21000L,
      s"sized sketch should keep ~the 20000 true matches, kept $sized")
    // and the auto-sized join is still EXACTLY the plain join
    val auto = BloomJoin.autoSizedPrefilteredJoin(
      probe, col("k"), build, col("bk"))
    val plain = probe.join(build, col("k") === col("bk"))
    assert(auto.count() === plain.count())
    assert(auto.select("k", "v").exceptAll(plain.select("k", "v")).isEmpty)
  }

  test("lazy subqueries: composing BloomJoin over SkewJoin runs zero " +
       "jobs; the first action runs exactly one sketch job and one " +
       "hot-key job") {
    import graft.operators.{BloomJoin, SkewJoin}
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
        "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // AQE off makes the count deterministic: one action = one job,
      // plus exactly one job per executed scalar subquery
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // range() inputs: no file-listing or schema-inference jobs
      val left = spark.range(0, 20000)
        .select((col("id") % 100).as("k"), col("id").as("lid"))
        .unionAll(spark.range(0, 1000).select(lit(0L).as("k"),
          (col("id") + 20000).as("lid")))
      val mid = spark.range(0, 100).select(col("id").as("rk"))
      val dim = spark.range(0, 50).select(col("id").as("bk"))
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new SparkListener {
        override def onJobStart(s: SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        // key 0 has 1200 left rows (hot at threshold 500); the other
        // 99 keys have 200 (cold) — both branches materially populated
        val salted = SkewJoin.saltedJoin(left, col("k"), col("lid"),
          mid, col("rk"), numSalts = 4, hotKeyThreshold = 500L)
        val piped = BloomJoin.prefilteredJoin(salted, col("k"),
          dim, col("bk"))
        Thread.sleep(300) // let any (wrongly) eager job surface
        assert(jobs.get === 0, "composing the pipeline must run no job")
        piped.write.format("noop").mode("overwrite").save()
        // listener delivery is async — wait for the count to settle
        var last = -1
        var cur = jobs.get
        while (cur != last) { last = cur; Thread.sleep(300); cur = jobs.get }
        assert(cur === 3, s"expected exactly 3 jobs (main action + one " +
          s"bloom-sketch subquery + one hot-key subquery), got $cur")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("d09 plan: corpus side is scan → project — no shuffle, no join " +
       "against exploded benchmark rows") {
    val p = SparkEntry.queries("d09_bloom_decontaminate")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("bloom_hit_count"), p)
    // the only corpus-side operators between the hit-count projection
    // and its FileScan are row-local (filter/project/broadcast-scalar
    // join) — a hashpartitioning Exchange there would mean the corpus
    // got shuffled
    val lines = p.linesIterator.toVector
    val projIdx = lines.indexWhere(_.contains("bloom_hit_count"))
    val scanIdx = lines.indexWhere(_.contains("FileScan parquet"), projIdx)
    assert(projIdx >= 0 && scanIdx > projIdx, p)
    assert(!lines.slice(projIdx + 1, scanIdx)
      .exists(_.contains("Exchange hashpartitioning")), p)
  }

  test("adaptive bloom join: the CMS selectivity rule installs the " +
      "filter only when it prunes; results identical either way") {
    import graft.operators.BloomJoin
    val li = Tables(spark, sfDir, "lineitem")
    val probeCms = BloomJoin.probeKeyCms(li, col("l_orderkey"))
    // the standing statistic's total is the exact probe row count
    assert(graft.functions.CmsUtil.totalCount(probeCms, 3, 8192)
      === li.count())
    def run(build: org.apache.spark.sql.DataFrame) = BloomJoin
      .adaptivePrefilteredJoin(li, col("l_orderkey"),
        build, col("o_orderkey"), probeCms)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
    val orders = Tables(spark, sfDir, "orders")
    // SELECTIVE build (~20% of probe rows survive): rule keeps the
    // Bloom — the plan carries the row-local prefilter
    val sel = run(orders.filter(col("o_totalprice") > 400000))
    assert(sel.queryExecution.executedPlan.toString
      .contains("bloom_hit_count"))
    // BROAD build (every probe row survives: sel ~1.0 > 0.5): rule
    // skips the Bloom — paying a filter that keeps everything is pure
    // cost
    val broad = run(orders)
    assert(!broad.queryExecution.executedPlan.toString
      .contains("bloom_hit_count"))
    // both paths equal the plain join
    def plainAgg(build: org.apache.spark.sql.DataFrame) =
      li.join(build, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
    assert(sel.orderBy("o_orderpriority").collect().toSeq ===
      plainAgg(orders.filter(col("o_totalprice") > 400000))
        .orderBy("o_orderpriority").collect().toSeq)
    assert(broad.orderBy("o_orderpriority").collect().toSeq ===
      plainAgg(orders).orderBy("o_orderpriority").collect().toSeq)
  }

  test("self-sized sketch: picks next-pow-2 >= bitsPerKey*n from its own " +
       "row count, folds EXACTLY to the size a fixed sketch would build " +
       "directly, and the one-job prefiltered join equals the plain join") {
    import graft.functions.BloomFunctions
    import graft.operators.BloomJoin
    val n = 20000L
    val keys = spark.range(n).select(
      pmod(xxhash64(col("id") * 5), lit(graft.functions.BloomUtil.P)).as("h"))
    // the fold law: the self-sized sketch's final bitmap is
    // bit-identical to a fixed sketch built at the same m — positions
    // mod 2^a mod 2^b == positions mod 2^b
    val auto = keys.repartition(7)
      .agg(BloomFunctions.bloomAggAuto(col("h"), 1 << 27, 16, 3, 42L))
      .head().getAs[Array[Byte]](0)
    val m = auto.length * 8
    assert(m === BloomJoin.sizedBits(n, 16, 1 << 27),
      "self-sizing picks the same size the two-job spelling computes")
    val fixed = keys.repartition(3)
      .agg(BloomFunctions.bloomAgg(col("h"), m, 3, 42L))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(auto, fixed),
      "folded sketch must be bit-identical to the directly-built one")
    // densify path: a tiny maxBits forces partials dense mid-update;
    // the fold from a dense maxBits bitmap is the same law
    val autoSmall = keys.repartition(2)
      .agg(BloomFunctions.bloomAggAuto(col("h"), 1 << 16, 1, 3, 42L))
      .head().getAs[Array[Byte]](0)
    val fixedSmall = keys
      .agg(BloomFunctions.bloomAgg(col("h"), 1 << 16, 3, 42L))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(autoSmall, fixedSmall),
      "dense-partial fold (maxBits hit) must match the fixed sketch")
    // end to end: the one-job join is exactly the plain join
    val probe = spark.range(100000)
      .select((col("id") % 100000).as("k"), col("id").as("v"))
    val build = spark.range(20000).select((col("id") * 5).as("bk"))
    val selfSized = BloomJoin.selfSizedPrefilteredJoin(
      probe, col("k"), build, col("bk"), bitsPerKey = 4, numHashes = 2)
    val plain = probe.join(build, col("k") === col("bk"))
    assert(selfSized.count() === plain.count())
    assert(selfSized.select("k", "v")
      .exceptAll(plain.select("k", "v")).isEmpty)
  }

  test("bucketed-skip regime: over co-bucketed inputs the prefilter is " +
      "SKIPPED — the plain join already pays zero Exchange, so the Bloom " +
      "has no shuffle bytes to save (measured net loss at sf10) — while " +
      "the same call over unbucketed parquet still installs it") {
    import graft.operators.BloomJoin
    val dir = java.nio.file.Files.createTempDirectory("bjskip").toString
    val probe = spark.range(0, 20000)
      .select((col("id") % 5000).as("k"), col("id").as("v"))
    val build = spark.range(0, 1000).select((col("id") * 5).as("bk"))
    probe.write.parquet(s"$dir/probe")
    build.write.parquet(s"$dir/build")
    graft.sinks.ParquetSink.writeBucketed(
      probe, "bj_probe_bk", s"$dir/probe_bk", 4, Seq("k"))
    graft.sinks.ParquetSink.writeBucketed(
      build, "bj_build_bk", s"$dir/build_bk", 4, Seq("bk"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def run(p: org.apache.spark.sql.DataFrame,
              b: org.apache.spark.sql.DataFrame) =
        BloomJoin.selfSizedPrefilteredJoin(p, col("k"), b, col("bk"),
          bitsPerKey = 4, numHashes = 2)
      // co-bucketed: regime rule skips the filter AND the plan stays
      // exchange-free — the two properties the rule exists to pair
      val bucketed = run(spark.table("bj_probe_bk"),
        spark.table("bj_build_bk"))
      val pb = bucketed.queryExecution.executedPlan.toString
      assert(!pb.contains("bloom_hit_count"), pb)
      assert(!pb.contains("Exchange hashpartitioning"), pb)
      // unbucketed shuffle regime: same call installs the filter
      val flat = run(spark.read.parquet(s"$dir/probe"),
        spark.read.parquet(s"$dir/build"))
      assert(flat.queryExecution.executedPlan.toString
        .contains("bloom_hit_count"))
      // identical results on both paths (and vs the plain join)
      val plain = probe.join(build, col("k") === col("bk"))
        .groupBy("k").agg(count(lit(1)).as("c")).orderBy("k").collect().toSeq
      assert(bucketed.groupBy("k").agg(count(lit(1)).as("c"))
        .orderBy("k").collect().toSeq === plain)
      assert(flat.groupBy("k").agg(count(lit(1)).as("c"))
        .orderBy("k").collect().toSeq === plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS bj_probe_bk")
      spark.sql("DROP TABLE IF EXISTS bj_build_bk")
    }
  }
}
