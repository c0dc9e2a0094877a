package graft

/** Physical-plan assertions: the properties that matter at 100 TB must
  * be visible in explain output, not assumed — filter/projection
  * pushdown to parquet, broadcast of dimension tables, partial
  * aggregation, top-k via TakeOrderedAndProject, whole-stage codegen.
  */
class PlanSpec extends TestSpark {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q01: filter and projection are pushed to the parquet scan") {
    val p = plan("q01_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), p)
    assert(p.contains("ReadSchema"))
    // pruned scan: none of the untouched wide columns are read
    assert(!p.contains("l_comment") && !p.contains("l_returnflag"), p)
  }

  test("q02: date + range predicates push down") {
    val p = plan("q02_filter_pred")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
  }

  test("q04/q06: dimension joins broadcast, no shuffle of the fact side for dims") {
    assert(plan("q04_join_broadcast").contains("BroadcastHashJoin"))
    val p6 = plan("q06_multijoin")
    assert("BroadcastHashJoin".r.findAllIn(p6).size >= 2, p6)
  }

  test("q06b: the bucketed 5-way star moves NO fact rows — lineitem " +
       "pre-aggregates in place on its bucket key, the order join is " +
       "co-bucketed sort-merge, dims broadcast; the only hash Exchange " +
       "left is the 25-row final aggregate") {
    val p = plan("q06b_multijoin_bucketed")
    // both fact scans read the bucketed layouts; at test scale the
    // order join itself may plan broadcast (orders is tiny) — the
    // invariant is the Exchange count, which is layout-guaranteed at
    // every scale: exactly one, for the dimension-grain final agg
    assert("Bucketed: true".r.findAllIn(p).size === 2, p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("q61: the (user, bucket) dedup and the per-user sweep window run " +
       "exchange-free over the user-bucketed events layout — the one " +
       "hash Exchange left moves interval-boundary rows") {
    val p = plan("q61_sliding_distinct")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
  }

  test("q03: aggregation is partial (map-side) then final") {
    val p = plan("q03_agg_groupby")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_sum"), p) // map-side combine before the shuffle
  }

  test("q09: top-k runs as TakeOrderedAndProject, not a global sort") {
    val p = plan("q09_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalSort"), p)
  }

  test("q07/q08: semi/anti joins stay semi/anti in the physical plan") {
    assert(plan("q07_semijoin").contains("LeftSemi"))
    assert(plan("q08_antijoin").contains("LeftAnti"))
  }

  test("q11: rank filter runs as WindowGroupLimit (per-partition top-k, no full sort spill)") {
    val p = plan("q11_window_rank")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("t14: BPE application is row-local — no hash Exchange anywhere " +
       "(the merges table is a plan literal, the corpus never shuffles)") {
    val p = plan("t14_bpe_apply")
    assert(p.contains("bpe_encode"), p)
    // only the gate's output orderBy may move rows (rangepartitioning);
    // tokenization itself introduces no hashpartitioning Exchange
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("d16: the rebuild scan is row-local — one single-walk byte kernel " +
       "(segment_cleanse) probes the hot fingerprints and copies " +
       "survivors, no hash Exchange") {
    val p = plan("d16_segment_dedup")
    assert(p.contains("segment_cleanse"), p)
    // the hot-set aggregation ran eagerly as its own job; the returned
    // plan is scan → cleanse projection → gate orderBy only
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("t15/t16: vocabulary scoring is row-local — models are hashed plan " +
       "references, the corpus scan pays no hash Exchange") {
    val p15 = plan("t15_oov_rate")
    assert(p15.contains("vocab_stats"), p15)
    assert(!p15.contains("Exchange hashpartitioning"), p15)
    val p16 = plan("t16_bigram_surprise")
    assert(p16.contains("bigram_surprise"), p16)
    assert(!p16.contains("Exchange hashpartitioning"), p16)
  }

  test("d17: CDC rebuild is row-local — one single-walk byte kernel " +
       "(cdc_segment_cleanse) re-derives boundaries, probes the hot " +
       "fingerprints and copies survivors, no hash Exchange") {
    val p = plan("d17_cdc_segment_dedup")
    assert(p.contains("cdc_segment_cleanse"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q54: the rollup merge re-aggregates DECIMAL partial state in " +
       "ONE corpus scan — the boundary flag rides the partial grouping " +
       "key instead of splitting the scan") {
    val p = plan("q54_incremental_rollup")
    // snapshot and delta states combine map-side in the same pass; the
    // merge is a second rollup-sized aggregate — events is read ONCE
    assert("partial_sum".r.findAllIn(p).size >= 2, p)
    assert(p.contains("decimal(27,4)") || p.contains("DecimalType(27,4)"), p)
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
  }

  test("q26: asof join is a single shuffle — one Exchange feeding the window") {
    val p = plan("q26_asof_join")
    // exchanges: union→window shuffle + final orderBy range partition;
    // no third shuffle for right-side dedup
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("q50: the three funnel-step windows run over the user-bucketed " +
      "layout — ZERO user_id exchanges (round 13; was one), and the " +
      "funnel counts reduce per-user first so NO Expand (round 15; the " +
      "4-way countDistinct expand was ~0.57 s of the 1.27 s sf10 median)") {
    val p = plan("q50_funnel")
    assert("Exchange hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r.findAllIn(p).size === 0, p)
    assert(p.contains("Bucketed: true"), p)
    assert("windowspecdefinition\\(user_id".r.findAllIn(p).size === 3, p)
    // unbounded frames need no ordering: zero sorts of the fact
    assert("Sort \\[user_id".r.findAllIn(p).size === 0, p)
    // the per-user reduce replaced the multi-countDistinct Expand
    assert(!p.contains("Expand"), p)
  }

  test("st07 batch face: q50's window spelling over the user-bucketed " +
      "layout — ZERO user_id exchanges, no Expand, and no object-fold " +
      "(round 16; the flatMapGroupsWithState encoder round-trip was " +
      "the 2.5× sf10 gap)") {
    val p = plan("st07_stream_funnel")
    assert("Exchange hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r.findAllIn(p).size === 0, p)
    assert(p.contains("Bucketed: true"), p)
    assert("windowspecdefinition\\(user_id".r.findAllIn(p).size === 3, p)
    assert(!p.contains("Expand"), p)
    assert(!p.contains("FlatMapGroupsWithState"), p)
  }

  test("d15: the per-domain count aggregate is STAGED (eagerly " +
      "materialized cache, round 17) — the caps join and the totals " +
      "row share one corpus scan instead of re-running it " +
      "(round 15: 1.31 -> 0.97 s at sf10)") {
    val p = plan("d15_domain_cap")
    // BOTH count consumers (caps join + totals row) read the cached
    // aggregate; the plan string also prints each InMemoryRelation's
    // rebuild subtree (a FileScan that does not execute once the
    // cache is built), so pin the cache reads, and that exactly ONE
    // executed scan reads the text column (the rank-window side)
    assert("InMemoryTableScan".r.findAllIn(p).size === 2, p)
    assert("FileScan parquet \\[doc_id#\\d+L,text".r.findAllIn(p).size === 1, p)
  }

  test("q63: the (lang, token) count table is STAGED — all four " +
      "consumers (scoring join + cl/cw/N rollups) read the cache; " +
      "unstaged, each pushed a different isnotnull set into its copy " +
      "so ReuseExchange never fired and the plan ran FOUR corpus " +
      "scans + token explodes (round 15: 3.88 -> 1.54 s at sf10)") {
    val p = plan("q63_mi_feature_select")
    assert("InMemoryTableScan".r.findAllIn(p).size === 4, p)
  }

  test("q51: d0 is a window over the user partition — over the bucketed " +
      "layout the fact pays ZERO user_id exchanges (round 13; was one) " +
      "and there is no join back") {
    val p = plan("q51_retention")
    // round-9 A/B (sf1, run-paired): groupBy(user)+join-back min 1.73 s
    // vs window min 0.89 s — the window folds d0 into the same
    // partitioning the distinct-dedup aggregate then consumes locally;
    // round 13 removed the remaining exchange via the shared layout
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r.findAllIn(p).size === 0, p)
    assert(p.contains("Bucketed: true"), p)
    assert("windowspecdefinition\\(user_id".r.findAllIn(p).size === 1, p)
  }

  test("s01: cosine scoring uses the codegen'd native dot expression") {
    val p = plan("s01_cosine_topk")
    assert(p.contains("float_vector_dot"), p)
  }

  test("s02/d05: LSH bucketing uses the codegen'd native hyperplane signature") {
    assert(plan("s02_ann_lsh").contains("hyperplane_signature"))
    assert(plan("d05_embed_neardup").contains("hyperplane_signature"))
  }

  test("t04: fingerprint uses the codegen'd native rolling hash") {
    assert(plan("t04_fingerprint").contains("rolling_fingerprint"))
  }

  test("d03: LSH candidate generation shuffles ids only — no hash arrays " +
       "through the band-bucket self-join") {
    // the band-bucket self-join must carry (id, band, bkey) only; the
    // shingle-hash array column `h` is fetched after pair dedup by
    // joining back to the persisted signature stage
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val opt = SparkEntry.queries("d03_minhash_lsh")(spark, sfDir)
      .queryExecution.optimizedPlan
    val bandJoins = opt.collect {
      case j: Join if j.condition.exists(_.references.exists(_.name == "bkey")) => j
    }
    assert(bandJoins.nonEmpty, opt.toString)
    bandJoins.foreach { j =>
      assert(!j.output.exists(a => Set("h", "ha", "hb")(a.name)),
        s"band join must not carry hash arrays: ${j.output.mkString(", ")}")
    }
  }

  test("d05: embedding band join shuffles ids only — no vectors through " +
       "the quadratic candidate stage") {
    // the band-bucket self-join must carry (id, band, bkey) only; the
    // embedding vectors are re-attached per side after pair dedup, so
    // wide rows never ride the candidate shuffle (see d03's twin)
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val opt = SparkEntry.queries("d05_embed_neardup")(spark, sfDir)
      .queryExecution.optimizedPlan
    val bandJoins = opt.collect {
      case j: Join if j.condition.exists(_.references.exists(_.name == "bkey")) => j
    }
    assert(bandJoins.nonEmpty, opt.toString)
    bandJoins.foreach { j =>
      assert(!j.output.exists(_.name == "embedding"),
        s"band join must not carry embeddings: ${j.output.mkString(", ")}")
    }
  }

  test("s04: PQ candidate scan shuffles codes-only rows — no embeddings, " +
       "LUTs, or codebooks through either ranking window") {
    // the ADC scan's per-query top-rerank window and the exact re-rank's
    // top-k window are the only corpus-wide shuffles; both must carry
    // narrow (query_id, vec_id, score) rows. The 4*dims-byte embedding
    // and the nSub×nCodes LUT/codebook arrays are consumed row-locally
    // below them (see Similarity.pqTopK's scale contract).
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    val opt = SparkEntry.queries("s04_pq_ann")(spark, sfDir)
      .queryExecution.optimizedPlan
    val wins = opt.collect {
      case w: LWindow if w.partitionSpec.exists(
        _.references.exists(_.name == "query_id")) => w
    }
    assert(wins.size >= 2, opt.toString)
    wins.foreach { w =>
      val bad = w.child.output.filter(a =>
        Set("embedding", "qe", "lut", "cnorm2", "cents")(a.name))
      assert(bad.isEmpty,
        s"ranking window must shuffle narrow rows, carries: ${bad.mkString(", ")}")
    }
    val adcJoins = opt.collect {
      case j: Join if j.output.exists(_.name == "codes") => j
    }
    assert(adcJoins.nonEmpty, opt.toString)
    adcJoins.foreach { j =>
      assert(!j.output.exists(_.name == "embedding"),
        s"ADC join must not carry embeddings: ${j.output.mkString(", ")}")
    }
  }

  test("q40: per-stratum top-k runs as WindowGroupLimit, not a full sort") {
    assert(plan("q40_topk_per_group").contains("WindowGroupLimit"))
  }

  test("t08: the corpus-size scalar is broadcast, not recomputed per row") {
    val p = plan("t08_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("t08: tf is row-local (term_counts map in the scan) — the " +
       "(doc_id, term) pairs never shuffle; df broadcasts") {
    val p = plan("t08_tfidf")
    // Round-9 shape: tf = explode(term_counts(tokens)) — the per-doc
    // counting happens inside the row, so the old GROUP BY
    // (doc_id, term) exchange (t08's largest shuffle, moving strictly
    // row-local information) is gone. Round 8 pinned "no cache" after
    // the cache A/B lost; keep that too.
    assert(p.contains("term_counts"), p)
    assert(!p.contains("InMemoryTableScan"), p)
    // no exchange keyed by the (doc_id, term) pair anywhere
    assert("hashpartitioning\\(doc_id#\\d+, term#\\d+".r.findFirstIn(p).isEmpty, p)
    // df reaches the join as a broadcast (vocab-sized), so the full tf
    // never pays a by-term exchange: dfreq + the n_docs scalar
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p)
  }

  test("q49: the skewed aggregate is factored through the join — money is " +
       "summed BELOW it and the pair count is a product, never a row set") {
    val p = plan("q49_factored_skew")
    // orders' money sum happens in a pre-join partial aggregate...
    assert(p.contains("partial_sum(cast(o_totalprice"), p)
    // ...and the pair count/sum are computed algebraically from the two
    // per-key aggregates (n_e * n_o / n_e * sum_o), so the quadratic
    // pair set is never materialized — skew gone by construction
    assert(p.contains("sum((n_e"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 6, p)
  }

  test("q36: interval pairing is an equi-join on the key, never a " +
       "BroadcastNestedLoopJoin over time") {
    val p = plan("q36_interval_pairs")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q43: KMV runs as one partial+final ObjectHashAggregate — no " +
       "distinct shuffle of the raw keys") {
    val p = plan("q43_kmv_distinct")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("kmv_sketch"), p)
    // exactly one Exchange (the group-by); a distinct-then-rank plan
    // would need two (distinct shuffle + window shuffle)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
  }

  test("d08: the benchmark shingle side broadcasts — the corpus is never " +
       "shuffled before the match join") {
    val p = plan("d08_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    // the corpus-side explode feeds the broadcast join directly: no
    // hashpartitioning Exchange between the corpus FileScan and the join
    val lines = p.linesIterator.toVector
    val joinIdx = lines.indexWhere(_.contains("BroadcastHashJoin"))
    val scanIdx = lines.indexWhere(_.contains("FileScan parquet"), joinIdx)
    assert(joinIdx >= 0 && scanIdx > joinIdx, p)
    assert(!lines.slice(joinIdx + 1, scanIdx)
      .exists(_.contains("Exchange hashpartitioning")), p)
  }

  test("s03: IVF cell assignment is row-local — no Exchange between the " +
       "corpus scan and nearest_cells") {
    val p = SparkEntry.queries("s03_ivf_ann")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("nearest_cells"), p)
    // every nearest_cells projection sits directly over a scan/broadcast
    // cross-join subtree with no shuffle in between: walk up from each
    // occurrence — the nearest enclosing Exchange must come AFTER (above)
    // the projection, which in explain text means no hashpartitioning
    // Exchange line appears between the Project(nearest_cells) line and
    // its FileScan below it.
    val lines = p.linesIterator.toVector
    val projIdx = lines.indexWhere(_.contains("nearest_cells"))
    val scanIdx = lines.indexWhere(_.contains("FileScan parquet"), projIdx)
    assert(projIdx >= 0 && scanIdx > projIdx, p)
    val between = lines.slice(projIdx + 1, scanIdx)
    assert(!between.exists(_.contains("Exchange hashpartitioning")), p)
  }

  test("d10: the candidate bucket join's probe side is batch-only — " +
       "corpus×corpus pairs are structurally impossible") {
    // the mining join's right side filters to keys >= 2^62 (the batch
    // offset) BEFORE the join, so the quadratically-dominant
    // corpus-bucket self-pairs are never generated
    val p = plan("d10_incremental_dedup")
    assert(p.contains("4611686018427387904"), p)
    val filterLine = p.linesIterator.find(l =>
      l.contains("Filter") && l.contains(">= 4611686018427387904"))
    assert(filterLine.isDefined, p)
  }

  test("d04/m05: hamming verify runs BELOW the pair-dedup exchange — " +
       "only surviving pairs are shuffled") {
    // verify-then-distinct (SURVEY §4): popcount is row-local-cheap, so
    // the hamming <= maxDist check must sit under the distinct's
    // Exchange (Catalyst folds it into the segment join condition),
    // shrinking the dedup shuffle to survivors only
    for (q <- Seq("d04_simhash", "m05_image_phash")) {
      val lines = plan(q).linesIterator.toVector
      val ex = lines.indexWhere(l =>
        l.contains("Exchange hashpartitioning") && l.contains("hamming"))
      assert(ex >= 0, s"$q: no dedup exchange over hamming pairs\n" +
        lines.mkString("\n"))
      val verify = lines.indexWhere(l =>
        l.contains("bit_count") && l.contains("<="), ex)
      assert(verify > ex,
        s"$q: hamming verify must run below the dedup exchange\n" +
          lines.mkString("\n"))
      assert(!lines.take(ex).exists(l =>
        l.contains("bit_count") && l.contains("<=")),
        s"$q: hamming predicate found ABOVE the dedup exchange\n" +
          lines.mkString("\n"))
    }
  }

  test("q46: all percentiles come from ONE histogram pass — a single " +
       "scan, not one branch per percentile") {
    val p = plan("q46_histogram_quantile")
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
    assert(p.contains("partial_count"), p)
  }

  test("q55: cell assignment is row-local; the pair stage is an " +
       "equi-join ON the cell with the cosine verify folded into its " +
       "condition; drops apply as an anti-join") {
    val p = plan("q55_semdedup")
    assert(p.contains("nearest_cells"), p)
    // verify-in-join: the only nested-loop joins are the one-row
    // centroid-array broadcasts (IdentityBroadcastMode); the vector
    // pair stage itself keys on cell_id and evaluates cosine inside
    // the join condition, so non-surviving pairs are never materialized
    val pairJoin = p.linesIterator.find(l =>
      (l.contains("HashJoin") || l.contains("SortMergeJoin")) &&
      l.contains("cell_id") && l.contains("float_vector_dot"))
    assert(pairJoin.isDefined, p)
    assert(p.contains("LeftAnti"), p)
  }

  test("s06: the kNN edge list materializes ONCE and the loop is " +
       "fully materialized before the result plan — the final plan " +
       "reads only the nodes-sized mass checkpoint") {
    val p = plan("s06_knn_centrality")
    // round-17 CC-pattern staging: edges eagerly checkpointed (the
    // lazy persist lost the cold-cache race between the loop's
    // independent map stages — 2.33 med lazy vs 1.76 eager at sf0.1),
    // final in-mass aggregate checkpointed, corpus-scaled edge blocks
    // freed inside the operator. The final plan therefore contains NO
    // banded self-join and no window — just the nodes join against
    // the mass checkpoint scan.
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("hyperplane_signature"), p)
    assert(!p.contains("InMemoryTableScan"), p)
  }

  test("m09: the signature self-join shuffles 3-long rows — the binary " +
       "payload never reaches an Exchange; the hot-bucket cap is an " +
       "anti-join in the plan") {
    val lines = plan("m09_video_neardup").linesIterator.toVector
    assert(!lines.exists(l => l.contains("Exchange") && l.contains("payload")),
      lines.mkString("\n"))
    assert(lines.exists(_.contains("LeftAnti")), lines.mkString("\n"))
  }

  test("q57: the snapshot diff is ONE full-outer join; the status CASE " +
       "and unchanged-filter evaluate above it without extra exchanges") {
    val p = plan("q57_snapshot_diff")
    assert(p.contains("FullOuter"), p)
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size === 1, p)
  }

  test("q56: the Z-order key is pure row-local arithmetic — no hash " +
       "Exchange anywhere in the plan") {
    val p = plan("q56_zorder_key")
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q58: the corpus-sized sketch build runs ONCE, checkpointed — " +
       "every pair-phase reference reads the materialized KB-sized RDD " +
       "(a lazily-cached stage let the concurrent broadcast jobs race " +
       "to populate it, each re-paying the corpus scan: 1.5–15 s " +
       "spread), the corpus never re-enters the pair plan, and no pair " +
       "join ever sort-merges (sketches broadcast)") {
    val p = plan("q58_sketch_setops")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("FileScan"), p)   // corpus scan only at build
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("s07: MMR selection is ONE linear plan — the candidate window's " +
       "WindowGroupLimit trims before its exchange, collect_list reuses " +
       "the same query_id partitioning (no second hash exchange), and " +
       "the greedy loop is the single mmr_select expression, not k " +
       "chained stages") {
    val p = plan("s07_mmr_diversify")
    assert(p.contains("mmr_select"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q60: heavy-hitter candidate detection is row-local — the CMS " +
       "rides pass 2 as a literal (cms_estimate in a Filter below the " +
       "exact-count exchange), one hash exchange per audited side") {
    val p = plan("q60_heavy_hitters")
    assert(p.contains("cms_estimate"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"), p)
  }

  test("q62: the global top-p% cut never global-sorts the corpus — " +
       "histogram prefix arithmetic + a broadcast cut join; the only " +
       "corpus-row window partitions by the boundary value") {
    val p = plan("q62_global_topk_percent")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // 3 value-keyed exchanges (histogram agg, prefix window, tie
    // window) — none is a rangepartitioning global sort of the data
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 3, p)
    assert("Window \\[row_number".r.findAllIn(p).size === 1, p)
  }

  test("d20: the corpus never shuffles before the bench join — bench " +
       "side broadcast through the banding, one exchange total (the " +
       "pair dedup), no sort-merge") {
    val p = plan("d20_semantic_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("d19: candidates come from an EQUI-join on variants (no " +
       "cartesian anywhere) and the verify is the bounded " +
       "edit_within_1 check, not the DP levenshtein") {
    // the gate entry materializes EAGERLY (variant-stage cleanup), so
    // its visible plan is the checkpoint scan; pin the OPERATOR's
    // plan through the lazy staged API on the same input shape
    import org.apache.spark.sql.functions.col
    val sup = Tables(spark, sfDir, "supplier")
      .select(col("s_suppkey").cast("long").as("id"),
        col("s_name").as("name"))
    val staged = graft.operators.FuzzyJoin.editDistance1PairsStaged(
      sup, col("id"), col("name"), maxBucket = Some(8L))
    try {
      val p = staged.result.queryExecution.executedPlan.toString
      assert(p.contains("edit_within_1"), p)
      assert(!p.contains("levenshtein"), p)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
    } finally staged.cleanup()
  }

  test("q65: the bucketed fact-fact join reads co-located sorted buckets " +
       "— no Exchange and no Sort of either fact table; the only " +
       "exchange carries the 5-value dimension partials") {
    // force the merge-join path: at test scale orders broadcasts, which
    // would hide the bucket property (at 100 TB fact⋈fact never
    // broadcasts)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("q65_bucketed_join")(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("SelectedBucketsCount"), p)
      // the join key exchange AND the per-query sort are both absent:
      // bucket layout pays them at write time. The single hash exchange
      // moves o_orderpriority partial aggregates; the range exchange is
      // the final 5-row orderBy.
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"), p)
      assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
      assert(!p.contains("Sort [l_orderkey") &&
        !p.contains("Sort [o_orderkey"), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS orders_bk_root_testdata_sf0_001")
      spark.sql("DROP TABLE IF EXISTS lineitem_bk_root_testdata_sf0_001")
    }
  }

  test("q66: k-means stats aggregate map-side on cell_id; the model " +
       "array attaches by BROADCAST after the aggregation, never " +
       "riding per corpus row through an exchange") {
    val p = plan("q66_kmeans_train")
    assert(p.contains("partial_min") && p.contains("partial_count"), p)
    // the stats pass exchanges on cell_id only (Lloyd TRAINING steps
    // above it pay their own nCells x dims-sized exchanges by design)
    assert(p.contains("Exchange hashpartitioning(cell_id"), p)
    // the centroid table is a broadcast attachment (one-row cross),
    // and no exchange ever carries the model array per corpus row:
    // every hash exchange key is a cell/pos grouping, never cents
    assert(p.contains("BroadcastExchange IdentityBroadcastMode"), p)
    assert(!p.contains("Exchange hashpartitioning(cents"), p)
    // no shuffle join anywhere in training or stats
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q67: cluster sampling assigns row-locally (broadcast model) " +
       "and pays exactly one cell-keyed window exchange") {
    val p = plan("q67_cluster_sample")
    assert(p.contains("Exchange hashpartitioning(cell_id"), p)
    assert(p.contains("row_number"), p)
    // no shuffle join anywhere — the model travels by broadcast
    // (training exchanges above are cell/pos-keyed, never embedding-
    // carrying joins)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastExchange IdentityBroadcastMode"), p)
  }

  test("q68: the merge is ONE co-partitioned full-outer join; the " +
       "winner window runs over the change-sized batch on the same " +
       "key partitioning the join consumes") {
    val p = plan("q68_apply_changeset")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"), p)
    // two key exchanges total: snapshot side + change side (the
    // window's exchange IS the join-side exchange, reused)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
    assert(p.contains("row_number"), p)
  }

  test("q59: the curation pipeline shuffles the corpus exactly once — " +
       "quality gate in the scan stage, exact dedup via a WindowGroupLimit-" +
       "trimmed window (no groupBy+join-back), split assignment row-local " +
       "on the same fingerprint; the only other hash exchange carries the " +
       "final (split, source) partial aggregates") {
    val p = plan("q59_curation_e2e")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("rolling_fingerprint"), p)
  }

  test("q70: SCD2 reshape is ONE key-partitioned window over the " +
       "changelog — lead() and the duplicate-seq guard share it, no " +
       "join, no second exchange of the changes") {
    val p = plan("q70_scd2_history")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("lead("), p)
  }

  test("q71: PPS selection rides the two-phase prefix sum — per-bucket " +
       "windows plus BROADCAST offsets/total, the corpus never meets a " +
       "shuffle join and never global-sorts") {
    val p = plan("q71_pps_sample")
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastNestedLoopJoin|BroadcastHashJoin".r
      .findAllIn(p).nonEmpty, p)
    // the only hash exchanges: the bucketed fact window + the 16-row
    // bucket-totals aggregation feeding offsets
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("q72: range digests aggregate map-side (partial xor/sum before " +
       "the shuffle) — the replica comparison joins RANGE rows, and " +
       "row payloads never reach the join") {
    val p = plan("q72_table_checksum")
    assert(p.contains("partial_bit_xor") || p.contains("partial"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // 2 per replica
    // the join consumes the digest aggregates, not table rows
    assert(p.contains("FullOuter"), p)
  }

  test("m11: keyframe selection is a row-local scan — no exchange, no " +
       "window, no join anywhere in the plan") {
    val p = plan("m11_keyframe_select")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q73: the interval sweep and the (key, group) aggregation share " +
       "ONE key exchange — partitioning on the key satisfies the " +
       "grouping's distribution, Catalyst adds no second shuffle") {
    val p = plan("q73_interval_merge")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("q75: one single-distinct branch per column, each scan pruned to " +
      "exactly its column, never the multi-distinct Expand fan-out " +
      "(Expand measured 2.7x the union shape at sf10)") {
    val p = plan("q75_column_profile")
    assert("FileScan parquet".r.findAllIn(p).size === 3, p)
    assert(!p.contains("Expand"), p)
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount"))
      assert(p.contains(s"ReadSchema: struct<$c:double>"), p)
  }

  test("q76: the regression sums partial-aggregate map-side in one scan; " +
      "the closing scalar math never touches the corpus") {
    val p = plan("q76_group_linregress")
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
    assert(p.contains("partial_sum"), p)
  }

  test("q77: the day grid, key list and fill join all read the " +
      "MATERIALIZED rollup — the events corpus is scanned once at the " +
      "checkpoint, never inside the returned plan (lazy derivation " +
      "measured to prune through the aggregate into THREE corpus scans)") {
    val p = plan("q77_gap_fill")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("FileScan"), p)
  }

  test("q78: the RETURNED plan is pass 2 alone — one scan, the pass-1 " +
      "bounds inlined as literal maps (no join, no pass-1 re-run inside " +
      "the probe job — the lazy broadcast spelling measured 9.3 s vs " +
      "2.0 s at sf10), and every Sort under the window is preceded by " +
      "the bucket-local (g,v) aggregate, never raw rows") {
    val p = plan("q78_weighted_median")
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
    // the per-group median-bucket filter reaches the scan's data filters
    assert(p.contains("element_at(map(keys:"), p)
    assert("partial_sum".r.findAllIn(p).size >= 1, p)
  }

  test("q79: all six rules from two key aggregations and one full-outer " +
      "join, ALL exchange-free over the shared bucketed layouts (round " +
      "13; the two key exchanges this replaced were the 3.1x-DuckDB " +
      "growth term at sf10: 4.8 -> 1.9 s) — no anti-joins, no broadcast " +
      "of a fact-sized key table") {
    val p = plan("q79_dq_audit")
    assert(!p.contains("Expand"), p)
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("LeftAnti") && !p.contains("BroadcastHashJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 0, p)
    assert("Bucketed: true".r.findAllIn(p).size === 2, p)
    assert(p.contains("partial_count"), p)
    // the stack() unpivot ships rule-count rows, not corpus rows
    assert(p.contains("stack(6"), p)
    // the child-side scan reads only the join key
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>"), p)
  }

  test("t18: the attrition cascade is ONE row-local corpus scan — no " +
      "join, the CASE chain codegen'd into the partial aggregate") {
    val p = plan("t18_filter_attrition")
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q80: the RETURNED plan is the flagging pass alone — one scan, " +
      "no join, the group stats inlined as literal maps (q78's " +
      "output-sized collect recipe)") {
    val p = plan("q80_group_outliers")
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("element_at(map(keys:"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q81: the rolling gauge pays ONE corpus exchange — running " +
      "prefix sums and the in-chunk lag(·,101) share a single " +
      "(event_type, chunk) sort, the cross-chunk carry arrives as a " +
      "BROADCAST tail-suffix table (no explode, no second corpus " +
      "shuffle), and NO bounded-frame recompute anywhere") {
    val p = plan("q81_rolling_anomaly")
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
    // the O(100·n) killer: a 100-row sliding frame re-aggregated per row
    assert(!p.contains("specifiedwindowframe(RowFrame, -100, -1)"), p)
    // running prefix sums ride Spark's O(n) running-frame path, fused
    // into ONE Window op; the only other Window is the O(1)/row lag —
    // same partitioning and ordering, so NO extra exchange or sort
    assert("Window \\[".r.findAllIn(p).size === 2, p)
    assert(p.contains("unboundedpreceding$()"), p)
    assert(p.contains("specifiedwindowframe(RowFrame, -101, -101)"), p)
    // one corpus sort (shared by both Windows) + the gate's |types|-row
    // output orderBy — nothing else sorts
    assert("Sort \\[".r.findAllIn(p).size === 2, p)
    // both window stages partition by (event_type, chunk) — the 5-type
    // parallelism ceiling is gone
    assert(p.contains("windowspecdefinition(event_type#") &&
      p.contains(", m#"), p)
    // the carry is a driver-bounded broadcast, not a row explode
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"), p)
    assert(!p.contains("Generate explode"), p)
    // ONE corpus exchange (the chunk window) + the |types|-row report agg
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
  }

  test("q82: attribution is a window, not a join — over the shared " +
      "user-bucketed layout the fact pays ZERO exchanges; only " +
      "touch-type report rows shuffle") {
    val p = plan("q82_attribution")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size === 0, p)
    assert(p.contains("windowspecdefinition(user_id"), p)
    assert(p.contains("Bucketed: true"), p)
  }

}
