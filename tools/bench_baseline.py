#!/usr/bin/env python3
"""Dev-only local baseline: time each headline query's DuckDB oracle on
the same parquet the Spark bench reads, so `BENCH_r{N}.json` has a
concrete single-node engine to compare against (the reference itself is
an in-memory SQLite REPL with no published numbers).

Usage: tools/bench_baseline.py <verify_out_dir> <sf_dir> [samples]
Reads <verify_out_dir>/oracle_sql.json (written by graft.Verify), runs
each HEADLINE query's oracle `samples` times in DuckDB (all cores, same
box as the Spark bench), reports the per-query median as one JSON line
shaped like the Spark bench output.

Not part of the shipped library.
"""
import sys, os, json, glob, time
import duckdb

# keep in sync with graft.Bench.headline
HEADLINE = [
    "q01_scan_project", "q03_agg_groupby", "q04_join_broadcast",
    "q06_multijoin", "q09_topk", "q11_window_rank", "q12_window_running",
    "q22_count_distinct", "q24_time_bucket", "q26_asof_join",
    "q27_range_join", "q29_cube", "q33_sessionize", "q34_stratified_sample",
    "q36_interval_pairs", "q37_grouping_sets", "q40_topk_per_group",
    "q41_doc_embedding_join", "q42_token_pack", "q44_cms_freq",
    "q45_salted_join", "q48_plain_skew", "q49_factored_skew",
    "q46_histogram_quantile", "q47_bloom_join",
    "q50_funnel", "q51_retention",
    "d01_dedup_exact", "d03_minhash_lsh", "d04_simhash", "d05_embed_neardup",
    "d07_dedup_corpus", "d08_decontaminate", "d09_bloom_decontaminate",
    "d10_incremental_dedup",
    "s01_cosine_topk", "s02_ann_lsh", "s03_ivf_ann", "s04_pq_ann",
    "t01_token_count", "t03_quality_score", "t05_ngram_stats",
    "t06_subword_stats", "t08_tfidf", "t10_repetition", "t11_pii_redact",
    "q32_hash_sample", "m01_binary_meta", "m05_image_phash",
    "m06_phash_clusters", "st07_stream_funnel",
    "q52_mixture_sample", "q53_shard_pack",
    "d15_domain_cap", "t14_bpe_apply", "d16_segment_dedup",
    "t15_oov_rate", "t16_bigram_surprise",
    "s05_knn_join", "st09_stream_asof", "m07_audio_fingerprint",
    "q54_incremental_rollup", "m08_scene_cuts", "d17_cdc_segment_dedup",
    "q55_semdedup", "t17_dsir_score", "m09_video_neardup",
    "s06_knn_centrality", "q56_zorder_key", "q57_snapshot_diff",
    "q58_sketch_setops", "q59_curation_e2e", "m10_audio_neardup",
    "q60_heavy_hitters", "s07_mmr_diversify",
    "q61_sliding_distinct", "d19_fuzzy_join",
    "q62_global_topk_percent", "d20_semantic_decontaminate",
    "q63_mi_feature_select", "q64_join_size_sketch",
    "q65_bucketed_join", "q06b_multijoin_bucketed",
    "q66_kmeans_train", "q67_cluster_sample", "q68_apply_changeset",
    "q69_unpivot",
    "q70_scd2_history", "q71_pps_sample", "q72_table_checksum",
    "m11_keyframe_select", "q73_interval_merge", "q74_snapshot_asof",
    "q75_column_profile", "q76_group_linregress", "q77_gap_fill",
    "q78_weighted_median",
    "q79_dq_audit", "t18_filter_attrition", "q80_group_outliers",
    "q81_rolling_anomaly", "q82_attribution",
]

def connect(sf_dir):
    """Fresh connection with table views; DUCKDB_MEM_LIMIT (e.g. 100GB)
    caps the engine so a runaway query (d10's recursive CTE at sf1)
    errors cleanly instead of OOM-killing the box — same convention as
    tools/check_local.py."""
    con = duckdb.connect()
    lim = os.environ.get("DUCKDB_MEM_LIMIT")
    if lim:
        con.execute(f"SET memory_limit='{lim}'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    samples = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = connect(sf_dir)
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # BASELINE_ONLY=q50_funnel,q51_retention times a subset (mirrors
    # SPARK_GRAFT_BENCH_ONLY in graft.Bench) for incremental refreshes
    # of expensive artifacts like BASELINE_sf1.json
    only = os.environ.get("BASELINE_ONLY")
    if only:
        req = {s.strip() for s in only.split(",") if s.strip()}
        # a typo'd name would silently time fewer queries than intended
        unknown = req - set(HEADLINE)
        if unknown:
            sys.exit(f"[baseline] BASELINE_ONLY names not in HEADLINE: "
                     f"{sorted(unknown)}")
        run = [q for q in HEADLINE if q in req]
    else:
        run = HEADLINE
    # BASELINE_ISOLATE=1 runs every query in a fresh SUBPROCESS: a
    # DuckDB OOM exhausts the PROCESS allocator, not just the
    # connection — measured at sf10, d17's failure left every later
    # query dying on kilobyte allocations and then killed the script
    # itself before the JSON line, so "reopen the connection" was not
    # actually recovery. Subprocess isolation costs ~0.5s per query
    # (view re-registration) and makes one blown oracle truly local.
    isolate = os.environ.get("BASELINE_ISOLATE") == "1"
    per_query = {}
    for name in run:
        if name not in oracle:
            print(f"[baseline] {name:22s} SKIP (no oracle)", file=sys.stderr)
            continue
        times = []
        failed = None
        if isolate:
            import subprocess
            payload = json.dumps({"sql": oracle[name], "sf": sf_dir,
                                  "samples": samples,
                                  "mem": os.environ.get("DUCKDB_MEM_LIMIT")})
            child = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                input=payload, capture_output=True, text=True)
            if child.returncode == 0 and child.stdout.strip():
                times = json.loads(child.stdout.strip())
            else:
                failed = (child.stderr.strip().splitlines() or ["killed"])[-1]
                print(f"[baseline] {name:22s} FAILED {failed}",
                      file=sys.stderr)
        else:
          for _ in range(samples):
            t0 = time.perf_counter()
            try:
                con.sql(oracle[name]).fetchall()  # materialize fully
            except Exception as e:
                # an OOM/abort poisons the connection state for some
                # errors — reopen so one blown query can't sink the suite
                failed = f"{type(e).__name__}: {e}"
                print(f"[baseline] {name:22s} FAILED {failed}",
                      file=sys.stderr)
                con = connect(sf_dir)
                break
            times.append(time.perf_counter() - t0)
        if failed is not None:
            per_query[name] = None
            continue
        med = sorted(times)[len(times) // 2]
        per_query[name] = round(med, 3)
        joined = ", ".join(f"{t:.2f}" for t in times)
        print(f"[baseline] {name:22s} median {med:7.2f}s  ({joined})",
              file=sys.stderr)
    # failed queries (None) stay in the map so the artifact records the
    # failure, but only completed queries feed the total
    total = round(sum(v for v in per_query.values() if v is not None), 3)
    print(json.dumps({"metric": "duckdb_baseline_total", "value": total,
                      "unit": "sec", "queries": per_query, "sf": sf_dir}))

def child():
    """--child mode: one query, fresh process. stdin: {sql, sf, samples,
    mem}; stdout: JSON list of per-sample seconds."""
    spec = json.load(sys.stdin)
    if spec.get("mem"):
        os.environ["DUCKDB_MEM_LIMIT"] = spec["mem"]
    con = connect(spec["sf"])
    times = []
    for _ in range(spec["samples"]):
        t0 = time.perf_counter()
        con.sql(spec["sql"]).fetchall()
        times.append(time.perf_counter() - t0)
    print(json.dumps(times))

if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child()
    else:
        main()
