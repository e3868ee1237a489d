#!/usr/bin/env python
"""Benchmark harness (driver-run per round -> BENCH_r{N}.json).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "crawl_urls_per_s": ..., "payload_rows_per_s": ...}

value = wall seconds of the flagship crawl (frontier loop) at
BENCH_CRAWL_URLS synthetic URLs. ``queries`` adds the payload-replay
pipeline (image rows/s) and the representative query-layer pipelines over
$GRAFT_SF_DIR.

``--scaling``: runs this script in fresh processes at two parallelism
levels (default RAY_GRAFT_CPUS=2 and =8, i.e. N and 4N; override with
BENCH_SCALE_LO/BENCH_SCALE_HI) on the SAME input — the sandbox proxy for
two cluster sizes — and reports both throughputs plus scaling efficiency
for the payload pipeline (the wave-barrier-free throughput path; see
BASELINE.md for the Amdahl analysis of the wave loop at sandbox scale)
and for the full crawl. Levels are interleaved and best-of-3 reps taken:
this sandbox shares the box with ~5-6 cores of background tenant load,
so a single rep can be badly skewed (levels above ~16 CPUs also
oversubscribe and hit shared memory-bandwidth contention a real
multi-node scale-out would not have).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_URLS = int(os.environ.get("BENCH_CRAWL_URLS", "400000"))
SCALING_ONLY = os.environ.get("BENCH_SCALING_ONLY") == "1"

QUERY_NAMES = [
    "q1_lineitem_agg",
    "search_keywords",
    "recent_topk",
    "events_daily_window",
    "seg_revenue",
    "dedup_first_wins",
    "token_stats",
    "bpe_token_stats",
    "exact_dedup_docs",
    "knn_topk",
    "knn_multi",
    "value_quantiles",
    "approx_distinct_users",
    "salted_returnflag_agg",
    "multi_source_union",
    "user_sessions",
    "user_session_rows",
    "user_event_sequence",
    "top_orders_per_segment",
    # round-2 additions
    "purchase_click_asof",
    "purchase_click_window",
    "events_rolling_7d",
    "order_priority_revenue",
    "hash_sample_events",
    "frequent_users",
    "value_quantiles_by_type",
    "urgent_top_revenue",
    "headline_clusters",
    "minhash_near_dup",
    "simhash_near_dup",
    "ngram_jaccard_pairs",
    "embedding_near_dup_ivf",
    "minhash_dedup_docs",
    "curate_image_corpus",
    # round-3 additions: corpus curation ops
    "gopher_repetition_docs",
    "dup_span_docs",
    "tfidf_top_terms",
    "benchmark_contamination",
    "unigram_logprob_docs",
    "kmeans_clusters",
    "curate_text_corpus",
    "jaccard_dedup_docs",
    "strip_dup_spans",
    # round-3 additions: graph + incremental/domain ops
    "link_pagerank",
    "incremental_exact_dedup",
    "bloom_dedup_docs",
    "domain_stats",
    "domain_quality_filter",
    "dedup_events_windowed",
    "dsir_select",
    "link_hits",
    "knn_pq_topk",
    "mixture_sample_docs",
    "search_with_index",
    "quality_classifier_docs",
    # round-3 tail additions
    "ranked_search",
    "stratified_sample_events",
    "semdedup_docs",
    "bigram_logprob_docs",
    "bpe_encode_docs",
    "prepare_training_data",
    "mine_hard_negatives",
    "export_image_shards",
    "shuffled_training_order",
    "curriculum_training_order",
    "upsample_mixture_docs",
    "train_val_test_split",
    "scrub_blocklist_docs",
    "sample_token_budget",
    "ngram_containment_pairs",
    "source_overlap_matrix",
    "aspect_bucket_images",
    "bucketed_training_batches",
    "caption_dedup_images",
    "sample_pixel_budget",
    "phash_radius_near_dup",
    "incremental_jaccard_dedup",
    "containment_dedup_docs",
    "normalized_exact_dedup",
    "chunk_documents",
    "zscore_anomaly_events",
    "phash_dedup_images",
    "events_pivot_daily",
    "customer_urgent_counts",
    "curate_chunk_corpus",
    "events_unpivot_daily",
    "events_daily_delta",
    "events_rollup",
    "char_entropy_docs",
    "user_day_fulljoin",
    "edit_distance_pairs",
    "range_join_shipments",
    "funnel_conversion",
    "triangle_count",
    "bm25_search",
    "pmi_collocations",
    "phash_dedup_keep_best",
    "user_activity_quartiles",
    "distinct_users_by_type",
    "mode_lang_by_source",
    "pareto_orders",
    "basket_cooccurrence",
    "user_value_ma3",
    "user_value_median",
    "weighted_sample_orders",
    "props_json_stats",
    "embedding_dim_stats",
    "event_transitions",
    "leakage_safe_split_images",
    "fair_share_quota",
    "cohort_retention",
    "doc_length_percentile",
    "winsorize_values",
    "approx_type_overlap",
    "session_trigrams",
    "value_trend_by_type",
    "lang_entropy_by_source",
    "type_user_hhi",
    "rrf_keyword_search",
    "mad_anomaly_events",
    "time_decay_user_value",
    "cumulative_users_by_day",
    "weekly_churn",
    "length_gini_by_source",
    "autocorr_daily_value",
    "inter_arrival_gaps",
    "cusum_changepoint",
    "hot_key_audit",
    "kcore_nodes",
    "augment_images",
    "peak_concurrency_daily",
    "link_bfs_depth",
    "bigram_ttr_by_source",
    "image_channel_stats",
    "regional_revenue_q5",
    "profile_events",
    "fk_integrity_audit",
    "link_degree_assortativity",
    "apply_changes_docs",
    "crawl_payload_fidelity",
    "crawl_channel_stats",
    "export_webdataset_shards",
    "read_webdataset_shards",
    "mixup_images",
    "token_dropout_docs",
    # session-3d additions
    "table_checksum",
    "late_event_audit",
    "mask_pii_docs",
    "strip_image_metadata",
    "video_frame_sample",
    "video_keyframe_dedup",
    "video_scene_segments",
    "video_near_dup",
    "video_keyframe_export",
    "crawl_robots_audit",
    "audio_near_dup",
    "curate_video_corpus",
    "gram_novelty_docs",
    "compression_ratio_docs",
    "audio_dedup_clips",
    "novelty_by_source",
    "leakage_safe_split_docs",
    "migrate_domain_column",
    # round-5 additions
    "kneser_ney_logprob_docs",
    "strip_dup_spans_maximal",
    "dup_span_runs",
    "byte_bpe_encode_docs",
    "table_checksum_fast",
]


def _consume(res) -> int:
    if hasattr(res, "num_rows"):
        return res.num_rows
    if hasattr(res, "count"):
        return res.count()
    return len(res)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=N_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    import __ray_entry__ as entrymod
    from newscrawler_ray.pipelines.crawl import payload_replay, run_crawl
    from newscrawler_ray.synth import default_fixture_dir, gen_fixtures

    fx = gen_fixtures(default_fixture_dir(N_URLS), n_urls=N_URLS, seed=42)
    queries: dict[str, float] = {}

    # warmup: spin up the worker pool + OS page cache (untimed)
    payload_replay(fx)

    reps = 3 if SCALING_ONLY else 2  # best-of damps tenant noise
    payload_secs, n_payload = [], 0
    for _ in range(reps):
        t0 = time.time()
        n_payload = payload_replay(fx)
        payload_secs.append(time.time() - t0)
    queries["payload_replay"] = round(min(payload_secs), 3)

    crawl_secs, res = [], None
    for _ in range(reps):
        t0 = time.time()
        # overlapped wave executions only pay off when CPUs outnumber the
        # per-wave parallelism; small clusters run sequential (adaptive,
        # same rule at every level — the system tunes itself to its size)
        res = run_crawl(
            fx, "/tmp/newscrawler_ray_bench_crawl", wave_window_ms=86_400_000,
            checkpoint=False, pipeline_waves=max(1, min(3, N_CPUS // 4)),
            collect_seen=False,
        )
        crawl_secs.append(time.time() - t0)
    crawl_sec = round(min(crawl_secs), 3)
    queries["crawl"] = crawl_sec

    # standing skewed-world row (verdict r3 #6): the 1M-URL Zipf-head
    # world regression-benches the adaptive politeness-window path every
    # round, not just in prose. One rep (the row is a regression tripwire,
    # not a headline); BENCH_SKEW_URLS=0 disables.
    skew_res = None
    skew_urls = int(os.environ.get("BENCH_SKEW_URLS", "1000000"))
    if not SCALING_ONLY and skew_urls:
        fx_skew = gen_fixtures(
            default_fixture_dir(skew_urls), n_urls=skew_urls, seed=42
        )
        t0 = time.time()
        skew_res = run_crawl(
            fx_skew, "/tmp/newscrawler_ray_bench_crawl_skew",
            wave_window_ms=86_400_000, checkpoint=False,
            pipeline_waves=max(1, min(3, N_CPUS // 4)), collect_seen=False,
        )
        queries["crawl_skewed_1m"] = round(time.time() - t0, 3)

    if not SCALING_ONLY:
        qmap = entrymod.queries()
        for name in QUERY_NAMES:
            t0 = time.time()
            _consume(qmap[name](SF_DIR))
            queries[name] = round(time.time() - t0, 3)

    out = {
        "metric": "crawl wall-clock (frontier loop, synthetic web) + per-pipeline secs",
        "value": crawl_sec,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": N_CPUS,
        "n_urls": N_URLS,
        "crawl_fetched": res["fetched"],
        "crawl_urls_per_s": round(res["fetched"] / crawl_sec, 1),
        "payload_rows": n_payload,
        "payload_rows_per_s": round(n_payload / queries["payload_replay"], 1),
    }
    if skew_res is not None:
        out["crawl_skewed_urls"] = skew_urls
        out["crawl_skewed_fetched"] = skew_res["fetched"]
        out["crawl_skewed_waves"] = skew_res["waves"]
        out["crawl_skewed_urls_per_s"] = round(
            skew_res["fetched"] / queries["crawl_skewed_1m"], 1
        )
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_SCALING_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    n_lo = int(os.environ.get("BENCH_SCALE_LO", "2"))
    n_hi = int(os.environ.get("BENCH_SCALE_HI", "8"))
    # interleave levels and keep per-level best: this sandbox shares the
    # box with other tenants, so consecutive runs see different machines —
    # interleaving samples both levels under comparable conditions
    runs_lo, runs_hi = [run(n_lo)], [run(n_hi)]
    runs_lo.append(run(n_lo))
    runs_hi.append(run(n_hi))

    def best(runs, key):
        return min(r["queries"][key] for r in runs)

    lo = min(runs_lo, key=lambda r: r["queries"]["payload_replay"])
    hi = min(runs_hi, key=lambda r: r["queries"]["payload_replay"])
    lo["queries"]["payload_replay"] = best(runs_lo, "payload_replay")
    hi["queries"]["payload_replay"] = best(runs_hi, "payload_replay")
    lo["queries"]["crawl"] = best(runs_lo, "crawl")
    hi["queries"]["crawl"] = best(runs_hi, "crawl")
    ratio = n_hi / n_lo
    payload_eff = (lo["queries"]["payload_replay"] / hi["queries"]["payload_replay"]) / ratio
    crawl_eff = (lo["queries"]["crawl"] / hi["queries"]["crawl"]) / ratio
    for r in (lo, hi):
        r["payload_rows_per_s"] = round(r["payload_rows"] / r["queries"]["payload_replay"], 1)
        r["crawl_urls_per_s"] = round(r["crawl_fetched"] / r["queries"]["crawl"], 1)
    return {
        "metric": f"scaling efficiency {n_lo} -> {n_hi} CPUs (same input, interleaved fresh processes, best-of)",
        "cpus_lo": n_lo,
        "cpus_hi": n_hi,
        f"payload_rows_per_s_{n_lo}": lo["payload_rows_per_s"],
        f"payload_rows_per_s_{n_hi}": hi["payload_rows_per_s"],
        "payload_scaling_efficiency": round(payload_eff, 3),
        f"crawl_urls_per_s_{n_lo}": lo["crawl_urls_per_s"],
        f"crawl_urls_per_s_{n_hi}": hi["crawl_urls_per_s"],
        "crawl_scaling_efficiency": round(crawl_eff, 3),
        f"payload_sec_{n_lo}": lo["queries"]["payload_replay"],
        f"payload_sec_{n_hi}": hi["queries"]["payload_replay"],
        f"crawl_sec_{n_lo}": lo["queries"]["crawl"],
        f"crawl_sec_{n_hi}": hi["queries"]["crawl"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
