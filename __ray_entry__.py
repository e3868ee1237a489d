"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline (BASELINE.json north_rule) on
a small deterministic synthetic world; ``queries()`` exposes every
implemented operator/pipeline from SURVEY.md §2 over the driver parquet
tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible query (same column names, same rounding).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in newscrawler_ray) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).parent))

from newscrawler_ray.pipelines import corpusstats as CS  # noqa: E402
from newscrawler_ray.pipelines import dedup as D  # noqa: E402
from newscrawler_ray.pipelines import ordering as ORD  # noqa: E402
from newscrawler_ray.pipelines import queries as Q  # noqa: E402
from newscrawler_ray.pipelines import simsearch as S  # noqa: E402
from newscrawler_ray.pipelines import sources as SRC  # noqa: E402
from newscrawler_ray.pipelines import textstats as T  # noqa: E402


def entry() -> Any:
    """Flagship: the wave-based crawl over the synthetic image+caption web
    (fixtures cached under /tmp); returns the stored output rows."""
    from newscrawler_ray.pipelines.crawl import crawl_output_dataset, run_crawl
    from newscrawler_ray.synth import default_fixture_dir, gen_fixtures

    fx = gen_fixtures(default_fixture_dir(600), n_urls=600, seed=42)
    out = Path("/tmp/newscrawler_ray_entry_out")
    run_crawl(fx, out, n_seen_shards=2, n_frontier_shards=2, checkpoint=False)
    ds = crawl_output_dataset(out)
    return ds.drop_columns(["bytes"])  # stable, driver-friendly schema


def _crawl_e2e(sf_dir: str) -> Any:
    """Rows-only check: full crawl on the deterministic synthetic web
    (sf_dir-independent input by design — the crawl's input table is the
    image+caption world from BASELINE.json input_hint, not the TPC-H set).
    Equality vs the single-threaded oracle is enforced in tests/."""
    from newscrawler_ray.pipelines.crawl import crawl_order_topk, run_crawl
    from newscrawler_ray.synth import default_fixture_dir, gen_fixtures

    fx = gen_fixtures(default_fixture_dir(1200), n_urls=1200, seed=42)
    out = Path("/tmp/newscrawler_ray_q_crawl")
    res = run_crawl(fx, out, checkpoint=False)
    # top-k contract: bounded driver materialization at any corpus size
    # (the full ordered list is a test-scale helper only — verdict r3 #7)
    return crawl_order_topk(out, k=1000)


def _extract_crawl_output(sf_dir: str) -> Any:
    """Rows-only: crawl output -> per-URL article fetch -> selector-cascade
    extraction with the parquet extraction cache (sf_dir-independent input
    by design — runs over the same synthetic web as ``crawl_e2e``)."""
    import shutil

    import pyarrow as pa

    from newscrawler_ray.pipelines.crawl import run_crawl
    from newscrawler_ray.pipelines.webextract import (
        extract_crawl_output,
        extracted_articles_dataset,
    )
    from newscrawler_ray.synth import default_fixture_dir, gen_fixtures

    fx = gen_fixtures(default_fixture_dir(1200), n_urls=1200, seed=42)
    out = Path("/tmp/newscrawler_ray_q_xcrawl")
    cache = out / "extract_cache"
    run_crawl(fx, out, checkpoint=False, collect_seen=False)
    shutil.rmtree(cache, ignore_errors=True)
    extract_crawl_output(out, cache)
    t = pa.Table.from_pylist(
        sorted(extracted_articles_dataset(cache).take_all(), key=lambda r: r["url"])
    )
    return t.select(["url", "title", "author", "summary", "extraction_error"])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # aggregations (SURVEY A1-A6)
        "q1_lineitem_agg": Q.q1_lineitem_agg,
        "count_by_source": Q.count_by_source,
        "count_by_lang": Q.count_by_lang,
        "global_counts": Q.global_counts,
        # mergeable-sketch distinct count (rows-only: approximate)
        "approx_distinct_users": Q.approx_distinct_users,
        # grouped mergeable-sketch distinct (rows-only; bound tests)
        "approx_users_by_type": Q.approx_distinct_users_by_type,
        # exact order statistics via sort + boundary-row takes
        "value_quantiles": Q.value_quantiles,
        # mergeable t-digest quantiles (rows-only: approximate; accuracy
        # vs the exact sort path asserted in tests)
        "approx_quantiles": Q.approx_quantiles,
        "avg_value_by_type": Q.avg_value_by_type,
        # grouped exact order statistics (bounded-key path; t-digest is
        # the unbounded-key scale path)
        "value_quantiles_by_type": Q.value_quantiles_by_type,
        "part_brand_stats": Q.part_brand_stats,
        "orders_by_status": Q.orders_by_status,
        "shipped_before_agg": Q.shipped_before_agg,
        "salted_returnflag_agg": Q.salted_returnflag_agg,
        # search / filters (SURVEY §3.3, M1, M3)
        "search_keywords": Q.search_keywords,
        # index-backed variant of the same search (build the inverted
        # index once, point-lookup + verify; SAME SQL oracle as the scan)
        "search_with_index": _search_with_index,
        # ... and the RANKING half: tf-idf-scored AND retrieval
        "ranked_search": Q.ranked_search,
        # Okapi BM25 (saturating tf, doc-length normalization) over the
        # same AND retrieval — SQL-recomputable term by term
        "bm25_search": Q.bm25_search,
        # top adjacent-bigram collocations by pointwise mutual
        # information (phrase mining / tokenizer-merge seeding)
        "pmi_collocations": _pmi_collocations,
        "search_substring": Q.search_substring,
        "excluded_filter": Q.excluded_filter,
        # sort / top-k / pagination (SURVEY O1/O2)
        "recent_topk": Q.recent_topk,
        "page_offset": Q.page_offset,
        "top_orders_per_segment": Q.top_orders_per_segment,
        # heavy hitters: exact top-k by aggregate + mergeable MG sketch
        "frequent_users": Q.frequent_users,
        "approx_frequent_users": Q.approx_frequent_users,
        # as-of join (custom operator: sort-within-group + merge_asof)
        "purchase_click_asof": Q.purchase_click_asof,
        # range (interval) join: clicks within the preceding hour
        "purchase_click_window": Q.purchase_click_window,
        # large-large hash-shuffle join (both sides big; no broadcast)
        "order_priority_revenue": Q.order_priority_revenue,
        # TPC-H Q3 shape: semi-join + filters + hash join + agg + top-k
        "urgent_top_revenue": Q.urgent_top_revenue,
        # dedup (SURVEY D2/D3)
        "dedup_first_wins": Q.dedup_first_wins,
        # bulk delete rewrite (SURVEY K5) + sampling (O4 extension)
        "purge_old_events": Q.purge_old_events,
        "sample_events": Q.sample_events,
        # deterministic (engine-independent) hash sampling — SQL-exact
        "hash_sample_events": Q.hash_sample_events,
        # deterministic per-group (stratified) sample — combiner shape:
        # per-block local top-k before the group shuffle
        "stratified_sample_events": Q.stratified_sample_events,
        # joins (SURVEY J1-J3)
        "seg_revenue": Q.seg_revenue,
        "nation_orders": Q.nation_orders,
        # per-type z-score outlier detection (monitoring pass; one
        # moments aggregate + broadcast + shuffle-free flag map;
        # SQL-exact with the sum-of-squares formula written out)
        "zscore_anomaly_events": Q.zscore_anomaly_events,
        # PIVOT: one row per day, one count column per event type
        # (indicator columns + ONE grouped sum — no per-type scans)
        "events_pivot_daily": Q.events_pivot_daily,
        # LEFT OUTER join preserving zero-count rows (pre-aggregated
        # thin right side; the missing join type in the family)
        "customer_urgent_counts": Q.customer_urgent_counts,
        # ROLLUP: per-type subtotals + grand-total row in one result
        "events_rollup": Q.events_rollup,
        # CUBE: all four grouping levels of (type, dow) in one result
        "events_cube": Q.events_cube,
        # INTERSECT / EXCEPT as one grouped flag aggregate (no join)
        "user_days_intersect": Q.user_days_intersect,
        "user_days_except": Q.user_days_except,
        # log2-bucket byte-length histogram (per-batch pre-combine)
        "doc_length_histogram": Q.doc_length_histogram,
        # ARG_MIN/ARG_MAX per group via per-block candidate combiner
        "user_first_last": Q.user_first_last,
        # Pearson r from distributed raw moments (six doubles per block)
        "value_hour_corr": Q.value_hour_corr,
        # UNPIVOT (melt): the wide grid back to long, KEEPING zero cells
        "events_unpivot_daily": Q.events_unpivot_daily,
        # LAG window: day-over-day count delta per type over the dense
        # grid (offset window runs on the aggregate, never raw events)
        "events_daily_delta": Q.events_daily_delta,
        # windows (SURVEY §2.9)
        "events_daily_window": Q.events_daily_window,
        # sliding 7-day calendar window over the daily series
        "events_rolling_7d": Q.events_rolling_7d,
        # windowed dedup: first (user, type) event per tumbling hour
        "dedup_events_windowed": Q.dedup_events_windowed,
        # multi-source union + normalize + dedup (SURVEY §3.2, S1-S4/D1/M10)
        "multi_source_union": SRC.multi_source_union,
        # grouped ordered collect (SURVEY A4)
        "user_event_sequence": SRC.user_event_sequence,
        # text stats
        "token_stats": Q.token_stats,
        "bpe_token_stats": T.bpe_token_stats,
        # Gopher repetition filters (Rae et al. 2021 Table A1, word-
        # position adaptation; SQL-exact vs the string-based oracle)
        "gopher_repetition_docs": T.gopher_repetition,
        # corpus-wide duplicated k-word spans (Lee et al. 2021 exact-
        # substring dedup signal; coarse-partition counting, no joins)
        "dup_span_docs": CS.dup_span_docs,
        # order-independent corpus checksum (anti-entropy / migration
        # verification; md5-based so the SQL oracle matches bit-for-bit)
        "table_checksum": CS.table_checksum,
        # production-rate checksum twin (vectorized 128-bit xxhash fold,
        # ~40x the md5 scan; rows-only — no SQL twin for xxhash, pytest
        # asserts order/partition invariance + single-row sensitivity)
        "table_checksum_fast": CS.table_checksum_fast,
        # domain-level curation (RefinedWeb/Dolma-style domain gating)
        "domain_stats": CS.domain_stats,
        "domain_quality_filter": CS.domain_quality_filter,
        # cross-source near-duplication matrix (which sources mirror
        # each other): exact jaccard pairs + two thin source joins +
        # one small aggregate — SQL-checkable row-for-row
        "source_overlap_matrix": CS.source_overlap_matrix,
        # DSIR-style importance resampling (target = lang slice)
        "dsir_select": CS.dsir_select,
        # ... and the matching TRANSFORM: strip every position covered
        # by a corpus-duplicated 8-gram and rebuild the doc
        "strip_dup_spans": CS.strip_dup_spans,
        # ... and the Lee et al. 2021 length-thresholded form: duplicated
        # k-gram seeds extend to maximal runs, only runs covering >=
        # min_words words are stripped (short boilerplate dups preserved)
        "strip_dup_spans_maximal": CS.strip_dup_spans_maximal,
        # ... and its flagging side: per-doc maximal duplicated-run
        # stats (runs >= min_words counted, longest run reported) — the
        # signal a drop-whole-doc dedup policy gates on
        "dup_span_runs": CS.dup_span_runs,
        # Dolma-style paragraph (disjoint-block) keep-first dedup: later
        # copies of a duplicated block are stripped, the first survives
        "paragraph_dedup_docs": CS.paragraph_dedup_docs,
        # exact corpus TF-IDF, top-5 terms per doc
        "tfidf_top_terms": CS.tfidf_top_terms,
        # benchmark decontamination (GPT-3/PaLM hygiene pass): flag docs
        # sharing a k-gram with the deterministic benchmark slice
        # (k=4 / mod=31 here so the sf0.01 corpus exercises real hits)
        "benchmark_contamination": lambda sf: CS.benchmark_contamination_docs(
            sf, k=4, bench_mod=31
        ),
        # pretraining mixture weights: p_s ∝ token_share^0.5 per source
        "source_mix_weights": CS.source_mix_weights,
        # ... and the mixture MATERIALIZED: deterministic per-source
        # hash sample at the damped rates (SQL-exact)
        "mixture_sample_docs": CS.mixture_sample_docs,
        # ... and the upsampling half: per-source repetition rates >= 1
        # (epochs relative to the largest source), floor copies + hash-
        # selected fractional copy (SQL-exact via a range() cross join)
        "upsample_mixture_docs": CS.upsample_mixture_docs,
        # deterministic held-out split: seeded-hash doc -> train/val/test
        # (pure function of (doc_id, seed); no leakage across recrawls)
        "train_val_test_split": CS.train_val_test_split,
        # C4-style blocklist scrub: whole-word RE2 hit count + in-place
        # masking (byte-exact vs DuckDB's RE2 regexp_replace)
        "scrub_blocklist_docs": T.scrub_blocklist_docs,
        # Dolma/FineWeb PII masking: emails / IPv4s / phones -> typed
        # sentinels + per-class hit counts; the PII surface is planted
        # as a pure function of doc_id on BOTH sides (byte-exact RE2)
        "mask_pii_docs": T.mask_pii_docs,
        # deterministic global training shuffle: distributed dense row
        # numbering (bucket histogram -> offset broadcast -> per-bucket
        # rank) over a seeded multiplicative-hash key (SQL-exact)
        "shuffled_training_order": ORD.shuffled_training_order,
        # length-curriculum schedule: shortest-first, seeded shuffle
        # within equal lengths — composite-key global rank over the
        # count-quantile-balanced partitioner (SQL-exact)
        "curriculum_training_order": ORD.curriculum_training_order,
        # token-budget subset: keep the prefix of the seeded shuffle
        # order whose running whitespace-token sum stays <= budget
        # (distributed windowed prefix cutoff; SQL-exact vs SUM() OVER)
        "sample_token_budget": ORD.sample_token_budget,
        # unigram-LM mean NLL per doc (CCNet perplexity-filter stand-in)
        "unigram_logprob_docs": CS.unigram_logprob_docs,
        # bigram-LM mean NLL per doc (order-aware rung toward KenLM)
        "bigram_logprob_docs": CS.bigram_logprob_docs,
        # interpolated Kneser-Ney trigram mean NLL per doc (the
        # CCNet-grade perplexity filter; continuation-count smoothing,
        # SQL-exact vs a string trigram/bigram CTE recompute)
        "kneser_ney_logprob_docs": CS.kneser_ney_logprob_docs,
        # distributed spherical k-means over the full embeddings table
        # (SemDeDup-style corpus clustering; rows-only: iterative — the
        # pytest oracle checks exact argmax optimality under the final
        # centroids, rerun determinism, and Lloyd objective improvement)
        "kmeans_clusters": S.kmeans_assign,
        # flagship text-curation composition (C4/RefinedWeb recipe):
        # gopher gates AND quality floor AND unigram-NLL cap AND
        # decontamination, then exact first-wins dedup — whole
        # composition SQL-oracled
        "curate_text_corpus": CS.curate_text_corpus,
        # ... -> chunking composition: sliding windows over exactly the
        # curation survivors (semi-join, not an id broadcast; the corpus
        # a context-window trainer consumes) — whole composition
        # SQL-oracled
        "curate_chunk_corpus": CS.curate_chunk_corpus,
        # resumable sharded export of the curated corpus (rows-only:
        # writes parquet; skip/rewrite semantics tested in tests/)
        "export_training_shards": _export_training_shards,
        # end-to-end LLM-data tier: curate -> train BPE on survivors ->
        # encode -> pack <=capacity-token bins -> resumable sharded
        # export (rows-only: component-consistency + invariants + resume
        # semantics in tests/test_tokenizer.py)
        "prepare_training_data": _prepare_training_data,
        # training-data ops: dedup family (SURVEY D2-D5 + graft additions)
        "exact_dedup_docs": D.exact_dedup_docs,
        # incremental snapshot dedup: new snapshot vs old corpus
        # (SQL-paired exact anti-aggregate; bloom variant is rows-only —
        # its FP/no-false-negative bounds are tested in tests/)
        "incremental_exact_dedup": D.incremental_exact_dedup,
        # NEAR-dup snapshot-vs-corpus dedup: cross-origin-only prefix-
        # filter pairs (old x old cliques never generated), then exact
        # first-wins within the snapshot — SQL-checkable
        "incremental_jaccard_dedup": lambda sf: D.incremental_jaccard_dedup(
            sf, threshold=0.5
        ),
        "bloom_dedup_docs": D.bloom_dedup_docs,
        # EXACT set-similarity self-join (prefix filtering) — unlike the
        # LSH families this one is deterministic and SQL-checkable
        "ngram_jaccard_pairs": lambda sf: D.ngram_jaccard_pairs(sf, threshold=0.5),
        # EXACT asymmetric containment self-join (|A∩B| / min(|A|,|B|)
        # >= t): catches short-doc-quoted-in-long-doc near-dups that
        # Jaccard misses; prefix-filter candidates, SQL-checkable
        "ngram_containment_pairs": lambda sf: D.ngram_containment_pairs(
            sf, threshold=0.6
        ),
        "minhash_near_dup": lambda sf: D.minhash_lsh_pairs(sf, threshold=0.5),
        # FastSS deletion-neighborhood fuzzy join: doc pairs whose
        # 60-char text prefix is within Levenshtein distance 1 —
        # character-typo near-dups the token-set family misses
        "edit_distance_pairs": D.edit_distance_pairs,
        # corpus-level dedup (pairs -> connected components -> keep the
        # cluster min): exact variant is SQL-checkable via recursive CTE
        "jaccard_dedup_docs": lambda sf: D.jaccard_dedup_docs(sf, threshold=0.5),
        # corpus dedup under the CONTAINMENT relation (quotes-plus-
        # commentary re-posts) — recursive-CTE hard oracle
        "containment_dedup_docs": lambda sf: D.containment_dedup_docs(
            sf, threshold=0.6
        ),
        # leakage-safe TEXT split: near-dup clusters land in one split
        # (text twin of leakage_safe_split_images, with a hard oracle:
        # the jaccard closure CTE composed with the Knuth split rule)
        "leakage_safe_split_docs": CS.leakage_safe_split_docs,
        # per-doc k-gram novelty (first-appearance fraction): one
        # Min-per-gram aggregate + winner counts + thin per-doc join
        "gram_novelty_docs": CS.gram_novelty_docs,
        # zlib-ratio quality gate (Gopher family): rows-only — no SQL
        # zlib; driver-recompute + planted-tails test in tests/
        "compression_ratio_docs": CS.compression_ratio_docs,
        # source-level novelty rollup: integer-exact gram-weighted rate
        "novelty_by_source": CS.novelty_by_source,
        # C4-style normalized exact dedup (case/punct/whitespace
        # variants) — SQL-exact
        "normalized_exact_dedup": D.normalized_exact_dedup,
        "minhash_dedup_docs": lambda sf: D.minhash_dedup_docs(sf, threshold=0.5),
        # cross-modal corpus dedup: clusters closed under (embedding
        # cosine >= 0.4 OR word-3-gram jaccard >= 0.5) keep min doc_id;
        # both pair sources exact -> recursive-CTE hard oracle
        "crossmodal_dedup_docs": lambda sf: D.crossmodal_dedup_docs(
            sf, tau=0.4, threshold=0.5
        ),
        # SemDeDup semantic corpus dedup (Abbas et al. 2023): k-means +
        # within-cluster cosine pruning, keep the farthest-from-centroid
        # member per near-dup group (rows-only: iterative — brute-force
        # survivor-set equality oracle in tests/test_dedup_simsearch.py)
        "semdedup_docs": lambda sf: D.semdedup_docs(sf, tau=0.4),
        "simhash_docs": D.simhash_docs,
        "simhash_near_dup": lambda sf: D.simhash_near_dup_pairs(sf),
        "embedding_near_dup": lambda sf: D.embedding_near_dup(sf, tau=0.4),
        # IVF-bucketed approximate near-dup (rows-only: recall vs the
        # exact operator is asserted in tests)
        # n_probe=6 makes the multi-probe assignment provably cover every
        # tau>=0.4 pair on this corpus (recall 1.0 vs the exact operator;
        # each emitted pair is exact-cosine-verified regardless) — so the
        # exact block-pair SQL is a hard oracle for it (VERDICT r2 item 3)
        "embedding_near_dup_ivf": lambda sf: D.embedding_near_dup_ivf(
            sf, tau=0.4, n_probe=6
        ),
        # similarity search
        "knn_topk": S.knn_topk,
        "knn_multi": S.knn_multi,
        "knn_ivf_topk": S.knn_ivf,
        # product-quantization ANN (rows-only: recall + determinism +
        # code-shape oracles in tests/)
        "knn_pq_topk": S.knn_pq,
        "pq_encode": S.pq_encode,
        # gap sessionization (SURVEY §2.9 streaming analog)
        "user_sessions": SRC.user_sessions,
        "user_session_rows": SRC.user_session_rows,
        # headline clustering (SURVEY A4 grouping half: simhash pairs ->
        # connected components -> grouped title collect; rows-only —
        # union-find + planted-cluster oracles in tests/)
        "headline_clusters": _headline_clusters,
        # PageRank over the deterministic document link graph (crawl
        # priority signal; SQL-paired — iterations unrolled as chained
        # CTEs in the oracle)
        "link_pagerank": _link_pagerank,
        # crawl -> PageRank tier composition (rows-only: dense-reference
        # equality + ground-truth-links oracle in tests/)
        "crawl_pagerank": _crawl_pagerank,
        # HITS hubs/authorities over the same link graph (SQL-paired)
        "link_hits": _link_hits,
        # text analysis (rows-only: heuristics not SQL-expressible)
        "lang_id_docs": T.lang_id,
        # sequence packing (rows-only: bin layout is a function of the
        # fixed blocking; invariants + determinism tested in tests/)
        "pack_token_bins": T.pack_token_bins,
        # sliding-window token chunking (context-window prep for docs
        # longer than a training sequence; SQL-exact vs
        # generate_series + list_slice)
        "chunk_documents": lambda sf: T.chunk_documents(
            sf, chunk_tokens=24, stride=12
        ),
        # BPE tokenizer training on the corpus + corpus-wide encoding
        # (rows-only: iterative merge loop; exact brute-force-retrain
        # and reference-encode oracles in tests/test_tokenizer.py)
        "train_bpe_merges": _train_bpe_merges,
        "bpe_encode_docs": _bpe_encode_docs,
        # byte-level BPE (GPT-2/tiktoken class): regex pre-tokenization +
        # 256-byte initial alphabet over the same merge engine (rows-only:
        # iterative + lookahead regex has no RE2/SQL twin; exact
        # brute-force-retrain and reference-encode oracles in tests)
        "byte_bpe_merges": _byte_bpe_merges,
        "byte_bpe_encode_docs": _byte_bpe_encode_docs,
        "quality_score_docs": T.quality_score,
        # per-doc Shannon char entropy (byte histogram, one bincount)
        "char_entropy_docs": T.char_entropy_docs,
        # FULL OUTER join of per-(user, day) type counts as one scan
        "user_day_fulljoin": Q.user_day_fulljoin,
        # association rules: (user, day)-basket pair support/conf/lift
        "basket_cooccurrence": Q.basket_cooccurrence,
        # ROWS-frame window: per-user trailing 3-row moving average
        "user_value_ma3": Q.user_value_ma3,
        "user_value_median": Q.user_value_median,
        # streaming watermark audit: per-user late-event counts + worst
        # disorder under a deterministic synthetic ingest clock
        "late_event_audit": Q.late_event_audit,
        # weighted sampling w/o replacement (A-ES exponential keys)
        "weighted_sample_orders": Q.weighted_sample_orders,
        # semi-structured: JSON field extraction + grouped stats
        "props_json_stats": Q.props_json_stats,
        # UNNEST family: per-dimension moments over list<float>
        "embedding_dim_stats": Q.embedding_dim_stats,
        # Markov transition matrix (lead() window over user sequences)
        "event_transitions": Q.event_transitions,
        # max-min fair-share (water-filling) budget allocation
        "fair_share_quota": Q.fair_share_quota,
        # cohort retention triangle (first-activity-week cohorts)
        "cohort_retention": Q.cohort_retention,
        # PERCENT_RANK window: within-source length percentile
        "doc_length_percentile": Q.doc_length_percentile,
        # winsorization: clamp values to per-type [p05, p95]
        "winsorize_values": Q.winsorize_values,
        # HLL inclusion-exclusion audience overlap (rows-only: approx)
        "approx_type_overlap": Q.approx_type_overlap,
        # session-path trigrams (two-lead window over user sequences)
        "session_trigrams": Q.session_trigrams,
        # per-type OLS trend (regr_slope/intercept via grouped moments)
        "value_trend_by_type": Q.value_trend_by_type,
        # per-source Shannon entropy (bits) of the language mix
        "lang_entropy_by_source": Q.lang_entropy_by_source,
        # per-type Herfindahl concentration of events over users
        "type_user_hhi": Q.type_user_hhi,
        # reciprocal-rank-fusion hybrid keyword retrieval
        "rrf_keyword_search": Q.rrf_keyword_search,
        # robust median/MAD outlier detection per type
        "mad_anomaly_events": Q.mad_anomaly_events,
        # per-user exponentially time-decayed value sum
        "time_decay_user_value": Q.time_decay_user_value,
        # running distinct-user count (first-day trick, no window scan)
        "cumulative_users_by_day": Q.cumulative_users_by_day,
        # week-over-week churn from one distinct (user, week) exchange
        "weekly_churn": Q.weekly_churn,
        # per-source Gini coefficient of document lengths
        "length_gini_by_source": Q.length_gini_by_source,
        # lag-1 autocorrelation of each type's daily value series
        "autocorr_daily_value": Q.autocorr_daily_value,
        # per-type inter-arrival gap stats over (user, type) runs
        "inter_arrival_gaps": Q.inter_arrival_gaps,
        # k-core of the document link graph (fixed-round distributed
        # peel; SQL-paired — rounds unrolled as chained CTEs)
        "kcore_nodes": _kcore_nodes,
        # CUSUM level-shift scan over each type's daily value series
        "cusum_changepoint": Q.cusum_changepoint,
        # pre-shuffle skew audit: top-1 key share per event type
        "hot_key_audit": Q.hot_key_audit,
        # sweep-line max-overlap: per-day peak concurrent 30-min
        # sessions via the distributed-prefix-sum histogram fold
        "peak_concurrency_daily": Q.peak_concurrency_daily,
        # multi-source BFS depth over the deterministic link graph
        # (crawl-depth analytic; broadcast frontier, streamed edges)
        "link_bfs_depth": _link_bfs_depth,
        # per-source bigram type-token ratio (template-farm audit)
        "bigram_ttr_by_source": _bigram_ttr_by_source,
        # TPC-H Q5: 6-table local-supplier revenue per nation
        "regional_revenue_q5": Q.regional_revenue_q5,
        # one-pass column profiler (n / nulls / exact distinct / min/max)
        "profile_events": Q.profile_events,
        # FK orphan audit: broadcast probes + union-aggregate anti-join
        "fk_integrity_audit": Q.fk_integrity_audit,
        # CDC MERGE: insert/update/delete stream applied in one grouped
        # winner pass (K1/K2 upsert generalized)
        "apply_changes_docs": Q.apply_changes_docs,
        # deterministic EDA token dropout (hash-decided, SQL-exact)
        "token_dropout_docs": _token_dropout_docs,
        # Newman degree assortativity of the link graph (hub→hub vs
        # hub→leaf; frontier-growth predictor)
        "link_degree_assortativity": _link_degree_assortativity,
        # non-equi INTERVAL join: lineitems shipped inside each promo
        # window (broadcast windows + per-batch sorted searchsorted)
        "range_join_shipments": Q.range_join_shipments,
        # ordered funnel view -> click-after-view -> purchase-after-click
        "funnel_conversion": Q.funnel_conversion,
        # NTILE window: equal-count activity quartiles via global_rank
        "user_activity_quartiles": Q.user_activity_quartiles,
        # two-level exact COUNT(DISTINCT) per group (no raw-row shuffle)
        "distinct_users_by_type": Q.distinct_users_by_type,
        # MODE aggregate: most frequent lang per source, min-lang ties
        "mode_lang_by_source": Q.mode_lang_by_source,
        # SKYLINE: Pareto-maximal orders on (totalprice, orderdate)
        "pareto_orders": Q.pareto_orders,
        # degree-oriented distributed triangle count on the co-purchase
        # projection graph (node-iterator, Suri/Vassilvitskii 2011)
        "triangle_count": _triangle_count,
        # distilled quality classifier (train-on-engine, rows-only:
        # loss-decrease / agreement / determinism oracles in tests/)
        "quality_classifier_docs": _quality_classifier_docs,
        "fingerprint_docs": T.fingerprint_docs,
        # HTML selector-cascade article extraction (SURVEY M6; rows-only:
        # golden parity vs the generator's ground truth in tests/)
        "extract_html": _extract_html,
        # structured video-metadata extraction (SURVEY M9; rows-only:
        # golden parity + URL-validation negative tests in tests/)
        "extract_video_metadata": _extract_video_metadata,
        # multimodal stages (over synthetic payload tables)
        "image_features": _image_features,
        "image_channel_stats": _image_channel_stats,
        "crawl_channel_stats": _crawl_channel_stats,
        "crawl_payload_fidelity": _crawl_payload_fidelity,
        "export_webdataset_shards": _export_webdataset_shards,
        "read_webdataset_shards": _read_webdataset_shards,
        "mixup_images": _mixup_images,
        "phash_near_dup": _phash_near_dup,
        # hamming-radius pHash pairs (re-encoded/resized copies land a
        # few bits off the exact hash; shared 4-band pigeonhole kernel;
        # rows-only — brute-force parity oracle in tests/)
        "phash_radius_near_dup": _phash_radius_near_dup,
        # ... and the corpus survivor set on top (pairs -> connected
        # components -> keep cluster min; rows-only — union-find parity
        # oracle in tests/)
        "phash_dedup_images": _phash_dedup_images,
        # leakage-safe split: near-dup clusters never span splits
        "leakage_safe_split_images": _leakage_safe_split_images,
        # keep-BEST cluster policy (max w*h, min-id ties) over the same
        # pHash near-dup relation (rows-only: union-find + planted-policy
        # oracles in tests/test_textstats_multimodal.py)
        "phash_dedup_keep_best": _phash_dedup_keep_best,
        # incremental image-snapshot dedup (bloom over phashes; rows-only
        # — no-false-negative + FP bounds in tests/)
        "bloom_dedup_images": _bloom_dedup_images,
        # image-text pair curation (vision.py; deterministic stand-in
        # towers, real actor-pool plumbing — in-test oracles)
        "clip_score_filter": _clip_score_filter,
        "image_quality_filter": _image_quality_filter,
        # SDXL-style multi-resolution training prep: nearest-log-aspect
        # bucket per image, payload bytes never read (rows-only:
        # brute-force optimality + determinism oracle in tests/)
        "aspect_bucket_images": _aspect_bucket_images,
        # deterministic crop/flip/resize augmentation (rows-only: pixel
        # oracles + determinism tests in tests/test_vision.py)
        "augment_images": _augment_images,
        # image metadata scrub (EXIF/GPS-strip twin of mask_pii_docs):
        # drop PNG ancillary chunks / PPM header comments in place;
        # rows-only — planted-then-stripped bytes are byte-identical to
        # the originals (tested in tests/test_textstats_multimodal.py)
        "strip_image_metadata": _strip_image_metadata,
        # video payload ops (frame-sample as an actor-pool seek-decode
        # stage; keyframe dedup as one thin-row hash aggregate) —
        # rows-only: planted syndicated-intro / within-video dup oracles
        # + direct-decode parity in tests/test_video.py
        "video_frame_sample": _video_frame_sample,
        "video_keyframe_dedup": _video_keyframe_dedup,
        "video_scene_segments": _video_scene_segments,
        "video_near_dup": _video_near_dup,
        "video_keyframe_export": _video_keyframe_export,
        "crawl_robots_audit": _crawl_robots_audit,
        "curate_video_corpus": _curate_video_corpus,
        # shard-wise schema migration with backfill (reference DB-script
        # analog; rows-only — idempotence/resume oracles in tests)
        "migrate_domain_column": _migrate_domain_column,
        # ... and the loader schedule on top: exactly-batch_size groups
        # per (bucket, step), seeded order, leftovers dropped (rows-only:
        # numpy recompute + invariant oracles in tests/)
        "bucketed_training_batches": _bucketed_training_batches,
        # exact duplicate-caption removal (boilerplate captions poison
        # contrastive training; rows-only — driver-recompute oracle)
        "caption_dedup_images": _caption_dedup_images,
        # pixel-budget image subset (decode/augment compute budget):
        # the image twin of sample_token_budget (rows-only — numpy
        # prefix-cutoff oracle in tests/)
        "sample_pixel_budget": _sample_pixel_budget,
        "image_near_dup_emb": _image_near_dup_emb,
        "curate_image_corpus": _curate_image_corpus,
        # ... and its resumable sharded export (rows-only: survivor +
        # payload-intact + resume semantics in tests/test_vision.py)
        "export_image_shards": _export_image_shards,
        "image_knn": _image_knn,
        # contrastive-training hard negatives: distributed all-pairs
        # top-k between the image and text towers (rows-only: exact
        # brute-force parity in tests/test_vision.py)
        "mine_hard_negatives": _mine_hard_negatives,
        # PQ-code visual search (rows-only: recall vs exact in tests/)
        "image_knn_pq": _image_knn_pq,
        "image_kmeans_clusters": _image_kmeans,
        "curate_crawl_output": _curate_crawl_output,
        "audio_features": _audio_features,
        "audio_near_dup": _audio_near_dup,
        "audio_dedup_clips": _audio_dedup_clips,
        # flagship crawl (north_rule; rows-only — oracle equality in tests/)
        "crawl_e2e": _crawl_e2e,
        # crawl -> article-extraction composition (reference inline
        # /news?extract=true path; rows-only — golden parity + cache-hit
        # semantics in tests/test_extract_composition.py)
        "extract_crawl_output": _extract_crawl_output,
        # incremental recrawl delta between two crawl snapshots
        # (rows-only; driver-set equality in tests/)
        "crawl_snapshot_diff": _crawl_snapshot_diff,
        # change-rate-driven recrawl scheduling (rows-only; per-host
        # driver recompute + priority-mapping tests in tests/)
        "recrawl_schedule": _recrawl_schedule,
        "recrawl_seed_urls": _recrawl_seed_urls,
        # crawler-trap mining: (host, path template) URL counts (rows-only;
        # DuckDB regexp oracle in tests/test_crawl_e2e.py)
        "crawl_url_templates": _mine_url_templates,
        # trap feedback loop: mine policy -> guarded re-crawl -> census
        # (rows-only; guarded-oracle byte equality in tests)
        "crawl_trap_guard": _crawl_trap_guard,
    }


def _train_bpe_merges(sf_dir: str) -> Any:
    from newscrawler_ray.pipelines.tokenizer import train_bpe_merges

    return train_bpe_merges(sf_dir, n_merges=64)


def _bpe_encode_docs(sf_dir: str) -> Any:
    from newscrawler_ray.pipelines.tokenizer import bpe_encode_docs

    return bpe_encode_docs(sf_dir, n_merges=64)


def _byte_bpe_merges(sf_dir: str) -> Any:
    from newscrawler_ray.pipelines.tokenizer import byte_bpe_merges

    return byte_bpe_merges(sf_dir, n_merges=64)


def _byte_bpe_encode_docs(sf_dir: str) -> Any:
    from newscrawler_ray.pipelines.tokenizer import byte_bpe_encode_docs

    return byte_bpe_encode_docs(sf_dir, n_merges=64)


def _quality_classifier_docs(sf_dir: str) -> Any:
    """Rows-only: hashed-BoW logistic regression distilled from the
    composite quality gate (full-batch GD on the engine; oracles in
    tests/test_textstats_multimodal.py)."""
    from newscrawler_ray.pipelines.classify import quality_classifier_scores

    return quality_classifier_scores(sf_dir)


def _search_with_index(sf_dir: str) -> Any:
    """SQL-paired: whole-word AND search answered from the inverted
    term index (built fresh into scratch each call; point lookups +
    exact regex verify — identical rows to the scan search)."""
    import shutil

    from newscrawler_ray.pipelines.index import build_term_index, search_index

    idx = Path("/tmp/newscrawler_ray_q_index")
    if idx.exists():
        shutil.rmtree(idx)
    build_term_index(sf_dir, idx)
    return search_index(idx, sf_dir)


def _export_training_shards(sf_dir: str) -> Any:
    """Rows-only: resumable sharded export manifest. A fresh scratch dir
    per call so the driver check always sees a full write."""
    import shutil

    from newscrawler_ray.pipelines.corpusstats import export_training_shards

    out = Path("/tmp/newscrawler_ray_q_export")
    if out.exists():
        shutil.rmtree(out)
    return export_training_shards(sf_dir, out)


def _prepare_training_data(sf_dir: str) -> Any:
    """Rows-only: end-to-end curate->tokenize->pack->shard manifest.
    Fresh scratch dir per call so the driver check sees a full write."""
    import shutil

    from newscrawler_ray.pipelines.corpusstats import prepare_training_data

    out = Path("/tmp/newscrawler_ray_q_traindata")
    if out.exists():
        shutil.rmtree(out)
    return prepare_training_data(sf_dir, out)


def _pmi_collocations(sf_dir: str) -> Any:
    """SQL-paired: PMI over within-doc adjacent token bigrams."""
    from newscrawler_ray.pipelines.corpusstats import pmi_collocations

    return pmi_collocations(sf_dir)


def _triangle_count(sf_dir: str) -> Any:
    """SQL-paired: degree-oriented triangle count over the co-purchase
    projection graph (same-day same-value-bucket purchase users)."""
    from newscrawler_ray.pipelines.graph import triangle_count

    return triangle_count(sf_dir)


def _link_pagerank(sf_dir: str) -> Any:
    """SQL-paired: PageRank (damping 0.85, 5 iterations, dangling mass
    redistributed uniformly) over the deterministic SQL-expressible
    link graph derived from documents."""
    from newscrawler_ray.pipelines.graph import link_pagerank

    return link_pagerank(sf_dir)


def _kcore_nodes(sf_dir: str) -> Any:
    """SQL-paired: k-core (k=4, 12 peel rounds, converged at both test
    scales) of the deterministic document link graph."""
    from newscrawler_ray.pipelines.graph import kcore_nodes

    return kcore_nodes(sf_dir)


def _link_bfs_depth(sf_dir: str) -> Any:
    """SQL-paired: multi-source BFS depth (seeds doc_id % 100 == 0,
    max depth 6) over the deterministic document link graph."""
    from newscrawler_ray.pipelines.graph import link_bfs_depth

    return link_bfs_depth(sf_dir)


def _bigram_ttr_by_source(sf_dir: str) -> Any:
    """SQL-paired: per-source bigram type-token ratio."""
    from newscrawler_ray.pipelines.corpusstats import bigram_ttr_by_source

    return bigram_ttr_by_source(sf_dir)


def _token_dropout_docs(sf_dir: str) -> Any:
    """SQL-paired: deterministic ~10% token dropout, hash-decided per
    (doc_id, position)."""
    from newscrawler_ray.pipelines.textstats import token_dropout_docs

    return token_dropout_docs(sf_dir)


def _link_degree_assortativity(sf_dir: str) -> Any:
    """SQL-paired: out-degree/in-degree Pearson correlation over the
    deterministic document link graph's edges."""
    from newscrawler_ray.pipelines.graph import link_degree_assortativity

    return link_degree_assortativity(sf_dir)


def _kcore_oracle(
    k: int = 4,
    rounds: int = 12,
    link_k: int = 3,
    mul: int = 48271,
    add: int = 10007,
    skip: int = 7,
) -> str:
    """Unrolled-round DuckDB k-core peel over the same deterministic
    link graph as ``_pagerank_oracle``: each round keeps nodes whose
    symmetric degree is >= k and the edges they induce. Canonical edge
    orientation (u=greatest, v=least) mirrors ``graph._make_orient``.
    Every per-round CTE is AS MATERIALIZED (CLAUDE.md invariant: DuckDB
    re-inlines repeated CTE references exponentially otherwise)."""
    parts = [
        f"""
WITH dc AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM documents),
raw AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS src,
         (CAST(doc_id AS BIGINT) * {mul} + j.j * {add} + 1) % dc.cnt AS dst
  FROM documents CROSS JOIN dc CROSS JOIN range(0, {link_k}) AS j(j)
  WHERE doc_id % {skip} <> 0
),
e0 AS MATERIALIZED (
  SELECT DISTINCT greatest(src, dst) AS u, least(src, dst) AS v
  FROM raw WHERE src <> dst
)"""
    ]
    prev = "e0"
    for i in range(1, rounds + 1):
        parts.append(
            f""",
n{i} AS MATERIALIZED (
  SELECT u FROM (SELECT u FROM {prev} UNION ALL SELECT v AS u FROM {prev})
  GROUP BY u HAVING count(*) >= {k}
),
e{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prev} e
  JOIN n{i} a ON e.u = a.u JOIN n{i} b ON e.v = b.u
)"""
        )
        prev = f"e{i}"
    parts.append(
        f"""
SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
FROM (SELECT u FROM {prev} UNION ALL SELECT v AS u FROM {prev})
GROUP BY u"""
    )
    return "".join(parts)


def _pagerank_oracle(
    k: int = 3,
    damping: float = 0.85,
    n_iter: int = 5,
    mul: int = 48271,
    add: int = 10007,
    skip: int = 7,
) -> str:
    """Unrolled-iteration DuckDB PageRank: one chained CTE per power-
    iteration step, same term grouping as the Ray kernel (d*r/outdeg per
    edge; dangling mass summed then spread uniformly), so both sides
    agree to float-sum reordering (<< the round-8 quantum)."""
    d = repr(damping)
    parts = [
        f"""
WITH dc AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM documents),
edges AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS src,
         (CAST(doc_id AS BIGINT) * {mul} + j.j * {add} + 1) % dc.cnt AS dst
  FROM documents CROSS JOIN dc CROSS JOIN range(0, {k}) AS j(j)
  WHERE doc_id % {skip} <> 0
),
deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes),
r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT cnt FROM nn) AS r FROM nodes)"""
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        parts.append(
            f""",
r{i} AS MATERIALIZED (
  SELECT nd.node,
         (1.0 - {d}) / (SELECT cnt FROM nn)
         + {d} * (SELECT COALESCE(SUM(p.r), 0)
                  FROM {prev} p
                  WHERE p.node NOT IN (SELECT src FROM deg))
               / (SELECT cnt FROM nn)
         + COALESCE(inf.s, 0) AS r
  FROM nodes nd
  LEFT JOIN (
    SELECT e.dst AS node, SUM({d} * p.r / dg.outdeg) AS s
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN deg dg ON dg.src = e.src
    GROUP BY e.dst
  ) inf ON inf.node = nd.node
)"""
        )
        prev = f"r{i}"
    parts.append(
        f"""
SELECT node, round(r + 1e-9, 8) AS rank FROM {prev} ORDER BY node"""
    )
    return "".join(parts)


def _crawl_snapshot_diff(sf_dir: str) -> Any:
    """Rows-only: delta between the 600-URL-world and 1200-URL-world
    crawls (sf_dir-independent input by design; driver-set equality in
    tests/test_crawl_e2e.py)."""
    from newscrawler_ray.pipelines.crawl import crawl_snapshot_diff, run_crawl
    from newscrawler_ray.synth import default_fixture_dir, gen_fixtures

    out_old = Path("/tmp/newscrawler_ray_q_diff_old")
    out_new = Path("/tmp/newscrawler_ray_q_diff_new")
    run_crawl(gen_fixtures(default_fixture_dir(600), n_urls=600, seed=42),
              out_old, n_seen_shards=2, n_frontier_shards=2,
              checkpoint=False, collect_seen=False)
    run_crawl(gen_fixtures(default_fixture_dir(1200), n_urls=1200, seed=42),
              out_new, n_seen_shards=2, n_frontier_shards=2,
              checkpoint=False, collect_seen=False)
    return crawl_snapshot_diff(out_old, out_new)


_RECRAWL_SNAPSHOTS: list = []


def _recrawl_snapshots() -> tuple[Path, Path]:
    """The 600-world and 1200-world crawl outputs the recrawl ops diff
    (same snapshot pair as ``crawl_snapshot_diff``; fixtures cached).
    Memoized per process — the crawls are deterministic, so the second
    recrawl query reuses the pair instead of re-crawling both worlds."""
    from newscrawler_ray.pipelines.crawl import run_crawl
    from newscrawler_ray.synth import default_fixture_dir, gen_fixtures

    out_old = Path("/tmp/newscrawler_ray_q_sched_old")
    out_new = Path("/tmp/newscrawler_ray_q_sched_new")
    if not _RECRAWL_SNAPSHOTS or not (
        out_old.exists() and out_new.exists()
    ):
        run_crawl(gen_fixtures(default_fixture_dir(600), n_urls=600, seed=42),
                  out_old, n_seen_shards=2, n_frontier_shards=2,
                  checkpoint=False, collect_seen=False)
        run_crawl(gen_fixtures(default_fixture_dir(1200), n_urls=1200, seed=42),
                  out_new, n_seen_shards=2, n_frontier_shards=2,
                  checkpoint=False, collect_seen=False)
        _RECRAWL_SNAPSHOTS.append(True)
    return out_old, out_new


def _recrawl_schedule(sf_dir: str) -> Any:
    """Rows-only: per-host change-rate recrawl schedule between two crawl
    snapshots (sf_dir-independent input by design; per-host recompute
    oracle in tests/test_crawl_e2e.py)."""
    from newscrawler_ray.pipelines.crawl import schedule_recrawl

    out_old, out_new = _recrawl_snapshots()
    return schedule_recrawl(out_old, out_new)


def _recrawl_seed_urls(sf_dir: str) -> Any:
    """Rows-only: the next pass's priority-tagged seed list (top-100 by
    recrawl_priority DESC, url ASC)."""
    from newscrawler_ray.pipelines.crawl import recrawl_seed_urls

    out_old, out_new = _recrawl_snapshots()
    return recrawl_seed_urls(out_old, out_new, k_top=100)


def _mine_url_templates(sf_dir: str) -> Any:
    """Rows-only: crawler-trap mining — (host, path template) URL counts
    over the 1200-URL-world snapshot (sf_dir-independent input by design;
    DuckDB regexp_replace+GROUP BY oracle in tests/test_crawl_e2e.py)."""
    from newscrawler_ray.pipelines.crawl import mine_url_templates

    _, out_new = _recrawl_snapshots()
    return mine_url_templates(out_new, min_urls=5)


def _crawl_trap_guard(sf_dir: str) -> Any:
    """Rows-only: the trap feedback loop — mine a snapshot's URL-space
    policy, re-crawl under it, return the guarded snapshot's template
    census (sf_dir-independent input by design; byte-equality vs the
    guarded oracle + hash-rule recompute in tests/test_crawl_e2e.py)."""
    from newscrawler_ray.functions.traps import trap_policy_from_snapshot
    from newscrawler_ray.pipelines.crawl import mine_url_templates, run_crawl
    from newscrawler_ray.synth import default_fixture_dir, gen_fixtures

    _, out_new = _recrawl_snapshots()
    policy = trap_policy_from_snapshot(out_new, max_urls=30)
    out = Path("/tmp/newscrawler_ray_q_trap")
    run_crawl(gen_fixtures(default_fixture_dir(1200), n_urls=1200, seed=42),
              out, n_seen_shards=2, n_frontier_shards=2, checkpoint=False,
              collect_seen=False, trap_policy=policy)
    return mine_url_templates(out, min_urls=1)


def _crawl_pagerank(sf_dir: str) -> Any:
    """Rows-only: crawl the synthetic web, then PageRank the crawled
    pages over the link graph the crawl discovered (sf_dir-independent
    input by design; dense-reference oracle in tests/)."""
    from newscrawler_ray.pipelines.crawl import run_crawl
    from newscrawler_ray.pipelines.graph import crawl_pagerank
    from newscrawler_ray.synth import default_fixture_dir, gen_fixtures

    fx = gen_fixtures(default_fixture_dir(1200), n_urls=1200, seed=42)
    out = Path("/tmp/newscrawler_ray_q_pagerank")
    run_crawl(fx, out, n_seen_shards=2, n_frontier_shards=2, checkpoint=False,
              collect_seen=False)
    return crawl_pagerank(out, fx)


def _link_hits(sf_dir: str) -> Any:
    """SQL-paired: HITS hubs & authorities (5 iterations, L2-normalized
    per half-step) over the deterministic link graph."""
    from newscrawler_ray.pipelines.graph import link_hits

    return link_hits(sf_dir)


def _hits_oracle(
    k: int = 3,
    n_iter: int = 5,
    mul: int = 48271,
    add: int = 10007,
    skip: int = 7,
) -> str:
    """Unrolled-iteration DuckDB HITS, same half-step ordering and term
    grouping as the Ray kernel (raw sums -> L2 norm -> normalize)."""
    parts = [
        f"""
WITH dc AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM documents),
edges AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS src,
         (CAST(doc_id AS BIGINT) * {mul} + j.j * {add} + 1) % dc.cnt AS dst
  FROM documents CROSS JOIN dc CROSS JOIN range(0, {k}) AS j(j)
  WHERE doc_id % {skip} <> 0
),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
h0 AS MATERIALIZED (SELECT node, 1.0 AS x FROM nodes)"""
    ]
    prev_h = "h0"
    for i in range(1, n_iter + 1):
        parts.append(
            f""",
a{i}r AS MATERIALIZED (
  SELECT e.dst AS node, SUM(p.x) AS s
  FROM edges e JOIN {prev_h} p ON p.node = e.src GROUP BY e.dst
),
a{i}z AS MATERIALIZED (SELECT sqrt(sum(s * s)) AS z FROM a{i}r),
a{i} AS MATERIALIZED (
  SELECT nd.node, COALESCE(r.s, 0) / (SELECT z FROM a{i}z) AS x
  FROM nodes nd LEFT JOIN a{i}r r ON r.node = nd.node
),
h{i}r AS MATERIALIZED (
  SELECT e.src AS node, SUM(p.x) AS s
  FROM edges e JOIN a{i} p ON p.node = e.dst GROUP BY e.src
),
h{i}z AS MATERIALIZED (SELECT sqrt(sum(s * s)) AS z FROM h{i}r),
h{i} AS MATERIALIZED (
  SELECT nd.node, COALESCE(r.s, 0) / (SELECT z FROM h{i}z) AS x
  FROM nodes nd LEFT JOIN h{i}r r ON r.node = nd.node
)"""
        )
        prev_h = f"h{i}"
    parts.append(
        f"""
SELECT a.node, round(a.x + 1e-9, 8) AS authority,
       round(h.x + 1e-9, 8) AS hub
FROM a{n_iter} a JOIN h{n_iter} h USING (node) ORDER BY a.node"""
    )
    return "".join(parts)


def _headline_clusters(sf_dir: str) -> Any:
    """Rows-only: story clusters over near-dup headlines (not
    SQL-expressible — simhash + connected components; oracles in
    tests/test_graph_clusters.py)."""
    from newscrawler_ray.pipelines.graph import headline_clusters

    return headline_clusters(sf_dir)


def _fixture_images():
    from newscrawler_ray.synth import default_fixture_dir, gen_fixtures

    fx = gen_fixtures(default_fixture_dir(1200), n_urls=1200, seed=42)
    return fx / "images.parquet"


def _videos_table():
    from newscrawler_ray.pipelines.video import default_video_fixture

    return default_video_fixture()


def _video_frame_sample(sf_dir: str) -> Any:
    """Rows-only: every-5th-frame sampling over the synthetic rvid
    table (sf_dir-independent input by design; payload bytes never
    leave the sampler stage)."""
    from newscrawler_ray.pipelines.video import video_frame_sample

    return video_frame_sample(str(_videos_table()), every_n=5)


def _video_keyframe_dedup(sf_dir: str) -> Any:
    """Rows-only: first-wins exact-phash dedup of the sampled
    keyframes (planted cross-video syndicated-intro group)."""
    from newscrawler_ray.pipelines.video import video_keyframe_dedup

    return video_keyframe_dedup(str(_videos_table()), every_n=5)


def _migrate_domain_column(sf_dir: str) -> Any:
    """Rows-only: shard-wise add-domain-column migration (reference
    scripts/add_domain_column.py + populate_domains.py analog) over a
    fresh synthetic sharded corpus; migrate-then-skip idempotence +
    value/resume oracles in tests/test_maintenance.py. Paths are
    relativized so the manifest is run-deterministic."""
    import shutil
    import tempfile
    from pathlib import Path

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from newscrawler_ray.pipelines.maintenance import backfill_domain

    root = Path(tempfile.mkdtemp(prefix="nc_migrate_", dir="/tmp"))
    try:
        for s in range(4):
            d = root / f"shard={s}"
            d.mkdir(parents=True)
            ids = [s * 50 + i for i in range(50)]
            _pq.write_table(
                _pa.table(
                    {
                        "host": _pa.array(
                            [f"sub{i % 3}.site{i % 7:04d}.example.com" for i in ids]
                        ),
                        "n": _pa.array(ids, _pa.int64()),
                    }
                ),
                str(d / "part-0.parquet"),
            )
        df = backfill_domain(root).to_pandas()
        df["shard"] = [str(Path(p).relative_to(root)) for p in df["shard"]]
        return df.sort_values("shard", ignore_index=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _video_keyframe_export(sf_dir: str) -> Any:
    """Rows-only: sampled keyframes re-encoded as IMAGE-table rows —
    the video->image bridge; decode/phash parity + unchanged-image-op
    oracle in tests/test_video.py. Payload column dropped here so the
    query result ships thin rows (the bytes are exercised in tests)."""
    from newscrawler_ray.pipelines.video import export_video_keyframes

    return export_video_keyframes(str(_videos_table()), every_n=5).drop_columns(
        ["bytes"]
    )


def _crawl_robots_audit(sf_dir: str) -> Any:
    """Rows-only: post-crawl robots/blocklist compliance audit over the
    shared crawl output — expected EMPTY (engine filters pre-fetch);
    planted-violation oracle in tests/test_robots_audit.py."""
    from newscrawler_ray.pipelines.crawl import robots_compliance_audit
    from newscrawler_ray.synth import default_fixture_dir

    return robots_compliance_audit(_shared_crawl_out(), default_fixture_dir(600))


def _curate_video_corpus(sf_dir: str) -> Any:
    """Rows-only: the video-tier composition — near-dup drop
    (first-wins) + per-survivor scene/keyframe stats (direct-recompute
    oracle in tests/test_video.py)."""
    from newscrawler_ray.pipelines.video import curate_video_corpus

    return curate_video_corpus(str(_videos_table()), threshold=0.5)


def _video_near_dup(sf_dir: str) -> Any:
    """Rows-only: whole-video near-dup (sampled-phash-set Jaccard via
    the shared exact set-similarity join; planted truncated-copy pair
    + brute-force parity oracles in tests/test_video.py)."""
    from newscrawler_ray.pipelines.video import video_near_dup

    return video_near_dup(str(_videos_table()), threshold=0.5)


def _video_scene_segments(sf_dir: str) -> Any:
    """Rows-only: phash-hamming scene segmentation (row-local, zero
    shuffle; planted still-scene-run oracle in tests/test_video.py)."""
    from newscrawler_ray.pipelines.video import video_scene_segments

    return video_scene_segments(str(_videos_table()))


def _strip_image_metadata(sf_dir: str) -> Any:
    """Rows-only: ancillary-metadata strip over the synthetic image table
    (sf_dir-independent input by design; metadata planted as a pure
    function of image_id, stripped payload byte-identical to the
    original — tested)."""
    from newscrawler_ray.pipelines.multimodal import strip_image_metadata

    return strip_image_metadata(_fixture_images(), plant=True).select_columns(
        ["image_id", "fmt", "n_meta", "bytes_removed"]
    )


def _augment_images(sf_dir: str) -> Any:
    """Rows-only: deterministic random-resized-crop + flip augmentation
    over the synthetic image table (sf_dir-independent input by design;
    determinism / flip-involution / crop-window pixel oracles in
    tests/test_vision.py)."""
    from newscrawler_ray.pipelines.vision import augment_images

    return augment_images(_fixture_images())


def _extract_html(sf_dir: str) -> Any:
    """Rows-only: selector-cascade extraction over deterministic synthetic
    HTML pages (sf_dir-independent input by design; golden parity in
    tests/test_html_extract.py)."""
    from newscrawler_ray.pipelines.webextract import extract_html_pages
    from newscrawler_ray.synth_html import gen_html_fixtures

    fx = gen_html_fixtures("/tmp/newscrawler_ray_fixtures/html_500", 500, 42)
    return extract_html_pages(fx / "html_pages.parquet")


def _extract_video_metadata(sf_dir: str) -> Any:
    """Rows-only: typed metadata cascade over deterministic synthetic
    video pages (sf_dir-independent input by design)."""
    from newscrawler_ray.pipelines.webextract import extract_video_metadata_pages
    from newscrawler_ray.synth_html import gen_video_fixtures

    fx = gen_video_fixtures("/tmp/newscrawler_ray_fixtures/video_300", 300, 42)
    return extract_video_metadata_pages(fx / "video_pages.parquet")


def _image_features(sf_dir: str) -> Any:
    """Rows-only: actor-pool decode/feature/thumbnail stage over the
    synthetic image table (input_hint shape; sf_dir-independent input)."""
    from newscrawler_ray.pipelines.multimodal import image_features

    return image_features(_fixture_images()).drop_columns(["thumbnail"])


def _image_channel_stats(sf_dir: str) -> Any:
    """Rows-only: corpus-wide per-channel normalization constants over
    the synthetic image table (sf_dir-independent input; brute-force
    driver oracle in tests/test_textstats_multimodal.py)."""
    from newscrawler_ray.pipelines.multimodal import image_channel_stats

    return image_channel_stats(_fixture_images())


def _bloom_dedup_images(sf_dir: str) -> Any:
    """Rows-only: incremental image-snapshot dedup (sf_dir-independent
    input by design — runs over the synthetic crawl image table)."""
    from newscrawler_ray.pipelines.multimodal import bloom_dedup_images

    return bloom_dedup_images(_fixture_images())


def _phash_near_dup(sf_dir: str) -> Any:
    from newscrawler_ray.pipelines.multimodal import phash_near_dup_groups

    return phash_near_dup_groups(_fixture_images())


def _phash_demo_table():
    """High-entropy (image_id, phash) demo table with planted near-dups
    (the crawl fixture's low-entropy gradient phashes make every
    hamming radius degenerate — 124 distinct hashes over 600 images;
    the degenerate regime stays covered by the brute-parity tests)."""
    from newscrawler_ray.pipelines.multimodal import synth_phash_table

    return synth_phash_table(
        "/tmp/newscrawler_ray_fixtures/phash_radius_2000.parquet", 2000, 5
    )


def _phash_dedup_keep_best(sf_dir: str) -> Any:
    """Rows-only: pHash cluster dedup keeping the highest-resolution
    member (sf_dir-independent input — the planted-near-dup phash
    table extended with deterministic (w, h) resolution metadata; the
    crawl fixture's degenerate gradient phashes chain everything into
    one component, which demos nothing)."""
    from newscrawler_ray.pipelines.multimodal import (
        phash_dedup_keep_best,
        synth_phash_wh_table,
    )

    return phash_dedup_keep_best(
        synth_phash_wh_table(
            "/tmp/newscrawler_ray_fixtures/phash_wh_2000.parquet", 2000, 5
        )
    )


def _leakage_safe_split_images(sf_dir: str) -> Any:
    """Rows-only: leakage-safe train/val/test split — every pHash
    near-dup CLUSTER lands in one split (sf_dir-independent input by
    design — planted-near-dup phash table; planted-pair co-location +
    coverage + determinism oracles in tests/test_new_analytics.py)."""
    from newscrawler_ray.pipelines.multimodal import leakage_safe_split_images

    return leakage_safe_split_images(_phash_demo_table())


def _phash_dedup_images(sf_dir: str) -> Any:
    """Rows-only: pHash hamming-radius corpus dedup (sf_dir-independent
    input by design — planted-near-dup phash table)."""
    from newscrawler_ray.pipelines.multimodal import phash_dedup_images

    return phash_dedup_images(_phash_demo_table())


def _phash_radius_near_dup(sf_dir: str) -> Any:
    """Rows-only: hamming-radius pHash near-dup pairs (sf_dir-independent
    input by design — planted-near-dup phash table)."""
    from newscrawler_ray.pipelines.multimodal import phash_radius_near_dup

    return phash_radius_near_dup(_phash_demo_table())


def _clip_score_filter(sf_dir: str) -> Any:
    """Rows-only: LAION-style image/text alignment filter (stand-in
    towers; driver-recompute oracle in tests/test_vision.py)."""
    from newscrawler_ray.pipelines.vision import clip_score_filter

    return clip_score_filter(_fixture_images(), tau=0.05)


def _image_quality_filter(sf_dir: str) -> Any:
    """Rows-only: size/aspect/flatness tagging over decoded image stats."""
    from newscrawler_ray.pipelines.vision import image_quality_filter

    return image_quality_filter(_fixture_images()).drop_columns(["pixel_std"])


def _aspect_bucket_images(sf_dir: str) -> Any:
    """Rows-only: SDXL-style aspect-ratio bucket assignment over the
    synthetic image table (sf_dir-independent input by design)."""
    from newscrawler_ray.pipelines.vision import aspect_bucket_images

    return aspect_bucket_images(_fixture_images())


def _caption_dedup_images(sf_dir: str) -> Any:
    """Rows-only: first-wins exact caption dedup over the synthetic
    image table (sf_dir-independent input by design)."""
    from newscrawler_ray.pipelines.vision import caption_dedup_images

    return caption_dedup_images(_fixture_images())


def _sample_pixel_budget(sf_dir: str) -> Any:
    """Rows-only: pixel-budget subset of the synthetic image table
    (sf_dir-independent input by design)."""
    from newscrawler_ray.pipelines.vision import sample_pixel_budget

    return sample_pixel_budget(_fixture_images(), budget=250_000)


def _bucketed_training_batches(sf_dir: str) -> Any:
    """Rows-only: deterministic multi-resolution batch schedule over the
    synthetic image table (sf_dir-independent input by design)."""
    from newscrawler_ray.pipelines.vision import bucketed_training_batches

    return bucketed_training_batches(_fixture_images())


def _image_near_dup_emb(sf_dir: str) -> Any:
    """Rows-only: embedding-cosine image near-dup via shared IVF pair
    mining (planted pixel-identical dups asserted in tests)."""
    from newscrawler_ray.pipelines.vision import image_near_dup_emb

    return image_near_dup_emb(_fixture_images())


_CRAWL_OUT_MEMO: dict = {}


def _shared_crawl_out(n_urls: int = 600) -> Path:
    """One deterministic 600-URL crawl per PROCESS feeds every
    crawl-tier query (curate / channel stats / fidelity) — review r3c:
    three byte-identical run_crawl invocations per bench pass. The
    first caller crawls (overwriting any stale dir from an older code
    version); later callers in the same process reuse the output."""
    from newscrawler_ray.pipelines.crawl import run_crawl
    from newscrawler_ray.synth import default_fixture_dir, gen_fixtures

    out = _CRAWL_OUT_MEMO.get(n_urls)
    if out is None:
        fx = gen_fixtures(default_fixture_dir(n_urls), n_urls=n_urls, seed=42)
        out = Path(f"/tmp/newscrawler_ray_shared_crawl_{n_urls}")
        run_crawl(fx, out, n_seen_shards=2, n_frontier_shards=2, checkpoint=False)
        _CRAWL_OUT_MEMO[n_urls] = out
    return out


def _curate_crawl_output(sf_dir: str) -> Any:
    """Rows-only: the tier composition — crawl the synthetic web, then
    run the full image-curation pass over the stored payload (first-wins
    image dedup without shuffling bytes; manual-dedup equality in
    tests/test_vision.py)."""
    from newscrawler_ray.pipelines.vision import curate_crawl_output

    return curate_crawl_output(_shared_crawl_out(), min_w=16, min_h=16)


def _crawl_channel_stats(sf_dir: str) -> Any:
    """Rows-only: crawl -> deduped corpus normalization constants
    (duplicate fetches must not bias the stats; dedup-equality oracle in
    tests/test_vision.py)."""
    from newscrawler_ray.pipelines.vision import crawl_channel_stats

    return crawl_channel_stats(_shared_crawl_out())


def _read_webdataset_shards(sf_dir: str) -> Any:
    """Rows-only: the loader half of the WebDataset export — tar shards
    back to pair rows (roundtrip + torn-shard tests in
    tests/test_vision.py). Depends on the export query's output dir;
    runs its own export first for independence."""
    import shutil

    from newscrawler_ray.pipelines.vision import (
        export_webdataset_shards,
        read_webdataset_shards,
    )

    out = Path("/tmp/newscrawler_ray_wds_read")
    shutil.rmtree(out, ignore_errors=True)
    export_webdataset_shards(_fixture_images(), out)  # cluster-width shards
    return read_webdataset_shards(out).drop_columns(["bytes"])


def _mixup_images(sf_dir: str) -> Any:
    """Rows-only: deterministic MixUp over the augmented corpus
    (sf_dir-independent input; blend/lambda/determinism oracles in
    tests/test_vision.py)."""
    from newscrawler_ray.pipelines.vision import mixup_images

    return mixup_images(_fixture_images())


def _export_webdataset_shards(sf_dir: str) -> Any:
    """Rows-only: WebDataset-style tar export of the curated image
    corpus (deterministic tar bytes, resume-by-existence; byte-identity
    + readback + resume tests in tests/test_vision.py)."""
    import shutil

    from newscrawler_ray.pipelines.vision import export_webdataset_shards

    out = Path("/tmp/newscrawler_ray_wds_export")
    shutil.rmtree(out, ignore_errors=True)
    return export_webdataset_shards(_fixture_images(), out)  # cluster-width shards


def _crawl_payload_fidelity(sf_dir: str) -> Any:
    """Rows-only: the north-rule acceptance invariant (pixels allclose /
    PSNR >= 40 dB for lossy, caption equality) run corpus-wide over a
    crawl's stored rows as a per-format fidelity report."""
    from newscrawler_ray.pipelines.multimodal import validate_payload_fidelity

    return validate_payload_fidelity(_shared_crawl_out(), n_urls=600, seed=42)


def _image_knn(sf_dir: str) -> Any:
    """Rows-only: visual similarity search (exact cosine top-k over the
    image tower; planted-twin + brute-force parity in tests)."""
    from newscrawler_ray.pipelines.vision import image_knn

    return image_knn(_fixture_images(), query_image_id="img-00000097")


def _image_knn_pq(sf_dir: str) -> Any:
    """Rows-only: PQ-code visual search (ADC scan + exact refine over
    the image tower; recall vs exact image_knn in tests)."""
    from newscrawler_ray.pipelines.vision import image_knn_pq

    return image_knn_pq(_fixture_images(), query_image_id="img-00000097")


def _image_kmeans(sf_dir: str) -> Any:
    """Rows-only: SemDeDup-style image clustering (spherical k-means over
    the image tower; optimality/determinism invariants in tests)."""
    from newscrawler_ray.pipelines.vision import image_kmeans

    return image_kmeans(_fixture_images())


def _curate_image_corpus(sf_dir: str) -> Any:
    """Rows-only: flagship LAION-style curation composition — quality
    gates AND clip filter AND dedup-after-filter; exact survivor-set
    equality vs a brute-force driver oracle in tests/test_vision.py."""
    from newscrawler_ray.pipelines.vision import curate_image_corpus

    return curate_image_corpus(_fixture_images())


def _mine_hard_negatives(sf_dir: str) -> Any:
    """Rows-only: per-image top-k hard negative captions (block-pair
    GEMM tasks + coarse per-query segment top-k)."""
    from newscrawler_ray.pipelines.vision import mine_hard_negatives

    return mine_hard_negatives(_fixture_images(), k=5)


def _export_image_shards(sf_dir: str) -> Any:
    """Rows-only: sharded curated image-pair export manifest. Fresh
    scratch dir per call so the driver check sees a full write."""
    import shutil

    from newscrawler_ray.pipelines.vision import export_image_shards

    out = Path("/tmp/newscrawler_ray_q_imgexport")
    if out.exists():
        shutil.rmtree(out)
    return export_image_shards(_fixture_images(), out)


def _audio_features(sf_dir: str) -> Any:
    """Rows-only: WAV decode + FFT feature stage over the deterministic
    synthetic audio table (sf_dir-independent input by design)."""
    from newscrawler_ray.pipelines.audio import audio_features, default_audio_fixture

    return audio_features(default_audio_fixture())


def _audio_dedup_clips(sf_dir: str) -> Any:
    """Rows-only: corpus-level audio dedup (near-dup pairs -> CC ->
    first-wins survivors; exact survivor-set oracle in tests)."""
    from newscrawler_ray.pipelines.audio import audio_dedup_clips, default_audio_fixture

    return audio_dedup_clips(default_audio_fixture(), threshold=0.6)


def _audio_near_dup(sf_dir: str) -> Any:
    """Rows-only: amplitude-invariant spectral-peak near-dup — the
    FOURTH payload type through dedup.gram_set_near_dup (planted 0.55x
    re-recordings + brute-force parity in tests/test_audio.py)."""
    from newscrawler_ray.pipelines.audio import audio_near_dup, default_audio_fixture

    return audio_near_dup(default_audio_fixture(), threshold=0.6)


def oracle_sql() -> dict[str, str]:
    out = {
        "q1_lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "count_by_source": "SELECT source, count(*) AS n FROM documents GROUP BY source",
        "link_pagerank": _pagerank_oracle(),
        "link_hits": _hits_oracle(),
        "count_by_lang": "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
        "global_counts": """
            SELECT count(*) AS n_total,
                   count(*) FILTER (WHERE n_chars >= 200) AS n_long,
                   count(*) FILTER (WHERE lang = 'en') AS n_en
            FROM documents""",
        "avg_value_by_type": """
            SELECT event_type, round(avg(value), 4) AS avg_value,
                   round(min(value), 4) AS min_value,
                   round(max(value), 4) AS max_value, count(*) AS n
            FROM events GROUP BY event_type""",
        "value_quantiles_by_type": """
            SELECT event_type, unnest([0.5, 0.9]) AS q,
                   round(unnest(quantile_cont(value, [0.5, 0.9])) + 1e-9, 4) AS value
            FROM events GROUP BY event_type""",
        "urgent_top_revenue": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   o_orderdate
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        "part_brand_stats": """
            SELECT p_brand, count(*) AS n,
                   round(sum(p_retailprice), 2) AS total_price
            FROM part GROUP BY p_brand""",
        "orders_by_status": """
            SELECT o_orderstatus, count(*) AS n,
                   round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY o_orderstatus""",
        "shipped_before_agg": """
            SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
            GROUP BY l_returnflag""",
        "salted_returnflag_agg": """
            SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag""",
        "search_keywords": r"""
            SELECT doc_id, source, n_chars FROM documents
            WHERE regexp_matches(text, '(?i)\bspark\b')
              AND regexp_matches(text, '(?i)\bmerge\b')
              AND n_chars >= 100""",
        "search_substring": "SELECT doc_id, lang FROM documents WHERE text ILIKE '%window%'",
        "search_with_index": r"""
            SELECT doc_id, source, n_chars FROM documents
            WHERE regexp_matches(text, '(?i)\bspark\b')
              AND regexp_matches(text, '(?i)\bmerge\b')
              AND n_chars >= 100""",
        "ranked_search": r"""
            WITH w AS MATERIALIZED (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w
              FROM documents
            ), tf AS (
              SELECT doc_id, w, count(*)::DOUBLE AS c FROM w
              WHERE w IN ('spark', 'merge') GROUP BY doc_id, w
            ), df AS (
              SELECT w, count(DISTINCT doc_id)::DOUBLE AS df FROM w
              WHERE w IN ('spark', 'merge') GROUP BY w
            ), n AS (SELECT count(*)::DOUBLE AS n FROM documents),
            s AS (
              SELECT tf.doc_id,
                     sum(tf.c * ln((SELECT n FROM n) / df.df)) AS score,
                     count(DISTINCT tf.w) AS nt
              FROM tf JOIN df USING (w) GROUP BY tf.doc_id
            )
            SELECT doc_id, round(score + 1e-9, 4) AS score
            FROM s WHERE nt = 2 ORDER BY score DESC, doc_id LIMIT 20""",
        # BM25 recomputed termwise: same tokenization, dl from the token
        # table, avgdl over ALL docs (zero-token docs count in N)
        "bm25_search": r"""
            WITH w AS MATERIALIZED (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w
              FROM documents
            ), dl AS (
              SELECT doc_id, count(*)::DOUBLE AS dl FROM w GROUP BY doc_id
            ), tf AS (
              SELECT doc_id, w, count(*)::DOUBLE AS c FROM w
              WHERE w IN ('spark', 'merge') GROUP BY doc_id, w
            ), df AS (
              SELECT w, count(DISTINCT doc_id)::DOUBLE AS df FROM w
              WHERE w IN ('spark', 'merge') GROUP BY w
            ), n AS (SELECT count(*)::DOUBLE AS n FROM documents),
            ad AS (SELECT (SELECT count(*) FROM w)::DOUBLE
                          / (SELECT n FROM n) AS avgdl),
            s AS (
              SELECT tf.doc_id,
                     sum(ln(((SELECT n FROM n) - df.df + 0.5)
                            / (df.df + 0.5) + 1)
                         * tf.c * 2.2
                         / (tf.c + 1.2 * (0.25 + 0.75 * dl.dl
                                          / (SELECT avgdl FROM ad)))
                        ) AS score,
                     count(DISTINCT tf.w) AS nt
              FROM tf JOIN df USING (w) JOIN dl USING (doc_id)
              GROUP BY tf.doc_id
            )
            SELECT doc_id, round(score + 1e-9, 4) AS score
            FROM s WHERE nt = 2 ORDER BY score DESC, doc_id LIMIT 20""",
        # PMI over the same within-doc adjacent bigram stream the BPE
        # trainer counts; totals T1/T12 are corpus token/bigram counts
        "pmi_collocations": r"""
            WITH wl AS MATERIALIZED (
              SELECT list_filter(string_split_regex(lower(text), '\W+'),
                                 x -> x <> '') AS w
              FROM documents
            ), tok AS (SELECT unnest(w) AS t FROM wl),
            bg AS (
              SELECT unnest(CASE WHEN len(w) < 2 THEN []::VARCHAR[]
                ELSE [w[i] || ' ' || w[i+1]
                      FOR i IN generate_series(1, len(w)-1)]
              END) AS p
              FROM wl
            ), bc AS (
              SELECT string_split(p, ' ')[1] AS w1,
                     string_split(p, ' ')[2] AS w2,
                     count(*)::DOUBLE AS n
              FROM bg GROUP BY 1, 2
            ), uc AS (
              SELECT t AS w, count(*)::DOUBLE AS c FROM tok GROUP BY 1
            ), tot AS (
              SELECT (SELECT count(*) FROM tok)::DOUBLE AS t1,
                     (SELECT count(*) FROM bg)::DOUBLE AS t12
            )
            SELECT bc.w1, bc.w2, bc.n::BIGINT AS n,
                   round(ln((bc.n / tot.t12)
                            / ((u1.c / tot.t1) * (u2.c / tot.t1)))
                         + 1e-9, 4) AS pmi
            FROM bc, tot
            JOIN uc u1 ON u1.w = bc.w1
            JOIN uc u2 ON u2.w = bc.w2
            WHERE bc.n >= 5
            ORDER BY pmi DESC, bc.w1, bc.w2 LIMIT 20""",
        "excluded_filter": """
            SELECT doc_id, source, lang FROM documents
            WHERE source NOT IN ('src0', 'src13', 'src7') AND lang <> 'zh'""",
        "recent_topk": """
            SELECT event_id, ts, event_type, round(value, 4) AS value
            FROM events ORDER BY ts DESC, event_id LIMIT 100""",
        "page_offset": """
            SELECT event_id, ts, event_type
            FROM events ORDER BY ts DESC, event_id LIMIT 50 OFFSET 100""",
        "top_orders_per_segment": """
            SELECT c_mktsegment, o_orderkey, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            QUALIFY row_number() OVER (
                PARTITION BY c_mktsegment
                ORDER BY o_totalprice DESC, o_orderkey) <= 3""",
        "purchase_click_asof": """
            -- correlated form rather than ASOF JOIN: DuckDB's ASOF leaves
            -- the choice among equal-ts clicks unspecified; this pins the
            -- same tie-break as pandas merge_asof (latest ts, then max id)
            SELECT p.event_id AS purchase_id, p.user_id,
                   CAST((SELECT c.event_id FROM events c
                         WHERE c.event_type = 'click'
                           AND c.user_id = p.user_id AND c.ts <= p.ts
                         ORDER BY c.ts DESC, c.event_id DESC
                         LIMIT 1) AS DOUBLE) AS click_id
            FROM events p WHERE p.event_type = 'purchase'""",
        "frequent_users": """
            SELECT user_id, count(*) AS n FROM events
            GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10""",
        # Misra-Gries with capacity k=256 never evicts below 256 distinct
        # keys (the decrement step fires only past capacity), so on this
        # corpus (150 distinct users) every counter is EXACT and the top
        # list equals the exact grouped count — a hard oracle here; the
        # approximate regime's error bounds are asserted in tests
        "approx_frequent_users": """
            SELECT user_id, count(*) AS est_count FROM events
            GROUP BY user_id ORDER BY est_count DESC, user_id LIMIT 10""",
        "purchase_click_window": """
            SELECT p.event_id AS purchase_id, p.user_id,
                   count(c.event_id) AS n_recent_clicks
            FROM events p LEFT JOIN events c
              ON c.user_id = p.user_id AND c.event_type = 'click'
             AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 60 MINUTE
            WHERE p.event_type = 'purchase'
            GROUP BY p.event_id, p.user_id""",
        # stddev written as the same sum-of-squares formula the engine
        # computes (DuckDB's STDDEV recurrence differs in last ulps);
        # the cut compares the ROUNDED z on both sides
        "zscore_anomaly_events": """
            WITH a AS (
              SELECT event_type, count(*)::DOUBLE AS n,
                     sum(value) AS s, sum(value * value) AS ss
              FROM events GROUP BY event_type
            ), st AS (
              SELECT event_type, s / n AS mu,
                     sqrt((ss - s * s / n) / (n - 1)) AS sd
              FROM a
            )
            SELECT e.event_id, e.event_type, round(e.value, 4) AS value,
                   round((e.value - st.mu) / st.sd + 1e-9, 4) AS z
            FROM events e JOIN st USING (event_type)
            WHERE abs(round((e.value - st.mu) / st.sd + 1e-9, 4)) > 3""",
        "events_rolling_7d": """
            WITH d AS (
                SELECT event_type, date_trunc('day', ts) AS day,
                       count(*) AS n, sum(value) AS v
                FROM events GROUP BY 1, 2)
            SELECT event_type, day, n,
                   CAST(sum(n) OVER w AS BIGINT) AS n_7d,
                   round(sum(v) OVER w, 4) AS total_7d
            FROM d
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                   AND CURRENT ROW)""",
        "order_priority_revenue": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority""",
        "dedup_first_wins": """
            SELECT user_id, event_type, min(event_id) AS first_event_id
            FROM events GROUP BY user_id, event_type""",
        "hash_sample_events": """
            SELECT event_id, event_type, round(value, 4) AS value
            FROM events
            WHERE (event_id * 2654435761) % 4294967296 < 429496729""",
        # per-group deterministic sample: k smallest Knuth hashes per
        # event_type, event_id tiebreak — window-rank oracle
        "stratified_sample_events": """
            SELECT event_type, event_id, round(value, 4) AS value
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY event_type
                ORDER BY (event_id * 2654435761) % 4294967296, event_id
            ) <= 20""",
        "purge_old_events": """
            SELECT event_id, ts, event_type FROM events
            WHERE ts >= TIMESTAMP '2024-01-15'""",
        "seg_revenue": """
            SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "nation_orders": """
            SELECT n_name, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name""",
        "dedup_events_windowed": """
            SELECT user_id, event_type, date_trunc('hour', ts) AS win,
                   min(event_id) AS event_id, count(*) - 1 AS n_absorbed
            FROM events GROUP BY user_id, event_type, date_trunc('hour', ts)""",
        "events_daily_window": """
            SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n,
                   round(sum(value), 4) AS total
            FROM events GROUP BY event_type, date_trunc('day', ts)""",
        "events_pivot_daily": """
            SELECT date_trunc('day', ts) AS day,
                   count(*) FILTER (event_type = 'click') AS n_click,
                   count(*) FILTER (event_type = 'error') AS n_error,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup') AS n_signup,
                   count(*) FILTER (event_type = 'view') AS n_view
            FROM events GROUP BY date_trunc('day', ts)""",
        "customer_urgent_counts": """
            SELECT c_custkey, count(o_orderkey) AS n_urgent
            FROM customer LEFT JOIN orders
              ON o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
            GROUP BY c_custkey""",
        "events_rollup": """
            SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
            FROM events GROUP BY ROLLUP(event_type)""",
        "events_cube": """
            SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
                   count(*) AS n, round(sum(value), 4) AS total
            FROM events GROUP BY CUBE(event_type, dow)""",
        "user_days_intersect": """
            SELECT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'purchase'""",
        "user_days_except": """
            SELECT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'purchase'""",
        "doc_length_histogram": """
            SELECT CAST(floor(log2(greatest(strlen(text), 1))) AS BIGINT)
                       AS bucket,
                   count(*) AS n
            FROM documents GROUP BY 1""",
        "user_first_last": """
            WITH r AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rf,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC)
                           AS rl
                FROM events)
            SELECT user_id,
                   max(CASE WHEN rf = 1 THEN event_type END) AS first_type,
                   max(CASE WHEN rl = 1 THEN event_type END) AS last_type,
                   count(*) AS n
            FROM r GROUP BY user_id""",
        "value_hour_corr": """
            SELECT round(corr(value, CAST(hour(ts) AS DOUBLE)) + 1e-9, 4)
                       AS corr_value_hour
            FROM events""",
        # melt of the dense grid: day x type cross join LEFT-joined to
        # the grouped counts, zero cells coalesced in
        "events_unpivot_daily": """
            WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day
                          FROM events),
                 types AS (SELECT unnest(['click','error','purchase',
                                          'signup','view']) AS event_type),
                 c AS (SELECT date_trunc('day', ts) AS day, event_type,
                              count(*) AS n
                       FROM events GROUP BY 1, 2)
            SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n
            FROM days d CROSS JOIN types t
            LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type""",
        "events_daily_delta": """
            WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day
                          FROM events),
                 types AS (SELECT unnest(['click','error','purchase',
                                          'signup','view']) AS event_type),
                 c AS (SELECT date_trunc('day', ts) AS day, event_type,
                              count(*) AS n
                       FROM events GROUP BY 1, 2),
                 g AS (SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n
                       FROM days d CROSS JOIN types t
                       LEFT JOIN c ON c.day = d.day
                                  AND c.event_type = t.event_type)
            SELECT event_type, day, n,
                   COALESCE(lag(n) OVER (PARTITION BY event_type
                                         ORDER BY day), 0) AS n_prev,
                   n - COALESCE(lag(n) OVER (PARTITION BY event_type
                                             ORDER BY day), 0) AS delta
            FROM g""",
        "multi_source_union": """
            SELECT DISTINCT doc_id, source, lang FROM (
                SELECT doc_id, source, lang FROM documents WHERE source = 'src0'
                UNION ALL
                SELECT doc_id, source, lang FROM documents WHERE source = 'src1'
                UNION ALL
                SELECT doc_id, source, lang FROM documents WHERE source IN ('src2', 'src0')
            ) WHERE lang <> 'zh'""",
        "user_event_sequence": """
            SELECT user_id, count(*) AS n_events,
                   string_agg(event_type, ',' ORDER BY event_id) AS sequence
            FROM events GROUP BY user_id""",
        "token_stats": r"""
            SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens
            FROM documents""",
        "bpe_token_stats": r"""
            SELECT doc_id, len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens
            FROM documents""",
        "exact_dedup_docs": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
        # same token definition as token_stats; starts every 12 tokens,
        # windows of 24 (1-based inclusive list_slice)
        "chunk_documents": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id, toks,
                     unnest(range(0, len(toks), 12)) AS start
              FROM w
            )
            SELECT doc_id,
                   CAST(start / 12 AS BIGINT) AS chunk_id,
                   CAST(len(list_slice(toks, start + 1, start + 24))
                        AS BIGINT) AS n_chunk_tokens,
                   list_aggregate(list_slice(toks, start + 1, start + 24),
                                  'string_agg', ' ') AS chunk_text
            FROM s""",
        "dsir_select": r"""
            WITH w AS (
              SELECT doc_id, lang,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w
              FROM documents
            ), cr AS (
              SELECT w, count(*)::DOUBLE AS c FROM w GROUP BY w
            ), ct AS (
              SELECT w, count(*)::DOUBLE AS c FROM w WHERE lang = 'en' GROUP BY w
            ), tr AS (SELECT sum(c) AS t FROM cr),
               tt AS (SELECT coalesce(sum(c), 0) AS t FROM ct),
               v AS (SELECT count(*)::DOUBLE AS v FROM cr),
            s AS (
              SELECT w.doc_id, count(*) AS n,
                     sum(ln((coalesce(ct.c, 0) + 0.5)
                            / ((SELECT t FROM tt) + 0.5 * (SELECT v FROM v)))
                       - ln((cr.c + 0.5)
                            / ((SELECT t FROM tr) + 0.5 * (SELECT v FROM v)))) AS s
              FROM w JOIN cr USING (w) LEFT JOIN ct USING (w)
              GROUP BY w.doc_id
            )
            SELECT doc_id, round(s / n + 1e-9, 4) AS weight
            FROM s ORDER BY weight DESC, doc_id LIMIT 100""",
        "domain_stats": """
            SELECT source, count(*) AS n_docs,
                   count(DISTINCT text) AS n_distinct,
                   round(1.0 - CAST(count(DISTINCT text) AS DOUBLE)
                             / count(*) + 1e-9, 4) AS dup_rate,
                   round(CAST(sum(n_chars) AS DOUBLE) / count(*) + 1e-9, 4)
                       AS avg_chars,
                   round(CAST(sum(CASE WHEN n_chars < 250 THEN 1 ELSE 0 END)
                              AS DOUBLE) / count(*) + 1e-9, 4) AS short_frac
            FROM documents GROUP BY source""",
        "domain_quality_filter": """
            SELECT doc_id, source FROM documents
            WHERE source IN (
                SELECT source FROM documents GROUP BY source
                HAVING CAST(sum(n_chars) AS DOUBLE) / count(*) >= 280.0)""",
        "incremental_exact_dedup": """
            WITH old AS (SELECT text FROM documents WHERE doc_id % 7 < 5),
                 nw AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 >= 5),
                 fresh AS (SELECT doc_id, text FROM nw
                           WHERE text NOT IN (SELECT text FROM old))
            SELECT min(doc_id) AS doc_id FROM fresh GROUP BY text""",
        # near-dup variant: drop new docs with jaccard >= 0.5 vs ANY old
        # doc, then exact first-wins within the snapshot (same
        # tokenization as ngram_jaccard_pairs)
        "incremental_jaccard_dedup": r"""
            WITH g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) < 3
                       THEN [list_aggregate(w, 'string_agg', ' ')]
                       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN generate_series(1, len(w)-2)]
                     END) AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS w
                    FROM documents)
            ), dropped AS (
              SELECT DISTINCT n.doc_id
              FROM g n JOIN g o
                ON n.doc_id % 7 >= 5 AND o.doc_id % 7 < 5
              WHERE len(list_intersect(n.grams, o.grams))::DOUBLE
                    / nullif(len(list_distinct(n.grams || o.grams)), 0) >= 0.5
            ), fresh AS (
              SELECT doc_id, text FROM documents
              WHERE doc_id % 7 >= 5
                AND doc_id NOT IN (SELECT doc_id FROM dropped)
            )
            SELECT min(doc_id) AS doc_id FROM fresh GROUP BY text""",
        # stopword-profile language id is pure arithmetic over regex
        # token counts -> SQL-expressible (the +1e-9 before round
        # mirrors the engine and keeps rounding away from exact .5
        # ties, where numpy half-even and DuckDB's vectorized round
        # disagree; argmax tie-break follows profile order en,de,es,fr
        # exactly as the CASE chain does)
        "lang_id_docs": r"""
            WITH w AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(lower(text), '\W+'),
                                 x -> x <> '') AS words
              FROM documents
            ), s AS (
              SELECT doc_id,
                regexp_matches(text, '[\x{4E00}-\x{9FFF}]') AS cjk,
                greatest(len(words), 1)::DOUBLE AS nw,
                len(list_filter(words, x -> x IN ('the','and','of','to','a',
                  'in','is','that','it','for','was','on')))::DOUBLE AS h_en,
                len(list_filter(words, x -> x IN ('der','die','das','und',
                  'ist','nicht','ein','eine','zu','mit','den')))::DOUBLE AS h_de,
                len(list_filter(words, x -> x IN ('el','la','de','que','y',
                  'en','un','una','es','los','las','por')))::DOUBLE AS h_es,
                len(list_filter(words, x -> x IN ('le','la','les','de','et',
                  'un','une','est','que','pour','dans')))::DOUBLE AS h_fr
              FROM w
            )
            SELECT doc_id,
              CASE WHEN cjk THEN 'zh'
                   WHEN greatest(h_en, h_de, h_es, h_fr) <= 0 THEN 'unknown'
                   WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
                   WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
                   WHEN h_es >= h_fr THEN 'es'
                   ELSE 'fr' END AS lang_pred,
              CASE WHEN cjk THEN 1.0
                   WHEN greatest(h_en, h_de, h_es, h_fr) <= 0 THEN 0.0
                   ELSE round(greatest(h_en, h_de, h_es, h_fr) / nw
                              + 1e-9, 4)
              END AS confidence
            FROM s""",
        # quality features/composite are deterministic arithmetic over
        # repetition fractions are exact arithmetic over per-doc word /
        # 2-gram occurrence counts under the shared \W+ tokenizer; keep
        # is compared on the ROUNDED values on both sides (tie-free
        # via the +1e-9 nudge, see CLAUDE.md)
        "gopher_repetition_docs": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w,
                     generate_subscripts(list_filter(string_split_regex(
                       lower(text), '\W+'), x -> x <> ''), 1) AS i
              FROM documents
            ), wc AS (
              SELECT doc_id, w, count(*) AS k FROM w GROUP BY doc_id, w
            ), d1 AS (
              SELECT doc_id, sum(k)::BIGINT AS n_words,
                     sum(CASE WHEN k >= 2 THEN k ELSE 0 END)::BIGINT
                       AS dup_words
              FROM wc GROUP BY doc_id
            ), g AS (
              SELECT doc_id,
                     w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY i)
                       AS g2
              FROM w QUALIFY g2 IS NOT NULL
            ), gc AS (
              SELECT doc_id, g2, count(*) AS k FROM g GROUP BY doc_id, g2
            ), d2 AS (
              SELECT doc_id, sum(k)::BIGINT AS n2,
                     sum(CASE WHEN k >= 2 THEN k ELSE 0 END)::BIGINT AS dup2,
                     max(k)::BIGINT AS top2
              FROM gc GROUP BY doc_id
            ), f AS (
              SELECT d.doc_id,
                     coalesce(n_words, 0) AS n_words,
                     round(coalesce(dup_words, 0)
                           / greatest(coalesce(n_words, 0), 1)::DOUBLE
                           + 1e-9, 4) AS dupword_frac,
                     round(coalesce(dup2, 0)
                           / greatest(coalesce(n2, 0), 1)::DOUBLE
                           + 1e-9, 4) AS dup2_frac,
                     round(coalesce(top2, 0)
                           / greatest(coalesce(n2, 0), 1)::DOUBLE
                           + 1e-9, 4) AS top2_frac
              FROM documents d
              LEFT JOIN d1 USING (doc_id) LEFT JOIN d2 USING (doc_id)
            )
            SELECT doc_id, n_words, dupword_frac, dup2_frac, top2_frac,
                   CASE WHEN dupword_frac <= 0.8 AND dup2_frac <= 0.08
                             AND top2_frac <= 0.05
                        THEN 1 ELSE 0 END::BIGINT AS keep
            FROM f""",
        # a k-word span is duplicated iff its 8-gram occurs >= 2 times
        # corpus-wide; the oracle recomputes the window totals by string
        # md5 first-15-hex-chars = the engine's 60-bit row hash exactly;
        # bit_xor is the order-independent fold
        "table_checksum": r"""
            SELECT count(*)::BIGINT AS n_rows,
                   bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT)
                     AS xor_hash,
                   sum(n_chars)::BIGINT AS total_chars
            FROM documents""",
        "dup_span_docs": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w,
                     generate_subscripts(list_filter(string_split_regex(
                       lower(text), '\W+'), x -> x <> ''), 1) AS i
              FROM documents
            ), g AS (
              SELECT doc_id,
                w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
                  || ' ' || lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win
                  || ' ' || lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win
                  || ' ' || lead(w, 7) OVER win AS g8
              FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY g8 IS NOT NULL
            ), c AS (
              SELECT doc_id,
                     count(*) OVER (PARTITION BY g8) >= 2 AS is_dup
              FROM g
            ), d AS (
              SELECT doc_id, count(*)::BIGINT AS n_spans,
                     sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT
                       AS dup_spans
              FROM c GROUP BY doc_id
            )
            SELECT doc.doc_id,
                   coalesce(n_spans, 0) AS n_spans,
                   coalesce(dup_spans, 0) AS dup_spans,
                   round(coalesce(dup_spans, 0)
                         / greatest(coalesce(n_spans, 0), 1)::DOUBLE
                         + 1e-9, 4) AS dup_span_frac
            FROM documents doc LEFT JOIN d USING (doc_id)""",
        # the stripping transform: a position is removed iff some
        # keep-first paragraph dedup over disjoint 4-word blocks: the
        # (doc_id, bidx)-min copy of each duplicated block survives,
        # every later copy is stripped from its doc
        "paragraph_dedup_docs": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w,
                     generate_subscripts(list_filter(string_split_regex(
                       lower(text), '\W+'), x -> x <> ''), 1) AS i
              FROM documents
            ), b AS (
              SELECT doc_id, (i - 1) // 4 AS bidx,
                     string_agg(w, ' ' ORDER BY i) AS block
              FROM w GROUP BY doc_id, bidx
            ), r AS (
              SELECT doc_id, bidx, block,
                     row_number() OVER (PARTITION BY block
                                        ORDER BY doc_id, bidx) AS rn
              FROM b
            ), agg AS (
              SELECT doc_id, count(*)::BIGINT AS n_blocks,
                     sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_dropped,
                     string_agg(CASE WHEN rn = 1 THEN block END,
                                ' ' ORDER BY bidx) AS clean
              FROM r GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(n_blocks, 0) AS n_blocks,
                   coalesce(n_dropped, 0) AS n_dropped,
                   coalesce(clean, '') AS clean_text
            FROM documents d LEFT JOIN agg USING (doc_id)""",
        # duplicated 8-gram window covers it; clean_text is the
        # space-join of kept tokens (string_agg skips the NULLed-out
        # covered words, preserving order)
        "strip_dup_spans": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w,
                     generate_subscripts(list_filter(string_split_regex(
                       lower(text), '\W+'), x -> x <> ''), 1) AS i
              FROM documents
            ), g AS (
              SELECT doc_id, i,
                w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
                  || ' ' || lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win
                  || ' ' || lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win
                  || ' ' || lead(w, 7) OVER win AS g8
              FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY g8 IS NOT NULL
            ), duppos AS (
              SELECT doc_id, i FROM (
                SELECT doc_id, i,
                       count(*) OVER (PARTITION BY g8) AS c FROM g)
              WHERE c >= 2
            ), cov AS (
              SELECT w.doc_id, w.i, w.w,
                     EXISTS (SELECT 1 FROM duppos d
                             WHERE d.doc_id = w.doc_id
                               AND w.i BETWEEN d.i AND d.i + 7) AS covered
              FROM w
            ), agg AS (
              SELECT doc_id, count(*)::BIGINT AS n_words,
                     sum(CASE WHEN covered THEN 1 ELSE 0 END)::BIGINT
                       AS n_removed,
                     string_agg(CASE WHEN NOT covered THEN w END,
                                ' ' ORDER BY i) AS clean
              FROM cov GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(n_words, 0) AS n_words,
                   coalesce(n_removed, 0) AS n_removed,
                   coalesce(clean, '') AS clean_text
            FROM documents d LEFT JOIN agg USING (doc_id)""",
        # maximal-run form: gaps-and-islands over the duplicated window
        # starts (i - row_number() groups consecutive starts), islands
        # covering >= 20 words stripped, shorter ones preserved
        "strip_dup_spans_maximal": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w,
                     generate_subscripts(list_filter(string_split_regex(
                       lower(text), '\W+'), x -> x <> ''), 1) AS i
              FROM documents
            ), g AS (
              SELECT doc_id, i,
                w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
                  || ' ' || lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win
                  || ' ' || lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win
                  || ' ' || lead(w, 7) OVER win AS g8
              FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY g8 IS NOT NULL
            ), duppos AS (
              SELECT doc_id, i FROM (
                SELECT doc_id, i,
                       count(*) OVER (PARTITION BY g8) AS c FROM g)
              WHERE c >= 2
            ), isl AS (
              SELECT doc_id, i,
                     i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
                       AS grp
              FROM duppos
            ), spans AS (
              SELECT doc_id, min(i) AS p0, max(i) + 7 AS p1
              FROM isl GROUP BY doc_id, grp
              HAVING max(i) + 8 - min(i) >= 20
            ), cov AS (
              SELECT w.doc_id, w.i, w.w,
                     EXISTS (SELECT 1 FROM spans s
                             WHERE s.doc_id = w.doc_id
                               AND w.i BETWEEN s.p0 AND s.p1) AS covered
              FROM w
            ), agg AS (
              SELECT doc_id, count(*)::BIGINT AS n_words,
                     sum(CASE WHEN covered THEN 1 ELSE 0 END)::BIGINT
                       AS n_removed,
                     string_agg(CASE WHEN NOT covered THEN w END,
                                ' ' ORDER BY i) AS clean
              FROM cov GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(n_words, 0) AS n_words,
                   coalesce(n_removed, 0) AS n_removed,
                   coalesce(clean, '') AS clean_text
            FROM documents d LEFT JOIN agg USING (doc_id)""",
        # flagging side of the maximal-run form: same islands CTE, per
        # doc the count of >=20-word runs and the longest run
        "dup_span_runs": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w,
                     generate_subscripts(list_filter(string_split_regex(
                       lower(text), '\W+'), x -> x <> ''), 1) AS i
              FROM documents
            ), g AS (
              SELECT doc_id, i,
                w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
                  || ' ' || lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win
                  || ' ' || lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win
                  || ' ' || lead(w, 7) OVER win AS g8
              FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY g8 IS NOT NULL
            ), duppos AS (
              SELECT doc_id, i FROM (
                SELECT doc_id, i,
                       count(*) OVER (PARTITION BY g8) AS c FROM g)
              WHERE c >= 2
            ), isl AS (
              SELECT doc_id, i,
                     i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
                       AS grp
              FROM duppos
            ), runs AS (
              SELECT doc_id, max(i) + 8 - min(i) AS run_words
              FROM isl GROUP BY doc_id, grp
            ), lens AS (
              SELECT doc_id, count(*)::BIGINT AS n_words FROM w GROUP BY doc_id
            ), agg AS (
              SELECT doc_id,
                     count(*) FILTER (WHERE run_words >= 20)::BIGINT
                       AS n_runs,
                     max(run_words)::BIGINT AS max_run_words
              FROM runs GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(l.n_words, 0) AS n_words,
                   coalesce(a.n_runs, 0) AS n_runs,
                   coalesce(a.max_run_words, 0) AS max_run_words,
                   coalesce(a.n_runs, 0) > 0 AS flagged
            FROM documents d
            LEFT JOIN lens l USING (doc_id)
            LEFT JOIN agg a USING (doc_id)""",
        # exact TF-IDF: score = tf * ln(N/df), per-doc top-5 ranked by
        # (rounded score DESC, term ASC) on BOTH sides
        "tfidf_top_terms": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, count(*)::BIGINT AS tf
              FROM w GROUP BY doc_id, term
            ), df AS (
              SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
            ), s AS (
              SELECT doc_id, term, tf, df,
                     round(tf * ln((SELECT count(*) FROM documents)::DOUBLE
                                   / df) + 1e-9, 4) AS score
              FROM tf JOIN df USING (term)
            )
            SELECT doc_id, term, tf, df, score
            FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, term ASC) AS rn FROM s)
            WHERE rn <= 5""",
        # decontamination: a non-benchmark doc is contaminated iff any
        # of its 4-grams appears in the benchmark slice (doc_id % 31 = 0;
        # 15 contaminated docs at sf0.01 — non-degenerate on purpose)
        "benchmark_contamination": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w,
                     generate_subscripts(list_filter(string_split_regex(
                       lower(text), '\W+'), x -> x <> ''), 1) AS i
              FROM documents
            ), g AS (
              SELECT doc_id,
                w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
                  || ' ' || lead(w, 3) OVER win AS g4
              FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY g4 IS NOT NULL
            ), bg AS (
              SELECT DISTINCT g4 FROM g WHERE doc_id % 31 = 0
            ), c AS (
              SELECT doc_id, count(*)::BIGINT AS n_spans,
                     sum(CASE WHEN g4 IN (SELECT g4 FROM bg)
                         THEN 1 ELSE 0 END)::BIGINT AS n_hits
              FROM g WHERE doc_id % 31 <> 0 GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(n_spans, 0) AS n_spans,
                   coalesce(n_hits, 0) AS n_hits,
                   CASE WHEN coalesce(n_hits, 0) > 0 THEN 1 ELSE 0
                     END::BIGINT AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 31 <> 0) d
            LEFT JOIN c USING (doc_id)""",
        # sqrt-damped mixture weights over per-source token sums; sqrt
        # is IEEE-correctly-rounded in both engines, so parity is exact
        # seeded multiplicative-hash shuffle key (seed XORed in before
        # the multiply) + dense global rank; HUGEINT keeps the multiply
        # from overflowing BIGINT
        "shuffled_training_order": r"""
            WITH keyed AS (
              SELECT doc_id,
                     CAST((CAST(xor(doc_id, 17 * 2654435769) AS HUGEINT)
                           * 2654435761) % 4294967296 AS BIGINT) AS skey
              FROM documents
            )
            SELECT doc_id, skey,
                   CAST(row_number() OVER (ORDER BY skey, doc_id)
                        AS BIGINT) - 1 AS pos
            FROM keyed""",
        # same seeded hash; three-key row_number() is the curriculum
        "curriculum_training_order": r"""
            WITH keyed AS (
              SELECT doc_id, n_chars,
                     CAST((CAST(xor(doc_id, 17 * 2654435769) AS HUGEINT)
                           * 2654435761) % 4294967296 AS BIGINT) AS skey
              FROM documents
            )
            SELECT doc_id, n_chars, skey,
                   CAST(row_number() OVER (ORDER BY n_chars, skey, doc_id)
                        AS BIGINT) - 1 AS pos
            FROM keyed""",
        # same seeded hash + the token_stats token definition; the
        # inclusive running sum is a SUM() OVER the same total order
        "sample_token_budget": r"""
            WITH keyed AS (
              SELECT doc_id,
                     CAST((CAST(xor(doc_id, 17 * 2654435769) AS HUGEINT)
                           * 2654435761) % 4294967296 AS BIGINT) AS skey,
                     len(string_split_regex(trim(text), '\s+'))::BIGINT
                       AS n_tokens
              FROM documents
            ), c AS (
              SELECT doc_id, skey, n_tokens,
                     CAST(sum(n_tokens) OVER (ORDER BY skey, doc_id)
                          AS BIGINT) AS cum
              FROM keyed
            )
            SELECT doc_id, skey, n_tokens, cum FROM c WHERE cum <= 10000""",
        "mixture_sample_docs": r"""
            WITH d AS (
              SELECT source,
                     len(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> ''))::BIGINT AS n_tokens
              FROM documents
            ), a AS (
              SELECT source, sum(n_tokens)::BIGINT AS n_tokens
              FROM d GROUP BY source
            ), s AS (
              SELECT source,
                     n_tokens::DOUBLE
                       / (SELECT sum(n_tokens)::DOUBLE FROM a) AS share
              FROM a
            ), r AS (
              SELECT source,
                     sqrt(share) / (SELECT max(sqrt(share)) FROM s)
                       * 4294967296.0 AS thresh
              FROM s
            )
            SELECT doc_id, documents.source FROM documents JOIN r USING (source)
            WHERE (CAST(doc_id AS BIGINT) * 2654435761) % 4294967296
                  < r.thresh""",
        "source_mix_weights": r"""
            WITH d AS (
              SELECT source,
                     len(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> ''))::BIGINT AS n_tokens
              FROM documents
            ), a AS (
              SELECT source, count(*)::BIGINT AS n_docs,
                     sum(n_tokens)::BIGINT AS n_tokens
              FROM d GROUP BY source
            ), s AS (
              SELECT source, n_docs, n_tokens,
                     n_tokens::DOUBLE
                       / (SELECT sum(n_tokens)::DOUBLE FROM a) AS share
              FROM a
            )
            SELECT source, n_docs, n_tokens,
                   round(share + 1e-9, 4) AS token_share,
                   round(sqrt(share)
                         / (SELECT sum(sqrt(share)) FROM s)
                         + 1e-9, 4) AS weight
            FROM s""",
        # repetition rate = sqrt(max_tokens / source_tokens): a pure
        # ratio of integer sums (no float-sum-order hazard); epochs via
        # a bounded range() cross join; the fractional copy shares the
        # mixture_sample_docs hash predicate
        "upsample_mixture_docs": r"""
            WITH d AS (
              SELECT source,
                     len(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> ''))::BIGINT AS n_tokens
              FROM documents
            ), a AS (
              SELECT source, sum(n_tokens)::BIGINT AS n_tokens
              FROM d GROUP BY source
            ), r AS (
              SELECT source,
                     sqrt((SELECT max(n_tokens)::DOUBLE FROM a)
                          / n_tokens::DOUBLE) AS rate
              FROM a
            )
            SELECT doc_id, documents.source, epoch
            FROM documents
            JOIN r ON r.source = documents.source
            CROSS JOIN range(1024) e(epoch)
            WHERE epoch < floor(rate)
               OR (epoch = floor(rate)
                   AND (doc_id * 2654435761) % 4294967296
                       < (rate - floor(rate)) * 4294967296)""",
        # same seeded multiplicative hash as shuffled_training_order;
        # cut points are exact doubles (frac * 2^32) in both engines
        "train_val_test_split": r"""
            SELECT doc_id,
                   CASE WHEN h < 0.05 * 4294967296 THEN 'test'
                        WHEN h < 0.10 * 4294967296 THEN 'val'
                        ELSE 'train' END AS split
            FROM (
              SELECT doc_id,
                     CAST((CAST(xor(doc_id, 7 * 2654435769) AS HUGEINT)
                           * 2654435761) % 4294967296 AS BIGINT) AS h
              FROM documents
            )""",
        # RE2 on both sides: \b word boundaries + alternation behave
        # identically in pyarrow.compute and DuckDB regexp_* kernels
        "scrub_blocklist_docs": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\b(slow|fast)\b'))::BIGINT
                     AS n_flagged,
                   regexp_replace(text, '\b(slow|fast)\b', '[SCRUBBED]', 'g')
                     AS clean_text
            FROM documents""",
        # unigram model = corpus word counts; mean_nll is exact
        # arithmetic over them (ln is libm-identical in both engines)
        "unigram_logprob_docs": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w
              FROM documents
            ), c AS (
              SELECT w, count(*)::DOUBLE AS c FROM w GROUP BY w
            ), t AS (
              SELECT sum(c) AS t FROM c
            ), s AS (
              SELECT doc_id, count(*)::BIGINT AS n_words,
                     sum(ln((SELECT t FROM t) / c.c)) AS nll
              FROM w JOIN c USING (w) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(n_words, 0) AS n_words,
                   round(coalesce(nll, 0)
                         / greatest(coalesce(n_words, 0), 1)
                         + 1e-9, 4) AS mean_nll
            FROM documents d LEFT JOIN s USING (doc_id)""",
        # bigram model = corpus bigram counts (lead() window); mean_nll
        # = first-word unigram term + conditional bigram terms, exact
        # arithmetic over counts (ln is libm-identical in both engines)
        "bigram_logprob_docs": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w,
                     generate_subscripts(list_filter(string_split_regex(
                       lower(text), '\W+'), x -> x <> ''), 1) AS i
              FROM documents
            ), u AS (
              SELECT w, count(*)::DOUBLE AS c FROM w GROUP BY w
            ), t AS (
              SELECT sum(c) AS t FROM u
            ), b AS (
              SELECT doc_id, i, w AS w1,
                     lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
              FROM w QUALIFY w2 IS NOT NULL
            ), bc AS (
              SELECT w1, w2, count(*)::DOUBLE AS c FROM b GROUP BY w1, w2
            ), n AS (
              SELECT doc_id, count(*)::BIGINT AS n_words FROM w GROUP BY doc_id
            ), f AS (
              SELECT fw.doc_id, ln((SELECT t FROM t) / u.c) AS nll
              FROM (SELECT doc_id, w FROM w WHERE i = 1) fw JOIN u USING (w)
            ), s AS (
              SELECT b.doc_id, sum(ln(u.c / bc.c)) AS nll
              FROM b JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
                     JOIN u ON u.w = b.w1
              GROUP BY b.doc_id
            )
            SELECT d.doc_id,
                   coalesce(n.n_words, 0) AS n_words,
                   round((coalesce(f.nll, 0) + coalesce(s.nll, 0))
                         / greatest(coalesce(n.n_words, 0), 1)
                         + 1e-9, 4) AS mean_nll
            FROM documents d
            LEFT JOIN n USING (doc_id)
            LEFT JOIN f USING (doc_id)
            LEFT JOIN s USING (doc_id)""",
        # interpolated Kneser-Ney trigram (D=0.75): string trigram/bigram
        # type tables give the continuation counts; same formula as the
        # engine, per-event, summed per doc (rounded + nudged)
        "kneser_ney_logprob_docs": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text),
                       '\W+'), x -> x <> '')) AS w,
                     generate_subscripts(list_filter(string_split_regex(
                       lower(text), '\W+'), x -> x <> ''), 1) AS i
              FROM documents
            ), bi AS (
              SELECT doc_id, w AS w1,
                     lead(w, 1) OVER win AS w2
              FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY w2 IS NOT NULL
            ), tr AS (
              SELECT doc_id, w AS w1,
                     lead(w, 1) OVER win AS w2, lead(w, 2) OVER win AS w3
              FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY w3 IS NOT NULL
            ), c2 AS (
              SELECT w1, w2, count(*)::DOUBLE AS c FROM bi GROUP BY w1, w2
            ), c3 AS (
              SELECT w1, w2, w3, count(*)::DOUBLE AS c
              FROM tr GROUP BY w1, w2, w3
            ), mid1 AS (
              SELECT w1, w2, count(*)::DOUBLE AS n FROM c3 GROUP BY w1, w2
            ), cont3 AS (
              SELECT w2, w3, count(*)::DOUBLE AS n FROM c3 GROUP BY w2, w3
            ), mid2 AS (
              SELECT w2, count(*)::DOUBLE AS n FROM c3 GROUP BY w2
            ), fol AS (
              SELECT w1, count(*)::DOUBLE AS n FROM c2 GROUP BY w1
            ), cont2 AS (
              SELECT w2, count(*)::DOUBLE AS n FROM c2 GROUP BY w2
            ), tot AS (
              SELECT count(*)::DOUBLE AS n FROM c2
            ), ev AS (
              SELECT tr.doc_id,
                -ln(
                  greatest(c3.c - 0.75, 0) / c2.c
                  + 0.75 * mid1.n / c2.c * (
                      greatest(cont3.n - 0.75, 0) / mid2.n
                      + 0.75 * fol.n / mid2.n * (cont2.n / tot.n)
                    )
                ) AS nll
              FROM tr
              JOIN c3 ON c3.w1 = tr.w1 AND c3.w2 = tr.w2 AND c3.w3 = tr.w3
              JOIN c2 ON c2.w1 = tr.w1 AND c2.w2 = tr.w2
              JOIN mid1 ON mid1.w1 = tr.w1 AND mid1.w2 = tr.w2
              JOIN cont3 ON cont3.w2 = tr.w2 AND cont3.w3 = tr.w3
              JOIN mid2 ON mid2.w2 = tr.w2
              JOIN fol ON fol.w1 = tr.w2
              JOIN cont2 ON cont2.w2 = tr.w3
              CROSS JOIN tot
            ), lens AS (
              SELECT doc_id, count(*)::BIGINT AS n_words FROM w GROUP BY doc_id
            ), agg AS (
              SELECT doc_id, count(*)::BIGINT AS n_tri, sum(nll) AS s
              FROM ev GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(l.n_words, 0) AS n_words,
                   coalesce(a.n_tri, 0) AS n_trigrams,
                   round(coalesce(a.s, 0)
                         / greatest(coalesce(a.n_tri, 0), 1) + 1e-9, 4)
                     AS mean_nll
            FROM documents d
            LEFT JOIN lens l USING (doc_id)
            LEFT JOIN agg a USING (doc_id)""",
        # the full curation composition is the AND of four SQL-expressible
        # gates plus a group-by-text dedup; every threshold compares the
        # rounded values both engines compute identically
        "curate_text_corpus": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '')) AS w,
                     generate_subscripts(list_filter(string_split_regex(lower(text), '\W+'), x -> x <> ''), 1) AS i
              FROM documents
            ), wc AS (
              SELECT doc_id, w, count(*) AS k FROM w GROUP BY doc_id, w
            ), d1 AS (
              SELECT doc_id, sum(k)::BIGINT AS n_words,
                     sum(CASE WHEN k >= 2 THEN k ELSE 0 END)::BIGINT AS dup_words
              FROM wc GROUP BY doc_id
            ), g2 AS (
              SELECT doc_id, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS g2
              FROM w QUALIFY g2 IS NOT NULL
            ), gc AS (
              SELECT doc_id, g2, count(*) AS k FROM g2 GROUP BY doc_id, g2
            ), d2 AS (
              SELECT doc_id, sum(k)::BIGINT AS n2,
                     sum(CASE WHEN k >= 2 THEN k ELSE 0 END)::BIGINT AS dup2,
                     max(k)::BIGINT AS top2
              FROM gc GROUP BY doc_id
            ), rep AS (
              SELECT d.doc_id,
                     round(coalesce(dup_words, 0) / greatest(coalesce(n_words, 0), 1)::DOUBLE + 1e-9, 4) AS dupword_frac,
                     round(coalesce(dup2, 0) / greatest(coalesce(n2, 0), 1)::DOUBLE + 1e-9, 4) AS dup2_frac,
                     round(coalesce(top2, 0) / greatest(coalesce(n2, 0), 1)::DOUBLE + 1e-9, 4) AS top2_frac
              FROM documents d LEFT JOIN d1 USING (doc_id) LEFT JOIN d2 USING (doc_id)
            ), qb AS (
              SELECT doc_id,
                length(text)::BIGINT AS n_chars,
                len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
                len(regexp_extract_all(text, '[^\w\s]'))::BIGINT AS n_punct,
                list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS words
              FROM documents
            ), qf AS (
              SELECT doc_id,
                round(0.4 * least(n_chars::DOUBLE / 500.0, 1)
                    + 0.2 * (1 - least(n_punct::DOUBLE / n_chars::DOUBLE, 1))
                    + 0.2 * least((n_chars::DOUBLE / greatest(n_tokens, 1)::DOUBLE) / 8.0, 1)
                    + 0.2 * least(round(len(list_filter(words, x -> x IN ('the','and','of',
                        'to','a','in','is','that','it','for','was','on')))::DOUBLE
                        / greatest(len(words), 1) + 1e-9, 4) * 4, 1) + 1e-9, 4) AS quality
              FROM qb
            ), uc AS (
              SELECT w, count(*)::DOUBLE AS c FROM w GROUP BY w
            ), ut AS (
              SELECT sum(c) AS t FROM uc
            ), un AS (
              SELECT doc_id, count(*)::BIGINT AS n,
                     sum(ln((SELECT t FROM ut) / uc.c)) AS nll
              FROM w JOIN uc USING (w) GROUP BY doc_id
            ), unr AS (
              SELECT d.doc_id,
                     round(coalesce(nll, 0) / greatest(coalesce(n, 0), 1) + 1e-9, 4) AS mean_nll
              FROM documents d LEFT JOIN un USING (doc_id)
            ), g4 AS (
              SELECT doc_id,
                w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
                  || ' ' || lead(w, 3) OVER win AS g4
              FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)
              QUALIFY g4 IS NOT NULL
            ), bg AS (
              SELECT DISTINCT g4 FROM g4 WHERE doc_id % 31 = 0
            ), ch AS (
              SELECT doc_id,
                     sum(CASE WHEN g4 IN (SELECT g4 FROM bg) THEN 1 ELSE 0 END)::BIGINT AS n_hits
              FROM g4 WHERE doc_id % 31 <> 0 GROUP BY doc_id
            ), surv AS (
              SELECT d.doc_id, d.text
              FROM documents d
              JOIN rep USING (doc_id) JOIN qf USING (doc_id) JOIN unr USING (doc_id)
              LEFT JOIN ch USING (doc_id)
              WHERE d.doc_id % 31 <> 0
                AND rep.dupword_frac <= 0.8 AND rep.dup2_frac <= 0.08
                AND rep.top2_frac <= 0.05
                AND qf.quality >= 0.55
                AND unr.mean_nll <= 3.402
                AND coalesce(ch.n_hits, 0) = 0
            )
            SELECT min(doc_id) AS doc_id FROM surv GROUP BY text""",
        # char-frequency entropy recomputed from an unnested char table
        "char_entropy_docs": r"""
            WITH ch AS (
              SELECT doc_id, unnest(string_split(text, '')) AS ch
              FROM documents WHERE strlen(text) > 0
            ), f AS (
              SELECT doc_id, ch, count(*)::DOUBLE AS c
              FROM ch GROUP BY doc_id, ch
            ), tot AS (
              SELECT doc_id, sum(c) AS n FROM f GROUP BY doc_id
            )
            SELECT f.doc_id,
                   round(-sum((c / n) * log2(c / n)) + 1e-9, 4)
                       AS char_entropy
            FROM f JOIN tot USING (doc_id) GROUP BY f.doc_id""",
        "user_day_fulljoin": """
            SELECT user_id, day, n_signup, n_error FROM
              (SELECT user_id, date_trunc('day', ts) AS day,
                      count(*) AS n_signup
               FROM events WHERE event_type = 'signup'
               GROUP BY 1, 2) a
            FULL OUTER JOIN
              (SELECT user_id, date_trunc('day', ts) AS day,
                      count(*) AS n_error
               FROM events WHERE event_type = 'error'
               GROUP BY 1, 2) b
            USING (user_id, day)""",
        # basket self-join recomputes the bitmask-popcount plan
        "basket_cooccurrence": """
            WITH ut AS (
              SELECT DISTINCT user_id, date_trunc('day', ts) AS day,
                     event_type
              FROM events
            ), n AS (
              SELECT count(*) AS nb FROM (
                SELECT DISTINCT user_id, date_trunc('day', ts) FROM events)
            ), s AS (
              SELECT event_type, count(*) AS c FROM ut GROUP BY 1
            ), p AS (
              SELECT a.event_type AS type_a, b.event_type AS type_b,
                     count(*) AS n_both
              FROM ut a JOIN ut b USING (user_id, day)
              WHERE a.event_type < b.event_type
              GROUP BY 1, 2
            )
            SELECT type_a, type_b, n_both,
                   round(n_both::DOUBLE / sa.c + 1e-9, 4) AS confidence,
                   round(nb * n_both::DOUBLE / (sa.c * sb.c) + 1e-9, 4)
                       AS lift
            FROM p JOIN s sa ON sa.event_type = p.type_a
                   JOIN s sb ON sb.event_type = p.type_b, n""",
        # the ROWS frame recomputed as a window over the raw table
        # arrival = ts + hash-jittered delay (identical rule engine-side);
        # watermark = running max event time in arrival order, exclusive
        "late_event_audit": """
            WITH a AS (
              SELECT user_id, ts, event_id,
                     epoch_us(ts) + ((event_id * 2654435761) % 4294967296)
                       % 7200000 * 1000 AS arrival
              FROM events
            ), w AS (
              SELECT user_id, ts,
                     max(ts) OVER (PARTITION BY user_id
                                   ORDER BY arrival, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) AS wm
              FROM a
            )
            SELECT user_id,
                   count(*)::BIGINT AS n_events,
                   coalesce(sum(CASE WHEN date_diff('microseconds', ts, wm)
                                          > 3600000000
                                     THEN 1 ELSE 0 END), 0)::BIGINT AS n_late,
                   coalesce(max(CASE WHEN wm > ts
                                     THEN date_diff('microseconds', ts, wm)
                                     END), 0)::BIGINT AS max_disorder_us
            FROM w GROUP BY user_id""",
        "user_value_median": """
            SELECT user_id,
                   round(quantile_cont(value, 0.5) + 1e-9, 4) AS med_value
            FROM events GROUP BY user_id""",
        "user_value_ma3": """
            SELECT user_id, event_id,
                   round(avg(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ) + 1e-9, 4) AS ma3
            FROM events""",
        # same hash-derived exponential keys, recomputed in SQL
        "weighted_sample_orders": """
            SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice
            FROM orders
            ORDER BY -ln((((o_orderkey * 2654435761) % 4294967296) + 1)
                         / 4294967297.0) / o_totalprice,
                     o_orderkey
            LIMIT 50""",
        # JSON path extraction via DuckDB's json functions
        "props_json_stats": """
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS sum_k,
                   round(avg(CAST(json_extract_string(props, '$.k')
                                  AS BIGINT)) + 1e-9, 4) AS avg_k
            FROM events GROUP BY event_type""",
        # the SQL plan pays the d-fold unnest blowup the Ray kernel
        # avoids (flat values buffer reshaped to (n, d) per batch)
        "embedding_dim_stats": """
            WITH u AS (
              SELECT unnest(generate_series(1, len(embedding))) - 1
                         AS dim,
                     CAST(unnest(embedding) AS DOUBLE) AS v
              FROM embeddings)
            SELECT dim, round(avg(v) + 1e-9, 4) AS mean_v,
                   round(stddev_pop(v) + 1e-9, 4) AS std_v
            FROM u GROUP BY dim""",
        # lead() window recomputes the adjacent-pair transitions
        "event_transitions": """
            WITH s AS (
              SELECT event_type,
                     lead(event_type) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                     ) AS nxt
              FROM events)
            SELECT event_type AS from_type, nxt AS to_type,
                   count(*) AS n
            FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2""",
        # row-ordered water-filling level; feasibility is constant
        # within demand tie blocks, so it equals the histogram one
        "fair_share_quota": """
            WITH d AS (
              SELECT user_id, count(*)::DOUBLE AS dem
              FROM events GROUP BY user_id
            ), s AS (
              SELECT user_id, dem,
                     row_number() OVER (ORDER BY dem, user_id) AS rn,
                     sum(dem) OVER (ORDER BY dem, user_id) AS ps,
                     count(*) OVER () AS nn
              FROM d
            ), f AS (
              SELECT coalesce(max(rn), 0) AS k,
                     coalesce(max(ps), 0.0) AS psk
              FROM s WHERE ps + dem * (nn - rn) <= 9000.0
            ), lvl AS (
              SELECT CASE WHEN f.k >= t.nn THEN 1e18
                          ELSE (9000.0 - f.psk) / (t.nn - f.k) END AS L
              FROM f, (SELECT count(*) AS nn FROM d) t
            )
            SELECT user_id, CAST(dem AS BIGINT) AS demand,
                   round(least(dem, L) + 1e-9, 4) AS quota
            FROM d, lvl""",
        # cohort triangle recomputed with min() + datediff('week')
        "cohort_retention": """
            WITH f AS (
              SELECT user_id, date_trunc('week', min(ts)) AS cohort
              FROM events GROUP BY user_id
            ), act AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
              FROM events
            ), j AS (
              SELECT f.cohort,
                     CAST(datediff('week', f.cohort, a.wk) AS BIGINT)
                         AS week_offset
              FROM f JOIN act a USING (user_id)
            ), c AS (
              SELECT cohort, week_offset, count(*) AS n_active
              FROM j GROUP BY 1, 2
            ), s AS (
              SELECT cohort, count(*) AS n_cohort FROM f GROUP BY 1
            )
            SELECT CAST(c.cohort AS TIMESTAMP) AS cohort, c.week_offset,
                   c.n_active,
                   round(c.n_active::DOUBLE / s.n_cohort + 1e-9, 4)
                       AS retention
            FROM c JOIN s USING (cohort)""",
        # unique (length, doc_id) keys make RANK == ROW_NUMBER, so the
        # window recomputes the same closed-form (rank-1)/(n-1)
        "doc_length_percentile": """
            SELECT doc_id, source,
                   round(percent_rank() OVER (
                       PARTITION BY source ORDER BY strlen(text), doc_id
                   ) + 1e-9, 4) AS pr
            FROM documents""",
        # quantile_cont == np.quantile linear interpolation; clip
        # decisions are bit-identical (bounds fall between data points)
        "winsorize_values": """
            WITH b AS (
              SELECT event_type,
                     quantile_cont(value, 0.05) AS lo,
                     quantile_cont(value, 0.95) AS hi
              FROM events GROUP BY event_type)
            SELECT e.event_id, e.event_type,
                   round(least(greatest(e.value, b.lo), b.hi) + 1e-9, 4)
                       AS value_w
            FROM events e JOIN b USING (event_type)""",
        # two-lead window recomputes the 3-event paths (full counts —
        # no LIMIT: a top-k boundary tie would be nondeterministic)
        "session_trigrams": """
            WITH s AS (
              SELECT event_type AS a,
                     lead(event_type) OVER w AS b,
                     lead(event_type, 2) OVER w AS c
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT a, b, c, count(*) AS n FROM s
            WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2, 3""",
        # regr_* over (value, hour); raw-moments closed form on the Ray
        # side — same float-tolerance profile as value_hour_corr
        "value_trend_by_type": """
            SELECT event_type,
                   round(regr_slope(value, CAST(hour(ts) AS DOUBLE))
                         + 1e-9, 4) AS slope,
                   round(regr_intercept(value, CAST(hour(ts) AS DOUBLE))
                         + 1e-9, 4) AS intercept
            FROM events GROUP BY event_type""",
        # DuckDB entropy() is base-2 Shannon over value frequencies
        "lang_entropy_by_source": """
            SELECT source, count(*) AS n_docs,
                   round(entropy(lang) + 1e-9, 4) AS lang_entropy
            FROM documents GROUP BY source""",
        "type_user_hhi": """
            WITH c AS (
              SELECT event_type, user_id, count(*)::DOUBLE AS c
              FROM events GROUP BY 1, 2)
            SELECT event_type,
                   CAST(sum(c) AS BIGINT) AS n_events,
                   count(*) AS n_users,
                   round(sum(c * c) / (sum(c) * sum(c)) + 1e-9, 4) AS hhi
            FROM c GROUP BY event_type""",
        # non-overlapping replace-length tf == pc.count_substring;
        # (tf DESC, doc_id) ranks are deterministic, so the fused list is
        "rrf_keyword_search": """
            WITH tf AS (
              SELECT k.kw, d.doc_id,
                     (strlen(d.text) - strlen(replace(d.text, k.kw, '')))
                       / strlen(k.kw) AS tf
              FROM documents d
              CROSS JOIN (VALUES ('spark'), ('merge'), ('window')) k(kw)
            ), ranked AS (
              SELECT kw, doc_id,
                     row_number() OVER (
                       PARTITION BY kw ORDER BY tf DESC, doc_id) AS rn
              FROM tf WHERE tf > 0
              QUALIFY rn <= 100
            )
            SELECT doc_id, round(sum(1.0 / (60 + rn)) + 1e-9, 4) AS rrf
            FROM ranked GROUP BY doc_id
            ORDER BY rrf DESC, doc_id LIMIT 20""",
        # quantile_cont(0.5) == np.quantile median (bit-identical); the
        # cut compares the ROUNDED modified z on both engines
        "mad_anomaly_events": """
            WITH m1 AS (
              SELECT event_type, quantile_cont(value, 0.5) AS med
              FROM events GROUP BY event_type
            ), m2 AS (
              SELECT e.event_type,
                     quantile_cont(abs(e.value - m1.med), 0.5) AS mad
              FROM events e JOIN m1 USING (event_type)
              GROUP BY e.event_type
            ), sc AS (
              SELECT e.event_id, e.event_type, e.value,
                     round(0.6745 * (e.value - m1.med) / m2.mad + 1e-9, 4)
                         AS rz
              FROM events e JOIN m1 USING (event_type)
                            JOIN m2 USING (event_type)
            )
            SELECT event_id, event_type, round(value, 4) AS value, rz
            FROM sc WHERE abs(rz) > 3.5""",
        # exact-integer microsecond age / one double divide -> identical
        # exponents; pow-vs-exp2 ulp noise dies in the round-nudge
        "time_decay_user_value": """
            WITH mx AS (SELECT max(ts) AS m FROM events)
            SELECT user_id, count(*) AS n_events,
                   round(sum(value * pow(2.0,
                       -CAST(epoch_us(mx.m) - epoch_us(ts) AS DOUBLE)
                        / (86400000000.0 * 7.0))) + 1e-9, 4)
                       AS decayed_value
            FROM events, mx GROUP BY user_id""",
        # COUNT(DISTINCT) OVER == cumsum of first-appearance counts
        "cumulative_users_by_day": """
            WITH f AS (
              SELECT user_id, min(date_trunc('day', ts)) AS day
              FROM events GROUP BY user_id
            ), d AS (
              SELECT day, count(*) AS new_users FROM f GROUP BY day
            )
            SELECT day, new_users,
                   CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT)
                       AS cum_users
            FROM d""",
        # churned(w) = active(w) - |active(w) ∩ active(w + 7 days)|;
        # the max observed week has no successor to churn into
        "weekly_churn": """
            WITH uw AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS week
              FROM events
            ), ret AS (
              SELECT a.week, count(*) AS retained
              FROM uw a JOIN uw b ON a.user_id = b.user_id
                   AND b.week = a.week + INTERVAL 7 DAY
              GROUP BY a.week
            ), act AS (
              SELECT week, count(*) AS active FROM uw GROUP BY week
            )
            SELECT act.week, act.active,
                   act.active - coalesce(ret.retained, 0) AS churned,
                   round((act.active - coalesce(ret.retained, 0))
                         / CAST(act.active AS DOUBLE) + 1e-9, 4)
                       AS churn_rate
            FROM act LEFT JOIN ret USING (week)
            WHERE act.week < (SELECT max(week) FROM act)""",
        # tied lengths make the (2i - n - 1) x_i sum order-free; strlen
        # is bytes, matching pc.binary_length
        "length_gini_by_source": """
            WITH l AS (
              SELECT source, CAST(strlen(text) AS DOUBLE) AS x
              FROM documents
            ), r AS (
              SELECT source, x,
                     row_number() OVER (
                       PARTITION BY source ORDER BY x) AS i,
                     count(*) OVER (PARTITION BY source) AS n,
                     sum(x) OVER (PARTITION BY source) AS s
              FROM l
            )
            SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
                   round(sum((2 * i - n - 1) * x) / (max(n) * max(s))
                         + 1e-9, 4) AS gini
            FROM r GROUP BY source""",
        # lag() over observed days only (calendar gaps ignored — both
        # sides); corr() is Pearson, n-1 factors cancel vs np.corrcoef
        "autocorr_daily_value": """
            WITH d AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                     sum(value) AS v
              FROM events GROUP BY event_type, day
            ), l AS (
              SELECT event_type, v,
                     lag(v) OVER (
                       PARTITION BY event_type ORDER BY day) AS pv
              FROM d
            )
            SELECT event_type, count(pv) AS n_pairs,
                   round(corr(v, pv) + 1e-9, 4) AS autocorr
            FROM l WHERE pv IS NOT NULL GROUP BY event_type""",
        # integer-exact us partials both sides; mean divides in the
        # same order (sum / 1e6 / n) so the doubles agree bit-for-bit
        "inter_arrival_gaps": """
            WITH g AS (
              SELECT event_type,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS gap_us
              FROM events
            )
            SELECT event_type, count(gap_us) AS n_gaps,
                   round(CAST(sum(gap_us) AS DOUBLE) / 1000000.0
                         / count(gap_us) + 1e-9, 4) AS mean_gap_s,
                   min(gap_us) / 1000000.0 AS min_gap_s,
                   max(gap_us) / 1000000.0 AS max_gap_s
            FROM g WHERE gap_us IS NOT NULL GROUP BY event_type""",
        "kcore_nodes": _kcore_oracle(),
        # statistic rounded BEFORE the rank so near-equal float peaks
        # order identically; earliest day wins ties on both sides
        "cusum_changepoint": """
            WITH d AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                     sum(value) AS v
              FROM events GROUP BY event_type, day
            ), m AS (
              SELECT event_type, avg(v) AS mu FROM d GROUP BY event_type
            ), s AS (
              SELECT d.event_type, d.day,
                     round(abs(sum(d.v - m.mu) OVER (
                       PARTITION BY d.event_type ORDER BY d.day))
                       + 1e-9, 4) AS cs
              FROM d JOIN m USING (event_type)
            ), r AS (
              SELECT event_type, day, cs,
                     row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY cs DESC, day) AS rn
              FROM s
            )
            SELECT event_type, day AS change_day, cs AS cusum_stat
            FROM r WHERE rn = 1""",
        "hot_key_audit": """
            WITH pk AS (
              SELECT event_type, user_id, count(*) AS c
              FROM events GROUP BY event_type, user_id
            )
            SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
                   count(*) AS n_keys,
                   CAST(max(c) AS BIGINT) AS top_key_rows,
                   round(CAST(max(c) AS DOUBLE)
                         / CAST(sum(c) AS DOUBLE) + 1e-9, 4) AS top_share
            FROM pk GROUP BY event_type""",
        "link_degree_assortativity": """
            WITH dc AS (
              SELECT CAST(count(*) AS BIGINT) AS cnt FROM documents
            ), e AS MATERIALIZED (
              SELECT CAST(doc_id AS BIGINT) AS src,
                     (CAST(doc_id AS BIGINT) * 48271 + j.j * 10007 + 1)
                         % dc.cnt AS dst
              FROM documents CROSS JOIN dc CROSS JOIN range(0, 5) AS j(j)
              WHERE doc_id % 7 <> 0 AND j.j <= doc_id % 5
            ), od AS (
              SELECT src, count(*)::DOUBLE AS outd FROM e GROUP BY src
            ), idg AS (
              SELECT dst, count(*)::DOUBLE AS ind FROM e GROUP BY dst
            )
            SELECT count(*) AS n_edges,
                   round(corr(od.outd, idg.ind) + 1e-9, 4) AS assortativity
            FROM e JOIN od ON e.src = od.src JOIN idg ON e.dst = idg.dst""",
        "token_dropout_docs": r"""
            WITH wl AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS w
              FROM documents
            )
            SELECT doc_id,
                   len(w)::BIGINT AS n_tokens,
                   (len(w) - len([w[i] FOR i IN generate_series(1, len(w))
                     IF ((doc_id * 1000003 + i) % 2147483648)
                        * 2654435761 % 2147483648 >= 214748365]))::BIGINT
                       AS n_dropped,
                   array_to_string([w[i] FOR i IN generate_series(1, len(w))
                     IF ((doc_id * 1000003 + i) % 2147483648)
                        * 2654435761 % 2147483648 >= 214748365], ' ')
                       AS aug_text
            FROM wl""",
        "mask_pii_docs": r"""
            WITH aug AS (
              -- coalesce mirrors the engine's fill_null(text, '') so
              -- null-text corpora stay in parity (ADVICE r3)
              SELECT doc_id,
                     COALESCE(text, '') || ' contact u' || CAST(doc_id AS VARCHAR)
                          || '@ex' || CAST(doc_id % 7 AS VARCHAR)
                          || '.net ip 10.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                          || ' tel 555-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       AS t0
              FROM documents
            ), s1 AS (
              SELECT doc_id,
                     len(regexp_extract_all(t0,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
                       AS n_emails,
                     regexp_replace(t0,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t1
              FROM aug
            ), s2 AS (
              SELECT doc_id, n_emails,
                     len(regexp_extract_all(t1,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT
                       AS n_ips,
                     regexp_replace(t1,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                       '<IP>', 'g') AS t2
              FROM s1
            )
            SELECT doc_id, n_emails, n_ips,
                   len(regexp_extract_all(t2, '\b\d{3}-\d{4}\b'))::BIGINT
                     AS n_phones,
                   regexp_replace(t2, '\b\d{3}-\d{4}\b', '<PHONE>', 'g')
                     AS masked_text
            FROM s2""",
        "apply_changes_docs": """
            WITH changes AS (
              SELECT doc_id, 'updated ' || CAST(doc_id AS VARCHAR) AS text,
                     'u' AS op
              FROM documents WHERE doc_id % 10 = 3
              UNION ALL
              SELECT doc_id, NULL, 'd' FROM documents WHERE doc_id % 10 = 7
              UNION ALL
              SELECT doc_id + 1000000,
                     'inserted ' || CAST(doc_id AS VARCHAR), 'u'
              FROM documents WHERE doc_id % 10 = 5
            )
            SELECT COALESCE(c.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN c.doc_id IS NOT NULL THEN c.text
                        ELSE b.text END AS text
            FROM documents b FULL OUTER JOIN changes c
              ON b.doc_id = c.doc_id
            WHERE COALESCE(c.op, 'b') <> 'd'""",
        "fk_integrity_audit": """
            SELECT 'orders.custkey' AS relation, count(*) AS n_rows,
                   count(*) FILTER (c_custkey IS NULL) AS n_orphans
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            UNION ALL
            SELECT 'lineitem.suppkey', count(*),
                   count(*) FILTER (s_suppkey IS NULL)
            FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
            UNION ALL
            SELECT 'lineitem.partkey', count(*),
                   count(*) FILTER (p_partkey IS NULL)
            FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
            UNION ALL
            SELECT 'lineitem.orderkey', count(*),
                   count(*) FILTER (o_orderkey IS NULL)
            FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey""",
        "profile_events": """
            SELECT 'event_id' AS col, count(*) AS n,
                   count(*) - count(event_id) AS n_null,
                   count(DISTINCT event_id) AS n_distinct,
                   CAST(min(event_id) AS DOUBLE) AS min_v,
                   CAST(max(event_id) AS DOUBLE) AS max_v
            FROM events
            UNION ALL
            SELECT 'user_id', count(*), count(*) - count(user_id),
                   count(DISTINCT user_id),
                   CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE)
            FROM events
            UNION ALL
            SELECT 'value', count(*), count(*) - count(value),
                   count(DISTINCT value),
                   min(value), max(value)
            FROM events""",
        "regional_revenue_q5": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name""",
        "bigram_ttr_by_source": r"""
            WITH wl AS MATERIALIZED (
              SELECT source,
                     list_filter(string_split_regex(lower(text), '\W+'),
                                 x -> x <> '') AS w
              FROM documents
            ), bg AS (
              SELECT source,
                     unnest(CASE WHEN len(w) < 2 THEN []::VARCHAR[]
                       ELSE [w[i] || ' ' || w[i+1]
                             FOR i IN generate_series(1, len(w)-1)]
                     END) AS p
              FROM wl
            )
            SELECT source, count(*) AS n_bigrams,
                   count(DISTINCT p) AS n_distinct,
                   round(count(DISTINCT p)::DOUBLE / count(*) + 1e-9, 4)
                       AS ttr
            FROM bg GROUP BY source""",
        "link_bfs_depth": """
            WITH RECURSIVE dc AS (
              SELECT CAST(count(*) AS BIGINT) AS cnt FROM documents
            ), e AS MATERIALIZED (
              SELECT CAST(doc_id AS BIGINT) AS src,
                     (CAST(doc_id AS BIGINT) * 48271 + j.j * 10007 + 1)
                         % dc.cnt AS dst
              FROM documents CROSS JOIN dc CROSS JOIN range(0, 3) AS j(j)
              WHERE doc_id % 7 <> 0
            ), r AS (
              SELECT CAST(doc_id AS BIGINT) AS node, 0 AS depth
              FROM documents WHERE doc_id % 100 = 0
              UNION
              SELECT e.dst AS node, r.depth + 1 AS depth
              FROM r JOIN e ON e.src = r.node WHERE r.depth < 6
            )
            SELECT node, CAST(MIN(depth) AS BIGINT) AS depth
            FROM r GROUP BY node""",
        "peak_concurrency_daily": """
            WITH b AS (
              SELECT epoch_us(ts) * 2 + 1 AS k, 1 AS d,
                     date_trunc('day', ts) AS day
              FROM events
              UNION ALL
              SELECT epoch_us(ts + INTERVAL 30 MINUTE) * 2 AS k, -1 AS d,
                     NULL AS day
              FROM events
            ), r AS (
              SELECT day, d,
                     CAST(SUM(d) OVER (ORDER BY k) AS BIGINT) AS running
              FROM b
            )
            SELECT day, MAX(running) AS peak
            FROM r WHERE d = 1 GROUP BY day ORDER BY day""",
        # the same regex token counts -> SQL-expressible likewise
        "quality_score_docs": r"""
            WITH b AS (
              SELECT doc_id,
                length(text)::BIGINT AS n_chars,
                len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
                len(regexp_extract_all(text, '[^\w\s]'))::BIGINT AS n_punct,
                list_filter(string_split_regex(lower(text), '\W+'),
                            x -> x <> '') AS words
              FROM documents
            ), f AS (
              SELECT doc_id, n_chars, n_tokens, n_punct,
                round(len(list_filter(words, x -> x IN ('the','and','of',
                    'to','a','in','is','that','it','for','was','on')))::DOUBLE
                  / greatest(len(words), 1) + 1e-9, 4) AS sr,
                n_chars::DOUBLE AS nc,
                greatest(n_tokens, 1)::DOUBLE AS nt,
                n_punct::DOUBLE AS np
              FROM b
            )
            SELECT doc_id, n_chars, n_tokens, n_punct,
                   sr AS stopword_ratio,
                   round(0.4 * least(nc / 500.0, 1)
                       + 0.2 * (1 - least(np / nc, 1))
                       + 0.2 * least((nc / nt) / 8.0, 1)
                       + 0.2 * least(sr * 4, 1) + 1e-9, 4) AS quality
            FROM f""",
        # minhash_near_dup emits only pairs that PASS the exact-Jaccard
        # verify stage, with the same tokenization/threshold as
        # ngram_jaccard_pairs — and the 16x4 banding provably catches
        # every pair the exact join finds on this corpus (verified:
        # identical 25-row output at sf0.01), so the exact-join SQL is a
        # hard oracle for it (VERDICT r2 item 3)
        "minhash_near_dup": r"""
            WITH g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) < 3
                       THEN [list_aggregate(w, 'string_agg', ' ')]
                       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN generate_series(1, len(w)-2)]
                     END) AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS w
                    FROM documents)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.grams, b.grams))::DOUBLE
                         / nullif(len(list_distinct(a.grams || b.grams)), 0),
                         4) AS jaccard
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
                  / nullif(len(list_distinct(a.grams || b.grams)), 0) >= 0.5""",
        # same argument at the corpus level: minhash_dedup_docs' pair set
        # equals the exact join's, so the transitive-closure survivors
        # match the recursive-CTE oracle row-for-row
        "minhash_dedup_docs": r"""
            WITH RECURSIVE g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) < 3
                       THEN [list_aggregate(w, 'string_agg', ' ')]
                       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN generate_series(1, len(w)-2)]
                     END) AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS w
                    FROM documents)
            ), p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM g a JOIN g b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
                    / nullif(len(list_distinct(a.grams || b.grams)), 0) >= 0.5
            ), e AS (
              SELECT id_a AS u, id_b AS v FROM p
              UNION SELECT id_b, id_a FROM p
            ), reach(n, x) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM e)
              UNION
              SELECT r.n, e.v FROM reach r JOIN e ON e.u = r.x
            ), lbl AS (
              SELECT n AS node, min(x) AS comp FROM reach GROUP BY n
            )
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT node FROM lbl WHERE comp < node)""",
        "ngram_jaccard_pairs": r"""
            -- word-3-gram Jaccard >= 0.5, same tokenization as the engine:
            -- lowercase, split \W+, drop empties; <3 words = one gram
            WITH g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) < 3
                       THEN [list_aggregate(w, 'string_agg', ' ')]
                       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN generate_series(1, len(w)-2)]
                     END) AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS w
                    FROM documents)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.grams, b.grams))::DOUBLE
                         / nullif(len(list_distinct(a.grams || b.grams)), 0),
                         4) AS jaccard
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
                  / nullif(len(list_distinct(a.grams || b.grams)), 0) >= 0.5""",
        "source_overlap_matrix": r"""
            -- near-dup pair counts per unordered source pair, same
            -- tokenization + threshold as ngram_jaccard_pairs
            WITH g AS (
              SELECT doc_id, source,
                     list_distinct(CASE WHEN len(w) < 3
                       THEN [list_aggregate(w, 'string_agg', ' ')]
                       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN generate_series(1, len(w)-2)]
                     END) AS grams
              FROM (SELECT doc_id, source,
                           list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS w
                    FROM documents)
            ), p AS (
              SELECT a.source AS sa, b.source AS sb
              FROM g a JOIN g b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
                    / nullif(len(list_distinct(a.grams || b.grams)), 0) >= 0.5
            )
            SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
                   count(*) AS n_pairs
            FROM p GROUP BY 1, 2""",
        "ngram_containment_pairs": r"""
            -- word-3-gram containment of the smaller set >= 0.6, same
            -- tokenization as the engine (and as ngram_jaccard_pairs)
            WITH g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) < 3
                       THEN [list_aggregate(w, 'string_agg', ' ')]
                       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN generate_series(1, len(w)-2)]
                     END) AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS w
                    FROM documents)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.grams, b.grams))::DOUBLE
                         / nullif(least(len(a.grams), len(b.grams)), 0),
                         4) AS containment
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
                  / nullif(least(len(a.grams), len(b.grams)), 0) >= 0.6""",
        # pure-containment interval join recomputed as a LEFT JOIN so
        # zero-shipment windows keep their row (the Ray side emits every
        # broadcast window unconditionally)
        "range_join_shipments": """
            WITH w AS (
              SELECT o_orderkey, o_orderdate AS d0,
                     o_orderdate + INTERVAL 30 DAY AS d1
              FROM orders
              WHERE o_orderpriority = '1-URGENT'
                AND o_orderdate BETWEEN DATE '1996-01-01'
                                    AND DATE '1996-03-31'
            )
            SELECT w.o_orderkey, count(l.l_shipdate) AS n_shipped
            FROM w LEFT JOIN lineitem l
              ON l.l_shipdate >= w.d0 AND l.l_shipdate < w.d1
            GROUP BY w.o_orderkey""",
        # staged funnel: each CTE keeps only users whose stage event
        # strictly follows their previous stage's first qualifying time
        "funnel_conversion": """
            WITH v AS (
              SELECT user_id, min(ts) AS t0 FROM events
              WHERE event_type = 'view' GROUP BY 1
            ), c AS (
              SELECT e.user_id, min(e.ts) AS t1
              FROM events e JOIN v USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY 1
            ), p AS (
              SELECT e.user_id, min(e.ts) AS t2
              FROM events e JOIN c USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY 1
            )
            SELECT (SELECT count(*) FROM v) AS n_view,
                   (SELECT count(*) FROM c) AS n_click,
                   (SELECT count(*) FROM p) AS n_purchase""",
        # skyline recomputed as the NOT EXISTS dominator check
        "pareto_orders": """
            SELECT o_orderkey, o_totalprice, o_orderdate
            FROM orders a
            WHERE NOT EXISTS (
              SELECT 1 FROM orders b
              WHERE b.o_totalprice >= a.o_totalprice
                AND b.o_orderdate >= a.o_orderdate
                AND (b.o_totalprice > a.o_totalprice
                     OR b.o_orderdate > a.o_orderdate))""",
        "distinct_users_by_type": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type""",
        # DuckDB's mode() tie choice is unspecified; recompute the same
        # (max count, min lang) winner deterministically
        "mode_lang_by_source": """
            WITH c AS (
              SELECT source, lang, count(*) AS n
              FROM documents GROUP BY 1, 2
            )
            SELECT source, min(lang) AS mode_lang
            FROM c
            WHERE (source, n) IN (
              SELECT (source, max(n)) FROM c GROUP BY source
            )
            GROUP BY source""",
        "user_activity_quartiles": """
            WITH t AS (
              SELECT user_id, count(*) AS n_events FROM events GROUP BY 1
            )
            SELECT user_id, n_events,
                   ntile(4) OVER (ORDER BY n_events DESC, user_id)::BIGINT
                       AS quartile
            FROM t""",
        # triangle count recomputed as the 3-way edge self-join over the
        # same deterministic co-purchase projection
        "triangle_count": """
            WITH e AS (
              SELECT DISTINCT user_id, date_trunc('day', ts) AS d,
                     floor(value)::BIGINT AS vb
              FROM events WHERE event_type = 'purchase'
            ), edges AS (
              SELECT DISTINCT a.user_id AS u, b.user_id AS v
              FROM e a JOIN e b
                ON a.d = b.d AND a.vb = b.vb AND a.user_id < b.user_id
            )
            SELECT (SELECT count(*) FROM edges) AS n_edges,
                   (SELECT count(*) FROM edges e1
                     JOIN edges e2 ON e2.u = e1.v
                     JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
                   ) AS n_triangles""",
        # exact Levenshtein over the same 60-char prefix key; DuckDB's
        # levenshtein is the independent recompute of the FastSS join
        "edit_distance_pairs": r"""
            WITH k AS (
              SELECT doc_id, substr(text, 1, 60) AS s FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   levenshtein(a.s, b.s)::BIGINT AS dist
            FROM k a JOIN k b ON a.doc_id < b.doc_id
            WHERE levenshtein(a.s, b.s) <= 1""",
        "jaccard_dedup_docs": r"""
            -- corpus dedup with TRANSITIVE closure: clusters connected by
            -- word-3-gram Jaccard >= 0.5 keep only their min doc_id
            WITH RECURSIVE g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) < 3
                       THEN [list_aggregate(w, 'string_agg', ' ')]
                       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN generate_series(1, len(w)-2)]
                     END) AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS w
                    FROM documents)
            ), p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM g a JOIN g b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
                    / nullif(len(list_distinct(a.grams || b.grams)), 0) >= 0.5
            ), e AS (
              SELECT id_a AS u, id_b AS v FROM p
              UNION SELECT id_b, id_a FROM p
            ), reach(n, x) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM e)
              UNION
              SELECT r.n, e.v FROM reach r JOIN e ON e.u = r.x
            ), lbl AS (
              SELECT n AS node, min(x) AS comp FROM reach GROUP BY n
            )
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT node FROM lbl WHERE comp < node)""",
        "novelty_by_source": r"""
            -- source-level novelty rollup over the same gram convention;
            -- integer sums make the rate division bit-deterministic
            WITH g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) < 3
                       THEN [list_aggregate(w, 'string_agg', ' ')]
                       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN generate_series(1, len(w)-2)]
                     END) AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS w
                    FROM documents)
            ), x AS (
              SELECT doc_id, unnest(grams) AS gram FROM g
            ), firsts AS (
              SELECT gram, min(doc_id) AS first_doc FROM x GROUP BY gram
            ), novel AS (
              SELECT first_doc AS doc_id, count(*) AS n_novel
              FROM firsts GROUP BY first_doc
            ), sizes AS (
              SELECT doc_id, count(*) AS n_grams FROM x GROUP BY doc_id
            ), per_doc AS (
              SELECT s.doc_id, s.n_grams, coalesce(n.n_novel, 0) AS n_novel
              FROM sizes s LEFT JOIN novel n ON n.doc_id = s.doc_id
            )
            SELECT d.source,
                   count(*) AS n_docs,
                   sum(p.n_grams)::BIGINT AS total_grams,
                   sum(p.n_novel)::BIGINT AS total_novel,
                   round(sum(p.n_novel)::DOUBLE
                         / greatest(sum(p.n_grams), 1) + 1e-9, 4)
                     AS novelty_rate,
                   sum(CASE WHEN p.n_novel * 5 < p.n_grams
                            THEN 1 ELSE 0 END)::BIGINT AS low_novelty_docs
            FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
            GROUP BY d.source""",
        "gram_novelty_docs": r"""
            -- per-doc k-gram novelty: fraction of the doc's DISTINCT
            -- word-3-grams whose min-doc_id first appearance is the doc
            -- itself (same gram convention as the jaccard family)
            WITH g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) < 3
                       THEN [list_aggregate(w, 'string_agg', ' ')]
                       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN generate_series(1, len(w)-2)]
                     END) AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS w
                    FROM documents)
            ), x AS (
              SELECT doc_id, unnest(grams) AS gram FROM g
            ), firsts AS (
              SELECT gram, min(doc_id) AS first_doc FROM x GROUP BY gram
            ), novel AS (
              SELECT first_doc AS doc_id, count(*) AS n_novel
              FROM firsts GROUP BY first_doc
            ), sizes AS (
              SELECT doc_id, count(*) AS n_grams FROM x GROUP BY doc_id
            )
            SELECT s.doc_id,
                   s.n_grams,
                   coalesce(n.n_novel, 0) AS n_novel,
                   round(coalesce(n.n_novel, 0)::DOUBLE
                         / greatest(s.n_grams, 1) + 1e-9, 4) AS novelty
            FROM sizes s LEFT JOIN novel n ON n.doc_id = s.doc_id""",
        "leakage_safe_split_docs": r"""
            -- leakage-safe split: the jaccard transitive closure gives
            -- each doc its cluster id (singletons: own doc_id), then the
            -- Knuth multiplicative hash of the CLUSTER picks the split.
            -- HUGEINT product mod 2^32 == the engine's wrapping uint64
            -- multiply mod 2^32; literals 0.8/0.9 are bit-equal to the
            -- engine's 1.0-0.1-0.1 / 1.0-0.1 doubles.
            WITH RECURSIVE g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) < 3
                       THEN [list_aggregate(w, 'string_agg', ' ')]
                       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN generate_series(1, len(w)-2)]
                     END) AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS w
                    FROM documents)
            ), p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM g a JOIN g b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
                    / nullif(len(list_distinct(a.grams || b.grams)), 0) >= 0.5
            ), e AS (
              SELECT id_a AS u, id_b AS v FROM p
              UNION SELECT id_b, id_a FROM p
            ), reach(n, x) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM e)
              UNION
              SELECT r.n, e.v FROM reach r JOIN e ON e.u = r.x
            ), lbl AS (
              SELECT n AS node, min(x) AS comp FROM reach GROUP BY n
            ), asg AS (
              SELECT d.doc_id,
                     coalesce(l.comp, d.doc_id) AS comp
              FROM documents d LEFT JOIN lbl l ON l.node = d.doc_id
            )
            SELECT doc_id,
                   CASE WHEN u < 0.8 THEN 'train'
                        WHEN u < 0.9 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ((comp::HUGEINT * 2654435761) % 4294967296)::DOUBLE
                           / 4294967296.0 AS u
                  FROM asg)""",
        "containment_dedup_docs": r"""
            -- corpus dedup with TRANSITIVE closure under containment:
            -- clusters connected by inter/min >= 0.6 keep their min id
            WITH RECURSIVE g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) < 3
                       THEN [list_aggregate(w, 'string_agg', ' ')]
                       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN generate_series(1, len(w)-2)]
                     END) AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS w
                    FROM documents)
            ), p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM g a JOIN g b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
                    / nullif(least(len(a.grams), len(b.grams)), 0) >= 0.6
            ), e AS (
              SELECT id_a AS u, id_b AS v FROM p
              UNION SELECT id_b, id_a FROM p
            ), reach(n, x) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM e)
              UNION
              SELECT r.n, e.v FROM reach r JOIN e ON e.u = r.x
            ), lbl AS (
              SELECT n AS node, min(x) AS comp FROM reach GROUP BY n
            )
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT node FROM lbl WHERE comp < node)""",
        "normalized_exact_dedup": r"""
            SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))""",
        "crossmodal_dedup_docs": r"""
            -- transitive closure over the UNION of both modalities'
            -- near-dup relations (text jaccard OR embedding cosine)
            WITH RECURSIVE g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(w) < 3
                       THEN [list_aggregate(w, 'string_agg', ' ')]
                       ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             FOR i IN generate_series(1, len(w)-2)]
                     END) AS grams
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(lower(text), '\W+'),
                                       x -> x <> '') AS w
                    FROM documents)
            ), p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM g a JOIN g b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
                    / nullif(len(list_distinct(a.grams || b.grams)), 0) >= 0.5
              UNION
              SELECT a.vec_id, b.vec_id
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
            ), e AS (
              SELECT id_a AS u, id_b AS v FROM p
              UNION SELECT id_b, id_a FROM p
            ), reach(n, x) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM e)
              UNION
              SELECT r.n, e.v FROM reach r JOIN e ON e.u = r.x
            ), lbl AS (
              SELECT n AS node, min(x) AS comp FROM reach GROUP BY n
            )
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT node FROM lbl WHERE comp < node)""",
        "embedding_near_dup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4""",
        # the IVF path emits only exact-cosine-verified pairs, and at
        # n_probe=6/16 the multi-probe cell assignment catches every
        # qualifying pair on this corpus (recall 1.0 vs the exact
        # operator, verified) — identical SQL is therefore a hard oracle
        "embedding_near_dup_ivf": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4""",
        "knn_topk": """
            SELECT vec_id FROM embeddings WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(
                embedding,
                (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id
            LIMIT 10""",
        "knn_multi": """
            SELECT q.vec_id AS query_id, e.vec_id
            FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
            WHERE q.vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5)
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                         e.vec_id) <= 5""",
        "value_quantiles": """
            SELECT q, round(v, 4) AS value FROM (
                SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
                       unnest(quantile_cont(value, [0.25, 0.5, 0.75, 0.9, 0.99])) AS v
                FROM events)""",
        "user_session_rows": """
            WITH flags AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (
                              PARTITION BY user_id ORDER BY ts, event_id)
                              > INTERVAL 60 MINUTE
                          THEN 1 ELSE 0 END AS brk, event_id
              FROM events
            ), sess AS (
              SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_idx
              FROM flags
            )
            SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                   count(*) AS n_events,
                   min(ts) AS start_ts, max(ts) AS end_ts
            FROM sess GROUP BY user_id, session_idx""",
        "user_sessions": """
            SELECT user_id, count(*) AS n_events,
                   CAST(1 + COALESCE(sum(CASE WHEN gap THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_sessions
            FROM (
                SELECT user_id,
                       ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                           > INTERVAL 60 MINUTE AS gap
                FROM events
            ) GROUP BY user_id""",
    }
    # The MinHash family earns the EXACT operators' oracles (VERDICT r2
    # item 3): every LSH candidate is exact-Jaccard-verified, so emitted
    # pairs are always a subset of the prefix-filter join's; on the
    # driver corpus the 16x4 banding's measured recall is 1.0, making
    # the outputs EQUAL — asserted in
    # tests/test_dedup_simsearch.py::test_minhash_family_equals_exact
    # so any fixture or kernel drift trips the suite before the driver.
    out["minhash_near_dup"] = out["ngram_jaccard_pairs"]
    out["minhash_dedup_docs"] = out["jaccard_dedup_docs"]
    # curation -> chunking composition: extend the curate CTE chain with
    # the chunker's generate_series + list_slice logic over survivors
    out["curate_chunk_corpus"] = out["curate_text_corpus"].replace(
        "SELECT min(doc_id) AS doc_id FROM surv GROUP BY text",
        r"""SELECT doc_id,
                   CAST(start / 12 AS BIGINT) AS chunk_id,
                   CAST(len(list_slice(toks, start + 1, start + 24))
                        AS BIGINT) AS n_chunk_tokens,
                   list_aggregate(list_slice(toks, start + 1, start + 24),
                                  'string_agg', ' ') AS chunk_text
            FROM (
              SELECT doc_id, toks, unnest(range(0, len(toks), 12)) AS start
              FROM (
                SELECT k.doc_id,
                       string_split_regex(trim(d.text), '\s+') AS toks
                FROM (SELECT min(doc_id) AS doc_id FROM surv GROUP BY text) k
                JOIN documents d USING (doc_id)
              )
            )""",
    )
    return out
