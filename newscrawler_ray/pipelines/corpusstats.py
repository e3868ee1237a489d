"""Corpus-level text statistics (training-data curation ops that need a
cross-document exchange, unlike the per-doc stages in textstats.py).

  dup_span_docs   — per-doc fraction of k-word spans duplicated anywhere
                    in the corpus (the exact-substring-dedup signal of
                    Lee et al. 2021, "Deduplicating Training Data Makes
                    Language Models Better", expressed over word k-grams)
  tfidf_top_terms — exact corpus TF-IDF, top-k terms per document

Scale shapes: dup_span_docs ships pre-aggregated (span_hash, doc_id,
cnt) rows into ONE coarse-partition groupby (~4P Python calls total,
segment sums inside — the same pattern as the LSH bucket stages), then a
tiny (doc_id, counters) union+sum; no joins, nothing on the driver.
tfidf_top_terms exchanges (doc_id, term, tf) rows twice (term-keyed df
join, doc-keyed top-k) — inherent to exact TF-IDF; both sides of every
exchange are pre-aggregated per batch.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import splitmix64, tokenize_word_hashes
from ..functions.io import read_clean

_I64 = pa.int64()
_U64 = np.uint64


def _p(sf_dir: str, table: str) -> str:
    return str(Path(sf_dir) / f"{table}.parquet")


def _nparts(num_partitions: int | None) -> int:
    if num_partitions is not None:
        return num_partitions
    return max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)


# ------------------------------------------------------- duplicate spans


def _span_hashes(
    texts, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(span_hash uint64, doc index per span, n_words per doc) for all
    k-word spans of an Arrow string batch. Docs with fewer than k words
    contribute zero spans (SQL-oracle convention: a k-gram window needs
    k words). Chained splitmix mixing, vectorized over the whole batch;
    spans crossing a doc boundary are masked out."""
    flat, offsets = tokenize_word_hashes(texts)
    lens = np.diff(offsets)
    n_docs = len(lens)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    total = len(flat)
    if total < k:
        return (
            np.empty(0, dtype=_U64),
            np.empty(0, dtype=np.int64),
            lens,
        )
    m = total - k + 1
    acc = flat[:m].copy()
    for j in range(1, k):
        acc = splitmix64(acc) ^ flat[j : j + m]
    acc = splitmix64(acc)
    valid = doc_of[:m] == doc_of[k - 1 :]
    return acc[valid], doc_of[:m][valid], lens


def _word_counts(texts) -> np.ndarray:
    """Non-empty-token count per doc under the shared ``\\W+`` tokenizer
    — the counting half of ``tokenize_word_hashes`` without the hash
    chain (the totals pass of dup_span_docs needs only the counts)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    lists = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(texts, "")), r"\W+"
    )
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offs = lists.offsets.to_numpy()
    flat = lists.values.slice(offs[0], offs[-1] - offs[0])
    keep = pc.not_equal(pc.binary_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
    return np.bincount(doc_of[keep_np], minlength=n_docs)


def dup_span_docs(
    sf_dir: str,
    *,
    k: int = 8,
    num_partitions: int | None = None,
    docs: rd.Dataset | None = None,
) -> rd.Dataset:
    """Per-document duplicated-span statistics: a k-word span is
    "duplicated" iff its k-gram occurs >= 2 times in the WHOLE corpus
    (including repeats inside one doc) — the signal exact-substring
    training-data dedup (Lee et al. 2021) removes, rebuilt over word
    k-grams so a DuckDB window oracle can recompute it exactly.

    Output: (doc_id, n_spans, dup_spans, dup_span_frac) for every doc;
    n_spans = max(n_words - k + 1, 0).

    Pipeline: map_batches emits per-batch pre-aggregated
    (part, span_hash, doc_id, cnt) rows -> groupby(part) with ~4P coarse
    partitions (hash-sharded; segment sums find runs with corpus total
    >= 2 and fold the duplicated counts per doc inside the part) ->
    union with the per-doc span totals -> ONE groupby(doc_id) sum. No
    joins, no driver-side state; every exchanged row is a few int64s.
    Duplicate detection by 64-bit hash == by string w.h.p. (string-based
    SQL parity asserted at sf0.01 in tests).
    """
    nparts = _nparts(num_partitions)
    coarse = nparts * 4
    if docs is None:
        docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def span_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        h, hdoc, _ = _span_hashes(batch.column("text"), k)
        if len(h) == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "h": pa.array([], _I64),
                    "doc_id": pa.array([], _I64),
                    "cnt": pa.array([], _I64),
                }
            )
        # pre-aggregate (hash, doc) occurrence counts within the batch
        order = np.lexsort((hdoc, h))
        hs, ds_ = h[order], hdoc[order]
        new = np.empty(len(hs), dtype=bool)
        new[0] = True
        new[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(hs)))
        hu, du = hs[starts], ids[ds_[starts]]
        return pa.table(
            {
                "part": pa.array((hu % _U64(coarse)).astype(np.int32)),
                "h": pa.array(hu.view(np.int64)),
                "doc_id": pa.array(du, _I64),
                "cnt": pa.array(cnt, _I64),
            }
        )

    rows = docs.map_batches(span_rows, batch_format="pyarrow")

    def coarse_dups(group: pa.Table) -> pa.Table:
        # one Python call per coarse part; exact per-hash totals via
        # segment sums over the sorted run structure
        h = group.column("h").to_numpy()
        d = group.column("doc_id").to_numpy()
        c = group.column("cnt").to_numpy()
        order = np.argsort(h, kind="stable")
        hs, ds_, cs = h[order], d[order], c[order]
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        totals = np.add.reduceat(cs, starts)
        dup_run = totals >= 2
        keep = np.repeat(dup_run, np.diff(np.append(starts, len(hs))))
        kd, kc = ds_[keep], cs[keep]
        if len(kd) == 0:
            return pa.table(
                {"doc_id": pa.array([], _I64),
                 "n_spans": pa.array([], _I64),
                 "dup_spans": pa.array([], _I64)}
            )
        # fold per doc inside the part before the final doc-keyed sum
        dorder = np.argsort(kd, kind="stable")
        kd, kc = kd[dorder], kc[dorder]
        dstarts = np.flatnonzero(np.r_[True, kd[1:] != kd[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(kd[dstarts], _I64),
                "n_spans": pa.array(
                    np.zeros(len(dstarts), dtype=np.int64), _I64
                ),
                "dup_spans": pa.array(np.add.reduceat(kc, dstarts), _I64),
            }
        )

    dups = rows.groupby("part").map_groups(coarse_dups, batch_format="pyarrow")

    def totals_rows(batch: pa.Table) -> pa.Table:
        lens = _word_counts(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_spans": pa.array(np.maximum(lens - k + 1, 0), _I64),
                "dup_spans": pa.array(np.zeros(len(lens), np.int64), _I64),
            }
        )

    totals = docs.map_batches(totals_rows, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    merged = totals.union(dups).groupby("doc_id").aggregate(
        Sum("n_spans", alias_name="n_spans"),
        Sum("dup_spans", alias_name="dup_spans"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], _I64),
                    "n_spans": pa.array([], _I64),
                    "dup_spans": pa.array([], _I64),
                    "dup_span_frac": pa.array([], pa.float64()),
                }
            )
        ns = batch.column("n_spans").to_numpy().astype(np.int64)
        dup = batch.column("dup_spans").to_numpy().astype(np.int64)
        # +1e-9 pre-round: tie-free vs DuckDB (see textstats.quality_score)
        frac = np.round(dup / np.maximum(ns, 1) + 1e-9, 4)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_spans": pa.array(ns, _I64),
                "dup_spans": pa.array(dup, _I64),
                "dup_span_frac": pa.array(frac, pa.float64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------- tf-idf


def tfidf_top_terms(
    sf_dir: str,
    *,
    top_k: int = 5,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Exact corpus TF-IDF with the top-k highest-scoring terms per doc:
    score = tf * ln(N / df), ranked per doc by (rounded score DESC, term
    ASC). Output: (doc_id, term, tf, df, score).

    Shape: per-batch Arrow group_by pre-computes final (doc_id, term,
    tf) rows (docs never span batches) -> groupby(term) counts df ->
    term-keyed hash join of df onto the tf rows -> coarse doc-keyed
    groupby (doc_id % 4P parts, ONE Python call per part, vectorized
    pandas rank inside) takes the per-doc top-k. Both exchanges move
    only (doc_id, term, tf[, df]) rows; exact TF-IDF inherently
    shuffles the term-frequency table — there is no smaller exchange.
    """
    nparts = _nparts(num_partitions)
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = float(docs.count())

    def tf_rows(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column("text"), "")
        lists = pc.split_pattern_regex(pc.utf8_lower(texts), r"\W+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offs = lists.offsets.to_numpy()
        flat = lists.values.slice(offs[0], offs[-1] - offs[0])
        keep = pc.not_equal(pc.binary_length(flat), 0)
        keep_np = keep.to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy()
        doc_of = np.repeat(ids, np.diff(offs))[keep_np]
        t = pa.table(
            {"doc_id": pa.array(doc_of, _I64), "term": flat.filter(keep)}
        )
        agg = t.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return agg.rename_columns(["doc_id", "term", "tf"])

    # tf feeds BOTH the df aggregate and the join probe side; without a
    # checkpoint, lineage re-runs the read+tokenize once per consumer.
    # The (doc, term, tf) table is the compacted term index — far
    # smaller than the text input — so materializing it here is the
    # cheap side of the trade at any scale (it spills, never the driver)
    tf = docs.map_batches(tf_rows, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Count

    df = tf.groupby("term").aggregate(Count(alias_name="df"))
    # hash-shuffle outputs carry 0-column blocks for empty partitions,
    # which acero rejects as a join side at high partition counts
    # (round-2 jaccard_dedup_docs regression class) — repartition first
    df = df.repartition(nparts)
    joined = tf.join(
        df, join_type="inner", num_partitions=nparts, on=("term",)
    )

    def route(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], _I64),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], _I64),
                    "df": pa.array([], _I64),
                    "part": pa.array([], pa.int32()),
                }
            )
        ids = batch.column("doc_id").to_numpy()
        part = (ids % (nparts * 4)).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    routed = joined.map_batches(route, batch_format="pyarrow")

    def topk(group):
        import pandas as pd  # noqa: F401 — map_groups pandas API

        g = group.copy()
        g["score"] = np.round(
            g["tf"].to_numpy(np.float64)
            * np.log(n_docs / g["df"].to_numpy(np.float64))
            + 1e-9,  # tie-free pre-round nudge (see CLAUDE.md)
            4,
        )
        g = g.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True]
        )
        g = g.groupby("doc_id", sort=False).head(top_k)
        return g[["doc_id", "term", "tf", "df", "score"]]

    return routed.groupby("part").map_groups(topk, batch_format="pandas")


# ------------------------------------------------------- decontamination


def _bench_gram_set(docs: rd.Dataset, k: int, bench_mod: int) -> np.ndarray:
    """Sorted int64 k-gram hash set of the benchmark slice
    (``doc_id % bench_mod == 0``) — small by construction (real eval
    sets are megabytes), so collecting it for a ``ray.put`` broadcast is
    the intended shape."""
    bench = docs.filter(lambda row: row["doc_id"] % bench_mod == 0)

    def bench_grams(batch: pa.Table) -> pa.Table:
        h, _, _ = _span_hashes(batch.column("text"), k)
        return pa.table({"h": pa.array(np.unique(h).view(np.int64))})

    parts = [
        b.column("h").to_numpy()
        for b in bench.map_batches(bench_grams, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    return np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)


def benchmark_contamination_docs(
    sf_dir: str,
    *,
    k: int = 8,
    bench_mod: int = 97,
) -> rd.Dataset:
    """Benchmark decontamination (the GPT-3/PaLM training-data hygiene
    pass: drop training docs that share an n-gram with an eval set).
    The "benchmark" here is the deterministic corpus slice
    ``doc_id % bench_mod == 0`` (~1%); every other doc is scanned for
    k-word spans whose k-gram appears anywhere in the benchmark.

    Output (non-benchmark docs only): (doc_id, n_spans, n_hits,
    contaminated) where n_hits counts span positions matching the
    benchmark gram set and contaminated = 1 iff n_hits > 0.

    Scale shape: real eval benchmarks are megabytes against a 100 TB
    corpus, so the gram set is the canonical broadcast-small-side case —
    collected once as a SORTED uint64 array, shipped via ``ray.put``,
    membership per batch is one vectorized ``searchsorted``. The corpus
    side streams; no shuffle at all.
    """
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    ref = ray.put(_bench_gram_set(docs, k, bench_mod))

    def scan(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        ids = batch.column("doc_id").to_numpy()
        keep = ids % bench_mod != 0
        sub = batch.filter(pa.array(keep))
        sids = sub.column("doc_id").to_numpy()
        h, hdoc, lens = _span_hashes(sub.column("text"), k)
        n_spans = np.maximum(lens - k + 1, 0)
        hits = np.zeros(len(sids), dtype=np.int64)
        if len(h) and len(grams):
            hs = h.view(np.int64)
            pos = np.searchsorted(grams, hs)
            pos = np.minimum(pos, len(grams) - 1)
            is_hit = grams[pos] == hs
            hits[:] = np.bincount(
                hdoc, weights=is_hit, minlength=len(sids)
            ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(sids, _I64),
                "n_spans": pa.array(n_spans, _I64),
                "n_hits": pa.array(hits, _I64),
                "contaminated": pa.array((hits > 0).astype(np.int64), _I64),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow")


# ------------------------------------------------------- mixture weights


def source_mix_weights(sf_dir: str) -> pa.Table:
    """Temperature-scaled sampling weights per source for pretraining
    mixtures (the GPT-3 / XLM-R data-mixing rule: p_s ∝ share_s^alpha
    with alpha=0.5, i.e. sqrt-damped so small sources are upsampled).

    Output: (source, n_docs, n_tokens, token_share, weight), weights
    summing to 1. Per-batch token counts fold into per-batch partial
    sums, one tiny groupby(source) — the final weight normalization
    runs on the k-limited (#sources) result, the canonical
    small-collect. sqrt (not pow) on both sides: IEEE-correctly-rounded
    in numpy and DuckDB alike, so parity is exact.
    """
    docs = read_clean(_p(sf_dir, "documents"), columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        lens = _word_counts(batch.column("text"))
        t = pa.table(
            {
                "source": batch.column("source"),
                "n_tokens": pa.array(lens, _I64),
            }
        )
        return (
            t.group_by(["source"])
            .aggregate([("n_tokens", "sum"), ([], "count_all")])
            .rename_columns(["source", "n_tokens", "n_docs"])
        )

    from ray.data.aggregate import Sum

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
    )
    t = pa.concat_tables(
        [b for b in agg.iter_batches(batch_format="pyarrow") if b.num_rows]
    ).combine_chunks()
    t = t.sort_by("source")
    n_tokens = t.column("n_tokens").to_numpy().astype(np.float64)
    share = n_tokens / n_tokens.sum()
    damped = np.sqrt(share)
    weight = damped / damped.sum()
    return pa.table(
        {
            "source": t.column("source"),
            "n_docs": t.column("n_docs"),
            "n_tokens": t.column("n_tokens"),
            "token_share": pa.array(
                np.round(share + 1e-9, 4), pa.float64()
            ),
            "weight": pa.array(np.round(weight + 1e-9, 4), pa.float64()),
        }
    )


# ------------------------------------------------------ unigram LM score


def _unigram_model(
    docs: rd.Dataset,
) -> tuple[np.ndarray, np.ndarray, float]:
    """(sorted word-hash array, matching float64 counts, total token
    count): the corpus unigram LM, built from per-batch partial counts
    folded by one hash-keyed groupby. Model-sized (Heaps' law), so the
    driver collect + ``ray.put`` broadcast is the intended shape."""

    def count_rows(batch: pa.Table) -> pa.Table:
        flat, _ = tokenize_word_hashes(batch.column("text"))
        if len(flat) == 0:
            return pa.table(
                {"h": pa.array([], _I64), "cnt": pa.array([], _I64)}
            )
        hu, cnt = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "h": pa.array(hu.view(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64), _I64),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        docs.map_batches(count_rows, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    hs, cs = [], []
    for b in agg.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            hs.append(b.column("h").to_numpy())
            cs.append(b.column("cnt").to_numpy())
    if hs:
        h_all = np.concatenate(hs)
        c_all = np.concatenate(cs).astype(np.float64)
        order = np.argsort(h_all)
        h_all, c_all = h_all[order], c_all[order]
    else:
        h_all = np.empty(0, np.int64)
        c_all = np.empty(0, np.float64)
    return h_all, c_all, float(c_all.sum())


def unigram_logprob_docs(sf_dir: str) -> rd.Dataset:
    """Model-based quality scoring, CCNet-style: score every doc by the
    mean negative log-likelihood under a corpus-trained unigram language
    model (the cheap stand-in for CCNet's KenLM perplexity filter —
    docs full of rare words score high, formulaic docs score low).

    Output: (doc_id, n_words, mean_nll) with
    mean_nll = (1/n) * sum ln(T / count(w_i)), T = corpus token count.

    Shape: per-batch partial (word_hash, cnt) counts -> one
    groupby(hash) sum -> the model ships as a SORTED (hash, count)
    numpy bundle via ``ray.put`` (a unigram LM is model-sized, not
    corpus-sized — Heaps' law keeps real vocabularies in the 10^6-10^7
    range, a ~100 MB broadcast at worst; were the vocab ever
    corpus-sized, the tfidf-style term join is the drop-in escape) ->
    scoring is one streaming map_batches with a vectorized searchsorted
    lookup. String-based SQL parity asserted at sf0.01 in tests.
    """
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    h_all, c_all, total = _unigram_model(docs)
    ref = ray.put((h_all, c_all))  # resolved zero-copy in every task

    def score(batch: pa.Table) -> pa.Table:
        model_h, model_c = ray.get(ref)
        flat, offsets = tokenize_word_hashes(batch.column("text"))
        lens = np.diff(offsets)
        n_docs = batch.num_rows
        nll_sum = np.zeros(n_docs, dtype=np.float64)
        if len(flat) and len(model_h):
            hs64 = flat.view(np.int64)
            pos = np.searchsorted(model_h, hs64)
            pos = np.minimum(pos, len(model_h) - 1)
            # every corpus word IS in the corpus model; the guard only
            # matters if scoring foreign text against this model
            c = np.where(model_h[pos] == hs64, model_c[pos], 1.0)
            nll = np.log(total / c)
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            nll_sum[:] = np.bincount(doc_of, weights=nll, minlength=n_docs)
        mean_nll = np.round(nll_sum / np.maximum(lens, 1) + 1e-9, 4)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(lens, _I64),
                "mean_nll": pa.array(mean_nll, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


# ------------------------------------------------------ bigram LM score


def _bigram_rows(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(bigram key uint64, left-word hash uint64, doc index per bigram,
    words-per-doc) for an Arrow string batch — adjacent word pairs
    within docs, vectorized over the whole batch (pairs crossing a doc
    boundary are masked out). The key is a splitmix chain of the two
    word hashes, the same construction as ``shingle_hashes(k=2)``."""
    flat, offsets = tokenize_word_hashes(texts)
    lens = np.diff(offsets)
    n = len(flat)
    if n < 2:
        e = np.empty(0, _U64)
        return e, e, np.empty(0, np.int64), lens
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    same = doc_of[:-1] == doc_of[1:]
    left = flat[:-1][same]
    key = splitmix64(splitmix64(left) ^ flat[1:][same])
    return key, left, doc_of[:-1][same], lens


def _bigram_model(
    docs: rd.Dataset, *, cap: int = 4_000_000
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted bigram-key array, float64 counts): corpus bigram counts
    via per-batch partials + one hash groupby — ``_unigram_model``'s
    shape one order up, with the df-map driver discipline because the
    bigram vocabulary grows faster than the unigram one:

    - count-1 bigrams are NEVER shipped — the scoring fallback count
      (1.0) IS their true count, so dropping them is exact, and on
      natural corpora they are most of the tail (Zipf);
    - of the rest, a running top-``cap`` trim bounds driver memory at
      2*cap rows; the stream is post-groupby (each key arrives once,
      final), so the trim is an exact selection, and only keys beyond
      the cap score approximately (their count reads as 1). Below the
      cap — every sandbox run — the model is EXACT."""

    def count_rows(batch: pa.Table) -> pa.Table:
        key, _, _, _ = _bigram_rows(batch.column("text"))
        if len(key) == 0:
            return pa.table({"h": pa.array([], _I64), "cnt": pa.array([], _I64)})
        hu, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "h": pa.array(hu.view(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64), _I64),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        docs.map_batches(count_rows, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    h_all = np.empty(0, np.int64)
    c_all = np.empty(0, np.int64)
    for b in agg.iter_batches(batch_format="pyarrow"):
        if not b.num_rows:
            continue
        c = b.column("cnt").to_numpy().astype(np.int64)
        keep = c >= 2  # count-1 drop is exact (see docstring)
        h_all = np.concatenate([h_all, b.column("h").to_numpy()[keep]])
        c_all = np.concatenate([c_all, c[keep]])
        if len(h_all) > 2 * cap:  # running exact top-cap trim
            top = np.argpartition(-c_all, cap - 1)[:cap]
            h_all, c_all = h_all[top], c_all[top]
    if len(h_all) > cap:
        top = np.argpartition(-c_all, cap - 1)[:cap]
        h_all, c_all = h_all[top], c_all[top]
    order = np.argsort(h_all)
    return h_all[order], c_all[order].astype(np.float64)


def bigram_logprob_docs(sf_dir: str) -> rd.Dataset:
    """Bigram-LM quality scoring — the next rung up from
    ``unigram_logprob_docs`` toward CCNet's KenLM filter: score every
    doc by its mean NLL under the corpus-trained bigram model,
    NLL = ln(T / c(w_1)) + Σ_{i>=2} ln(c(w_{i-1}) / c(w_{i-1}, w_i)),
    mean over n words. Formulaic word sequences (high bigram counts)
    score low; unusual transitions score high — a sharper signal than
    unigram rarity because it sees ORDER.

    Output: (doc_id, n_words, mean_nll). Both models ship as sorted
    (hash, count) numpy bundles via ``ray.put`` (model-sized, see
    ``unigram_logprob_docs``); scoring is one streaming map with two
    vectorized searchsorted lookups. Trained on the corpus it scores,
    every bigram is in the model — no backoff term fires (the guard
    only matters for foreign text). String-based SQL parity (lead()
    window bigrams) checked by the driver at sf0.01."""
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    uh, uc, total = _unigram_model(docs)
    bh, bc = _bigram_model(docs)
    ref = ray.put((uh, uc, bh, bc))

    def _lookup(model_h: np.ndarray, model_c: np.ndarray, keys64: np.ndarray):
        # empty model / missing key both score count 1.0 (exact for the
        # count-1 entries _bigram_model drops; backoff guard otherwise)
        if len(model_h) == 0:
            return np.ones(len(keys64), np.float64)
        pos = np.minimum(np.searchsorted(model_h, keys64), len(model_h) - 1)
        return np.where(model_h[pos] == keys64, model_c[pos], 1.0)

    def score(batch: pa.Table) -> pa.Table:
        model_uh, model_uc, model_bh, model_bc = ray.get(ref)
        key, left, bdoc, lens = _bigram_rows(batch.column("text"))
        flat, offsets = tokenize_word_hashes(batch.column("text"))
        n_docs = batch.num_rows
        nll_sum = np.zeros(n_docs, dtype=np.float64)
        if len(flat) and len(model_uh):
            # first word of each non-empty doc: unigram NLL
            first_pos = offsets[:-1][lens > 0]
            cu = _lookup(model_uh, model_uc, flat[first_pos].view(np.int64))
            nll_sum[lens > 0] = np.log(total / cu)
        if len(key):
            c_left = _lookup(model_uh, model_uc, left.view(np.int64))
            c_bi = _lookup(model_bh, model_bc, key.view(np.int64))
            nll = np.log(c_left / c_bi)
            nll_sum += np.bincount(bdoc, weights=nll, minlength=n_docs)
        mean_nll = np.round(nll_sum / np.maximum(lens, 1) + 1e-9, 4)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(lens, _I64),
                "mean_nll": pa.array(mean_nll, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


# --------------------------------------- interpolated Kneser-Ney trigram


def _chain2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive uint64 pair key (same chain as ``_bigram_rows``)."""
    return splitmix64(splitmix64(a) ^ b)


def _trigram_rows(texts):
    """Per-batch trigram events: (k3, k12, k23, w2, w3, doc_of, lens)
    where k3 keys the trigram, k12 the left-context bigram, k23 the
    continuation bigram, w2/w3 the word hashes — everything a KN lookup
    needs, all uint64, vectorized (events crossing doc boundaries are
    masked)."""
    flat, offsets = tokenize_word_hashes(texts)
    lens = np.diff(offsets)
    n = len(flat)
    if n < 3:
        e = np.empty(0, _U64)
        return e, e, e, e, e, np.empty(0, np.int64), lens
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    m = doc_of[:-2] == doc_of[2:]
    h1, h2, h3 = flat[:-2][m], flat[1:-1][m], flat[2:][m]
    k12 = _chain2(h1, h2)
    k23 = _chain2(h2, h3)
    k3 = splitmix64(k12 ^ h3)
    return k3, k12, k23, h2, h3, doc_of[:-2][m], lens


def _collect_kinded_counts(
    agg: rd.Dataset, cap: int
) -> "tuple[dict[str, np.ndarray], dict[str, np.ndarray]]":
    """Split the tagged (kind, h, cnt, a..d) post-groupby stream into the
    trigram (kind 0) and bigram (kind 1) type tables, each folded with
    the running top-``cap`` trim and returned sorted by ``h`` (same
    discipline as the word-count fold in ``tokenizer.py`` — the stream
    is post-groupby, so each (kind, h) arrives exactly once, final)."""
    raw = ("h", "cnt", "a", "b", "c", "d")
    acc: "list[dict[str, np.ndarray] | None]" = [None, None]

    def _trim(arrs, k):
        top = np.argpartition(-arrs["cnt"], k - 1)[:k]
        return {c: v[top] for c, v in arrs.items()}

    for bt in agg.iter_batches(batch_format="pyarrow"):
        if not bt.num_rows:
            continue
        kind = bt.column("kind").to_numpy()
        for ki in (0, 1):
            m = kind == ki
            if not m.any():
                continue
            part = {c: bt.column(c).to_numpy()[m] for c in raw}
            cur = acc[ki]
            acc[ki] = (
                part
                if cur is None
                else {c: np.concatenate([cur[c], part[c]]) for c in raw}
            )
            if len(acc[ki]["h"]) > 2 * cap:
                acc[ki] = _trim(acc[ki], cap)
    out = []
    for ki in (0, 1):
        cur = acc[ki]
        if cur is None:
            cur = {c: np.empty(0, np.int64) for c in raw}
        elif len(cur["h"]) > cap:
            cur = _trim(cur, cap)
        order = np.argsort(cur["h"])
        out.append({c: v[order] for c, v in cur.items()})
    T = {
        "h": out[0]["h"], "cnt": out[0]["cnt"], "k12": out[0]["a"],
        "k23": out[0]["b"], "w2": out[0]["c"], "w3": out[0]["d"],
    }
    B = {"h": out[1]["h"], "cnt": out[1]["cnt"], "l": out[1]["a"],
         "r": out[1]["b"]}
    return T, B


def _sorted_lookup(h: np.ndarray, v: np.ndarray, keys: np.ndarray, default=1.0):
    """Vectorized value lookup in a sorted (h, v) table; misses read
    ``default``."""
    if len(h) == 0:
        return np.full(len(keys), default, np.float64)
    pos = np.minimum(np.searchsorted(h, keys), len(h) - 1)
    return np.where(h[pos] == keys, v[pos].astype(np.float64), default)


def kneser_ney_logprob_docs(
    sf_dir: str, *, discount: float = 0.75, cap: int = 8_000_000
) -> rd.Dataset:
    """Interpolated Kneser-Ney trigram scoring (Chen & Goodman 1999) —
    the CCNet-grade perplexity filter the unigram/bigram rungs build
    toward: per doc, the mean NLL of its trigram events under

        P(w3|w1 w2) = max(c3-D,0)/c2 + D*N1+(w1 w2 .)/c2 * Pkn(w3|w2)
        Pkn(w3|w2)  = max(N1+(. w2 w3)-D,0)/N1+(. w2 .)
                      + D*N1+(w2 .)/N1+(. w2 .) * Pcont(w3)
        Pcont(w3)   = N1+(. w3) / N1+(. .)

    (D = ``discount``; N1+ are distinct-context continuation counts —
    the KN signature that "francisco" scores low as a continuation no
    matter how frequent "san francisco" is).

    Output: (doc_id, n_words, n_trigrams, mean_nll); docs with < 3
    words have no events and score 0. Scoring covers positions 3..n
    (full-context events only).

    Shape: ONE distributed count pass (a single tokenize scan emits
    BOTH trigram and bigram type partials, tagged by kind, into one
    ``groupby(kind, h)``; component keys ride along as Min aggregates —
    they are pure functions of the group key), so the operator reads the
    corpus exactly twice: counts + score. The type tables are model-sized (Heaps' law one order up
    from bigrams); the driver derives every continuation count from them
    with np.unique folds and broadcasts ONE sorted-array bundle via
    ``ray.put``; scoring is a streaming map with seven searchsorted
    lookups. ``cap`` bounds the driver fold (running exact top-cap trim;
    count-1 trigrams are KEPT — KN's discounting needs them — so above
    the cap the tail reads count 1, exact below it: every sandbox run).
    SQL-exact at sf0.01: the oracle recomputes the same formula from
    string trigram/bigram CTEs (hash identity == string identity w.h.p.,
    the same licence as ``bigram_logprob_docs``)."""
    from ray.data.aggregate import Min, Sum

    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def combined_partial(batch: pa.Table) -> pa.Table:
        """ONE tokenize pass emits BOTH n-gram type partials (tagged by
        ``kind``): trigram rows carry (k12, k23, w2, w3) in (a, b, c, d),
        bigram rows carry (left, right) in (a, b). Sharing the scan cuts
        the operator's corpus reads from 3 to 2 (counts + score) — at
        the 100 TB design point the text scan IS the cost."""
        flat, offsets = tokenize_word_hashes(batch.column("text"))
        lens = np.diff(offsets)
        n = len(flat)
        cols = {c: [] for c in ("kind", "h", "cnt", "a", "b", "c", "d")}
        if n >= 2:
            doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            same2 = doc_of[:-1] == doc_of[1:]
            l2, r2 = flat[:-1][same2], flat[1:][same2]
            k2 = _chain2(l2, r2)
            hu, first, cnt = np.unique(k2, return_index=True, return_counts=True)
            z = np.zeros(len(hu), np.int64)
            cols["kind"].append(np.ones(len(hu), np.int64))
            cols["h"].append(hu.view(np.int64))
            cols["cnt"].append(cnt.astype(np.int64))
            cols["a"].append(l2[first].view(np.int64))
            cols["b"].append(r2[first].view(np.int64))
            cols["c"].append(z)
            cols["d"].append(z)
            if n >= 3:
                same3 = doc_of[:-2] == doc_of[2:]
                h1, h2, h3 = flat[:-2][same3], flat[1:-1][same3], flat[2:][same3]
                k12 = _chain2(h1, h2)
                k23 = _chain2(h2, h3)
                k3 = splitmix64(k12 ^ h3)
                hu, first, cnt = np.unique(
                    k3, return_index=True, return_counts=True
                )
                cols["kind"].append(np.zeros(len(hu), np.int64))
                cols["h"].append(hu.view(np.int64))
                cols["cnt"].append(cnt.astype(np.int64))
                cols["a"].append(k12[first].view(np.int64))
                cols["b"].append(k23[first].view(np.int64))
                cols["c"].append(h2[first].view(np.int64))
                cols["d"].append(h3[first].view(np.int64))
        if not cols["h"]:
            z = pa.array([], _I64)
            return pa.table(
                {c: z for c in ("kind", "h", "cnt", "a", "b", "c", "d")}
            )
        return pa.table(
            {c: pa.array(np.concatenate(v), _I64) for c, v in cols.items()}
        )

    agg = (
        docs.map_batches(combined_partial, batch_format="pyarrow")
        .groupby(["kind", "h"])
        .aggregate(
            Sum("cnt", alias_name="cnt"),
            Min("a", alias_name="a"),
            Min("b", alias_name="b"),
            Min("c", alias_name="c"),
            Min("d", alias_name="d"),
        )
    )
    T, B = _collect_kinded_counts(agg, cap)

    def _unique_counts(keys: np.ndarray):
        if len(keys) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        u, c = np.unique(keys, return_counts=True)
        return u, c.astype(np.float64)

    # continuation tables from the distinct-type tables (driver folds —
    # all model-sized)
    mid1_h, mid1_c = _unique_counts(T["k12"])  # N1+(w1 w2 .)
    cont3_h, cont3_c = _unique_counts(T["k23"])  # N1+(. w2 w3)
    mid2_h, mid2_c = _unique_counts(T["w2"])  # N1+(. w2 .)
    fol_h, fol_c = _unique_counts(B["l"])  # N1+(w2 .)
    cont2_h, cont2_c = _unique_counts(B["r"])  # N1+(. w3)
    n_bigram_types = float(len(B["h"]))  # N1+(. .)
    bundle = ray.put(
        (
            T["h"], T["cnt"].astype(np.float64),
            B["h"], B["cnt"].astype(np.float64),
            mid1_h, mid1_c, cont3_h, cont3_c, mid2_h, mid2_c,
            fol_h, fol_c, cont2_h, cont2_c,
        )
    )
    D = float(discount)

    def score(batch: pa.Table) -> pa.Table:
        (t_h, t_c, b_h, b_c, m1h, m1c, c3h, c3c, m2h, m2c,
         fh, fc, c2h, c2c) = ray.get(bundle)
        k3, k12, k23, w2, w3, doc_of, lens = _trigram_rows(
            batch.column("text")
        )
        n_docs = batch.num_rows
        n_tri = np.maximum(lens - 2, 0)
        nll_sum = np.zeros(n_docs, np.float64)
        if len(k3):
            s = np.int64  # all model keys stored as int64 views
            c3 = _sorted_lookup(t_h, t_c, k3.view(s))
            c2 = _sorted_lookup(b_h, b_c, k12.view(s))
            n_mid1 = _sorted_lookup(m1h, m1c, k12.view(s))
            n_c3 = _sorted_lookup(c3h, c3c, k23.view(s))
            n_mid2 = _sorted_lookup(m2h, m2c, w2.view(s))
            n_fol = _sorted_lookup(fh, fc, w2.view(s))
            n_c2 = _sorted_lookup(c2h, c2c, w3.view(s))
            p_cont = n_c2 / max(n_bigram_types, 1.0)
            p_bi = (
                np.maximum(n_c3 - D, 0.0) / n_mid2
                + D * n_fol / n_mid2 * p_cont
            )
            p = np.maximum(c3 - D, 0.0) / c2 + D * n_mid1 / c2 * p_bi
            nll_sum = np.bincount(
                doc_of, weights=-np.log(p), minlength=n_docs
            )
        mean_nll = np.round(nll_sum / np.maximum(n_tri, 1) + 1e-9, 4)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(lens, _I64),
                "n_trigrams": pa.array(n_tri, _I64),
                "mean_nll": pa.array(mean_nll, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


# -------------------------------------------------- curation composition


def curate_text_corpus(
    sf_dir: str,
    *,
    quality_min: float = 0.55,
    nll_max: float = 3.402,
    contam_k: int = 4,
    bench_mod: int = 31,
) -> rd.Dataset:
    """Flagship text-curation composition (the C4/RefinedWeb recipe, one
    pipeline): a document survives iff it passes the Gopher repetition
    gates AND the composite quality floor AND the unigram-LM rarity cap
    AND carries no benchmark k-gram (decontamination; benchmark docs
    themselves are excluded from the training set) — then exact
    first-wins dedup keeps min(doc_id) per surviving text. Returns the
    surviving doc_ids.

    Shape: two model-sized broadcast builds (benchmark gram set, unigram
    model — each one aggregate), then ONE streaming map over the corpus
    evaluates every gate per batch (reusing the exact per-batch kernels
    the individual operators' SQL oracles verify), and one (hash,
    doc_id) groupby picks dedup winners. Payload text never shuffles.
    Every gate is SQL-expressible, so the WHOLE composition has a hard
    DuckDB oracle — thresholds are compared on the rounded values both
    sides compute identically.
    """
    from ray.data.aggregate import Min

    from ..functions.hashing import word_hashes
    from .dedup import content_hash64
    from .textstats import _LANG_STOPWORDS, quality_batch, repetition_batch

    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    gref = ray.put(_bench_gram_set(docs, contam_k, bench_mod))
    h_all, c_all, total = _unigram_model(docs)
    mref = ray.put((h_all, c_all))
    stop_en = np.sort(word_hashes(sorted(_LANG_STOPWORDS["en"])))

    def survivors(batch: pa.Table) -> pa.Table:
        model_h, model_c = ray.get(mref)
        bench = ray.get(gref)
        ids = batch.column("doc_id").to_numpy()
        n_docs = batch.num_rows
        rep = repetition_batch(batch)
        qual = quality_batch(batch, stop_en).column("quality").to_numpy()
        # unigram mean NLL (same arithmetic as unigram_logprob_docs)
        flat, offsets = tokenize_word_hashes(batch.column("text"))
        lens = np.diff(offsets)
        nll_sum = np.zeros(n_docs, dtype=np.float64)
        if len(flat) and len(model_h):
            hs64 = flat.view(np.int64)
            pos = np.minimum(
                np.searchsorted(model_h, hs64), len(model_h) - 1
            )
            c = np.where(model_h[pos] == hs64, model_c[pos], 1.0)
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            nll_sum[:] = np.bincount(
                doc_of, weights=np.log(total / c), minlength=n_docs
            )
        mean_nll = np.round(nll_sum / np.maximum(lens, 1) + 1e-9, 4)
        # contamination hits (same arithmetic as benchmark_contamination)
        hits = np.zeros(n_docs, dtype=np.int64)
        sh, shdoc, _ = _span_hashes(batch.column("text"), contam_k)
        if len(sh) and len(bench):
            hs64 = sh.view(np.int64)
            pos = np.minimum(np.searchsorted(bench, hs64), len(bench) - 1)
            hits[:] = np.bincount(
                shdoc, weights=bench[pos] == hs64, minlength=n_docs
            ).astype(np.int64)
        keep = (
            (rep.column("keep").to_numpy() == 1)
            & (qual >= quality_min)
            & (mean_nll <= nll_max)
            & (hits == 0)
            & (ids % bench_mod != 0)
        )
        kept = batch.filter(pa.array(keep))
        h = [content_hash64(t) for t in kept.column("text").to_pylist()]
        return pa.table(
            {
                "content_hash": pa.array(h, _I64),
                "doc_id": kept.column("doc_id"),
            }
        )

    cand = docs.map_batches(survivors, batch_format="pyarrow")
    out = cand.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="doc_id")
    )
    return out.select_columns(["doc_id"])


# ---------------------------------------------------- dup-span stripping


def _dup_pos_joined(sf_dir: str, k: int, num_partitions: "int | None"):
    """Shared prefix of the exact-substring transforms: span-position
    rows -> coarse duplicated-position marking -> per-doc position blobs
    -> ONE doc-keyed left join onto the docs. Returns the joined Dataset
    (doc_id, text, dup_pos) — `strip_dup_spans` rebuilds texts from it,
    `dup_span_runs` computes maximal-run stats from it."""
    nparts = _nparts(num_partitions)
    coarse = nparts * 4
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def span_pos_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        h, hdoc, lens = _span_hashes(batch.column("text"), k)
        if len(h) == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()),
                 "h": pa.array([], _I64),
                 "doc_id": pa.array([], _I64),
                 "pos": pa.array([], _I64)}
            )
        # 0-based position of each span within ITS doc
        starts = np.zeros(len(lens), np.int64)
        np.cumsum(np.maximum(lens - k + 1, 0)[:-1], out=starts[1:])
        counts = np.maximum(lens - k + 1, 0)
        pos = (
            np.arange(len(h), dtype=np.int64)
            - np.repeat(starts, counts)
        )
        return pa.table(
            {
                "part": pa.array((h % _U64(coarse)).astype(np.int32)),
                "h": pa.array(h.view(np.int64)),
                "doc_id": pa.array(ids[hdoc], _I64),
                "pos": pa.array(pos, _I64),
            }
        )

    rows = docs.map_batches(span_pos_rows, batch_format="pyarrow")

    def dup_positions(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy()
        d = group.column("doc_id").to_numpy()
        p = group.column("pos").to_numpy()
        order = np.argsort(h, kind="stable")
        hs = h[order]
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        run_len = np.diff(np.append(starts, len(hs)))
        keep = np.repeat(run_len >= 2, run_len)
        kept = order[keep]
        return pa.table(
            {
                "doc_id": pa.array(d[kept], _I64),
                "pos": pa.array(p[kept], _I64),
                "dpart": pa.array(
                    (d[kept] % (coarse)).astype(np.int32)
                ),
            }
        )

    dups = rows.groupby("part").map_groups(dup_positions, batch_format="pyarrow")

    def pos_blobs(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy()
        p = group.column("pos").to_numpy()
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        counts = np.diff(np.append(starts, len(d)))
        offs = np.zeros(len(starts) + 1, np.int32)
        np.cumsum(counts * 8, out=offs[1:])
        blob = pa.Array.from_buffers(
            pa.binary(), len(starts),
            [None, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(np.ascontiguousarray(p).tobytes())],
        )
        return pa.table(
            {"doc_id": pa.array(d[starts], _I64), "dup_pos": blob}
        )

    blobs = (
        dups.groupby("dpart").map_groups(pos_blobs, batch_format="pyarrow")
        .repartition(nparts)  # join-quirk: coalesce 0-col empty blocks
    )

    joined = docs.join(
        blobs, join_type="left_outer", num_partitions=nparts, on=("doc_id",)
    )

    return joined


def strip_dup_spans(
    sf_dir: str,
    *,
    k: int = 8,
    min_words: "int | None" = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Exact-substring dedup as a TRANSFORM (Lee et al. 2021: remove the
    duplicated substrings, keep the rest): every word position covered
    by any corpus-duplicated k-gram window is dropped, and the doc is
    rebuilt from the surviving normalized tokens.

    ``min_words`` (verdict r4 #4, the maximal-span refinement — see
    ``strip_dup_spans_maximal``): when set, duplicated k-gram window
    starts are first extended into MAXIMAL runs (consecutive duplicated
    starts = one duplicated region), and a region is stripped only when
    it covers >= ``min_words`` words — the >=L-token threshold real
    pipelines use (Lee et al. strip >=50-token duplicates). ``None``
    keeps the original strip-every-window behavior, which over-strips
    docs whose maximal duplicated run is shorter than the threshold
    (e.g. a single duplicated 8-gram).

    Output: (doc_id, n_words, n_removed, clean_text) where clean_text
    joins the kept tokens of the shared ``\\W+`` tokenizer with single
    spaces (the normalized token stream, NOT the original byte text —
    the same convention the SQL oracle recomputes with string_agg).

    Shape: span-position rows (part, hash, doc_id, pos) -> coarse
    groupby(part) marks corpus-duplicated positions (segment counts) ->
    coarse groupby(doc part) folds each doc's positions into ONE binary
    blob row -> hash join of the blobs onto the docs -> a final
    streaming map rebuilds each text with a difference-array coverage
    mask. Payload text crosses only the one doc-keyed join; every other
    exchange is int64 rows.
    """
    joined = _dup_pos_joined(sf_dir, k, num_partitions)

    def rebuild(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], _I64),
                 "n_words": pa.array([], _I64),
                 "n_removed": pa.array([], _I64),
                 "clean_text": pa.array([], pa.string())}
            )
        batch = batch.combine_chunks()
        texts = pc.fill_null(batch.column("text"), "")
        lists = pc.split_pattern_regex(pc.utf8_lower(texts), r"\W+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offs = lists.offsets.to_numpy()
        flat = lists.values.slice(offs[0], offs[-1] - offs[0])
        keep_tok = pc.not_equal(pc.binary_length(flat), 0)
        words = flat.filter(keep_tok).to_pylist()
        keep_np = keep_tok.to_numpy(zero_copy_only=False)
        n_docs = batch.num_rows
        doc_raw = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
        lens = np.bincount(doc_raw[keep_np], minlength=n_docs)
        starts = np.zeros(n_docs, np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        # coverage via difference array: +1 at p, -1 at p+k (per doc)
        diff = np.zeros(int(lens.sum()) + 1, np.int64)
        blob_col = batch.column("dup_pos")
        for i in range(n_docs):
            v = blob_col[i].as_py()
            if v is None:
                continue
            p = np.frombuffer(v, dtype=np.int64)
            if len(p) == 0:
                continue
            if min_words is not None:
                # maximal-run extension: consecutive duplicated window
                # starts form one duplicated region [p0, p1+k); strip
                # only regions covering >= min_words words
                brk = np.flatnonzero(np.diff(p) > 1)
                s0 = np.r_[0, brk + 1]
                s1 = np.r_[brk, len(p) - 1]
                good = (p[s1] - p[s0] + k) >= min_words
                if not good.any():
                    continue
                w0 = p[s0[good]]
                w1 = p[s1[good]] + k  # exclusive end
                np.add.at(diff, starts[i] + w0, 1)
                np.add.at(
                    diff, np.minimum(starts[i] + w1, starts[i] + lens[i]), -1
                )
            else:
                np.add.at(diff, starts[i] + p, 1)
                np.add.at(
                    diff, np.minimum(starts[i] + p + k, starts[i] + lens[i]), -1
                )
        covered = np.zeros(int(lens.sum()), dtype=bool)
        if len(covered):
            # cumsum must not leak across docs: reset by construction —
            # windows never extend past their doc (spans are doc-internal
            # and the -1 is clamped to the doc end)
            covered = np.cumsum(diff[:-1]) > 0
        out_txt, out_rm = [], []
        for i in range(n_docs):
            s, e = int(starts[i]), int(starts[i] + lens[i])
            cov = covered[s:e]
            kept = [w for w, c in zip(words[s:e], cov) if not c]
            out_txt.append(" ".join(kept))
            out_rm.append(int(cov.sum()))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(lens, _I64),
                "n_removed": pa.array(out_rm, _I64),
                "clean_text": pa.array(out_txt, pa.string()),
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow")


def strip_dup_spans_maximal(
    sf_dir: str,
    *,
    k: int = 8,
    min_words: int = 20,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Exact-substring dedup with the Lee et al. 2021 length threshold
    (verdict r4 #4): duplicated k-gram window starts extend left/right
    into maximal runs, and only runs covering >= ``min_words`` words are
    stripped — a doc whose longest duplicated run is short (e.g. one
    duplicated 8-gram boilerplate phrase) is PRESERVED, where the
    fixed-k ``strip_dup_spans`` would strip it. This is the >=L-token
    rule production pipelines apply (Lee et al. use 50 BPE tokens).

    Approximation note (documented, same class as BFF/Dolma k-gram
    dedup): a maximal run of consecutive corpus-duplicated k-grams may
    chain windows duplicated against DIFFERENT partners, so a stripped
    region is a superset union of true >=k-word duplicated substrings
    rather than one suffix-array-maximal match; with k=8 every stripped
    word is still inside some corpus-duplicated 8-gram.

    Same distributed shape as ``strip_dup_spans`` (thin int64 span rows,
    coarse-partition segment counts, one doc-keyed join; the maximal-run
    extension is per-doc vectorized numpy on already-local position
    blobs — no extra exchange). SQL-exact: the oracle recomputes the
    runs with a gaps-and-islands window over the duplicated positions.
    """
    return strip_dup_spans(
        sf_dir, k=k, min_words=min_words, num_partitions=num_partitions
    )


def dup_span_runs(
    sf_dir: str,
    *,
    k: int = 8,
    min_words: int = 20,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Per-document MAXIMAL duplicated-run statistics — the flagging
    side of Lee et al. 2021 (``strip_dup_spans_maximal`` is the removal
    side; pipelines that DROP whole documents containing a >=L-token
    duplicate gate on this signal): consecutive corpus-duplicated
    k-gram window starts merge into maximal runs; per doc we report how
    many runs clear the ``min_words`` threshold, and the longest run of
    any length.

    Output: (doc_id, n_words, n_runs, max_run_words, flagged) where
    n_runs counts runs covering >= min_words words, max_run_words is
    the longest maximal run in words (0 if the doc has no duplicated
    window), flagged = n_runs > 0.

    Same exchange plan as ``strip_dup_spans`` (shared
    ``_dup_pos_joined`` prefix); the run fold is local numpy over each
    doc's already-joined position blob. SQL-exact: the oracle reuses
    the gaps-and-islands recompute."""
    joined = _dup_pos_joined(sf_dir, k, num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], _I64),
                 "n_words": pa.array([], _I64),
                 "n_runs": pa.array([], _I64),
                 "max_run_words": pa.array([], _I64),
                 "flagged": pa.array([], pa.bool_())}
            )
        batch = batch.combine_chunks()
        lens = _word_counts(batch.column("text"))
        n_docs = batch.num_rows
        n_runs = np.zeros(n_docs, np.int64)
        max_run = np.zeros(n_docs, np.int64)
        blob_col = batch.column("dup_pos")
        for i in range(n_docs):
            v = blob_col[i].as_py()
            if v is None:
                continue
            p = np.frombuffer(v, dtype=np.int64)
            if len(p) == 0:
                continue
            brk = np.flatnonzero(np.diff(p) > 1)
            s0 = np.r_[0, brk + 1]
            s1 = np.r_[brk, len(p) - 1]
            run_words = p[s1] - p[s0] + k
            n_runs[i] = int((run_words >= min_words).sum())
            max_run[i] = int(run_words.max())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(lens, _I64),
                "n_runs": pa.array(n_runs, _I64),
                "max_run_words": pa.array(max_run, _I64),
                "flagged": pa.array(n_runs > 0),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------- domain-level curation
#
# RefinedWeb/Dolma-style domain gating: aggregate per-domain signals
# once, then gate every document by its domain's aggregate — the cheap
# corpus-maintenance complement to per-doc quality scores. `source` is
# the documents table's domain analog.


def domain_stats(sf_dir: str) -> rd.Dataset:
    """Per-source corpus health: doc count, distinct-content count,
    duplicate rate, mean length, short-doc fraction.

    Shape: text never moves — a vector stage emits thin (source,
    content_hash, n_chars) rows; one hash aggregate per (source, hash)
    collapses exact copies; a second tiny per-source rollup finishes.
    Both shuffles ship fixed-width rows; source cardinality is small so
    the final aggregate is trivial."""
    from ray.data.aggregate import Count, Sum

    from .dedup import content_hash64

    ds = read_clean(_p(sf_dir, "documents"), columns=["source", "text", "n_chars"])

    def rows(batch: pa.Table) -> pa.Table:
        h = [content_hash64(t) for t in batch.column("text").to_pylist()]
        nch = batch.column("n_chars").to_numpy()
        return pa.table(
            {
                "source": batch.column("source"),
                "content_hash": pa.array(h, _I64),
                "n_chars": batch.column("n_chars"),
                "short": pa.array((nch < 250).astype(np.int64), _I64),
            }
        )

    per_text = (
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby(["source", "content_hash"])
        .aggregate(
            Count(alias_name="cnt"),
            Sum("n_chars", alias_name="sum_chars"),
            Sum("short", alias_name="n_short"),
        )
    )
    per_source = per_text.groupby("source").aggregate(
        Sum("cnt", alias_name="n_docs"),
        Count(alias_name="n_distinct"),
        Sum("sum_chars", alias_name="sum_chars"),
        Sum("n_short", alias_name="n_short"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_docs").to_numpy().astype(np.float64)
        nd = batch.column("n_distinct").to_numpy().astype(np.float64)
        sc = batch.column("sum_chars").to_numpy().astype(np.float64)
        sh = batch.column("n_short").to_numpy().astype(np.float64)
        return pa.table(
            {
                "source": batch.column("source"),
                "n_docs": batch.column("n_docs"),
                "n_distinct": batch.column("n_distinct"),
                "dup_rate": pa.array(np.round(1.0 - nd / n + 1e-9, 4)),
                "avg_chars": pa.array(np.round(sc / n + 1e-9, 4)),
                "short_frac": pa.array(np.round(sh / n + 1e-9, 4)),
            }
        )

    return per_source.map_batches(finish, batch_format="pyarrow")


def domain_quality_filter(
    sf_dir: str, *, min_avg_chars: float = 280.0
) -> rd.Dataset:
    """Documents surviving the domain gate: keep every doc whose source's
    MEAN document length clears ``min_avg_chars`` (drop whole low-quality
    domains, not individual docs). Aggregate once -> broadcast the tiny
    qualifying-source set -> shuffle-free semi-join filter."""
    from ..functions.joins import make_broadcast_semijoin_fn

    from ray.data.aggregate import Count, Sum

    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"])
    agg = ds.groupby("source").aggregate(
        Count(alias_name="n"), Sum("n_chars", alias_name="s")
    )

    def qualifying(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.float64)
        s = batch.column("s").to_numpy().astype(np.float64)
        return pa.table(
            {"source": batch.column("source").filter(pa.array(s / n >= min_avg_chars))}
        )

    good = pa.concat_tables(
        [
            b
            for b in agg.map_batches(qualifying, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
            if b.num_columns
        ]
    )
    keys_ref = ray.put(good.column("source").combine_chunks())
    out = ds.map_batches(
        make_broadcast_semijoin_fn("source", keys_ref), batch_format="pyarrow"
    )
    return out.select_columns(["doc_id", "source"])


def curate_chunk_corpus(
    sf_dir: str,
    *,
    chunk_tokens: int = 24,
    stride: int = 12,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Curation -> chunking, composed: sliding-window token chunks of
    exactly the docs that survive the full text-curation gate (the
    corpus a context-window trainer actually consumes). Survivor ids
    attach via a hash SEMI-join — not an id broadcast, which is
    corpus-sized at 100 TB — then the shuffle-free chunker runs over
    the surviving text. Both halves are SQL-oracled, so the whole
    composition is too."""
    from .textstats import chunk_documents

    nparts = _nparts(num_partitions)
    keep = curate_text_corpus(sf_dir).repartition(nparts)
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    surv = docs.repartition(nparts).join(
        keep, join_type="left_semi", num_partitions=nparts, on=("doc_id",)
    )
    return chunk_documents(
        sf_dir, chunk_tokens=chunk_tokens, stride=stride, docs=surv
    )


def source_overlap_matrix(
    sf_dir: str,
    *,
    threshold: float = 0.5,
    k: int = 3,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Cross-source near-duplication matrix: for every (unordered)
    source pair, the number of near-dup doc pairs (word-k-gram Jaccard
    >= threshold) with one doc in each source — the diagnostic a corpus
    curator reads to find sources mirroring each other (syndication,
    scraped mirrors) before setting mixture weights. Intra-source rows
    (source_a == source_b) count a source's internal near-dups.

    Shape: pair mining is the exact prefix-filter join (nothing new
    shuffles text); sources attach to the FEW verified pairs via two
    thin (doc_id, source) hash joins — never a broadcast of the
    corpus-sized doc->source map — and one small-cardinality aggregate
    finishes. Deterministic end to end, SQL-checkable row-for-row."""
    from ray.data.aggregate import Count

    from .dedup import ngram_jaccard_pairs

    nparts = _nparts(num_partitions)
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(
        sf_dir, threshold=threshold, k=k, docs=docs, num_partitions=nparts
    )
    # join-quirk discipline: coalesce 0-column blocks before the joins;
    # a fully-empty pair set short-circuits (the join cannot key it)
    pairs = pairs.repartition(nparts).materialize()
    empty = pa.table(
        {"source_a": pa.array([], pa.string()),
         "source_b": pa.array([], pa.string()),
         "n_pairs": pa.array([], _I64)}
    )
    if pairs.count() == 0:
        return rd.from_arrow(empty)
    src = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "source"])

    def thin(name: str):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return pa.table(
                    {f"id_{name}": pa.array([], _I64),
                     f"src_{name}": pa.array([], pa.string())}
                )
            return pa.table(
                {f"id_{name}": batch.column("doc_id"),
                 f"src_{name}": batch.column("source")}
            )

        return f

    j = pairs.join(
        src.map_batches(thin("a"), batch_format="pyarrow"),
        join_type="inner", num_partitions=nparts, on=("id_a",),
    ).repartition(nparts)
    j = j.join(
        src.map_batches(thin("b"), batch_format="pyarrow"),
        join_type="inner", num_partitions=nparts, on=("id_b",),
    )

    def orient(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return empty.drop_columns(["n_pairs"])
        sa, sb = batch.column("src_a"), batch.column("src_b")
        a_first = pc.less_equal(sa, sb)
        return pa.table(
            {"source_a": pc.if_else(a_first, sa, sb),
             "source_b": pc.if_else(a_first, sb, sa)}
        )

    out = j.map_batches(orient, batch_format="pyarrow")
    return out.groupby(["source_a", "source_b"]).aggregate(
        Count(alias_name="n_pairs")
    )


# ------------------------------------------------ importance resampling


def dsir_select(
    sf_dir: str,
    *,
    target_lang: str = "en",
    n_select: int = 100,
    alpha: float = 0.5,
) -> rd.Dataset:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", simplified to unigram
    features): score every document by its mean per-token importance
    log-ratio ln(p_target / p_raw) between a target-domain unigram LM
    (here: the ``target_lang`` slice) and the raw-corpus LM, both
    additively smoothed over the raw vocabulary, and keep the top
    ``n_select`` (ties broken by doc_id). Docs with no tokens are not
    selectable.

    Shape: two model builds (per-batch partials -> one hash groupby ->
    model-sized driver fold, exactly ``unigram_logprob_docs``'s shape),
    one broadcast of the merged (hash, c_target, c_raw) bundle, one
    streaming scoring map, then a top-k sort on the model-thin
    (doc_id, weight) output."""
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang"])

    def only_target(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("lang"), target_lang))

    h_r, c_r, total_r = _unigram_model(docs)
    h_t, c_t, total_t = _unigram_model(
        docs.map_batches(only_target, batch_format="pyarrow")
    )
    vocab = float(len(h_r))
    # align target counts onto the raw vocab (every target word is a raw
    # word; unseen-in-target words get count 0 and live on smoothing)
    c_t_aligned = np.zeros_like(c_r)
    if len(h_t):
        pos = np.searchsorted(h_r, h_t)
        c_t_aligned[pos] = c_t
    ref = ray.put((h_r, c_t_aligned, c_r))

    def score(batch: pa.Table) -> pa.Table:
        model_h, ct_a, cr_a = ray.get(ref)
        flat, offsets = tokenize_word_hashes(batch.column("text"))
        lens = np.diff(offsets)
        n_docs = batch.num_rows
        s = np.zeros(n_docs, dtype=np.float64)
        if len(flat) and len(model_h):
            hs64 = flat.view(np.int64)
            pos = np.minimum(np.searchsorted(model_h, hs64), len(model_h) - 1)
            ct = ct_a[pos]
            cr = cr_a[pos]
            term = np.log((ct + alpha) / (total_t + alpha * vocab)) - np.log(
                (cr + alpha) / (total_r + alpha * vocab)
            )
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            s[:] = np.bincount(doc_of, weights=term, minlength=n_docs)
        w = np.round(s / np.maximum(lens, 1) + 1e-9, 4)
        keep = lens > 0
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "weight": pa.array(w[keep], pa.float64()),
            }
        )

    scored = docs.map_batches(score, batch_format="pyarrow")
    return scored.sort(["weight", "doc_id"], descending=[True, False]).limit(
        n_select
    )


def mixture_sample_docs(sf_dir: str) -> rd.Dataset:
    """Materialize the pretraining mixture: deterministically sample
    each source at a rate proportional to its sqrt-damped weight
    (``source_mix_weights``), normalized so the heaviest-weighted source
    keeps everything. Multiplicative-hash predicate per doc_id (the
    ``hash_sample_events`` trick) — a pure function of (doc_id, source
    rates), so retried partitions resample identically and a SQL oracle
    checks row-for-row.

    Shape: one tiny per-source aggregate (source_mix_weights), rates
    broadcast as a sorted numpy bundle, then a shuffle-free filter map.
    Output: (doc_id, source) kept rows."""
    from ..functions.joins import make_broadcast_map_fn, table_to_mapping

    w = source_mix_weights(sf_dir)
    nt = w.column("n_tokens").to_numpy().astype(np.float64)
    damped = np.sqrt(nt / nt.sum())
    thresh = (damped / damped.max()) * 4294967296.0
    rates = pa.table(
        {"source": w.column("source"), "thresh": pa.array(thresh, pa.float64())}
    )
    ref = ray.put(table_to_mapping(rates, "source", "thresh"))
    add_thresh = make_broadcast_map_fn("source", "thresh", ref, out_type=pa.float64())

    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "source"])

    def keep(batch: pa.Table) -> pa.Table:
        batch = add_thresh(batch)
        ids = batch.column("doc_id").to_numpy()
        h = ((ids * 2654435761) % 4294967296).astype(np.float64)
        t = batch.column("thresh").to_numpy()
        return batch.filter(pa.array(h < t)).select(["doc_id", "source"])

    return docs.map_batches(keep, batch_format="pyarrow")


def upsample_mixture_docs(sf_dir: str) -> rd.Dataset:
    """Materialize the mixture with per-source repetition rates >= 1
    (the GPT-3 / LLaMA recipe's other half: small sources are not just
    kept, they are REPEATED for multiple epochs). Rate per source is
    sqrt(n_tokens_max / n_tokens_s) — the sqrt-damped mixture expressed
    as epochs relative to the largest source (which gets exactly 1.0),
    a pure ratio of integer token sums, so no float-summation-order
    hazard enters the oracle. Each doc emits floor(rate) full copies
    (epoch 0..floor-1) plus one more iff its multiplicative hash falls
    under the fractional remainder — a pure function of (doc_id,
    source rates): retried tasks re-emit identical rows and the DuckDB
    ``range()`` cross-join oracle checks row-for-row.

    Shape: one tiny per-source aggregate, rates broadcast as a numpy
    bundle, then a shuffle-free vectorized expand map (np.repeat).
    Output: (doc_id, source, epoch)."""
    from ..functions.joins import make_broadcast_map_fn, table_to_mapping

    w = source_mix_weights(sf_dir)
    nt = w.column("n_tokens").to_numpy().astype(np.float64)
    rate = np.sqrt(nt.max() / nt)
    # the SQL oracle's epoch generator is bounded; a >1024x repetition
    # rate means a pathological mixture, not a bigger cross join
    assert rate.max() < 1024, "repetition rate exceeds the oracle bound"
    rates = pa.table(
        {"source": w.column("source"), "rate": pa.array(rate, pa.float64())}
    )
    ref = ray.put(table_to_mapping(rates, "source", "rate"))
    add_rate = make_broadcast_map_fn("source", "rate", ref, out_type=pa.float64())

    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "source"])

    def expand(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], _I64),
                "source": pa.array([], pa.string()),
                "epoch": pa.array([], _I64),
            }
        )
        if batch.num_columns == 0 or batch.num_rows == 0:
            return empty
        batch = add_rate(batch)
        ids = batch.column("doc_id").to_numpy()
        r = batch.column("rate").to_numpy()
        nfull = np.floor(r)
        frac = r - nfull
        h = ((ids * 2654435761) % 4294967296).astype(np.float64)
        ncopies = (nfull + (h < frac * 4294967296.0)).astype(np.int64)
        total = int(ncopies.sum())
        if total == 0:
            return empty
        idx = np.repeat(np.arange(len(ids), dtype=np.int64), ncopies)
        starts = np.cumsum(ncopies) - ncopies
        epoch = np.arange(total, dtype=np.int64) - np.repeat(starts, ncopies)
        out = batch.select(["doc_id", "source"]).take(pa.array(idx))
        return out.append_column("epoch", pa.array(epoch, _I64))

    return docs.map_batches(expand, batch_format="pyarrow")


def train_val_test_split(
    sf_dir: str, *, val_frac: float = 0.05, test_frac: float = 0.05, seed: int = 7
) -> rd.Dataset:
    """Deterministic held-out split of the corpus: (doc_id, split) with
    split in {train, val, test} assigned by the seeded multiplicative
    hash (same kernel as ``shuffled_training_order``). A pure function
    of (doc_id, seed): every rerun, every cluster size and the SQL
    oracle agree doc-for-doc, and val/test never leak into train across
    incremental recrawls because membership never depends on which other
    docs exist. Shuffle-free single map over a thin projection."""
    from .ordering import shuffle_key

    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id"])
    test_cut = test_frac * 4294967296.0
    val_cut = (test_frac + val_frac) * 4294967296.0
    names = np.array(["train", "val", "test"], dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], _I64), "split": pa.array([], pa.string())}
            )
        h = shuffle_key(batch.column("doc_id").to_numpy(), seed).astype(np.float64)
        code = (h < val_cut).astype(np.int64) + (h < test_cut)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "split": pa.array(names[code], pa.string()),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow")


def compression_ratio_docs(
    sf_dir: str,
    *,
    level: int = 6,
    max_ratio: float = 0.8,
    min_ratio: float = 0.25,
    min_len: int = 256,
) -> rd.Dataset:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    Gopher-family quality signal a hand-written heuristic can't fake:
    heavily templated/repeated text compresses far below prose
    (< ``min_ratio``), random/base64-ish noise compresses above it
    (> ``max_ratio`` — printable-ASCII entropy tops out ~0.83, real
    prose sits ~0.3–0.6), and docs under ``min_len`` bytes are flagged
    ``short`` instead of judged: zlib's fixed header dominates there
    and the ratio measures overhead, not content.

    Shape: one shuffle-free ``map_batches``; the per-doc loop is a
    C-level ``zlib.compress`` call per string (the same class as the
    regex kernels — Python drives, C does the bytes). Output:
    (doc_id, raw_len, comp_len, ratio, flag) with flag in
    {ok, too_repetitive, too_random, short}. Rows-only (no SQL zlib)."""
    import zlib

    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def ratios(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        raw = np.fromiter((len(t.encode()) for t in texts), np.int64, len(texts))
        comp = np.fromiter(
            (len(zlib.compress(t.encode(), level)) for t in texts),
            np.int64,
            len(texts),
        )
        r = comp / np.maximum(raw, 1)
        flag = np.where(
            raw < min_len,
            "short",
            np.where(
                r < min_ratio,
                "too_repetitive",
                np.where(r > max_ratio, "too_random", "ok"),
            ),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "raw_len": pa.array(raw, _I64),
                "comp_len": pa.array(comp, _I64),
                "ratio": pa.array(np.round(r + 1e-9, 4), pa.float64()),
                "flag": pa.array(flag, pa.string()),
            }
        )

    return docs.map_batches(ratios, batch_format="pyarrow")


def gram_novelty_docs(
    sf_dir: str, *, k: int = 3, num_partitions: int | None = None
) -> rd.Dataset:
    """Per-document k-gram novelty: the fraction of a doc's DISTINCT
    word-k-grams whose FIRST corpus appearance (min doc_id) is this doc
    — near 1 for fresh prose, near 0 for templated/spun/syndicated text
    that recombines grams already in the corpus. The streaming-novelty
    quality signal, computed batch (order = doc_id, the ingest order).

    Shape: one gram-lists pass (shared tokenizer) -> explode to thin
    (gram, doc_id) rows -> ONE hash aggregate Min(doc_id) per gram ->
    count the winners per doc -> join onto per-doc gram counts (both
    sides one row per doc). The exchange carries the distinct-gram
    vocabulary once; text never moves.

    Output: (doc_id, n_grams, n_novel, novelty) — SQL-checkable
    row-for-row (same gram convention as the jaccard family)."""
    from ray.data.aggregate import Count, Min

    from .dedup import _gram_lists

    nparts = _nparts(num_partitions)
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    grams = _gram_lists(docs, k).materialize()

    def explode(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        col = batch.column("grams")
        lens = pc.list_value_length(col).to_numpy().astype(np.int64)
        did = np.repeat(batch.column("doc_id").to_numpy(), lens)
        return pa.table(
            {"gram": pc.list_flatten(col),
             "doc_id": pa.array(did, _I64)}
        )

    firsts = (
        grams.map_batches(explode, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Min("doc_id", alias_name="first_doc"))
    )
    novel = firsts.groupby("first_doc").aggregate(Count(alias_name="n_novel"))

    def clean_novel(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], _I64), "n_novel": pa.array([], _I64)}
            )
        return pa.table(
            {"doc_id": batch.column("first_doc"), "n_novel": batch.column("n_novel")}
        )

    novel = novel.map_batches(clean_novel, batch_format="pyarrow").repartition(nparts)

    sizes = grams.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"), "n_grams": b.column("n_grams")}
        ),
        batch_format="pyarrow",
    ).repartition(nparts)
    j = sizes.join(novel, join_type="left_outer", num_partitions=nparts, on=("doc_id",))

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], _I64), "n_grams": pa.array([], _I64),
                 "n_novel": pa.array([], _I64),
                 "novelty": pa.array([], pa.float64())}
            )
        ng = batch.column("n_grams").to_numpy()
        nv = pc.coalesce(
            pc.cast(batch.column("n_novel"), _I64), pa.scalar(0, _I64)
        ).to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pa.array(ng, _I64),
                "n_novel": pa.array(nv, _I64),
                "novelty": pa.array(
                    np.round(nv / np.maximum(ng, 1) + 1e-9, 4), pa.float64()
                ),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


def novelty_by_source(
    sf_dir: str, *, k: int = 3, num_partitions: int | None = None
) -> rd.Dataset:
    """Source-level novelty rollup: per source, the gram-weighted
    novelty rate (SUM n_novel / SUM n_grams — integer sums, so the
    division is bit-deterministic at any partitioning; averaging the
    per-doc float ratios would be order-sensitive) and the count of
    LOW-novelty docs (n_novel * 5 < n_grams, i.e. ratio < 0.2 in exact
    integer arithmetic). The per-source number a curator reads to spot
    templated/syndicated sources before setting mixture weights.

    Shape: the ``gram_novelty_docs`` aggregates + one thin per-doc
    source join + one small-cardinality groupby."""
    from ray.data.aggregate import Count, Sum

    nparts = _nparts(num_partitions)
    nov = gram_novelty_docs(sf_dir, k=k, num_partitions=nparts)

    def thin(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], _I64), "n_grams": pa.array([], _I64),
                 "n_novel": pa.array([], _I64), "low": pa.array([], _I64)}
            )
        ng = batch.column("n_grams").to_numpy()
        nv = batch.column("n_novel").to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": batch.column("n_grams"),
                "n_novel": batch.column("n_novel"),
                "low": pa.array((nv * 5 < ng).astype(np.int64), _I64),
            }
        )

    src = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "source"]).repartition(
        nparts
    )
    j = nov.map_batches(thin, batch_format="pyarrow").repartition(nparts).join(
        src, join_type="inner", num_partitions=nparts, on=("doc_id",)
    )
    agg = j.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_grams", alias_name="total_grams"),
        Sum("n_novel", alias_name="total_novel"),
        Sum("low", alias_name="low_novelty_docs"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "n_docs": pa.array([], _I64),
                 "total_grams": pa.array([], _I64),
                 "total_novel": pa.array([], _I64),
                 "novelty_rate": pa.array([], pa.float64()),
                 "low_novelty_docs": pa.array([], _I64)}
            )
        tg = batch.column("total_grams").to_numpy()
        tn = batch.column("total_novel").to_numpy()
        return pa.table(
            {
                "source": batch.column("source"),
                "n_docs": batch.column("n_docs"),
                "total_grams": pa.array(tg, _I64),
                "total_novel": pa.array(tn, _I64),
                "novelty_rate": pa.array(
                    np.round(tn / np.maximum(tg, 1) + 1e-9, 4), pa.float64()
                ),
                "low_novelty_docs": pa.array(
                    batch.column("low_novelty_docs").to_numpy().astype(np.int64), _I64
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def leakage_safe_split_docs(
    sf_dir: str,
    *,
    threshold: float = 0.5,
    k: int = 3,
    frac_val: float = 0.1,
    frac_test: float = 0.1,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Leakage-safe train/val/test split of the DOCUMENT corpus: every
    word-k-gram-Jaccard near-dup CLUSTER (transitive closure at
    ``threshold``) lands in one split, so a near-duplicate of a training
    document can never contaminate val/test — the text twin of
    ``leakage_safe_split_images``, but with a hard row-for-row SQL
    oracle (the ``jaccard_dedup_docs`` recursive-CTE closure composed
    with the Knuth-hash split rule). ``train_val_test_split`` splits
    rows; this splits equivalence classes.

    Shape: exact prefix-filter pairs -> connected components -> LEFT
    OUTER join of all doc_ids against the (node, component) assignment
    (docs in no pair are their own singleton cluster), then one
    multiplicative-hash map of the cluster id onto [0, 1) picks the
    split. Cluster-deterministic, no RNG; only (doc_id, component) rows
    ever shuffle."""
    from .dedup import ngram_jaccard_pairs
    from .graph import connected_components

    nparts = _nparts(num_partitions)
    pairs = ngram_jaccard_pairs(
        sf_dir, threshold=threshold, k=k, num_partitions=nparts
    ).select_columns(["id_a", "id_b"])
    assign = connected_components(pairs, num_partitions=nparts)

    def clean(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], _I64),
                 "component": pa.array([], _I64)}
            )
        return pa.table(
            {"doc_id": batch.column("node"), "component": batch.column("component")}
        )

    assign = assign.map_batches(clean, batch_format="pyarrow").materialize()
    ids = read_clean(_p(sf_dir, "documents"), columns=["doc_id"]).repartition(nparts)
    if assign.count() > 0:
        joined = ids.join(
            assign.repartition(nparts),
            join_type="left_outer",
            num_partitions=nparts,
            on=("doc_id",),
        )
    else:
        # no near-dup pairs anywhere: every doc is a singleton cluster
        # (the join's empty right side would lack the key column)
        joined = ids.map_batches(
            lambda b: b.append_column("component", pa.nulls(b.num_rows, _I64)),
            batch_format="pyarrow",
        )

    lo_val = 1.0 - frac_val - frac_test
    lo_test = 1.0 - frac_test

    def pick(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], _I64), "split": pa.array([], pa.string())}
            )
        did = batch.column("doc_id").to_numpy()
        comp = pc.coalesce(
            pc.cast(batch.column("component"), _I64), batch.column("doc_id")
        ).to_numpy()
        # Knuth multiplicative hash of the CLUSTER id; (a*b mod 2^64)
        # mod 2^32 == a*b mod 2^32, so the SQL oracle's HUGEINT product
        # agrees exactly with the wrapping uint64 multiply here
        u = (
            (comp.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(4294967296)
        ).astype(np.float64) / 4294967296.0
        split = np.where(u < lo_val, "train", np.where(u < lo_test, "val", "test"))
        return pa.table(
            {
                "doc_id": pa.array(did, _I64),
                "split": pa.array(split, pa.string()),
            }
        )

    return joined.map_batches(pick, batch_format="pyarrow")


# ----------------------------------------------------- resumable export


def export_training_shards(
    sf_dir: str,
    out_dir: str | Path,
    *,
    n_shards: int = 8,
) -> pa.Table:
    """Resumable partitioned export of the curated corpus: curate once,
    then write one parquet directory per doc_id-hash shard with an
    atomic per-shard ``_DONE`` marker — a rerun (after a crash, or a
    partial cluster loss) skips every finished shard and writes only the
    missing ones. The shard assignment is a pure function of doc_id, so
    a rewritten shard is byte-identical rows (tested).

    This is the output discipline the 100 TB run needs: never one giant
    file, never redo finished work. Returns the manifest (shard, n_rows,
    skipped) — the op's driver-visible result.
    """
    from ..functions.joins import make_broadcast_semijoin_fn

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    keep_ids = curate_text_corpus(sf_dir)
    ids = pa.concat_tables(
        [b for b in keep_ids.iter_batches(batch_format="pyarrow") if b.num_rows]
    ).column("doc_id").combine_chunks()
    # curated id set is survivors-sized; broadcast once like every other
    # small-side semi-join (at 10^10 docs swap for the hash-partition
    # anti-aggregate in incremental_exact_dedup — same semantics)
    keep_ref = ray.put(ids)

    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "source", "text"])
    kept = docs.map_batches(
        make_broadcast_semijoin_fn("doc_id", keep_ref), batch_format="pyarrow"
    )

    def add_shard(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        h = (d.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return batch.append_column(
            "shard", pa.array((h % np.uint64(n_shards)).astype(np.int64), _I64)
        )

    kept = kept.map_batches(add_shard, batch_format="pyarrow").materialize()
    return _resumable_shard_write(kept, out_dir, n_shards)


def _resumable_shard_write(
    kept: rd.Dataset, out_dir: Path, n_shards: int, *, key: str = "doc_id"
) -> pa.Table:
    """Write one parquet dir per shard with atomic ``_DONE`` markers
    (``kept`` is materialized and carries an int64 ``shard`` column);
    reruns skip finished shards, crashed partials rewrite byte-identical
    rows. Returns the (shard, n_rows, skipped) manifest. Shared by
    ``export_training_shards``, ``prepare_training_data`` and
    ``vision.export_image_shards``.

    All PENDING shards land in ONE hive-partitioned parquet write (the
    term-index lesson: a serial per-shard filter+sort+write loop pays
    ~4 dataset-execution launches per shard; measured at sf0.1/32 CPUs
    the loop's write tail was ~9.5 s of export_image_shards' 22 s —
    with the bulk write the op is 12.5 s, i.e. curation plus ~2.5 s,
    and prepare_training_data went 5.8 s -> 3.3 s).
    Shard atomicity is unchanged: a _DONE marker is touched only after
    the bulk write returns, a crash before that leaves partials that the
    next run rmtree-rewrites, and finished shards are filtered out of
    the write entirely. The global sort on ``key`` pins a deterministic
    row order (shard dirs are disjoint key-hash slices of one sorted
    stream, so per-shard content is the same as sorting each shard
    alone)."""
    import json
    import shutil

    # Layout marker (ADVICE r4): the row->shard map is `hash(key) %
    # n_shards`, so resuming with a DIFFERENT n_shards (e.g. the
    # cluster-width default on a differently-sized cluster) would
    # silently mix two hash layouts — old _DONE shards skipped under the
    # new assignment, rows duplicated/missing. Persist n_shards on first
    # run and fail loud on mismatch instead of relying on the docstring.
    out_dir.mkdir(parents=True, exist_ok=True)
    layout_path = out_dir / "_SHARD_LAYOUT.json"
    if layout_path.exists():
        recorded = json.loads(layout_path.read_text()).get("n_shards")
        if recorded != n_shards:
            raise ValueError(
                f"resume layout mismatch: {out_dir} was written with "
                f"n_shards={recorded} but this run uses n_shards={n_shards}; "
                "pass n_shards explicitly (or delete the output dir) — "
                "mixing hash layouts would duplicate/drop rows"
            )
    else:
        layout_path.write_text(json.dumps({"n_shards": n_shards, "key": key}))

    pending, manifest_rows = [], {}
    for s in range(n_shards):
        sdir = out_dir / f"shard={s:04d}"
        if (sdir / "_DONE").exists():
            manifest_rows[s] = (-1, True)
            continue
        if sdir.exists():  # partial from a crashed run: rewrite cleanly
            shutil.rmtree(sdir)
        pending.append(s)
    if pending:
        pend_set = pa.array(pending, pa.int64())

        def only_pending(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch.column("shard"), value_set=pend_set)
            )

        part = kept.map_batches(only_pending, batch_format="pyarrow")

        # zero-padded STRING partition values keep the shard=%04d dir
        # naming of the resume contract under hive partitioning
        def pad_shard(batch: pa.Table) -> pa.Table:
            i = batch.schema.get_field_index("shard")
            vals = batch.column("shard").to_numpy()
            return batch.set_column(
                i, "shard",
                pa.array([f"{v:04d}" for v in vals], pa.string()),
            )

        counts = np.zeros(n_shards, np.int64)
        for b in kept.select_columns(["shard"]).iter_batches(
            batch_format="pyarrow"
        ):
            if b.num_rows:
                s = b.column("shard").to_numpy()
                np.add.at(counts, s[np.isin(s, pending)], 1)
        if counts[pending].sum() > 0:  # write_parquet on 0 rows is a no-op
            part.sort(key).map_batches(
                pad_shard, batch_format="pyarrow"
            ).write_parquet(str(out_dir), partition_cols=["shard"])
        for s in pending:
            sdir = out_dir / f"shard={s:04d}"
            sdir.mkdir(parents=True, exist_ok=True)  # zero-row shard
            (sdir / "_DONE").touch()  # marker only after the data
            manifest_rows[s] = (int(counts[s]), False)
    return pa.table(
        {
            "shard": pa.array(range(n_shards), _I64),
            "n_rows": pa.array(
                [manifest_rows[s][0] for s in range(n_shards)], _I64
            ),
            "skipped": pa.array([manifest_rows[s][1] for s in range(n_shards)]),
        }
    )


def prepare_training_data(
    sf_dir: str,
    out_dir: str | Path,
    *,
    n_merges: int = 64,
    capacity: int = 256,
    n_shards: int = 8,
    num_blocks: int = 8,
    max_word_types: int = 1_000_000,
) -> pa.Table:
    """The end-to-end LLM-data tier, one pipeline: curate the corpus
    (C4/RefinedWeb gates + dedup), train the BPE tokenizer ON the
    curated corpus, encode every surviving doc under the trained
    vocabulary, pack docs into <= ``capacity``-token training bins, and
    export one resumable parquet shard dir per bin-hash bucket — rows
    (doc_id, source, text, n_tokens, bin_id), a bin never split across
    shards. This is the artifact an actual pretraining run reads.

    Shape: curate's survivor ids broadcast once (semi-join, no shuffle);
    ONE word-count pass over survivors trains the merges (driver loop is
    word-TYPE-sized — see ``tokenizer.py``); ONE streaming pass per
    block encodes (dictionary-encode: distinct words merge once) and
    packs (first-fit-decreasing, ``pack_token_bins``'s per-block
    contract — bin ids namespaced by block min doc_id); shard write
    reuses the ``_DONE``-marker resume discipline. Text never shuffles
    anywhere. Rows-only for the driver (iterative trainer inside);
    pytest asserts component-consistency (survivors == curate output,
    token counts == reference encode under the survivor-trained merges),
    packing invariants, bin-shard integrity, and resume semantics.
    """
    from ..functions.joins import make_broadcast_semijoin_fn
    from .tokenizer import _word_count_table, encode_word, learn_bpe

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    keep_ids = curate_text_corpus(sf_dir)
    ids = pa.concat_tables(
        [b for b in keep_ids.iter_batches(batch_format="pyarrow") if b.num_rows]
    ).column("doc_id").combine_chunks()
    keep_ref = ray.put(ids)
    docs = read_clean(
        _p(sf_dir, "documents"),
        columns=["doc_id", "source", "text"],
        override_num_blocks=num_blocks,
    )
    kept = docs.map_batches(
        make_broadcast_semijoin_fn("doc_id", keep_ref), batch_format="pyarrow"
    )
    # tokenizer trains on the CURATED corpus (the order a real run uses)
    words, freqs = _word_count_table(kept, max_word_types)
    merges = [(l, r) for l, r, _ in learn_bpe(words, freqs, n_merges)]
    ranks = {m: i for i, m in enumerate(merges)}

    def encode_pack(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import tokenize_words

        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], _I64),
                    "source": pa.array([], pa.string()),
                    "text": pa.array([], pa.string()),
                    "n_tokens": pa.array([], _I64),
                    "bin_id": pa.array([], _I64),
                }
            )
        ws, offsets = tokenize_words(batch.column("text"))
        n_docs = batch.num_rows
        n_words = np.diff(offsets)
        if len(ws):
            d = ws.dictionary_encode()
            lens = np.fromiter(
                (len(encode_word(w, ranks)) for w in d.dictionary.to_pylist()),
                dtype=np.int64,
                count=len(d.dictionary),
            )
            per_word = lens[d.indices.to_numpy(zero_copy_only=False)]
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)
            nt = np.bincount(doc_of, weights=per_word, minlength=n_docs).astype(
                np.int64
            )
        else:
            nt = np.zeros(n_docs, np.int64)
        # first-fit-decreasing pack within the block (pack_token_bins
        # contract: per-block bins, ids namespaced by block min doc_id)
        ids_np = batch.column("doc_id").to_numpy()
        order = np.lexsort((ids_np, -nt))
        bins: list[int] = []
        local = np.empty(n_docs, np.int64)
        for row in order:
            need = int(nt[row])
            for bno, rem in enumerate(bins):
                if rem >= need:
                    bins[bno] = rem - need
                    local[row] = bno
                    break
            else:
                local[row] = len(bins)
                bins.append(max(capacity - need, 0))
        block_key = int(ids_np.min())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "text": batch.column("text"),
                "n_tokens": pa.array(nt, _I64),
                "bin_id": pa.array(block_key * 100_000 + local, _I64),
            }
        )

    packed = kept.map_batches(encode_pack, batch_size=None, batch_format="pyarrow")

    def add_shard(batch: pa.Table) -> pa.Table:
        # shard by BIN hash so a training bin never splits across shards
        b = batch.column("bin_id").to_numpy()
        h = (b.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return batch.append_column(
            "shard", pa.array((h % np.uint64(n_shards)).astype(np.int64), _I64)
        )

    packed = packed.map_batches(add_shard, batch_format="pyarrow").materialize()
    return _resumable_shard_write(packed, out_dir, n_shards)


# ----------------------------------------- paragraph (block) keep-first


def paragraph_dedup_docs(
    sf_dir: str,
    *,
    k: int = 4,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Paragraph-level keep-first dedup (Dolma's dedupe-by-paragraph /
    RefinedWeb's line-dedup, expressed over disjoint k-word blocks since
    the fixture corpus has no newline structure): every duplicated block
    keeps exactly ONE canonical copy — the corpus-order first occurrence
    by (doc_id, block index) — and later copies are stripped from their
    docs. Distinct from ``strip_dup_spans`` (Lee et al.), which removes
    EVERY occurrence of a duplicated span including the first.

    Output: (doc_id, n_blocks, n_dropped, clean_text) for every doc;
    clean_text joins the surviving normalized tokens with single spaces
    (same convention as ``strip_dup_spans``).

    Shape: block rows (part, hash, doc_id, bidx) -> coarse groupby(part)
    picks each hash's (doc_id, bidx)-min winner with a lexsort segment
    scan and emits only loser rows -> per-doc binary-blob fold -> one
    doc-keyed join -> streaming rebuild. Winner selection never packs
    (doc_id, bidx) into one integer, so ids stay full-range int64; block
    equality is by 64-bit content hash (== string equality w.h.p.; the
    SQL oracle compares the strings themselves)."""
    nparts = _nparts(num_partitions)
    coarse = nparts * 4
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def block_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        flat, offsets = tokenize_word_hashes(batch.column("text"))
        lens = np.diff(offsets)
        n_docs = len(lens)
        empty = pa.table(
            {"part": pa.array([], pa.int32()),
             "h": pa.array([], _I64),
             "doc_id": pa.array([], _I64),
             "bidx": pa.array([], _I64)}
        )
        if len(flat) == 0:
            return empty
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        starts = np.zeros(n_docs, np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        pos = np.arange(len(flat), dtype=np.int64) - starts[doc_of]
        bidx = pos // k
        new_block = np.r_[True, (doc_of[1:] != doc_of[:-1])
                          | (bidx[1:] != bidx[:-1])]
        block_of = np.cumsum(new_block) - 1
        n_blocks = int(block_of[-1]) + 1
        # ordered splitmix chain per block: r ascending == word order
        bh = np.zeros(n_blocks, dtype=_U64)
        r0 = pos % k == 0
        bh[block_of[r0]] = flat[r0]
        for r in range(1, k):
            m = pos % k == r
            if not m.any():
                break
            blk = block_of[m]
            bh[blk] = splitmix64(bh[blk]) ^ flat[m]
        bh = splitmix64(bh)
        bstart = np.flatnonzero(new_block)
        return pa.table(
            {
                "part": pa.array((bh % _U64(coarse)).astype(np.int32)),
                "h": pa.array(bh.view(np.int64)),
                "doc_id": pa.array(ids[doc_of[bstart]], _I64),
                "bidx": pa.array(bidx[bstart], _I64),
            }
        )

    rows = docs.map_batches(block_rows, batch_format="pyarrow")

    def loser_rows(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy()
        d = group.column("doc_id").to_numpy()
        b = group.column("bidx").to_numpy()
        order = np.lexsort((b, d, h))
        hs = h[order]
        first = np.r_[True, hs[1:] != hs[:-1]]
        losers = order[~first]  # every row after its hash's (d,b)-min
        return pa.table(
            {
                "doc_id": pa.array(d[losers], _I64),
                "pos": pa.array(b[losers], _I64),
                "dpart": pa.array((d[losers] % coarse).astype(np.int32)),
            }
        )

    drops = rows.groupby("part").map_groups(loser_rows, batch_format="pyarrow")

    def pos_blobs(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy()
        p = group.column("pos").to_numpy()
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        counts = np.diff(np.append(starts, len(d)))
        offs = np.zeros(len(starts) + 1, np.int32)
        np.cumsum(counts * 8, out=offs[1:])
        blob = pa.Array.from_buffers(
            pa.binary(), len(starts),
            [None, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(np.ascontiguousarray(p).tobytes())],
        )
        return pa.table(
            {"doc_id": pa.array(d[starts], _I64), "drop_bidx": blob}
        )

    blobs = (
        drops.groupby("dpart").map_groups(pos_blobs, batch_format="pyarrow")
        .repartition(nparts)  # join-quirk: coalesce 0-col empty blocks
    )
    joined = docs.join(
        blobs, join_type="left_outer", num_partitions=nparts, on=("doc_id",)
    )

    def rebuild(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], _I64),
                 "n_blocks": pa.array([], _I64),
                 "n_dropped": pa.array([], _I64),
                 "clean_text": pa.array([], pa.string())}
            )
        batch = batch.combine_chunks()
        texts = pc.fill_null(batch.column("text"), "")
        lists = pc.split_pattern_regex(pc.utf8_lower(texts), r"\W+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offs = lists.offsets.to_numpy()
        flat = lists.values.slice(offs[0], offs[-1] - offs[0])
        keep_tok = pc.not_equal(pc.binary_length(flat), 0)
        words = flat.filter(keep_tok).to_pylist()
        keep_np = keep_tok.to_numpy(zero_copy_only=False)
        n_docs = batch.num_rows
        doc_raw = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
        lens = np.bincount(doc_raw[keep_np], minlength=n_docs)
        starts = np.zeros(n_docs, np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        blob_col = batch.column("drop_bidx")
        out_txt, out_drop, out_blocks = [], [], []
        for i in range(n_docs):
            s, n = int(starts[i]), int(lens[i])
            nb = -(-n // k) if n else 0
            v = blob_col[i].as_py()
            if not v:
                out_txt.append(" ".join(words[s:s + n]))
                out_drop.append(0)
                out_blocks.append(nb)
                continue
            dropped = np.frombuffer(v, dtype=np.int64)
            dset = set(dropped.tolist())
            kept = [
                w for j, w in enumerate(words[s:s + n]) if j // k not in dset
            ]
            out_txt.append(" ".join(kept))
            out_drop.append(len(dset))
            out_blocks.append(nb)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_blocks": pa.array(out_blocks, _I64),
                "n_dropped": pa.array(out_drop, _I64),
                "clean_text": pa.array(out_txt, pa.string()),
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow")


def pmi_collocations(
    sf_dir: str,
    *,
    top_k: int = 20,
    min_count: int = 5,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Top-k adjacent-bigram collocations by pointwise mutual
    information: PMI(w1, w2) = ln( (c12/T12) / ((c1/T1)(c2/T1)) ) over
    within-document adjacent token pairs (Church/Hanks, "Word
    association norms, mutual information, and lexicography", 1990) —
    the corpus-statistics primitive behind phrase mining and
    tokenizer-merge seeding (``train_bpe_merges`` counts the same
    pairs; this scores them against independence).

    Shape: one tokenize pass emits per-batch PRE-COMBINED bigram counts
    (Arrow group_by inside the batch — the shuffle ships one row per
    distinct in-batch pair, not per occurrence) -> grouped Sum; unigram
    counts likewise; totals are scalar ``Dataset.aggregate`` folds; two
    vocab-keyed hash joins attach c1/c2 onto the bigram rows. Every
    exchange is vocabulary-sized, never corpus-sized; min_count prunes
    before the join. Output: (w1, w2, n, pmi), PMI DESC top-k,
    (w1, w2) tie-break, round-4 with the tie-free 1e-9 nudge."""
    from ray.data.aggregate import Sum

    nparts = _nparts(num_partitions)
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def _flat_tokens(batch: pa.Table):
        texts = pc.fill_null(batch.column("text"), "")
        lists = pc.split_pattern_regex(pc.utf8_lower(texts), r"\W+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offs = lists.offsets.to_numpy()
        flat = lists.values.slice(offs[0], offs[-1] - offs[0])
        keep = pc.not_equal(pc.binary_length(flat), 0)
        keep_np = keep.to_numpy(zero_copy_only=False)
        doc_of = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), np.diff(offs)
        )[keep_np]
        return flat.filter(keep), doc_of

    def bigram_counts(batch: pa.Table) -> pa.Table:
        flat, doc_of = _flat_tokens(batch)
        if len(flat) < 2:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        adj = doc_of[1:] == doc_of[:-1]  # adjacent AND same doc
        idx = np.nonzero(adj)[0]
        t = pa.table(
            {"w1": flat.take(pa.array(idx)), "w2": flat.take(pa.array(idx + 1))}
        )
        agg = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return agg.rename_columns(["w1", "w2", "n"])

    def unigram_counts(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch)
        t = pa.table({"w": flat})
        agg = t.group_by(["w"]).aggregate([([], "count_all")])
        return agg.rename_columns(["w", "c"])

    bc = (
        docs.map_batches(bigram_counts, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
        .repartition(nparts)
        .materialize()
    )
    uc = (
        docs.map_batches(unigram_counts, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
        .repartition(nparts)
        .materialize()
    )
    t12 = float(bc.aggregate(Sum("n", alias_name="t"))["t"] or 0)
    t1 = float(uc.aggregate(Sum("c", alias_name="t"))["t"] or 0)
    if t12 == 0 or t1 == 0:
        return rd.from_arrow(
            pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()), "pmi": pa.array([], pa.float64())}
            )
        )

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        return batch.filter(pc.greater_equal(batch.column("n"), min_count))

    pruned = bc.map_batches(prune, batch_format="pyarrow").repartition(nparts)
    j = pruned.join(
        uc.rename_columns({"w": "w1", "c": "c1"}),
        join_type="inner", num_partitions=nparts, on=("w1",),
    ).repartition(nparts)
    j = j.join(
        uc.rename_columns({"w": "w2", "c": "c2"}),
        join_type="inner", num_partitions=nparts, on=("w2",),
    )

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()), "pmi": pa.array([], pa.float64())}
            )
        n = batch.column("n").to_numpy().astype(np.float64)
        c1 = batch.column("c1").to_numpy().astype(np.float64)
        c2 = batch.column("c2").to_numpy().astype(np.float64)
        pmi = np.log((n / t12) / ((c1 / t1) * (c2 / t1)))
        return pa.table(
            {
                "w1": batch.column("w1"),
                "w2": batch.column("w2"),
                "n": batch.column("n"),
                "pmi": pa.array(np.round(pmi + 1e-9, 4), pa.float64()),
            }
        )

    out = j.map_batches(score, batch_format="pyarrow")
    return out.sort(["pmi", "w1", "w2"], descending=[True, False, False]).limit(top_k)


def bigram_ttr_by_source(sf_dir: str) -> pa.Table:
    """Per-source bigram type-token ratio (distinct adjacent word pairs
    / total pairs) — the lexical-diversity audit that catches template
    farms and spun content: a source whose bigram TTR collapses is
    recombining the same phrases (its unigram mix can still look
    normal, which is why ``lang_entropy_by_source`` alone misses it).

    Shape: ONE tokenize pass emits per-batch PRE-COMBINED
    (source, w1, w2, n) rows (the ``pmi_collocations`` kernel keyed by
    source) into one grouped Sum — after it, every (source, bigram) is
    a single row, so distinct = a per-block row count and total = a
    per-block Sum, folded per source by a second (source-cardinality-
    sized) aggregate. Exchanges are vocabulary-sized; at 10^10-doc
    scale swap the gram strings for the repo's 64-bit gram hashes
    (``functions/hashing.py``) — counts are then exact up to hash
    collisions instead of string-exact.

    Output: (source, n_bigrams, n_distinct, ttr round-4 +1e-9 nudge)."""
    from ray.data.aggregate import Sum

    docs = read_clean(_p(sf_dir, "documents"), columns=["source", "text"])

    def bg_counts(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column("text"), "")
        lists = pc.split_pattern_regex(pc.utf8_lower(texts), r"\W+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offs = lists.offsets.to_numpy()
        flat = lists.values.slice(offs[0], offs[-1] - offs[0])
        keep = pc.not_equal(pc.binary_length(flat), 0)
        keep_np = keep.to_numpy(zero_copy_only=False)
        doc_of = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), np.diff(offs)
        )[keep_np]
        flat = flat.filter(keep)
        empty = pa.table(
            {"source": pa.array([], pa.string()),
             "w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
        if len(flat) < 2:
            return empty
        adj = doc_of[1:] == doc_of[:-1]
        idx = np.nonzero(adj)[0]
        if len(idx) == 0:
            return empty
        src = batch.column("source").take(pa.array(doc_of[idx]))
        t = pa.table(
            {"source": src, "w1": flat.take(pa.array(idx)),
             "w2": flat.take(pa.array(idx + 1))}
        )
        agg = t.group_by(["source", "w1", "w2"]).aggregate([([], "count_all")])
        return agg.rename_columns(["source", "w1", "w2", "n"])

    per_pair = (
        docs.map_batches(bg_counts, batch_format="pyarrow")
        .groupby(["source", "w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "d": pa.array([], _I64), "t": pa.array([], _I64)}
            )
        g = batch.group_by("source").aggregate([([], "count_all"), ("n", "sum")])
        return g.rename_columns(["source", "d", "t"])

    agg = (
        per_pair.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("d", alias_name="n_distinct"), Sum("t", alias_name="n_bigrams")
        )
    )
    parts = [b for b in agg.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not parts:
        return pa.table(
            {"source": pa.array([], pa.string()),
             "n_bigrams": pa.array([], _I64), "n_distinct": pa.array([], _I64),
             "ttr": pa.array([], pa.float64())}
        )
    t = pa.concat_tables(parts).combine_chunks()
    d = t.column("n_distinct").to_numpy().astype(np.float64)
    n = t.column("n_bigrams").to_numpy().astype(np.float64)
    return pa.table(
        {
            "source": t.column("source"),
            "n_bigrams": pc.cast(t.column("n_bigrams"), _I64),
            "n_distinct": pc.cast(t.column("n_distinct"), _I64),
            "ttr": pa.array(np.round(d / n + 1e-9, 4), pa.float64()),
        }
    )


def table_checksum(sf_dir: str, table: str = "documents") -> pa.Table:
    """Order-independent corpus checksum — the anti-entropy primitive a
    100 TB migration / replica / re-partition is verified with (row-wise
    diffs are O(corpus); this is one streaming pass and a 24-byte fold).

    Per row: a 60-bit content hash (md5 of the text, first 15 hex chars —
    md5 so the SQL oracle computes the IDENTICAL value engine-side).
    Folds: XOR of row hashes (order- and partition-independent; its known
    blind spot — duplicate rows cancelling pairwise — is covered by the
    row count and char sum riding along), row count, total chars.

    Shape: each block emits ONE (xor, n, chars) partial row; the global
    fold is a constant-size aggregate. Nothing else leaves the scan, so
    the op costs exactly one read of the hashed column at any scale.
    """
    import hashlib

    ds = read_clean(_p(sf_dir, table), columns=["text", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        h = np.fromiter(
            (
                int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                for t in batch.column("text").to_pylist()
            ),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return pa.table(
            {
                "xor_hash": pa.array([int(np.bitwise_xor.reduce(h)) if len(h) else 0], _I64),
                "n_rows": pa.array([batch.num_rows], _I64),
                "total_chars": pa.array(
                    [int(np.sum(batch.column("n_chars").to_numpy()))], _I64
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    xor = 0
    n = chars = 0
    for r in parts:
        xor ^= int(r["xor_hash"])
        n += int(r["n_rows"])
        chars += int(r["total_chars"])
    return pa.table(
        {
            "n_rows": pa.array([n], _I64),
            "xor_hash": pa.array([xor], _I64),
            "total_chars": pa.array([chars], _I64),
        }
    )


def table_checksum_fast(sf_dir: str, table: str = "documents") -> pa.Table:
    """Production-rate twin of ``table_checksum``: the per-row md5 there
    is load-bearing ONLY for SQL parity (DuckDB recomputes the identical
    value); at 100 TB an interpreter-bound ~80 MB/s/core scan is the
    wrong shape for an anti-entropy pass. This variant folds the
    vectorized 128-bit content-hash pair (``hash_text_array_128``,
    ~3.5 GB/s/core) instead — same order-/partition-independent XOR
    fold, same (count, chars) blind-spot cover, two independent lanes.
    Rows-only for the driver (no SQL twin for xxhash); pytest asserts
    order/partition invariance and single-row sensitivity."""
    from ..functions.hashing import hash_text_array_128

    ds = read_clean(_p(sf_dir, table), columns=["text", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        a, b = hash_text_array_128(batch.column("text"))
        return pa.table(
            {
                "xor_a": pa.array(
                    [int(np.bitwise_xor.reduce(a)) if len(a) else 0], _I64
                ),
                "xor_b": pa.array(
                    [int(np.bitwise_xor.reduce(b)) if len(b) else 0], _I64
                ),
                "n_rows": pa.array([batch.num_rows], _I64),
                "total_chars": pa.array(
                    [int(np.sum(batch.column("n_chars").to_numpy()))], _I64
                ),
            }
        )

    xa = xb = n = chars = 0
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        xa ^= int(r["xor_a"])
        xb ^= int(r["xor_b"])
        n += int(r["n_rows"])
        chars += int(r["total_chars"])
    return pa.table(
        {
            "n_rows": pa.array([n], _I64),
            "xor_a": pa.array([xa], _I64),
            "xor_b": pa.array([xb], _I64),
            "total_chars": pa.array([chars], _I64),
        }
    )
