"""Global ordering primitives: distributed dense row numbering and the
deterministic training shuffle built on it.

Ray Data has no zipWithIndex: ``sort()`` range-partitions blocks into
global order but exposes no block offsets, so "give every row its
global position" needs a primitive. ``global_rank`` supplies it with
one histogram pass + one bucketed shuffle:

  1. per-block FINE bucket histograms (fine = key * F // key_max,
     monotone in the key, F >= 4096) — one thin (bucket, n) row per
     nonzero bucket per block reaches the driver;
  2. the driver folds F counters, then groups contiguous fine buckets
     into C ≈ 2-per-CPU coarse partitions of roughly EQUAL row count
     (count-quantile cuts, so skewed key distributions still balance)
     and broadcasts (fine→coarse map, coarse offsets) via ``ray.put``;
  3. ``groupby(coarse).map_groups`` sorts each partition by
     (key, tiebreak) and assigns ``offset[coarse] + arange(n)`` — one
     Python call per COARSE partition (the repo's coarse-partition
     discipline), vectorized inside.

Only the rank key + tiebreak + caller-selected columns enter the
shuffle; at 10^10 rows each partition holds ~N/C thin rows and the
driver holds F+C int64s — both independent of corpus payload size.

``shuffled_training_order`` is the op a training-data pipeline runs
last: a seeded multiplicative-hash key (Knuth 1998 §6.4; the same
``hash_sample_events`` family the repo already oracles) gives every doc
a pseudo-random but fully deterministic global position — retried
partitions, reruns and the DuckDB ``row_number()`` oracle all agree
row-for-row. The reference stores crawl results in insertion order and
pages them out (``services/news_service.py`` list endpoints); a
pretraining consumer instead needs a reproducible global shuffle, which
is this operator.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.io import read_clean

_I64 = pa.int64()

# multiplicative-hash constants shared verbatim with the SQL oracle
_SHUF_MUL = 2654435761  # Knuth's 2^32 / phi
_SHUF_SEED_MIX = 2654435769  # seed spreader, XORed in BEFORE the multiply
_B32 = 4294967296  # 2^32


def _p(sf_dir: str, table: str) -> str:
    return str(Path(sf_dir) / f"{table}.parquet")


def _nbuckets(n_buckets: int | None) -> int:
    if n_buckets is not None:
        return n_buckets
    return max(4, int(ray.cluster_resources().get("CPU", 4)) * 2)


def fine_bucket_count(C: int, key_max: int) -> int:
    """Fine-histogram resolution for ``C`` coarse partitions over keys
    in [0, key_max): much finer than C so count-quantile cuts balance,
    capped so ``key * F`` can never overflow int64 (F <= 2^62 /
    key_max). Shared by ``global_rank``, ``global_prefix_cutoff`` and
    ``queries.peak_concurrency_daily`` — one overflow bound, one
    place."""
    return max(C, min(max(4096, C * 64), (1 << 62) // max(key_max, 1)))


def count_balanced_coarse(
    counts: np.ndarray, C: int, bases: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Group contiguous fine buckets into ``C`` coarse partitions of
    roughly equal ROW count (count-quantile cuts — balanced under any
    key skew; a single fine bucket is never split) and draw each coarse
    partition's base value from ``bases`` at its first fine bucket.
    Returns (fine->coarse map, per-coarse base). ``bases`` is whatever
    exclusive prefix the caller folds per fine bucket: the row-count
    prefix for ranking, the signed delta prefix for the sweep-line."""
    total = int(counts.sum())
    cumx = np.cumsum(counts) - counts
    fine2coarse = np.minimum((cumx * C) // max(total, 1), C - 1)
    base = np.zeros(C, dtype=bases.dtype)
    present, first_idx = np.unique(fine2coarse, return_index=True)
    base[present] = bases[first_idx]
    return fine2coarse, base


def global_rank(
    ds: rd.Dataset,
    key_col: str,
    tiebreak_col: str,
    *,
    key_max: int = _B32,
    n_buckets: int | None = None,
    out_col: str = "pos",
) -> rd.Dataset:
    """Append ``out_col``: the dense 0-based global rank of every row
    ordered by (``key_col`` asc, ``tiebreak_col`` asc). ``key_col`` must
    be int64 in [0, key_max); (key, tiebreak) must be unique for a
    well-defined total order (ties would still get distinct consecutive
    ranks, in within-bucket lexsort order). All other columns pass
    through; thin inputs (select before ranking) keep the shuffle thin.
    """
    C = _nbuckets(n_buckets)
    # histogram at much finer resolution than the partition count, then
    # group CONTIGUOUS fine buckets into C roughly-equal-count coarse
    # partitions on the driver — balanced shuffle partitions for ANY key
    # distribution (uniform hash keys, skewed lengths, zipfian counts),
    # not just uniform ones. A single fine bucket is never split, so a
    # pileup on ONE key value still lands in one partition (documented;
    # callers with duplicate-heavy keys should widen the key).
    F = fine_bucket_count(C, key_max)
    # two passes (histogram, then rank) read the input twice; pin it
    # once instead — the ranking shuffle already holds a full copy of
    # these rows, so this adds no new memory class, and the caller's
    # thin projection (see above) keeps it bytes-per-row small
    ds = ds.materialize()

    def fine_of(keys: np.ndarray) -> np.ndarray:
        # int64-safe by construction: F <= 2^62 / key_max
        return (keys * F) // key_max

    def hist(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"b": pa.array([], _I64), "n": pa.array([], _I64)})
        cnt = np.bincount(
            fine_of(batch.column(key_col).to_numpy()), minlength=F
        )
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"b": pa.array(nz, _I64), "n": pa.array(cnt[nz], _I64)}
        )

    counts = np.zeros(F, dtype=np.int64)
    for part in ds.map_batches(hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if part.num_rows:
            # iter_batches may coalesce several blocks' partials into one
            # batch, repeating bucket ids — np.add.at, not fancy +=
            np.add.at(
                counts, part.column("b").to_numpy(), part.column("n").to_numpy()
            )
    total = int(counts.sum())
    empty = pa.table(
        {
            **{f.name: pa.array([], f.type) for f in ds.schema().base_schema},
            out_col: pa.array([], _I64),
        }
    )
    if total == 0:
        return rd.from_arrow(empty)
    # exclusive prefix per fine bucket == global rank of its first row;
    # coarse id = which C-quantile of the row count that prefix falls in
    # (monotone, so each coarse partition is a contiguous key range)
    cumx = np.cumsum(counts) - counts
    fine2coarse, off_coarse = count_balanced_coarse(counts, C, cumx)
    bundle_ref = ray.put((fine2coarse, off_coarse))

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return empty.append_column("_bucket", pa.array([], _I64)).drop_columns([out_col])
        f2c, _ = ray.get(bundle_ref)
        coarse = f2c[fine_of(batch.column(key_col).to_numpy())]
        return batch.append_column("_bucket", pa.array(coarse, _I64))

    def rank_bucket(group: pa.Table) -> pa.Table:
        keys = group.column(key_col).to_numpy()
        ties = group.column(tiebreak_col).to_numpy()
        order = np.lexsort((ties, keys))
        _, off = ray.get(bundle_ref)
        base = off[int(group.column("_bucket")[0].as_py())]
        out = group.take(pa.array(order)).drop_columns(["_bucket"])
        return out.append_column(
            out_col, pa.array(base + np.arange(len(order), dtype=np.int64), _I64)
        )

    def normalize(batch: pa.Table) -> pa.Table:
        # map_groups emits 0-column blocks for empty hash-shuffle
        # partitions (join-quirk rule); normalize to the output schema
        if batch.num_columns == 0 or batch.num_rows == 0:
            return empty
        return batch

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow")
    ranked = keyed.groupby("_bucket").map_groups(rank_bucket, batch_format="pyarrow")
    return ranked.map_batches(normalize, batch_format="pyarrow")


def global_prefix_cutoff(
    ds: rd.Dataset,
    key_col: str,
    tiebreak_col: str,
    weight_col: str,
    budget: int,
    *,
    key_max: int = _B32,
    n_buckets: int | None = None,
    out_col: str = "cum",
) -> rd.Dataset:
    """Keep exactly the rows whose INCLUSIVE running ``weight_col`` sum,
    in (``key_col`` asc, ``tiebreak_col`` asc) order, is <= ``budget``;
    append that running sum as ``out_col`` (the SQL
    ``SUM(w) OVER (ORDER BY key, tiebreak) <= budget`` predicate).

    Scale shape: one fine-histogram pass folds per-bucket WEIGHT sums to
    the driver (F int64s); every fine bucket whose exclusive prefix
    already exceeds the budget is dropped IN THE MAP STAGE — selecting a
    1B-token subset of a 100 TB corpus shuffles only the kept prefix
    region, not the corpus. Kept buckets group into count-balanced
    coarse partitions (as in ``global_rank``); each partition sorts,
    cumsums locally on top of its driver-supplied base, and applies the
    exact per-row cut. Weights must be non-negative int64.
    """
    C = _nbuckets(n_buckets)
    F = fine_bucket_count(C, key_max)
    ds = ds.materialize()

    def fine_of(keys: np.ndarray) -> np.ndarray:
        return (keys * F) // key_max

    def hist(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"b": pa.array([], _I64), "w": pa.array([], _I64),
                 "n": pa.array([], _I64)}
            )
        b = fine_of(batch.column(key_col).to_numpy())
        w = batch.column(weight_col).to_numpy()
        wsum = np.bincount(b, weights=w.astype(np.float64), minlength=F)
        cnt = np.bincount(b, minlength=F)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "b": pa.array(nz, _I64),
                "w": pa.array(wsum[nz].astype(np.int64), _I64),
                "n": pa.array(cnt[nz], _I64),
            }
        )

    wsums = np.zeros(F, dtype=np.int64)
    counts = np.zeros(F, dtype=np.int64)
    for part in ds.map_batches(hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if part.num_rows:
            b = part.column("b").to_numpy()
            np.add.at(wsums, b, part.column("w").to_numpy())
            np.add.at(counts, b, part.column("n").to_numpy())
    empty = pa.table(
        {
            **{f.name: pa.array([], f.type) for f in ds.schema().base_schema},
            out_col: pa.array([], _I64),
        }
    )
    total_rows = int(counts.sum())
    if total_rows == 0:
        return rd.from_arrow(empty)
    wcumx = np.cumsum(wsums) - wsums  # exclusive weight prefix per bucket
    # buckets whose exclusive prefix is past the budget can't contribute
    keep_mask = wcumx <= budget
    kept = np.flatnonzero(keep_mask)
    if len(kept) == 0:
        return rd.from_arrow(empty)
    # count-quantile coarse grouping over the KEPT buckets only
    kept_counts = counts[kept]
    kcumx = np.cumsum(kept_counts) - kept_counts
    ktotal = max(int(kept_counts.sum()), 1)
    kept_coarse = np.minimum((kcumx * C) // ktotal, C - 1)
    fine2coarse = np.full(F, -1, dtype=np.int64)
    fine2coarse[kept] = kept_coarse
    base_w = np.zeros(C, dtype=np.int64)
    present, first_idx = np.unique(kept_coarse, return_index=True)
    base_w[present] = wcumx[kept][first_idx]
    bundle_ref = ray.put((fine2coarse, base_w))

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return empty.append_column(
                "_bucket", pa.array([], _I64)
            ).drop_columns([out_col])
        f2c, _ = ray.get(bundle_ref)
        coarse = f2c[fine_of(batch.column(key_col).to_numpy())]
        out = batch.append_column("_bucket", pa.array(coarse, _I64))
        return out.filter(pa.array(coarse >= 0))  # budget-pruned buckets

    def cut(group: pa.Table) -> pa.Table:
        keys = group.column(key_col).to_numpy()
        ties = group.column(tiebreak_col).to_numpy()
        order = np.lexsort((ties, keys))
        _, bases = ray.get(bundle_ref)
        base = bases[int(group.column("_bucket")[0].as_py())]
        w = group.column(weight_col).to_numpy()[order]
        cum = base + np.cumsum(w)
        keep = cum <= budget
        out = group.take(pa.array(order[keep])).drop_columns(["_bucket"])
        return out.append_column(out_col, pa.array(cum[keep], _I64))

    def normalize(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return empty
        return batch

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    done = tagged.groupby("_bucket").map_groups(cut, batch_format="pyarrow")
    return done.map_batches(normalize, batch_format="pyarrow")


def sample_token_budget(
    sf_dir: str,
    *,
    budget: int = 10_000,
    seed: int = 17,
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Deterministic random subset of the corpus holding AT MOST
    ``budget`` whitespace tokens: walk the seeded pseudo-random order
    (skey asc, doc_id asc — the ``shuffled_training_order`` permutation)
    and keep every doc until the next one would push the running token
    total past the budget. The op a pretraining run uses to carve "the
    first N tokens of the shuffled corpus" out of a much larger pool.

    Output: (doc_id, skey, n_tokens, cum) where ``cum`` is the inclusive
    running token sum — SQL-exact vs a ``SUM() OVER (ORDER BY)`` window.

    Scale shape (``global_prefix_cutoff``): the fine weight-histogram
    fold tells the driver where the budget lands, so every block prunes
    rows past the cutoff region BEFORE the shuffle — selecting a
    1B-token subset of a 100 TB corpus moves only ~budget worth of thin
    (doc_id, skey, n_tokens) rows, never the corpus."""
    import pyarrow.compute as pc

    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        trimmed = pc.utf8_trim_whitespace(batch.column("text"))
        counts = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "skey": pa.array(shuffle_key(ids, seed), _I64),
                "n_tokens": pc.cast(counts, pa.int64()),
            }
        )

    ds = docs.map_batches(keyed, batch_format="pyarrow")
    return global_prefix_cutoff(
        ds, "skey", "doc_id", "n_tokens", budget, n_buckets=n_buckets
    )


def shuffle_key(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-id shuffle key in [0, 2^32) — a pure function
    of (id, seed), identical to the SQL oracle's HUGEINT arithmetic.
    The seed XORs in BEFORE the multiply (adding it after would shift
    every key by a constant mod 2^32, leaving the ORDER unchanged except
    at the wrap boundary — caught by the seed-variation test)."""
    mixed = ids.astype(np.uint64) ^ np.uint64((seed * _SHUF_SEED_MIX) % 2**64)
    h = mixed * np.uint64(_SHUF_MUL)
    return (h % np.uint64(_B32)).astype(np.int64)


def shuffled_training_order(
    sf_dir: str, *, seed: int = 17, n_buckets: int | None = None
) -> rd.Dataset:
    """Deterministic global training shuffle of the document corpus:
    (doc_id, skey, pos) where ``pos`` is the doc's position in the
    seeded pseudo-random order (skey asc, doc_id asc on hash ties).
    Reading the corpus back sorted by ``pos`` replays the exact same
    epoch order on any cluster size, after any retry. Only (doc_id,
    skey) — 16 bytes/row — enter the ranking shuffle."""
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id"])

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "skey": pa.array(shuffle_key(ids, seed), _I64),
            }
        )

    ds = docs.map_batches(keyed, batch_format="pyarrow")
    return global_rank(ds, "skey", "doc_id", n_buckets=n_buckets)


def curriculum_training_order(
    sf_dir: str, *, seed: int = 17, n_buckets: int | None = None
) -> rd.Dataset:
    """Length-curriculum ordering (shortest-first, the classic
    curriculum-learning schedule): every doc's global position under
    (n_chars asc, then seeded pseudo-random within equal lengths).
    The composite rank key is ``n_chars * 2^32 + skey`` — ranking it
    with doc_id as the final tiebreak IS the three-level order, and the
    count-quantile coarse partitions inside ``global_rank`` keep the
    shuffle balanced even though document lengths are anything but
    uniform. Output: (doc_id, n_chars, skey, pos); SQL-exact vs a
    three-key ``row_number()``."""
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        n_chars = batch.column("n_chars").to_numpy()
        # composite fits int64 for any real document: n_chars < 2^30
        assert n_chars.max(initial=0) < (1 << 30), "n_chars overflows the key"
        sk = shuffle_key(ids, seed)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "skey": pa.array(sk, _I64),
                "_ckey": pa.array(n_chars * _B32 + sk, _I64),
            }
        )

    # materialize the thin keyed rows here so the max() scan below and
    # global_rank's own two passes all read the pinned copy, not parquet
    ds = docs.map_batches(keyed, batch_format="pyarrow").materialize()
    key_max = (int(ds.max("n_chars") or 0) + 1) * _B32
    ranked = global_rank(
        ds, "_ckey", "doc_id", key_max=key_max, n_buckets=n_buckets
    )
    return ranked.drop_columns(["_ckey"])
