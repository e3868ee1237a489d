"""Query layer: Ray Data pipelines over the corpus tables, DuckDB-parity.

Each function is the Ray-Data-native analog of a reference query shape
(SURVEY.md §2 / §3.2-3.3), runs over the driver-provided parquet tables in
``sf_dir`` and has a matching ANSI-SQL oracle in ``__ray_entry__.oracle_sql``.
Column names match the SQL exactly (the driver hashes values under sorted
column names).

Scale/shape notes honored throughout:
  * reads prune columns (``read_parquet(columns=[...])``)
  * per-batch kernels are pyarrow.compute / numpy — no Python row loops
  * ``groupby().aggregate()`` in Ray Data already computes per-block
    partial aggregates before the shuffle (combiner-style), so grouped
    sums/counts ship one partial row per key per block, not raw rows
  * small-side joins are broadcast (functions/joins.py), never shuffled
  * float aggregates are rounded identically on both sides to make the
    value-hash comparison float-order-insensitive
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions.io import read_clean
from ..functions.joins import (
    broadcast_table,
    make_broadcast_map_fn,
    make_broadcast_semijoin_fn,
    table_to_mapping,
)
from ..functions.text import keyword_search_mask


def _p(sf_dir: str, table: str) -> str:
    return str(Path(sf_dir) / f"{table}.parquet")


def _round_col(ds: rd.Dataset, cols: dict[str, int]) -> rd.Dataset:
    """Round float columns with numpy (NOT pc.round: arrow's kernel is
    off by one ulp from DuckDB/numpy/python rounding for some values,
    which breaks bit-level value-hash comparison against the oracle)."""

    def rnd(batch: pa.Table) -> pa.Table:
        for c, nd in cols.items():
            rounded = np.round(batch.column(c).to_numpy(zero_copy_only=False), nd)
            batch = batch.set_column(
                batch.schema.get_field_index(c), c, pa.array(rounded)
            )
        return batch

    return ds.map_batches(rnd, batch_format="pyarrow")


# ------------------------------------------------------------ aggregations


def q1_lineitem_agg(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1 shape: grouped sums over lineitem (SURVEY A1/A2 analog).

    Ray Data's hash aggregate pre-combines per block, so the shuffle ships
    one partial row per (returnflag, linestatus) per block.
    """
    ds = read_clean(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def add_disc(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(
            batch.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), batch.column("l_discount"))
        )
        return batch.append_column("disc_price", disc)

    ds = ds.map_batches(add_disc, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Count(alias_name="n_rows"),
    )
    return _round_col(out, {"sum_qty": 2, "sum_disc_price": 2})


def count_by_source(sf_dir: str) -> rd.Dataset:
    """Grouped count(*) by source (reference A1, ``db_manage.py:32-36``)."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["source"])
    return ds.groupby("source").aggregate(Count(alias_name="n"))


def count_by_lang(sf_dir: str) -> rd.Dataset:
    ds = read_clean(_p(sf_dir, "documents"), columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n"))


def global_counts(sf_dir: str) -> pa.Table:
    """Conditional global counts (reference A2, ``db_manage.py:27-51``).

    One streaming pass: per-batch partial counts, summed — no groupby
    shuffle at all for a global aggregate.
    """
    ds = read_clean(_p(sf_dir, "documents"), columns=["n_chars", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_total": pa.array([batch.num_rows], pa.int64()),
                "n_long": pa.array(
                    [pc.sum(pc.greater_equal(batch.column("n_chars"), 200)).as_py() or 0],
                    pa.int64(),
                ),
                "n_en": pa.array(
                    [pc.sum(pc.equal(batch.column("lang"), "en")).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = parts.aggregate(Sum("n_total", alias_name="n_total"),
                          Sum("n_long", alias_name="n_long"),
                          Sum("n_en", alias_name="n_en"))
    return pa.table({k: pa.array([v], pa.int64()) for k, v in out.items()})


def avg_value_by_type(sf_dir: str) -> rd.Dataset:
    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Mean("value", alias_name="avg_value"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
        Count(alias_name="n"),
    )
    return _round_col(out, {"avg_value": 4, "min_value": 4, "max_value": 4})


def zscore_anomaly_events(sf_dir: str, *, z_cut: float = 3.0) -> rd.Dataset:
    """Per-type z-score outlier detection over the events stream — the
    classic monitoring pass (flag values more than ``z_cut`` sample
    standard deviations from their type's mean). Two stages: ONE grouped
    (n, sum, sum-of-squares) aggregate (types are low-cardinality, rows
    are thin), moments broadcast as a numpy bundle, then a shuffle-free
    map emits the anomalous rows. The sum-of-squares formula
    sd = sqrt((ss - s^2/n) / (n-1)) is written out identically in the
    SQL oracle (DuckDB's own STDDEV uses a different one-pass recurrence
    whose last-ulp results may differ); the threshold compares the
    ROUNDED z on both sides so the cut can't straddle float noise."""
    import ray

    ds = read_clean(_p(sf_dir, "events"), columns=["event_id", "event_type", "value"])

    def sq(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy()
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
                "value2": pa.array(v * v, pa.float64()),
            }
        )

    agg = ds.map_batches(sq, batch_format="pyarrow").groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value", alias_name="s"),
        Sum("value2", alias_name="ss"),
    )
    parts = [
        b for b in agg.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    mom = pa.concat_tables(parts).combine_chunks()
    types = np.array(mom.column("event_type").to_pylist())
    n = mom.column("n").to_numpy().astype(np.float64)
    s = mom.column("s").to_numpy()
    ss = mom.column("ss").to_numpy()
    mu = s / n
    sd = np.sqrt((ss - s * s / n) / (n - 1.0))
    order = np.argsort(types)
    bundle_ref = ray.put((types[order], mu[order], sd[order]))

    def flag(batch: pa.Table) -> pa.Table:
        t, m, d = ray.get(bundle_ref)
        keys = np.array(batch.column("event_type").to_pylist())
        pos = np.searchsorted(t, keys)
        v = batch.column("value").to_numpy()
        z = np.round((v - m[pos]) / d[pos] + 1e-9, 4)
        keep = np.abs(z) > z_cut
        kept = batch.filter(pa.array(keep))
        return pa.table(
            {
                "event_id": kept.column("event_id"),
                "event_type": kept.column("event_type"),
                "value": pa.array(np.round(v[keep], 4), pa.float64()),
                "z": pa.array(z[keep], pa.float64()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def part_brand_stats(sf_dir: str) -> rd.Dataset:
    ds = read_clean(_p(sf_dir, "part"), columns=["p_brand", "p_retailprice"])
    out = ds.groupby("p_brand").aggregate(
        Count(alias_name="n"), Sum("p_retailprice", alias_name="total_price")
    )
    return _round_col(out, {"total_price": 2})


def orders_by_status(sf_dir: str) -> rd.Dataset:
    ds = read_clean(_p(sf_dir, "orders"), columns=["o_orderstatus", "o_totalprice"])
    out = ds.groupby("o_orderstatus").aggregate(
        Count(alias_name="n"), Sum("o_totalprice", alias_name="total")
    )
    return _round_col(out, {"total": 2})


def shipped_before_agg(sf_dir: str) -> rd.Dataset:
    """Filter pushdown at the read + grouped agg (pruned columns only)."""
    import pyarrow.dataset as pads

    ds = read_clean(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_shipdate"],
        filter=pads.field("l_shipdate") < pa.scalar(pa.compute.strptime("1996-01-01", "%Y-%m-%d", "us").as_py()),
    )
    out = ds.groupby("l_returnflag").aggregate(
        Count(alias_name="n"), Sum("l_quantity", alias_name="sum_qty")
    )
    return _round_col(out, {"sum_qty": 2})


# ------------------------------------------------------------ search / filter


def search_keywords(sf_dir: str) -> rd.Dataset:
    """Whole-word, case-insensitive, multi-keyword AND search (reference
    ``/search``, ``main.py:271-294``) + min-length gate, vectorized RE2."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "source", "n_chars", "text"])

    def filt(batch: pa.Table) -> pa.Table:
        mask = keyword_search_mask(batch, ["spark", "merge"], ["text"])
        mask = pc.and_(mask, pc.greater_equal(batch.column("n_chars"), 100))
        return batch.filter(mask).select(["doc_id", "source", "n_chars"])

    return ds.map_batches(filt, batch_format="pyarrow")


def search_substring(sf_dir: str) -> rd.Dataset:
    """Substring ILIKE search (reference ``db_manage.py:149-154``)."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "lang", "text"])

    def filt(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring(batch.column("text"), "window", ignore_case=True)
        return batch.filter(pc.fill_null(mask, False)).select(["doc_id", "lang"])

    return ds.map_batches(filt, batch_format="pyarrow")


def excluded_filter(sf_dir: str) -> rd.Dataset:
    """Broadcast anti-semi-join vs a small blocklist (reference M1/J2,
    ``utils/url_utils.py:18-34``): blocklist in every worker, no shuffle."""
    import ray

    blockset = {"src0", "src13", "src7"}
    ref = ray.put(blockset)
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "source", "lang"])
    ds = ds.map_batches(
        make_broadcast_semijoin_fn("source", ref, anti=True), batch_format="pyarrow"
    )

    def filt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch.column("lang"), "zh"))

    return ds.map_batches(filt, batch_format="pyarrow")


def salted_returnflag_agg(sf_dir: str) -> rd.Dataset:
    """Hot-key aggregation with explicit salting (north_rule skew
    mitigation): l_returnflag has 3 values over 600k rows — every key is
    hot — so the first groupby runs on (key, salt) and the reduce fans
    out 16-way per key before a tiny final merge. Same result as a
    direct groupby (the SQL oracle)."""
    from ..functions.skew import salted_groupby_sum

    ds = read_clean(
        _p(sf_dir, "lineitem"), columns=["l_returnflag", "l_quantity"]
    )
    out = salted_groupby_sum(
        ds, "l_returnflag", {"l_quantity": "sum_qty"}, count_alias="n"
    )
    return _round_col(out, {"sum_qty": 2})


def purge_old_events(sf_dir: str) -> rd.Dataset:
    """Delete-by-age rewrite (reference K5, ``scripts/db_manage.py:62-90``):
    the kept rows of a bulk delete expressed as a streaming anti-filter —
    at scale this rewrites the table partition by partition."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_id", "ts", "event_type"])

    def keep(batch: pa.Table) -> pa.Table:
        cutoff = pa.scalar(pc.strptime("2024-01-15", "%Y-%m-%d", "us").as_py())
        return batch.filter(pc.greater_equal(batch.column("ts"), cutoff))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_events(sf_dir: str) -> rd.Dataset:
    """Seeded record sampling (the one thing the reference's randomness
    never does — SURVEY O4 — but a training-data pipeline needs).
    Deterministic per seed; rows-only check (no SQL sampling oracle)."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_id", "event_type"])
    return ds.random_sample(0.1, seed=7)


# ------------------------------------------------------------ sort / top-k


def recent_topk(sf_dir: str) -> rd.Dataset:
    """Global top-k by recency with deterministic tiebreak (reference O1,
    ``google_news_crawler.py:518-519`` — the crawl-ordering sort)."""
    ds = read_clean(
        _p(sf_dir, "events"), columns=["event_id", "ts", "event_type", "value"]
    )
    out = ds.sort(["ts", "event_id"], descending=[True, False]).limit(100)
    return _round_col(out, {"value": 4})


def page_offset(sf_dir: str) -> pa.Table:
    """ORDER BY ts DESC OFFSET 100 LIMIT 50 (reference O2, ``main.py:296``)."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_id", "ts", "event_type"])
    rows = ds.sort(["ts", "event_id"], descending=[True, False]).limit(150).take_all()
    return pa.Table.from_pylist(rows[100:150])


def top_orders_per_segment(sf_dir: str, *, k: int = 3) -> rd.Dataset:
    """Per-group top-k (window-rank analog, SURVEY O1 generalized):
    orders ranked by (totalprice DESC, orderkey ASC) within market
    segment.

    Two-level plan (the ``frequent_users`` partial-top-k shape, not one
    pandas call holding a segment's every order): a vectorized partial
    top-k per BLOCK first shrinks each block to <= k rows per segment,
    then the per-segment final ranks only those partials — the shuffle
    ships k rows per (block, segment), never the raw orders, so a
    segment with a billion orders costs the same as one with a
    thousand."""
    import pyarrow.parquet as pq

    cust = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    ref = broadcast_table(table_to_mapping(cust, "c_custkey", "c_mktsegment"))
    ds = read_clean(_p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"])
    ds = ds.map_batches(
        make_broadcast_map_fn("o_custkey", "c_mktsegment", ref, pa.string()),
        batch_format="pyarrow",
    )

    def grouped_topk(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch.select(["c_mktsegment", "o_orderkey", "o_totalprice"])
        codes = (
            batch.column("c_mktsegment")
            .combine_chunks()
            .dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
        )
        okey = batch.column("o_orderkey").to_numpy()
        price = batch.column("o_totalprice").to_numpy()
        order = np.lexsort((okey, -price, codes))
        cs = codes[order]
        new = np.empty(len(cs), bool)
        new[0] = True
        new[1:] = cs[1:] != cs[:-1]
        starts = np.nonzero(new)[0]
        seg = np.cumsum(new) - 1
        rank = np.arange(len(cs)) - starts[seg]
        keep = np.sort(order[rank < k])
        return batch.select(["c_mktsegment", "o_orderkey", "o_totalprice"]).take(
            pa.array(keep)
        )

    partials = ds.map_batches(grouped_topk, batch_format="pyarrow")
    return (
        partials.groupby("c_mktsegment")
        .map_groups(grouped_topk, batch_format="pyarrow")
    )


# ------------------------------------------------------------ dedup


def dedup_first_wins(sf_dir: str) -> rd.Dataset:
    """Exact first-wins dedup by key (reference D2/D3 URL dedup semantics):
    hash-partition by key, keep min sequence id per group."""
    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "event_type", "event_id"])
    return ds.groupby(["user_id", "event_type"]).aggregate(
        Min("event_id", alias_name="first_event_id")
    )


# ------------------------------------------------------------ joins


def seg_revenue(sf_dir: str) -> rd.Dataset:
    """orders ⋈ customer (broadcast small side) → revenue by segment
    (reference J1 lifted to an analytical join; no shuffle join)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    ref = broadcast_table(table_to_mapping(cust, "c_custkey", "c_mktsegment"))
    ds = read_clean(_p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    ds = ds.map_batches(
        make_broadcast_map_fn("o_custkey", "c_mktsegment", ref, pa.string()),
        batch_format="pyarrow",
    )
    out = ds.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders")
    )
    return _round_col(out, {"revenue": 2})


def nation_orders(sf_dir: str) -> rd.Dataset:
    """orders ⋈ customer ⋈ nation via two chained broadcast lookups."""
    import pyarrow.parquet as pq

    cust = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    cust_ref = broadcast_table(table_to_mapping(cust, "c_custkey", "c_nationkey"))
    nat_ref = broadcast_table(table_to_mapping(nat, "n_nationkey", "n_name"))
    ds = read_clean(_p(sf_dir, "orders"), columns=["o_custkey"])
    ds = ds.map_batches(
        make_broadcast_map_fn("o_custkey", "nationkey", cust_ref, pa.int32()),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(
        make_broadcast_map_fn("nationkey", "n_name", nat_ref, pa.string()),
        batch_format="pyarrow",
    )
    return ds.groupby("n_name").aggregate(Count(alias_name="n_orders"))


def value_quantiles(sf_dir: str, *, qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99)) -> pa.Table:
    """Exact quantiles with linear interpolation (same definition as SQL
    ``quantile_cont``): one distributed sort, then only the 2 boundary
    rows per quantile leave the cluster (``split_at_indices`` + tiny
    takes) — order statistics without materializing the sorted column."""
    ds = read_clean(_p(sf_dir, "events"), columns=["value"]).sort("value")
    n = ds.count()
    if n == 0:
        # no order statistics exist on an empty table (and min(lo+1, n-1)
        # below would produce a negative split index)
        return pa.table(
            {
                "q": pa.array(list(qs), pa.float64()),
                "value": pa.array([None] * len(qs), pa.float64()),
            }
        )
    positions = [(len_q := (n - 1) * q, int(len_q), len_q - int(len_q)) for q in qs]
    need = sorted({i for _, lo, _ in positions for i in (lo, min(lo + 1, n - 1))})
    splits = ds.split_at_indices(need)
    # row at sorted index need[j] is the first row of splits[j+1]; every
    # boundary index is < n, so splits[j+1] is never empty
    boundary = {}
    for j, idx in enumerate(need):
        boundary[idx] = splits[j + 1].take(1)[0]["value"]
    vals = []
    for q, (_, lo, frac) in zip(qs, positions):
        hi = min(lo + 1, n - 1)
        v = boundary[lo] + frac * (boundary[hi] - boundary[lo])
        vals.append(float(np.round(v, 4)))
    return pa.table(
        {"q": pa.array(list(qs), pa.float64()), "value": pa.array(vals, pa.float64())}
    )


def approx_quantiles(
    sf_dir: str, *, qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99), delta: int = 200
) -> pa.Table:
    """Approximate quantiles via mergeable t-digest sketches: one ~KB
    digest per batch inside ``map_batches``, merged in a tiny final pass
    — the 100 TB alternative to ``value_quantiles``'s exact distributed
    sort (a full shuffle). Rank error O(q(1-q)/delta); asserted against
    the exact path in tests. Rows-only for the driver (approximate)."""
    from ..functions.sketches import TDigest

    ds = read_clean(_p(sf_dir, "events"), columns=["value"])

    def sketch_batch(batch: pa.Table) -> pa.Table:
        d = TDigest(delta)
        d.add(batch.column("value").to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([d.serialize()], pa.binary())})

    sketches = ds.map_batches(sketch_batch, batch_size=8192, batch_format="pyarrow")
    merged = None
    for b in sketches.iter_batches(batch_size=256, batch_format="pyarrow"):
        for blob in b.column("sketch").to_pylist():
            s = TDigest.deserialize(blob)
            merged = s if merged is None else merged.merge(s)
    vals = [
        float(np.round(merged.quantile(q), 4)) if merged is not None else None
        for q in qs
    ]
    return pa.table(
        {"q": pa.array(list(qs), pa.float64()), "value": pa.array(vals, pa.float64())}
    )


def approx_distinct_users(sf_dir: str, *, p: int = 12) -> pa.Table:
    """Approximate distinct count via mergeable HyperLogLog sketches: one
    ~4 KB sketch per batch inside ``map_batches``, merged in a tiny final
    pass — no shuffle of raw keys at any scale (vs ``unique``/
    ``COUNT(DISTINCT)`` which exchange every row). Accuracy ±~1.6% at
    p=12; asserted against the exact count in tests. Rows-only for the
    driver (approximate ≠ SQL-exact)."""
    from ..functions.sketches import HyperLogLog

    ds = read_clean(_p(sf_dir, "events"), columns=["user_id"])

    def sketch_batch(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        h.add_ints(batch.column("user_id").to_numpy())
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    sketches = ds.map_batches(sketch_batch, batch_size=8192, batch_format="pyarrow")
    merged = None
    for b in sketches.iter_batches(batch_size=256, batch_format="pyarrow"):
        for blob in b.column("sketch").to_pylist():
            s = HyperLogLog.deserialize(blob)
            merged = s if merged is None else merged.merge(s)
    est = int(round(merged.estimate())) if merged else 0
    return pa.table({"approx_distinct_users": pa.array([est], pa.int64())})


# ------------------------------------------------------------ as-of join


def purchase_click_asof(sf_dir: str) -> rd.Dataset:
    """As-of join (custom operator — Ray Data has none): each purchase
    event matched to the latest click at-or-before it by the same user.

    Coarse-bucket execution (not one pandas call per user — the repo's
    measured slow idiom): users hash into ~4P buckets via
    ``_knuth_bucket``, ONE ``map_groups`` call per bucket; inside, a
    single lexsort by (user, ts, kind, id) with clicks ordered before
    purchases at equal ts, then a per-segment-reset
    ``np.maximum.accumulate`` of click row indices resolves every
    purchase's latest-click match vectorized (an accumulated index that
    predates the user's segment start means "no click yet" -> null).
    Ties (several clicks at one ts) resolve to the highest event_id —
    the same row ``pd.merge_asof`` picks. Only (id, user, type, ts)
    columns ever shuffle. DuckDB's ASOF JOIN is the oracle.
    """
    import ray

    ds = read_clean(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )
    B = max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)

    def tag(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch.column("event_type"), value_set=pa.array(["purchase", "click"])
        )
        batch = batch.filter(keep)
        part = _knuth_bucket(batch.column("user_id").to_numpy(), B)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def asof(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        is_click = pc.equal(g.column("event_type"), "click").to_numpy(
            zero_copy_only=False
        )
        kind = np.where(is_click, 0, 1)  # click sorts before purchase at a tie
        order = np.lexsort((eid, kind, ts, uid))
        uid, eid, is_click = uid[order], eid[order], is_click[order]
        n = len(uid)
        if n == 0:
            return pa.table(
                {"purchase_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "click_id": pa.array([], pa.float64())}
            )
        bounds = np.empty(n, dtype=bool)
        bounds[0] = True
        bounds[1:] = uid[1:] != uid[:-1]
        seg_first = np.flatnonzero(bounds)
        seg_start = np.repeat(seg_first, np.diff(np.append(seg_first, n)))
        idx = np.arange(n)
        last_click = np.maximum.accumulate(np.where(is_click, idx, -1))
        purch = ~is_click
        m = last_click[purch]
        valid = m >= seg_start[purch]  # a click from an earlier user doesn't count
        click_id = np.where(valid, eid[np.maximum(m, 0)], 0).astype(np.float64)
        return pa.table(
            {
                "purchase_id": pa.array(eid[purch], pa.int64()),
                "user_id": pa.array(uid[purch], pa.int64()),
                # float64 with nulls for unmatched — the dtype the pandas
                # implementation produced (NaN -> null on block convert)
                "click_id": pa.array(click_id, pa.float64(), mask=~valid),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(asof, batch_format="pyarrow")
    )


# ------------------------------------------------------------ windows


def events_daily_window(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-day window per event_type (SURVEY §2.9: the rebuild's
    window analog — event-time bucket computed vectorized, then grouped)."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def add_day(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        return batch.append_column("day", day).drop_columns(["ts"])

    ds = ds.map_batches(add_day, batch_format="pyarrow")
    out = ds.groupby(["event_type", "day"]).aggregate(
        Count(alias_name="n"), Sum("value", alias_name="total")
    )
    out = _round_col(out, {"total": 4})

    def fix_day_unit(batch: pa.Table) -> pa.Table:
        # the groupby shuffle downcasts day to second precision; restore
        # timestamp[us] so the schema matches the SQL oracle exactly
        i = batch.schema.get_field_index("day")
        return batch.set_column(
            i, "day", pc.cast(batch.column("day"), pa.timestamp("us"))
        )

    return out.map_batches(fix_day_unit, batch_format="pyarrow")


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_daily(sf_dir: str) -> rd.Dataset:
    """PIVOT: one row per day with one count column per event type
    (n_click, n_error, ...) — the wide layout a dashboard reads.
    Expressed as indicator columns + ONE grouped Sum (the distributed
    pivot shape: no per-type scans, no post-join); the type set is the
    schema and must be closed, as in SQL PIVOT."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "ts"])

    def indicators(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        cols = {"day": day}
        for t in _EVENT_TYPES:
            cols[f"n_{t}"] = pc.cast(
                pc.equal(batch.column("event_type"), t), pa.int64()
            )
        return pa.table(cols)

    ds = ds.map_batches(indicators, batch_format="pyarrow")
    out = ds.groupby("day").aggregate(
        *[Sum(f"n_{t}", alias_name=f"n_{t}") for t in _EVENT_TYPES]
    )

    def fix_day_unit(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("day")
        return batch.set_column(
            i, "day", pc.cast(batch.column("day"), pa.timestamp("us"))
        )

    return out.map_batches(fix_day_unit, batch_format="pyarrow")


def events_rollup(sf_dir: str) -> rd.Dataset:
    """ROLLUP: per-type counts/sums plus the grand-total row (event_type
    = NULL) in ONE result — the OLAP subtotal shape. The grand total is
    derived by re-aggregating the (tiny) grouped result, not by a second
    scan of the input."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "value"])
    per_type = ds.groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("value", alias_name="total")
    ).materialize()
    parts = [
        b for b in per_type.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    t = pa.concat_tables(parts).combine_chunks()
    grand = pa.table(
        {
            "event_type": pa.array([None], pa.string()),
            "n": pa.array([int(pc.sum(t.column("n")).as_py() or 0)], pa.int64()),
            "total": pa.array(
                [float(pc.sum(t.column("total")).as_py() or 0.0)], pa.float64()
            ),
        }
    )
    out = rd.from_arrow(pa.concat_tables([t, grand]))
    return _round_col(out, {"total": 4})


def events_unpivot_daily(sf_dir: str) -> rd.Dataset:
    """UNPIVOT (melt): the wide day x type grid back to long
    (day, event_type, n) rows — KEEPING zero cells (a day with no
    errors yields an explicit n=0 row), which is what distinguishes the
    melt of the dense grid from the plain grouped count. One flat map
    over the (tiny, day-count-sized) pivot output."""
    wide = events_pivot_daily(sf_dir)

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        days, types, vals = [], [], []
        for t in _EVENT_TYPES:
            days.append(batch.column("day"))
            types.append(pa.array([t] * n, pa.string()))
            vals.append(batch.column(f"n_{t}"))
        return pa.table(
            {
                "day": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                     for c in days]
                ),
                "event_type": pa.concat_arrays(types),
                "n": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                     for c in vals]
                ),
            }
        )

    return wide.map_batches(melt, batch_format="pyarrow")


def events_daily_delta(sf_dir: str) -> rd.Dataset:
    """LAG window: day-over-day count change per event type
    (n, n_prev, delta; the first day of each type has n_prev = 0 —
    COALESCE'd LAG). The daily counts are aggregate-sized (days x
    types), so the offset window runs as a per-type sort + shift inside
    ``map_groups`` over the tiny grouped result — the window never
    touches raw events."""
    long = events_unpivot_daily(sf_dir)  # dense grid: zero cells included

    def delta(group: pa.Table) -> pa.Table:
        day = group.column("day").to_numpy()
        n = group.column("n").to_numpy()
        order = np.argsort(day)
        d, nn = day[order], n[order]
        prev = np.r_[0, nn[:-1]]
        return pa.table(
            {
                "event_type": group.column("event_type").take(pa.array(order)),
                "day": pa.array(d),
                "n": pa.array(nn, pa.int64()),
                "n_prev": pa.array(prev, pa.int64()),
                "delta": pa.array(nn - prev, pa.int64()),
            }
        )

    out = long.groupby("event_type").map_groups(delta, batch_format="pyarrow")

    def fix_day_unit(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "day": pa.array([], pa.timestamp("us")),
                 "n": pa.array([], pa.int64()),
                 "n_prev": pa.array([], pa.int64()),
                 "delta": pa.array([], pa.int64())}
            )
        i = batch.schema.get_field_index("day")
        return batch.set_column(
            i, "day", pc.cast(batch.column("day"), pa.timestamp("us"))
        )

    return out.map_batches(fix_day_unit, batch_format="pyarrow")


def customer_urgent_counts(sf_dir: str) -> rd.Dataset:
    """LEFT OUTER join preserving zero-count rows: per customer, the
    number of URGENT orders — customers with none stay in the result
    with 0 (the missing join type in the inner/semi/anti/asof family).
    Right side is pre-aggregated to thin (custkey, n) rows BEFORE the
    join (filter at the read + grouped count), so the outer join moves
    one row per customer and one per matched key — never raw orders."""
    import ray
    import pyarrow.dataset as pads

    cust = read_clean(_p(sf_dir, "customer"), columns=["c_custkey"])
    orders = read_clean(
        _p(sf_dir, "orders"),
        columns=["o_custkey", "o_orderpriority"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    ).select_columns(["o_custkey"])
    counts = orders.groupby("o_custkey").aggregate(Count(alias_name="n_urgent"))
    nparts = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    j = cust.repartition(nparts).join(
        counts.repartition(nparts),
        join_type="left_outer",
        num_partitions=nparts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"c_custkey": pa.array([], pa.int64()),
                 "n_urgent": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey"),
                "n_urgent": pc.fill_null(
                    pc.cast(batch.column("n_urgent"), pa.int64()), 0
                ),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------ text stats


def token_stats(sf_dir: str) -> rd.Dataset:
    """Whitespace token count per doc, vectorized (split + list_value_length)."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch.column("text"))
        counts = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_tokens": pc.cast(counts, pa.int64())}
        )

    return ds.map_batches(toks, batch_format="pyarrow")


# ----------------------------------------------------- range join / rolling


def purchase_click_window(sf_dir: str, *, minutes: int = 60) -> rd.Dataset:
    """Range (interval) join: per purchase, count same-user clicks in the
    preceding ``minutes`` window (custom operator — Ray Data has no range
    join). Coarse-bucket execution like the as-of join: users hash into
    ~4P buckets, ONE kernel call per bucket. Inside, the window count is
    a MERGED-EVENT scan, not per-user searchsorted loops: every click
    (kind 0) sorts together with two probe rows per purchase — one at
    ``ts`` (upper bound, inclusive) and one at ``ts - minutes`` (lower
    bound, exclusive) — by (user, ts, kind); a segment-reset cumulative
    click count read at each probe position yields hi/lo for all
    purchases in one vectorized pass. Only (id, key, type, ts) columns
    ever shuffle."""
    import ray

    ds = read_clean(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )
    B = max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)
    win_us = np.int64(minutes) * 60_000_000

    def tag(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch.column("event_type"), value_set=pa.array(["purchase", "click"])
        )
        batch = batch.filter(keep)
        part = _knuth_bucket(batch.column("user_id").to_numpy(), B)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def windowed(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        is_click = pc.equal(g.column("event_type"), "click").to_numpy(
            zero_copy_only=False
        )
        p_mask = ~is_click
        pu, pt, pe = uid[p_mask], ts[p_mask], eid[p_mask]
        np_rows = len(pu)
        if np_rows == 0:
            return pa.table(
                {"purchase_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "n_recent_clicks": pa.array([], pa.int64())}
            )
        cu, ct = uid[is_click], ts[is_click]
        nc = len(cu)
        # merged array: clicks | hi-probes (ts) | lo-probes (ts - w)
        all_uid = np.concatenate([cu, pu, pu])
        all_ts = np.concatenate([ct, pt, pt - win_us])
        kind = np.zeros(nc + 2 * np_rows, np.int8)
        kind[nc:] = 1  # probes sort AFTER clicks at an equal ts (<=)
        order = np.lexsort((kind, all_ts, all_uid))
        s_uid = all_uid[order]
        s_click = (order < nc).astype(np.int64)
        n = len(s_uid)
        bounds = np.empty(n, dtype=bool)
        bounds[0] = True
        bounds[1:] = s_uid[1:] != s_uid[:-1]
        seg_first = np.flatnonzero(bounds)
        csum = np.cumsum(s_click)
        base = np.repeat(
            csum[seg_first] - s_click[seg_first],
            np.diff(np.append(seg_first, n)),
        )
        clicks_upto = csum - base  # per row: same-user clicks with ts <= row ts
        # scatter back to original probe positions
        probe_counts = np.empty(n, np.int64)
        probe_counts[order] = clicks_upto
        hi = probe_counts[nc : nc + np_rows]
        lo = probe_counts[nc + np_rows :]
        return pa.table(
            {
                "purchase_id": pa.array(pe, pa.int64()),
                "user_id": pa.array(pu, pa.int64()),
                "n_recent_clicks": pa.array(hi - lo, pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(windowed, batch_format="pyarrow")
    )


def events_rolling_7d(sf_dir: str) -> rd.Dataset:
    """Sliding calendar window (SURVEY §2.9): per event_type and day, the
    rolling 7-day (current + 6 preceding days) event count and value sum.

    Two-level plan that scales: the big table collapses to one row per
    (type, day) via a pre-combined hash aggregate; the rolling frame then
    runs per type over that tiny daily series (searchsorted window
    bounds) — the expensive pass never sees a window, the window never
    sees the raw events."""
    import pandas as pd

    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def add_day(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        return batch.append_column("day", day).drop_columns(["ts"])

    daily = ds.map_batches(add_day, batch_format="pyarrow").groupby(
        ["event_type", "day"]
    ).aggregate(Count(alias_name="n"), Sum("value", alias_name="v"))

    def roll(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("day")
        d = g["day"].to_numpy().astype("datetime64[D]").astype(np.int64)
        n = g["n"].to_numpy()
        v = g["v"].to_numpy()
        lo = np.searchsorted(d, d - 6, side="left")
        n7 = np.array([int(n[l : i + 1].sum()) for i, l in enumerate(lo)], np.int64)
        v7 = np.array([round(float(v[l : i + 1].sum()), 4) for i, l in enumerate(lo)])
        return pd.DataFrame(
            {
                "event_type": g["event_type"].to_numpy(),
                "day": g["day"].to_numpy(),
                "n": n.astype(np.int64),
                "n_7d": n7,
                "total_7d": v7,
            }
        )

    out = daily.groupby("event_type").map_groups(roll, batch_format="pandas")

    def fix_day_unit(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("day")
        return batch.set_column(
            i, "day", pc.cast(batch.column("day"), pa.timestamp("us"))
        )

    return out.map_batches(fix_day_unit, batch_format="pyarrow")


# ------------------------------------------------- large-large hash join


def order_priority_revenue(sf_dir: str, *, num_partitions: int | None = None) -> rd.Dataset:
    """Revenue by order priority: lineitem JOIN orders where BOTH sides
    are large — the hash-shuffle-join path that complements the
    broadcast joins used when one side is small (seg_revenue etc.).

    lineitem first collapses to one row per order (pre-combined hash
    aggregate: the shuffle ships (orderkey, rev, n) partials, not line
    items), then ``Dataset.join`` hash-partitions both sides by
    orderkey, then a tiny groupby by priority finishes. No driver-side
    state, no broadcast — the shape that holds when orders outgrows any
    single worker."""
    import ray

    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    li = read_clean(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        # arrow C++ group_by per batch: lineitem is orderkey-clustered, so
        # this is a near-total combine — no global per-order aggregate
        # needed (sums re-merge associatively after the join)
        r = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table({"o_orderkey": batch.column("l_orderkey"), "rev": r})
        g = t.group_by("o_orderkey").aggregate([("rev", "sum"), ("rev", "count")])
        return pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "rev": g.column("rev_sum"),
                "n_items": pc.cast(g.column("rev_count"), pa.int64()),
            }
        )

    per_order = li.map_batches(rev_partial, batch_format="pyarrow")

    orders = read_clean(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    )
    joined = per_order.join(
        orders, join_type="inner", num_partitions=num_partitions, on=("o_orderkey",)
    )
    out = joined.groupby("o_orderpriority").aggregate(
        Sum("rev", alias_name="revenue"), Sum("n_items", alias_name="n_items")
    )
    return _round_col(out, {"revenue": 2})


def hash_sample_events(sf_dir: str, *, rate_num: int = 429496729) -> rd.Dataset:
    """Deterministic hash sampling (~10%): keep rows where the Knuth
    multiplicative hash of the key lands under the rate threshold.
    Unlike seeded ``random_sample`` this is reproducible across engines,
    so a SQL oracle checks it exactly — and at scale it is the sampling
    you can re-run per partition after a retry without changing the
    sample (pure function of the key, no RNG state)."""
    ds = read_clean(
        _p(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_numpy().astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(4294967296)
        out = batch.filter(pa.array(h < np.uint64(rate_num)))
        return out

    out = ds.map_batches(keep, batch_format="pyarrow")
    return _round_col(out, {"value": 4})


def stratified_sample_events(sf_dir: str, *, k: int = 20) -> rd.Dataset:
    """Deterministic STRATIFIED sample: the k events with the smallest
    Knuth multiplicative hash within each event_type (ties broken by
    event_id) — per-source balanced sampling for training-data curation,
    reproducible across engines and retries (pure function of the keys,
    no RNG state), so a SQL window-rank oracle checks it exactly.

    Combiner shape for scale: every block first keeps its LOCAL per-group
    top-k (vectorized lexsort + segment ranks), so the shuffle ships at
    most k rows per (group, block) instead of the whole table; the final
    per-group head-k runs over those partials only."""
    import pandas as pd

    ds = read_clean(
        _p(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def khash(ids: np.ndarray) -> np.ndarray:
        return (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            4294967296
        )

    def partial_topk(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch
        ids = batch.column("event_id").to_numpy()
        h = khash(ids)
        codes = (
            batch.column("event_type")
            .combine_chunks()
            .dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((ids, h, codes))
        cs = codes[order]
        new = np.empty(len(cs), bool)
        new[0] = True
        new[1:] = cs[1:] != cs[:-1]
        starts = np.nonzero(new)[0]
        seg = np.cumsum(new) - 1
        rank = np.arange(len(cs)) - starts[seg]
        keep = order[rank < k]
        return batch.take(pa.array(np.sort(keep)))

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(_h=khash(g["event_id"].to_numpy()))
        g = g.sort_values(["_h", "event_id"]).head(k)
        return g[["event_type", "event_id", "value"]]

    out = partials.groupby("event_type").map_groups(head_k, batch_format="pandas")
    return _round_col(out, {"value": 4})


def frequent_users(sf_dir: str, *, topn: int = 10) -> rd.Dataset:
    """EXACT top-n heavy hitters: grouped count (pre-combined hash
    aggregate) then a tiny sort over one row per user — the pattern for
    top-k BY AGGREGATE (vs ``recent_topk`` which top-ks raw rows)."""
    ds = read_clean(_p(sf_dir, "events"), columns=["user_id"])
    out = ds.groupby("user_id").aggregate(Count(alias_name="n"))
    return out.sort(["n", "user_id"], descending=[True, False]).limit(topn)


def approx_frequent_users(sf_dir: str, *, topn: int = 10, k: int = 256) -> pa.Table:
    """Approximate heavy hitters via mergeable Misra-Gries summaries:
    one ~k*16-byte sketch per batch inside ``map_batches``, merged in a
    tiny final pass — no shuffle of raw keys at any scale. Every key
    with true count > n/(k+1) is guaranteed surfaced and counter error
    is bounded by n/(k+1); both bounds asserted vs the exact query in
    tests. Rows-only for the driver (approximate ≠ SQL-exact)."""
    from ..functions.sketches import MisraGries

    ds = read_clean(_p(sf_dir, "events"), columns=["user_id"])

    def sketch_batch(batch: pa.Table) -> pa.Table:
        m = MisraGries(k)
        m.add_ints(batch.column("user_id").to_numpy())
        return pa.table({"sketch": pa.array([m.serialize()], pa.binary())})

    sketches = ds.map_batches(sketch_batch, batch_size=8192, batch_format="pyarrow")
    merged = None
    for b in sketches.iter_batches(batch_size=256, batch_format="pyarrow"):
        for blob in b.column("sketch").to_pylist():
            s = MisraGries.deserialize(blob)
            merged = s if merged is None else merged.merge(s)
    top = merged.top(topn) if merged is not None else []
    return pa.table(
        {
            "user_id": pa.array([t[0] for t in top], pa.int64()),
            "est_count": pa.array([t[1] for t in top], pa.int64()),
        }
    )


def _f64_ordered_u64(v: np.ndarray) -> np.ndarray:
    """Order-preserving map float64 -> uint64 (IEEE-754 total order for
    finite values: negatives flip all bits, positives flip the sign
    bit). Lets grouped order statistics bisect on EXACT integer ranges
    — no float-boundary ambiguity between binning passes."""
    b = v.view(np.uint64)
    sign = (b >> np.uint64(63)).astype(bool)
    return np.where(sign, ~b, b | np.uint64(1 << 63))


def _ordered_u64_f64(key: int) -> float:
    b = np.uint64(key)
    if b & np.uint64(1 << 63):
        b = b ^ np.uint64(1 << 63)
    else:
        b = ~b
    return float(np.array([b], np.uint64).view(np.float64)[0])


def _np_lerp(a: float, b: float, t: float) -> float:
    """numpy's quantile interpolation branch (np.lib._function_base:
    _lerp) — replicated exactly so distributed selection is
    bit-identical to ``np.quantile`` on the gathered array."""
    if t >= 0.5:
        return b - (b - a) * (1 - t)
    return a + (b - a) * t


def _grouped_order_stats(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    ranks_by_key: "dict[str, list[int]]",
    *,
    group_counts: "dict[str, int] | None" = None,
    n_bins: int = 2048,
    collect_cap: int = 65536,
) -> "dict[tuple[str, int], float]":
    """EXACT k-th order statistics per group, fully distributed — the
    scale path for grouped quantiles/medians that never materializes a
    group's values anywhere. ``ranks_by_key[key]`` lists the 0-based
    sorted-position ranks wanted for that key; returns {(key, rank):
    value}.

    Mechanism: values map to order-preserving uint64 keys, then the
    wanted ranks bisect their integer ranges by histogram refinement —
    one column-pruned pass per round counts ``n_bins`` buckets per
    still-wide INTERVAL (a few thin (interval, bin, count) rows
    shuffle, never values), the driver descends each rank into the
    bucket holding it, and once an interval holds <= ``collect_cap``
    rows a filtered gather pass ships just those rows for the exact
    pick. Intervals are deduplicated across ranks: a key's f/c median
    ranks (or several quantiles) share one histogram and one gather
    until their descent paths split. ``group_counts`` (per-key row
    counts, if the caller already aggregated them) lets small groups
    skip bisection entirely and go straight to the gather. Terminates
    in <= ceil(64 / log2(n_bins)) rounds regardless of distribution or
    skew; typical groups resolve in 0-1 rounds. NaNs unsupported (no
    place in a total value order)."""
    FULL = (0, 1 << 64)
    # intervals: (key, lo, hi) -> list of (rank, r_local); count or None
    intervals: "dict[tuple, list[list[int]]]" = {}
    counts: "dict[tuple, int | None]" = {}
    for key, ranks in ranks_by_key.items():
        iv = (key,) + FULL
        intervals[iv] = [[r, r] for r in ranks]
        counts[iv] = (group_counts or {}).get(key)

    out: dict[tuple[str, int], float] = {}

    def _hist_pass(ivs: "list[tuple]") -> "tuple[dict, np.ndarray]":
        keys = [iv[0] for iv in ivs]
        los = np.array([iv[1] for iv in ivs], np.uint64)
        his = np.array([iv[2] - 1 for iv in ivs], np.uint64)  # inclusive
        shifts = np.array(
            [
                max(0, (iv[2] - iv[1] - 1).bit_length() - n_bins.bit_length() + 1)
                for iv in ivs
            ],
            np.uint64,
        )

        uk = np.array(sorted(set(keys)))
        key_code = {k: int(np.searchsorted(uk, k)) for k in keys}

        def hist(batch: pa.Table) -> pa.Table:
            # integer key codes once per batch: comparing an object-dtype
            # string array per entry would be a Python loop per element
            kv = batch.column(key_col).to_numpy(zero_copy_only=False).astype("U")
            codes = np.searchsorted(uk, kv)
            codes[(codes >= len(uk)) | (uk[np.minimum(codes, len(uk) - 1)] != kv)] = -1
            iv_ = _f64_ordered_u64(
                batch.column(val_col).to_numpy().astype(np.float64)
            )
            eids, bins, cnts = [], [], []
            for i in range(len(keys)):
                m = (codes == key_code[keys[i]]) & (iv_ >= los[i]) & (iv_ <= his[i])
                if not m.any():
                    continue
                lb = ((iv_[m] - los[i]) >> shifts[i]).astype(np.int64)
                c = np.bincount(lb)
                nz = np.flatnonzero(c)
                eids.append(np.full(len(nz), i, np.int64))
                bins.append(nz.astype(np.int64))
                cnts.append(c[nz].astype(np.int64))
            if not eids:
                return pa.table(
                    {"eid": pa.array([], pa.int64()),
                     "bin": pa.array([], pa.int64()),
                     "cnt": pa.array([], pa.int64())}
                )
            return pa.table(
                {"eid": pa.array(np.concatenate(eids), pa.int64()),
                 "bin": pa.array(np.concatenate(bins), pa.int64()),
                 "cnt": pa.array(np.concatenate(cnts), pa.int64())}
            )

        agg = (
            ds.map_batches(hist, batch_format="pyarrow")
            .groupby(["eid", "bin"])
            .aggregate(Sum("cnt", alias_name="n"))
            .take_all()
        )
        per: dict[int, dict[int, int]] = {}
        for r in agg:
            per.setdefault(r["eid"], {})[r["bin"]] = r["n"]
        return per, shifts

    def _gather_pass(ivs: "list[tuple]") -> "dict[int, np.ndarray]":
        keys = [iv[0] for iv in ivs]
        los = np.array([iv[1] for iv in ivs], np.uint64)
        his = np.array([iv[2] - 1 for iv in ivs], np.uint64)

        uk = np.array(sorted(set(keys)))
        key_code = {k: int(np.searchsorted(uk, k)) for k in keys}

        def pick_rows(batch: pa.Table) -> pa.Table:
            kv = batch.column(key_col).to_numpy(zero_copy_only=False).astype("U")
            codes = np.searchsorted(uk, kv)
            codes[(codes >= len(uk)) | (uk[np.minimum(codes, len(uk) - 1)] != kv)] = -1
            fv = batch.column(val_col).to_numpy().astype(np.float64)
            iv_ = _f64_ordered_u64(fv)
            eids, vals = [], []
            for i in range(len(keys)):
                m = (codes == key_code[keys[i]]) & (iv_ >= los[i]) & (iv_ <= his[i])
                if m.any():
                    eids.append(np.full(int(m.sum()), i, np.int64))
                    vals.append(fv[m])
            if not eids:
                return pa.table(
                    {"eid": pa.array([], pa.int64()),
                     "v": pa.array([], pa.float64())}
                )
            return pa.table(
                {"eid": pa.array(np.concatenate(eids), pa.int64()),
                 "v": pa.array(np.concatenate(vals), pa.float64())}
            )

        rows = ds.map_batches(pick_rows, batch_format="pyarrow").take_all()
        by: dict[int, list[float]] = {}
        for r in rows:
            by.setdefault(r["eid"], []).append(r["v"])
        return {i: np.sort(np.array(by.get(i, []), np.float64)) for i in range(len(ivs))}

    for _round in range(9):  # 64 bits / 11 bits per round, with margin
        if not intervals:
            break
        # width-1 intervals resolve without touching data
        for iv in [i for i in intervals if i[2] - i[1] <= 1]:
            v = _ordered_u64_f64(iv[1])
            for rank, _ in intervals.pop(iv):
                out[(iv[0], rank)] = v
            counts.pop(iv, None)
        # narrow-enough intervals go to ONE shared gather
        gather = [
            iv for iv in intervals
            if counts.get(iv) is not None and counts[iv] <= collect_cap
        ]
        if gather:
            sorted_vals = _gather_pass(gather)
            for i, iv in enumerate(gather):
                vs = sorted_vals[i]
                for rank, r_local in intervals.pop(iv):
                    out[(iv[0], rank)] = float(vs[r_local])
                counts.pop(iv, None)
        if not intervals:
            break
        # histogram round over the remaining wide intervals
        ivs = sorted(intervals)
        per, shifts = _hist_pass(ivs)
        nxt: dict[tuple, list[list[int]]] = {}
        nxt_counts: dict[tuple, int | None] = {}
        for i, iv in enumerate(ivs):
            bins = per.get(i, {})
            step = int(np.uint64(1) << shifts[i])
            sorted_bins = sorted(bins)
            cums = np.cumsum([bins[b] for b in sorted_bins])
            for rank, r_local in intervals[iv]:
                j = int(np.searchsorted(cums, r_local, side="right"))
                if j >= len(sorted_bins):
                    raise RuntimeError(
                        f"rank {r_local} beyond group size for key {iv[0]!r}"
                    )
                b = sorted_bins[j]
                new_local = r_local - (int(cums[j - 1]) if j else 0)
                lo = int(iv[1]) + b * step
                child = (iv[0], lo, min(lo + step, 1 << 64))
                nxt.setdefault(child, []).append([rank, new_local])
                nxt_counts[child] = bins[b]
        intervals, counts = nxt, nxt_counts
    if intervals:
        raise RuntimeError("grouped order statistics did not converge")
    return out


def _grouped_quantiles(
    ds: rd.Dataset, key_col: str, val_col: str, qs: "tuple[float, ...]"
) -> "dict[tuple[str, float], float]":
    """Linear-interpolated exact grouped quantiles (np.quantile /
    DuckDB quantile_cont semantics) on top of ``_grouped_order_stats``:
    one tiny count aggregate picks the two order statistics each
    quantile needs (and lets small groups resolve in a single gather
    pass); the selection never ships a group's raw values."""
    import math

    counts = {
        r[key_col]: r["n"]
        for r in ds.groupby(key_col).aggregate(Count(alias_name="n")).take_all()
    }
    ranks_by_key: dict[str, list[int]] = {}
    pos_by_key: dict[str, list[tuple[float, int, int]]] = {}
    for key, n in counts.items():
        want = set()
        plan = []
        for q in qs:
            pos = q * (n - 1)
            f, c = int(math.floor(pos)), int(math.ceil(pos))
            want.update((f, c))
            plan.append((q, f, c, pos - f))
        ranks_by_key[key] = sorted(want)
        pos_by_key[key] = plan
    stats = _grouped_order_stats(
        ds, key_col, val_col, ranks_by_key, group_counts=counts
    )
    out: dict[tuple[str, float], float] = {}
    for key, plan in pos_by_key.items():
        for q, f, c, t in plan:
            a, b = stats[(key, f)], stats[(key, c)]
            out[(key, q)] = a if f == c else _np_lerp(a, b, t)
    return out


def value_quantiles_by_type(
    sf_dir: str, *, qs: tuple = (0.5, 0.9)
) -> rd.Dataset:
    """GROUPED exact order statistics: per event_type, the q-quantiles of
    value (linear interpolation — replicating numpy's lerp branch, which
    matches DuckDB's ``quantile_cont``). Runs on the distributed
    selection engine (``_grouped_order_stats``): histogram-refinement
    bisection on order-preserving integer keys, so NO group's values are
    ever materialized in one worker — the round-2 "one group fits in a
    worker" assumption is gone and unbounded key cardinality only widens
    the thin (entry, bin, count) aggregate."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "value"])
    quants = _grouped_quantiles(ds, "event_type", "value", tuple(qs))
    keys = sorted({k for k, _ in quants})
    rows_k, rows_q, rows_v = [], [], []
    for k in keys:
        for q in qs:
            rows_k.append(k)
            rows_q.append(q)
            # +1e-9 anti-tie nudge (repo invariant): builtin round,
            # np.round and DuckDB round can disagree within an ulp of a
            # .00005 half-even boundary; the nudge keeps both engines off it.
            rows_v.append(round(quants[(k, q)] + 1e-9, 4))
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(rows_k, pa.string()),
                "q": pa.array(rows_q, pa.float64()),
                "value": pa.array(rows_v, pa.float64()),
            }
        )
    )


def urgent_top_revenue(sf_dir: str, *, k: int = 10) -> rd.Dataset:
    """TPC-H Q3 shape — the composition end-cap: broadcast semi-join
    (customer segment filter) + pushed-down date filters at both reads +
    per-batch arrow pre-combine + large-large hash join + grouped sum +
    global top-k. Every stage is the scale form: only (orderkey, rev)
    partials and the filtered orders ever shuffle."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    cutoff = pa.compute.strptime("1998-06-01", "%Y-%m-%d", "us").as_py()
    cust = pq.read_table(
        _p(sf_dir, "customer"),
        columns=["c_custkey", "c_mktsegment"],
        filters=[("c_mktsegment", "=", "BUILDING")],
    )
    keys_ref = broadcast_table(pa.array(sorted(cust.column("c_custkey").to_pylist())))

    orders = read_clean(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pads.field("o_orderdate") < pa.scalar(cutoff),
    )
    orders = orders.map_batches(
        make_broadcast_semijoin_fn("o_custkey", keys_ref), batch_format="pyarrow"
    ).drop_columns(["o_custkey"])

    li = read_clean(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pads.field("l_shipdate") > pa.scalar(cutoff),
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        r = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table({"o_orderkey": batch.column("l_orderkey"), "rev": r})
        g = t.group_by("o_orderkey").aggregate([("rev", "sum")])
        return g.rename_columns(["o_orderkey", "rev"])

    li = li.map_batches(rev_partial, batch_format="pyarrow")
    num_partitions = max(2, int(__import__("ray").cluster_resources().get("CPU", 4)) // 2)
    joined = li.join(
        orders, join_type="inner", num_partitions=num_partitions, on=("o_orderkey",)
    )
    out = joined.groupby(["o_orderkey", "o_orderdate"]).aggregate(
        Sum("rev", alias_name="revenue")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch.column("o_orderkey"),
                "revenue": pa.array(
                    np.round(batch.column("revenue").to_numpy(zero_copy_only=False), 2)
                ),
                "o_orderdate": pc.cast(batch.column("o_orderdate"), pa.timestamp("us")),
            }
        )

    out = out.map_batches(finish, batch_format="pyarrow")
    return out.sort(["revenue", "l_orderkey"], descending=[True, False]).limit(k)


def dedup_events_windowed(sf_dir: str) -> rd.Dataset:
    """Streaming-analog windowed dedup (SURVEY §2.9 + D-family): within
    each tumbling 1-hour event-time window, collapse repeated
    (user_id, event_type) firings to the first event (min event_id) and
    report how many were absorbed — the dedup a stream processor runs to
    suppress retry/duplicate deliveries. Vectorized window-bucket stage +
    one hash aggregate of thin rows."""
    ds = read_clean(
        _p(sf_dir, "events"), columns=["event_id", "ts", "user_id", "event_type"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        # pre-combine per block (arrow hash agg) so the shuffle ships one
        # row per distinct (user, type, window) per block, not raw events
        win = pc.floor_temporal(batch.column("ts"), unit="hour")
        t = batch.append_column("win", win).drop_columns(["ts"])
        return (
            t.group_by(["user_id", "event_type", "win"])
            .aggregate([("event_id", "min"), ([], "count_all")])
            .rename_columns(["user_id", "event_type", "win", "event_id", "n"])
        )

    ds = ds.map_batches(partial, batch_format="pyarrow")
    out = ds.groupby(["user_id", "event_type", "win"]).aggregate(
        Min("event_id", alias_name="event_id"), Sum("n", alias_name="n_absorbed")
    )

    def finish(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("win")
        batch = batch.set_column(
            i, "win", pc.cast(batch.column("win"), pa.timestamp("us"))
        )
        j = batch.schema.get_field_index("n_absorbed")
        return batch.set_column(
            j,
            "n_absorbed",
            pc.subtract(batch.column("n_absorbed"), pa.scalar(1, pa.int64())),
        )

    return out.map_batches(finish, batch_format="pyarrow")


def approx_distinct_users_by_type(sf_dir: str, *, p: int = 12) -> rd.Dataset:
    """Per-group approximate distinct via GROUPED mergeable sketches: one
    HLL per (event_type, block) inside map_batches (kilobytes), then a
    per-group merge — the distinct-count-per-key shape that never
    shuffles raw keys (a GROUP BY + COUNT(DISTINCT) exchanges every
    (key, user) row; this exchanges ~4 KB per group per block).
    Accuracy bound vs the exact counts is asserted in tests; rows-only
    for the driver (approximate != SQL-exact)."""
    from ..functions.sketches import HyperLogLog

    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "user_id"])

    def sketch_batch(batch: pa.Table) -> pa.Table:
        keys = batch.column("event_type").to_numpy(zero_copy_only=False)
        users = batch.column("user_id").to_numpy()
        order = np.argsort(keys, kind="stable")
        keys, users = keys[order], users[order]
        uniq, starts = np.unique(keys, return_index=True)
        blobs, out_keys = [], []
        bounds = np.append(starts, len(keys))
        for i, k in enumerate(uniq):
            h = HyperLogLog(p)
            h.add_ints(users[bounds[i] : bounds[i + 1]])
            blobs.append(h.serialize())
            out_keys.append(str(k))
        return pa.table(
            {"event_type": pa.array(out_keys), "sketch": pa.array(blobs, pa.binary())}
        )

    sketches = ds.map_batches(sketch_batch, batch_format="pyarrow")

    def merge_group(group: pa.Table) -> pa.Table:
        merged = None
        for blob in group.column("sketch").to_pylist():
            s = HyperLogLog.deserialize(blob)
            merged = s if merged is None else merged.merge(s)
        return pa.table(
            {
                "event_type": pa.array([group.column("event_type")[0].as_py()]),
                "approx_users": pa.array(
                    [int(round(merged.estimate()))], pa.int64()
                ),
            }
        )

    return sketches.groupby("event_type").map_groups(
        merge_group, batch_format="pyarrow"
    )


def ranked_search(
    sf_dir: str, *, words: tuple[str, ...] = ("spark", "merge"), k: int = 20
) -> rd.Dataset:
    """Ranked retrieval: the whole-word AND search ordered by tf-idf
    relevance (the ranking half a search endpoint needs beyond the
    boolean match) — score(d) = sum over query terms of
    tf(t, d) * ln(N / df(t)).

    Two streaming passes: (1) per-block partial document frequencies for
    the query terms (a |words|-sized fold — tiny); (2) per-block
    vectorized tf via hashed-token equality + bincount, AND filter,
    score, then a top-k sort of the thin (doc_id, score) rows."""
    from ..functions.hashing import tokenize_word_hashes

    term_h = []
    for w in words:
        flat, _ = tokenize_word_hashes([w])
        if len(flat) != 1:
            return rd.from_arrow(
                pa.table({"doc_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
            )
        term_h.append(np.uint64(flat[0]))
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        flat, offsets = tokenize_word_hashes(batch.column("text"))
        lens = np.diff(offsets)
        doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        out = []
        for h in term_h:
            hit_docs = np.unique(doc_of[flat == h])
            out.append(len(hit_docs))
        return pa.table(
            {
                "term": pa.array(range(len(term_h)), pa.int64()),
                "df": pa.array(out, pa.int64()),
                "n": pa.array([batch.num_rows] * len(term_h), pa.int64()),
            }
        )

    df = np.zeros(len(term_h), np.int64)
    n_docs = 0
    for b in docs.map_batches(df_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            terms = b.column("term").to_numpy()
            # add.at, NOT fancy-index +=: iter_batches coalesces multiple
            # block outputs, so term indices repeat within one batch and
            # `df[idx] += v` would keep only one addition per index
            np.add.at(df, terms, b.column("df").to_numpy())
            n_docs += int(b.column("n").to_numpy()[terms == 0].sum())
    if (df == 0).any() or n_docs == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
        )
    idf = np.log(float(n_docs) / df.astype(np.float64))
    idf_ref = (term_h, idf)

    def score(batch: pa.Table) -> pa.Table:
        flat, offsets = tokenize_word_hashes(batch.column("text"))
        lens = np.diff(offsets)
        n = batch.num_rows
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        hs, w_idf = idf_ref
        total = np.zeros(n, np.float64)
        all_hit = np.ones(n, bool)
        for h, wi in zip(hs, w_idf):
            tf = np.bincount(doc_of[flat == h], minlength=n).astype(np.float64)
            all_hit &= tf > 0
            total += tf * wi
        keep = all_hit
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "score": pa.array(np.round(total[keep] + 1e-9, 4), pa.float64()),
            }
        )

    out = docs.map_batches(score, batch_format="pyarrow")
    return out.sort(["score", "doc_id"], descending=[True, False]).limit(k)


# ------------------------------------------------ OLAP / set-op batch (r3)


def events_cube(sf_dir: str) -> rd.Dataset:
    """CUBE(event_type, dow): counts/sums at all FOUR grouping levels
    — (type, dow), (type), (dow), grand total — in one result, the
    OLAP cross-tab shape (generalizes ``events_rollup``). One scan
    builds the finest grid with a distributed grouped aggregate; the
    three coarser levels re-aggregate the (types x 7)-sized grid
    driver-side, never rescanning the input. Day-of-week numbering is
    pinned to DuckDB's (Sunday=0) via week_start=7/count_from_zero."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def add_dow(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "dow": pc.cast(
                    pc.day_of_week(
                        batch.column("ts"), count_from_zero=True, week_start=7
                    ),
                    pa.int64(),
                ),
                "value": batch.column("value"),
            }
        )

    grid = (
        ds.map_batches(add_dow, batch_format="pyarrow")
        .groupby(["event_type", "dow"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total"))
        .materialize()
    )
    parts = [b for b in grid.iter_batches(batch_format="pyarrow") if b.num_rows]
    t = pa.concat_tables(parts).combine_chunks()

    def _level(tbl: pa.Table, keys: list[str]) -> pa.Table:
        """Re-aggregate the tiny grid to a coarser level, null-filling
        the dimensions that were rolled away (SQL CUBE's NULL rows)."""
        if keys:
            g = tbl.group_by(keys).aggregate([("n", "sum"), ("total", "sum")])
            n, total = g.column("n_sum"), g.column("total_sum")
            cols = {k: g.column(k) for k in keys}
            m = g.num_rows
        else:
            n = pa.array([int(pc.sum(tbl.column("n")).as_py() or 0)], pa.int64())
            total = pa.array(
                [float(pc.sum(tbl.column("total")).as_py() or 0.0)], pa.float64()
            )
            cols, m = {}, 1
        out = {
            "event_type": cols.get(
                "event_type", pa.nulls(m, pa.string())
            ),
            "dow": cols.get("dow", pa.nulls(m, pa.int64())),
            "n": pc.cast(n, pa.int64()),
            "total": pc.cast(total, pa.float64()),
        }
        return pa.table(out)

    cube = pa.concat_tables(
        [
            _level(t, ["event_type", "dow"]),
            _level(t, ["event_type"]),
            _level(t, ["dow"]),
            _level(t, []),
        ]
    )
    return _round_col(rd.from_arrow(cube), {"total": 4})


def _user_day_type_flags(sf_dir: str, a: str, b: str) -> rd.Dataset:
    """Per-(user, day) presence flags for two event types: one scan to
    0/1 indicator columns, then a grouped Max (Ray pre-combines per
    block, so the shuffle ships one partial row per key per block —
    the distributed INTERSECT/EXCEPT shape; no per-side scans, no
    join). Day granularity (not user) because every fixture user hits
    every event type — user-level set ops would be degenerate."""
    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "event_type", "ts"])

    def flags(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": pc.cast(
                    pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.timestamp("us"),
                ),
                "f_a": pc.cast(pc.equal(et, a), pa.int64()),
                "f_b": pc.cast(pc.equal(et, b), pa.int64()),
            }
        )

    return (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Max("f_a", alias_name="has_a"), Max("f_b", alias_name="has_b"))
    )


def user_days_intersect(
    sf_dir: str, *, a: str = "click", b: str = "purchase"
) -> rd.Dataset:
    """INTERSECT: (user, day) pairs with BOTH event types that day. Set
    ops over the same input run as ONE grouped flag aggregate + filter
    (not two scans + a shuffle join, which is how a literal INTERSECT
    plan executes)."""
    g = _user_day_type_flags(sf_dir, a, b)
    return g.filter(
        expr="has_a == 1 and has_b == 1"
    ).select_columns(["user_id", "day"])


def user_days_except(
    sf_dir: str, *, a: str = "click", b: str = "purchase"
) -> rd.Dataset:
    """EXCEPT: (user, day) pairs with type ``a`` but no type ``b`` that
    day — same one-scan flag aggregate as ``user_days_intersect``."""
    g = _user_day_type_flags(sf_dir, a, b)
    return g.filter(
        expr="has_a == 1 and has_b == 0"
    ).select_columns(["user_id", "day"])


def doc_length_histogram(sf_dir: str) -> rd.Dataset:
    """Log2-bucket histogram of document byte lengths — the corpus
    diagnostic every curation run starts with. Per-batch bucket counts
    (numpy unique) pre-combine before the tiny grouped Sum, so the
    shuffle ships at most ~40 rows per block regardless of corpus size.
    Byte (not codepoint) lengths on both sides: strlen in the oracle
    (DuckDB's byte length), ``pc.binary_length`` here — exact under
    any encoding."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["text"])

    def buckets(batch: pa.Table) -> pa.Table:
        lens = np.maximum(
            pc.binary_length(batch.column("text")).to_numpy().astype(np.int64), 1
        )
        # exact at powers of two (log2 is correctly rounded there), so
        # the floor agrees bit-for-bit with DuckDB's log2
        bucket = np.floor(np.log2(lens.astype(np.float64))).astype(np.int64)
        vals, counts = np.unique(bucket, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(vals, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    return (
        ds.map_batches(buckets, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
    )


def user_first_last(sf_dir: str) -> rd.Dataset:
    """ARG_MIN/ARG_MAX per group: each user's first and last event type
    by (ts, event_id) plus their event count. Per-batch lexsort picks
    one candidate first/last row per user per block (the combiner), so
    the shuffle ships partials, not raw events; a tiny ``map_groups``
    reduces candidates. Ties broken by event_id — deterministic on both
    sides."""
    ds = read_clean(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        ts = batch.column("ts").to_numpy().astype("datetime64[us]").view(np.int64)
        eid = batch.column("event_id").to_numpy()
        order = np.lexsort((eid, ts, u))
        us = u[order]
        starts = np.r_[0, np.flatnonzero(us[1:] != us[:-1]) + 1]
        ends = np.r_[starts[1:] - 1, len(us) - 1]
        fi, li = order[starts], order[ends]
        et = batch.column("event_type")
        return pa.table(
            {
                "user_id": pa.array(u[fi], pa.int64()),
                "f_ts": pa.array(ts[fi], pa.int64()),
                "f_eid": pa.array(eid[fi], pa.int64()),
                "first_type": et.take(pa.array(fi)),
                "l_ts": pa.array(ts[li], pa.int64()),
                "l_eid": pa.array(eid[li], pa.int64()),
                "last_type": et.take(pa.array(li)),
                "n": pa.array(
                    (ends - starts + 1).astype(np.int64), pa.int64()
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_user(group: pa.Table) -> pa.Table:
        f = np.lexsort((group.column("f_eid").to_numpy(),
                        group.column("f_ts").to_numpy()))[0]
        l = np.lexsort((group.column("l_eid").to_numpy(),
                        group.column("l_ts").to_numpy()))[-1]
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "first_type": group.column("first_type").slice(int(f), 1),
                "last_type": group.column("last_type").slice(int(l), 1),
                "n": pa.array(
                    [int(pc.sum(group.column("n")).as_py())], pa.int64()
                ),
            }
        )

    return partials.groupby("user_id").map_groups(
        reduce_user, batch_format="pyarrow"
    )


def value_hour_corr(sf_dir: str) -> pa.Table:
    """Pearson correlation between event value and hour-of-day via
    distributed raw moments: each batch emits ONE row of
    (n, sx, sy, sxx, syy, sxy); the six global sums reduce through
    Ray's aggregate and the driver combines them into r. Nothing but
    a constant number of doubles ever leaves a worker."""
    ds = read_clean(_p(sf_dir, "events"), columns=["ts", "value"])

    def moments(batch: pa.Table) -> pa.Table:
        x = pc.hour(batch.column("ts")).to_numpy().astype(np.float64)
        y = batch.column("value").to_numpy()
        return pa.table(
            {
                "n": pa.array([float(len(x))], pa.float64()),
                "sx": pa.array([float(x.sum())], pa.float64()),
                "sy": pa.array([float(y.sum())], pa.float64()),
                "sxx": pa.array([float((x * x).sum())], pa.float64()),
                "syy": pa.array([float((y * y).sum())], pa.float64()),
                "sxy": pa.array([float((x * y).sum())], pa.float64()),
            }
        )

    m = ds.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"),
    )
    n, sx, sy = m["n"], m["sx"], m["sy"]
    cov = m["sxy"] - sx * sy / n
    vx = m["sxx"] - sx * sx / n
    vy = m["syy"] - sy * sy / n
    r = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else 0.0
    return pa.table(
        {"corr_value_hour": pa.array([float(np.round(r + 1e-9, 4))], pa.float64())}
    )


def user_day_fulljoin(
    sf_dir: str, *, a: str = "signup", b: str = "error"
) -> rd.Dataset:
    """FULL OUTER join of per-(user, day) counts of two event types —
    the missing join type in the query family. Executed as ONE scan
    with type-filtered indicator columns + a grouped Sum (cells absent
    from both sides never materialize, exactly FULL OUTER's row set),
    then zero counts null out to match SQL's unmatched-side NULLs. No
    two-scan shuffle join."""
    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "event_type", "ts"])

    def flags(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, a), pc.equal(et, b))
        batch = batch.filter(keep)
        et = batch.column("event_type")
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": pc.cast(
                    pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.timestamp("us"),
                ),
                "f_a": pc.cast(pc.equal(et, a), pa.int64()),
                "f_b": pc.cast(pc.equal(et, b), pa.int64()),
            }
        )

    g = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Sum("f_a", alias_name="n_a"), Sum("f_b", alias_name="n_b"))
    )

    def nullify(batch: pa.Table) -> pa.Table:
        def z2null(col):
            v = pc.cast(col, pa.int64())
            return pc.if_else(pc.equal(v, 0), pa.scalar(None, pa.int64()), v)

        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": batch.column("day"),
                f"n_{a}": z2null(batch.column("n_a")),
                f"n_{b}": z2null(batch.column("n_b")),
            }
        )

    return g.map_batches(nullify, batch_format="pyarrow")


def range_join_shipments(sf_dir: str) -> rd.Dataset:
    """INTERVAL (range) JOIN — per promo window, how many lineitems
    shipped inside it. Windows are the urgent Q1-1996 orders, each
    spanning [o_orderdate, o_orderdate + 30 days); there is NO equi-key
    between the sides, the join predicate is pure containment — the
    non-equi join type the engine lacked (as-of: purchase_click_asof).

    Broadcast-window plan (the small-side shape): windows are a
    filtered slice of orders (<<corpus), shipped once via ``ray.put``
    as numpy bundles; each lineitem batch sorts its ship dates once and
    answers ALL windows with two vectorized ``searchsorted`` calls —
    O(B log B + W log B) per batch, no row loop, no shuffle of the big
    side at all. Partial per-window counts (one int64 row per window
    per block) reduce in a grouped Sum. Were the window side large,
    the scale path is bucket-replication to overlapping 30-day cells +
    equi-join on cell; the broadcast plan is strictly better while
    windows fit a worker heap (millions of windows ~ tens of MB)."""
    windows = read_clean(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def to_window(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        keep = pc.and_(
            pc.equal(batch.column("o_orderpriority"), "1-URGENT"),
            pc.and_(
                pc.greater_equal(d, pa.scalar(np.datetime64("1996-01-01", "us"))),
                pc.less_equal(d, pa.scalar(np.datetime64("1996-03-31", "us"))),
            ),
        )
        batch = batch.filter(keep)
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "d0": pc.cast(batch.column("o_orderdate"), pa.int64()),
            }
        )

    w_empty = pa.table({"o_orderkey": pa.array([], pa.int64()), "d0": pa.array([], pa.int64())})
    wtab = pa.concat_tables(
        [w_empty]
        + list(
            windows.map_batches(to_window, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    ).combine_chunks()
    keys = wtab.column("o_orderkey").to_numpy().astype(np.int64)
    d0 = wtab.column("d0").to_numpy().astype(np.int64)
    d1 = d0 + 30 * 86_400_000_000  # 30 days in microseconds
    import ray as _ray

    bundle_ref = _ray.put((keys, d0, d1))

    li = read_clean(_p(sf_dir, "lineitem"), columns=["l_shipdate"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        k, lo, hi = _ray.get(bundle_ref)  # zero-copy numpy from plasma
        ship = np.sort(pc.cast(batch.column("l_shipdate"), pa.int64()).to_numpy())
        n = np.searchsorted(ship, hi, side="left") - np.searchsorted(
            ship, lo, side="left"
        )
        return pa.table(
            {"o_orderkey": pa.array(k, pa.int64()), "n_shipped": pa.array(n, pa.int64())}
        )

    parts = li.map_batches(partial_counts, batch_format="pyarrow")
    return parts.groupby("o_orderkey").aggregate(Sum("n_shipped", alias_name="n_shipped"))


def funnel_conversion(sf_dir: str) -> pa.Table:
    """Ordered funnel view -> click -> purchase: users with a view, a
    click strictly after their first view, and a purchase strictly
    after that first qualifying click. The staged-sequence aggregate
    every product-analytics store ships (and the reference's event
    tables invite) — strictly harder than ``user_event_sequence``'s
    unordered distinct-count.

    Per stage: grouped Min over the filtered scan -> hash-join the
    previous stage's first-times onto candidate events by user ->
    filter ts > prev -> grouped Min again. Joins ship (user_id, ts)
    rows only; no stage materializes events on the driver; user counts
    (the output) are single ints. Scale-safe at any user cardinality —
    no broadcast of a user-sized map."""
    ev = read_clean(_p(sf_dir, "events"), columns=["user_id", "event_type", "ts"])

    def typed(t: str) -> rd.Dataset:
        def f(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.equal(batch.column("event_type"), t))
            return pa.table(
                {
                    "user_id": batch.column("user_id"),
                    "ts": pc.cast(batch.column("ts"), pa.int64()),
                }
            )

        return ev.map_batches(f, batch_format="pyarrow")

    num_partitions = max(2, int(__import__("ray").cluster_resources().get("CPU", 4)) // 2)

    def first_after(events: rd.Dataset, prev: rd.Dataset, prev_col: str) -> rd.Dataset:
        j = events.join(
            prev, join_type="inner", num_partitions=num_partitions, on=("user_id",)
        )

        def later(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0:
                return pa.table(
                    {"user_id": pa.array([], pa.int64()), "ts": pa.array([], pa.int64())}
                )
            keep = pc.greater(batch.column("ts"), batch.column(prev_col))
            batch = batch.filter(keep)
            return pa.table(
                {"user_id": batch.column("user_id"), "ts": batch.column("ts")}
            )

        return (
            j.map_batches(later, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(Min("ts", alias_name=prev_col))
        )

    v0 = typed("view").groupby("user_id").aggregate(Min("ts", alias_name="t0")).materialize()
    c1 = first_after(typed("click"), v0, "t0").rename_columns({"t0": "t1"}).materialize()
    p2 = first_after(typed("purchase"), c1, "t1").materialize()
    return pa.table(
        {
            "n_view": pa.array([v0.count()], pa.int64()),
            "n_click": pa.array([c1.count()], pa.int64()),
            "n_purchase": pa.array([p2.count()], pa.int64()),
        }
    )


def bm25_search(
    sf_dir: str,
    *,
    words: tuple[str, ...] = ("spark", "merge"),
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> rd.Dataset:
    """Okapi BM25 ranked retrieval (Robertson/Walker, SIGIR 1994) — the
    saturating, length-normalized upgrade of ``ranked_search``'s raw
    tf-idf: score(d) = sum_t idf_t * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    with idf_t = ln((N - df + 0.5)/(df + 0.5) + 1). AND semantics and
    the same two streaming passes; pass 1's per-block fold additionally
    carries token totals so avgdl costs nothing extra. All driver state
    is |words| ints + two scalars."""
    from ..functions.hashing import tokenize_word_hashes

    term_h = []
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
    )
    for w in words:
        flat, _ = tokenize_word_hashes([w])
        if len(flat) != 1:
            return rd.from_arrow(empty)
        term_h.append(np.uint64(flat[0]))
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        flat, offsets = tokenize_word_hashes(batch.column("text"))
        lens = np.diff(offsets)
        doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        out = [int(len(np.unique(doc_of[flat == h]))) for h in term_h]
        return pa.table(
            {
                "term": pa.array(range(len(term_h)), pa.int64()),
                "df": pa.array(out, pa.int64()),
                "n": pa.array([batch.num_rows] * len(term_h), pa.int64()),
                "toks": pa.array([int(lens.sum())] * len(term_h), pa.int64()),
            }
        )

    df = np.zeros(len(term_h), np.int64)
    n_docs = 0
    total_toks = 0
    for blk in docs.map_batches(df_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if blk.num_rows:
            terms = blk.column("term").to_numpy()
            np.add.at(df, terms, blk.column("df").to_numpy())
            first = terms == 0
            n_docs += int(blk.column("n").to_numpy()[first].sum())
            total_toks += int(blk.column("toks").to_numpy()[first].sum())
    if (df == 0).any() or n_docs == 0 or total_toks == 0:
        return rd.from_arrow(empty)
    avgdl = total_toks / n_docs
    idf = np.log((n_docs - df.astype(np.float64) + 0.5) / (df + 0.5) + 1.0)

    def score(batch: pa.Table) -> pa.Table:
        flat, offsets = tokenize_word_hashes(batch.column("text"))
        lens = np.diff(offsets)
        n = batch.num_rows
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        norm = k1 * (1.0 - b + b * lens.astype(np.float64) / avgdl)
        total = np.zeros(n, np.float64)
        all_hit = np.ones(n, bool)
        for h, wi in zip(term_h, idf):
            tf = np.bincount(doc_of[flat == h], minlength=n).astype(np.float64)
            all_hit &= tf > 0
            total += wi * tf * (k1 + 1.0) / (tf + norm)
        keep = all_hit
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "score": pa.array(np.round(total[keep] + 1e-9, 4), pa.float64()),
            }
        )

    out = docs.map_batches(score, batch_format="pyarrow")
    return out.sort(["score", "doc_id"], descending=[True, False]).limit(k)


def user_activity_quartiles(sf_dir: str, *, n_tiles: int = 4) -> rd.Dataset:
    """NTILE window: users bucketed into ``n_tiles`` equal-count groups
    by activity (event count DESC, user_id ASC) — the remaining window
    function family member (rank: ``shuffled_training_order``; lag:
    ``events_daily_delta``; rolling: ``events_rolling_7d``).

    Grouped Count -> distributed ``global_rank`` over the thin
    (user_id, n_events) rows (histogram-balanced range partition, no
    single-node sort) -> closed-form SQL NTILE arithmetic per row: the
    first N % k tiles get one extra member. Count keys are exact ints,
    so Ray and SQL order identically with no float-sum hazard."""
    from ray.data.aggregate import Max as _Max

    from .ordering import global_rank

    ev = read_clean(_p(sf_dir, "events"), columns=["user_id"])
    totals = (
        ev.groupby("user_id").aggregate(Count(alias_name="n_events")).materialize()
    )
    n_users = totals.count()
    if n_users == 0:
        return rd.from_arrow(
            pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64()),
                 "quartile": pa.array([], pa.int64())}
            )
        )
    max_n = int(totals.aggregate(_Max("n_events", alias_name="m"))["m"])

    def keyed(batch: pa.Table) -> pa.Table:
        n = batch.column("n_events").to_numpy().astype(np.int64)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "n_events": batch.column("n_events"),
                "key": pa.array(max_n - n, pa.int64()),  # DESC via flip
            }
        )

    ranked = global_rank(
        totals.map_batches(keyed, batch_format="pyarrow"),
        "key", "user_id", key_max=max_n + 1, out_col="pos",
    )
    q, r = divmod(n_users, n_tiles)

    def tiles(batch: pa.Table) -> pa.Table:
        p = batch.column("pos").to_numpy()
        cut = r * (q + 1)
        tile = np.where(
            p < cut,
            p // max(q + 1, 1),
            r + np.where(q > 0, (p - cut) // max(q, 1), 0),
        ) + 1
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "n_events": batch.column("n_events"),
                "quartile": pa.array(tile.astype(np.int64), pa.int64()),
            }
        )

    return ranked.map_batches(tiles, batch_format="pyarrow")


def distinct_users_by_type(sf_dir: str) -> rd.Dataset:
    """count(DISTINCT user_id) per event_type — the two-level exact
    distinct idiom: dedupe on the COMPOSITE key first (grouped count
    whose per-block combiner collapses repeats before the shuffle),
    then count rows per type. The raw-row shuffle a naive distinct
    would pay never happens; level 2 runs on |types x users| thin rows."""
    ev = read_clean(_p(sf_dir, "events"), columns=["event_type", "user_id"])
    pairs = (
        ev.groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )
    return pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))


def mode_lang_by_source(sf_dir: str) -> rd.Dataset:
    """MODE aggregate: the most frequent lang per source (min lang on
    ties) — SQL's ``mode() WITHIN GROUP``. Two grouped aggregates plus
    the max-semi-match: counts per (source, lang), grouped Max(n) per
    source, inner join back on (source, n), grouped Min(lang) as the
    deterministic tie-break. Every exchange is (source x lang)-sized."""
    num_partitions = max(2, int(__import__("ray").cluster_resources().get("CPU", 4)) // 2)
    ds = read_clean(_p(sf_dir, "documents"), columns=["source", "lang"])
    counts = (
        ds.groupby(["source", "lang"])
        .aggregate(Count(alias_name="n"))
        .repartition(num_partitions)
        .materialize()
    )
    top = (
        counts.groupby("source")
        .aggregate(Max("n", alias_name="n"))
        .repartition(num_partitions)
    )
    at_max = counts.join(
        top, join_type="inner", num_partitions=num_partitions, on=("source", "n")
    )
    return (
        at_max.groupby("source")
        .aggregate(Min("lang", alias_name="mode_lang"))
    )


def _skyline2d(price: np.ndarray, date: np.ndarray) -> np.ndarray:
    """Boolean survivor mask of the 2-D maxima (skyline) under strict
    Pareto domination: row i is dominated iff some row is >= in both
    dims and > in at least one. Vectorized: sort by (price DESC, date
    DESC); survive iff date == max(date) within the equal-price group
    AND date > running max(date) over strictly-higher-price rows.
    Exact duplicates all survive (neither strictly exceeds the other)."""
    n = len(price)
    keep = np.zeros(n, bool)
    if n == 0:
        return keep
    order = np.lexsort((-date, -price))
    p, d = price[order], date[order]
    grp_new = np.r_[True, p[1:] != p[:-1]]
    gid = np.cumsum(grp_new) - 1
    # max date per price group == first date in group (sorted date DESC)
    gmax = d[grp_new][gid]
    # running max of date over all STRICTLY higher price groups
    gfirst = np.nonzero(grp_new)[0]
    gmax_per_group = d[grp_new]
    prev = np.empty(len(gfirst), d.dtype)
    prev[0] = np.iinfo(np.int64).min if d.dtype.kind in "iu" else -np.inf
    if len(gfirst) > 1:
        np.maximum.accumulate(gmax_per_group[:-1], out=gmax_per_group[:-1])
        prev[1:] = gmax_per_group[:-1]
    surv = (d == gmax) & (d > prev[gid])
    keep[order] = surv
    return keep


def pareto_orders(sf_dir: str) -> rd.Dataset:
    """SKYLINE (Pareto-maxima) query: orders not dominated on
    (o_totalprice, o_orderdate) — no other order is >= in both and >
    in one (Börzsönyi/Kossmann/Stocker, "The Skyline Operator", ICDE
    2001). The multi-objective top-k a ranking query can't express.

    Distributed 2-D plan: every block computes its LOCAL skyline with
    one vectorized sort+scan (a globally non-dominated row is
    non-dominated in its own block, so the global skyline is a subset
    of the union of local ones); the union of local skylines is
    skyline-sized per block (~log-size on real data), so the final
    cross-block pass runs on a k-limited collection exactly like the
    top-k operators. Blocks ship three thin columns; text/payload
    never read."""
    ds = read_clean(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    )

    def local(batch: pa.Table) -> pa.Table:
        price = batch.column("o_totalprice").to_numpy()
        date = pc.cast(batch.column("o_orderdate"), pa.int64()).to_numpy()
        return batch.filter(pa.array(_skyline2d(price, date)))

    cand = pa.concat_tables(
        ds.map_batches(local, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ),
        promote_options="default",
    ).combine_chunks()
    price = cand.column("o_totalprice").to_numpy()
    date = pc.cast(cand.column("o_orderdate"), pa.int64()).to_numpy()
    out = cand.filter(pa.array(_skyline2d(price, date)))
    return rd.from_arrow(out)


def _knuth_bucket(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Knuth multiplicative hash of int64 keys onto [0, n_buckets) —
    the ONE coarse-bucket partitioner the sequence/window operators
    share (same key always lands in the same bucket; a drift between
    copies would silently split a user across buckets)."""
    k = keys.astype(np.uint64)
    return (
        ((k * np.uint64(2654435761)) % np.uint64(4294967296))
        % np.uint64(n_buckets)
    ).astype(np.int64)


def _event_type_vocab(sf_dir: str) -> np.ndarray:
    """Sorted event-type vocabulary from a single-column pruned scan
    (tiny grouped count; shared by the bitmask/transition operators)."""
    rows = (
        read_clean(_p(sf_dir, "events"), columns=["event_type"])
        .groupby("event_type")
        .count()
        .take_all()
    )
    return np.sort(np.array([r["event_type"] for r in rows]))


def basket_cooccurrence(sf_dir: str) -> rd.Dataset:
    """Association-rules co-occurrence (Agrawal/Srikant market-basket):
    for every pair of event types, how many (user, day) baskets contain
    both, with confidence P(b|a) and lift — the frequent-itemset family
    (reference has nothing like it; a curation pipeline uses the same
    shape for tag/source co-occurrence diagnostics).

    Distributed plan, one wide exchange total:
      1. tiny type vocabulary from a single-column pruned scan;
      2. distinct (user, day, type) via grouped Count — the per-block
         combiner collapses repeats before the shuffle;
      3. encode each type as a bit and OR per basket with one grouped
         Sum (rows are distinct, so Sum == bit-OR) keyed (user, day);
      4. per-batch popcount partials: C(T,2) pair counts + T singles +
         one basket-count row per block — kilobytes regardless of scale;
      5. driver folds the partials (sketch-merge style) into the final
         T*(T-1)/2-row table.
    Assumes |vocab| < 63 (bitmask in one int64); larger vocabularies
    would shard the mask into multiple columns."""
    ev = read_clean(_p(sf_dir, "events"), columns=["user_id", "event_type", "ts"])

    vocab = _event_type_vocab(sf_dir)
    T = len(vocab)
    if T >= 63:
        raise NotImplementedError("bitmask plan needs |event types| < 63")

    def day_bit(batch: pa.Table) -> pa.Table:
        idx = np.searchsorted(vocab, batch.column("event_type").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": pc.cast(
                    pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.timestamp("us"),
                ),
                "bit": pa.array(np.left_shift(np.int64(1), idx), pa.int64()),
            }
        )

    distinct = (
        ev.map_batches(day_bit, batch_format="pyarrow")
        .groupby(["user_id", "day", "bit"])
        .count()
    )
    masks = distinct.groupby(["user_id", "day"]).aggregate(
        Sum("bit", alias_name="mask")
    )

    pairs_i, pairs_j = np.triu_indices(T, k=1)

    def partials(batch: pa.Table) -> pa.Table:
        m = batch.column("mask").to_numpy()
        # uint8 temporaries: the rows x C(T,2) expansion is the memory
        # hot spot near the T<63 guard (int64 would be 8x larger);
        # numpy promotes the axis-0 sums back to int64
        present = ((m[:, None] >> np.arange(T)) & 1).astype(np.uint8)
        singles = present.sum(axis=0, dtype=np.int64)
        both = (present[:, pairs_i] & present[:, pairs_j]).sum(
            axis=0, dtype=np.int64
        )
        return pa.table(
            {
                "i": pa.array(
                    np.concatenate([pairs_i, np.arange(T), [-1]]), pa.int64()
                ),
                "j": pa.array(
                    np.concatenate([pairs_j, np.arange(T), [-1]]), pa.int64()
                ),
                "n": pa.array(
                    np.concatenate([both, singles, [len(m)]]), pa.int64()
                ),
            }
        )

    acc = np.zeros((T + 1, T + 1), dtype=np.int64)
    for b in masks.map_batches(partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        np.add.at(
            acc,
            (b.column("i").to_numpy() + 1, b.column("j").to_numpy() + 1),
            b.column("n").to_numpy(),
        )
    nb = acc[0, 0]
    supp = acc.diagonal()[1:]
    n_both = acc[1:, 1:][pairs_i, pairs_j]
    keep = n_both > 0
    conf = n_both[keep] / supp[pairs_i[keep]]
    lift = nb * n_both[keep] / (supp[pairs_i[keep]] * supp[pairs_j[keep]])
    out = pa.table(
        {
            "type_a": pa.array(vocab[pairs_i[keep]], pa.string()),
            "type_b": pa.array(vocab[pairs_j[keep]], pa.string()),
            "n_both": pa.array(n_both[keep], pa.int64()),
            "confidence": pa.array(np.round(conf + 1e-9, 4), pa.float64()),
            "lift": pa.array(np.round(lift + 1e-9, 4), pa.float64()),
        }
    )
    return rd.from_arrow(out)


def user_value_median(sf_dir: str) -> rd.Dataset:
    """Per-user EXACT median of value — grouped order statistics at
    UNBOUNDED key cardinality, the complement of
    ``value_quantiles_by_type``'s selection engine: when groups are
    many and small (50M users x dozens of events), histogram bisection
    per key would be absurd and a per-key pandas call is the measured
    slow idiom; the right plan is the coarse-bucket lexsort — users
    hash into ~4P buckets, ONE kernel call per bucket sorts (user,
    value) and reads both middle order statistics of every segment
    vectorized. Interpolation matches DuckDB ``quantile_cont`` (lower +
    t*(upper-lower), t=0.5)."""
    import ray

    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "value"])
    B = max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)

    def tag(batch: pa.Table) -> pa.Table:
        part = _knuth_bucket(batch.column("user_id").to_numpy(), B)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def medians(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        val = g.column("value").to_numpy()
        order = np.lexsort((val, uid))
        uid, val = uid[order], val[order]
        n = len(uid)
        if n == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "med_value": pa.array([], pa.float64())}
            )
        bounds = np.empty(n, dtype=bool)
        bounds[0] = True
        bounds[1:] = uid[1:] != uid[:-1]
        seg_first = np.flatnonzero(bounds)
        cnt = np.diff(np.append(seg_first, n))
        lo = val[seg_first + (cnt - 1) // 2]
        hi = val[seg_first + cnt // 2]
        med = lo + 0.5 * (hi - lo)  # quantile_cont's lower + t*(upper-lower)
        return pa.table(
            {
                "user_id": pa.array(uid[seg_first], pa.int64()),
                "med_value": pa.array(np.round(med + 1e-9, 4), pa.float64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(medians, batch_format="pyarrow")
    )


def user_value_ma3(sf_dir: str, *, k: int = 3) -> rd.Dataset:
    """ROWS-frame window: per-user trailing k-row moving average of
    ``value`` ordered by (ts, event_id) — SQL's ``ROWS BETWEEN k-1
    PRECEDING AND CURRENT ROW``, the row-offset frame the RANGE-based
    ``events_rolling_7d`` can't express (short frames at segment heads
    average over fewer rows, exactly like SQL).

    Coarse-bucket execution (repo memory: one Python call per USER is
    the slow idiom): users hash into ~4P buckets, ONE ``map_groups``
    call per bucket; inside a bucket a single lexsort + per-segment
    shifted-add kernel computes every user's windows vectorized. The
    window sum adds the k values directly (not a long prefix-sum
    difference) so float error stays at ulps of the window, far from
    the round(4) boundary."""
    import ray

    ds = read_clean(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )
    B = max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)

    def tag(batch: pa.Table) -> pa.Table:
        part = _knuth_bucket(batch.column("user_id").to_numpy(), B)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def windows(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        val = g.column("value").to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, val = uid[order], ts[order], eid[order], val[order]
        n = len(uid)
        bounds = np.empty(n, dtype=bool)
        bounds[0] = True
        bounds[1:] = uid[1:] != uid[:-1]
        seg_first = np.flatnonzero(bounds)
        seg_start = np.repeat(seg_first, np.diff(np.append(seg_first, n)))
        idx = np.arange(n)
        s = val.copy()
        cnt = np.ones(n)
        for d in range(1, k):
            ok = idx - d >= seg_start
            s[ok] += val[idx[ok] - d]
            cnt[ok] += 1.0
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "ma3": pa.array(np.round(s / cnt + 1e-9, 4), pa.float64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(windows, batch_format="pyarrow")
    )


def weighted_sample_orders(sf_dir: str, *, k: int = 50) -> rd.Dataset:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, algorithm A-ES): the k orders with the smallest exponential
    key -ln(u)/w, weight w = o_totalprice — each order's inclusion
    probability is proportional to its price. u derives from the Knuth
    multiplicative hash of the key column (the ``hash_sample_events``
    trick), NOT an RNG: the sample is a pure function of the keys, so
    retried partitions resample identically at any scale and a SQL
    oracle recomputes it exactly (k-th boundary gap ~1e-11 on the
    fixtures vs ~1e-20 cross-engine log ulps).

    Top-k shape: every block keeps its local k smallest keys
    (argpartition), the driver merges the <= k-per-block candidates —
    the same prune the recency top-k and kNN operators use; nothing
    wider than k rows per block ever moves."""
    ds = read_clean(_p(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def local_topk(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").to_numpy().astype(np.uint64)
        w = batch.column("o_totalprice").to_numpy()
        h = (ok * np.uint64(2654435761)) % np.uint64(4294967296)
        u = (h.astype(np.float64) + 1.0) / 4294967297.0
        key = -np.log(u) / w
        if len(key) > k:
            keep = np.argpartition(key, k)[:k]
            batch, key = batch.take(pa.array(keep)), key[keep]
        return batch.append_column("_key", pa.array(key, pa.float64()))

    cand = pa.concat_tables(
        ds.map_batches(local_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ),
        promote_options="default",
    ).combine_chunks()
    key = cand.column("_key").to_numpy()
    ok = cand.column("o_orderkey").to_numpy()
    top = np.lexsort((ok, key))[:k]
    out = cand.take(pa.array(top))
    # np.round, not pc.round: arrow's kernel is one ulp off DuckDB's
    # for some values (see _round_col) — driver hashes are bit-exact
    return rd.from_arrow(
        pa.table(
            {
                "o_orderkey": out.column("o_orderkey"),
                "o_totalprice": pa.array(
                    np.round(out.column("o_totalprice").to_numpy(), 4),
                    pa.float64(),
                ),
            }
        )
    )


def props_json_stats(sf_dir: str) -> rd.Dataset:
    """Semi-structured extraction (the reference stores a JSON list
    column, ``database.py:40``; event payloads are the analog here):
    pull the integer field ``k`` out of the JSON ``props`` string with
    ONE vectorized RE2 pass (``pc.extract_regex``) — no per-row json
    parser — then grouped count/sum/avg per event type. The grouped
    aggregate ships one partial row per (type, block); the JSON text
    itself never shuffles."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        props = batch.column("props")
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        st = pc.extract_regex(props, pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(st, "k"), pa.int64())
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "k": k,
                # SQL's avg ignores NULL k (rows whose props lack the
                # field); carry the non-null count so both sides divide
                # by the same denominator (the fixtures have no nulls,
                # but the semantics must not depend on that)
                "k_nn": pc.cast(pc.is_valid(k), pa.int64()),
            }
        )

    g = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("k", alias_name="sum_k"),
            Sum("k_nn", alias_name="n_k"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy()
        s = batch.column("sum_k").to_numpy()
        nk = batch.column("n_k").to_numpy().astype(np.float64)
        avg = np.round(s / np.maximum(nk, 1.0) + 1e-9, 4)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": pa.array(n, pa.int64()),
                "sum_k": pa.array(s, pa.int64()),
                "avg_k": pa.array(avg, pa.float64(), mask=nk == 0),
            }
        )

    return g.map_batches(finish, batch_format="pyarrow")


def embedding_dim_stats(sf_dir: str) -> rd.Dataset:
    """Per-dimension mean/std over the ``list<float>`` embedding column
    — the UNNEST/flatten family on a real list column, and the feature-
    normalization statistics an ML pipeline computes before whitening.

    Zero-copy kernel: each batch flattens the list array's values
    buffer straight into an (n, d) view (no per-row Python, no unnest
    explosion — the d-fold row blowup the SQL plan pays never
    materializes) and emits d-row moment partials (n, sum, sumsq); the
    driver folds kilobyte partials and finishes mean / population std.
    """
    ds = read_clean(_p(sf_dir, "embeddings"), columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column("embedding")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        offs = arr.offsets.to_numpy()
        d = int(offs[1] - offs[0]) if n else 0
        m = arr.flatten().to_numpy().astype(np.float64).reshape(n, d)
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
                "n": pa.array(np.full(d, n, dtype=np.int64), pa.int64()),
                "s": pa.array(m.sum(axis=0), pa.float64()),
                "ss": pa.array((m * m).sum(axis=0), pa.float64()),
            }
        )

    acc: dict[int, np.ndarray] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows == 0:
            continue
        dims = b.column("dim").to_numpy()
        d = int(dims.max()) + 1
        if not acc:
            acc = {"n": np.zeros(d), "s": np.zeros(d), "ss": np.zeros(d)}
        for col in ("n", "s", "ss"):
            np.add.at(acc[col], dims, b.column(col).to_numpy())
    mean = acc["s"] / acc["n"]
    std = np.sqrt(acc["ss"] / acc["n"] - mean * mean)
    return rd.from_arrow(
        pa.table(
            {
                "dim": pa.array(np.arange(len(mean), dtype=np.int64), pa.int64()),
                "mean_v": pa.array(np.round(mean + 1e-9, 4), pa.float64()),
                "std_v": pa.array(np.round(std + 1e-9, 4), pa.float64()),
            }
        )
    )


def event_transitions(sf_dir: str) -> rd.Dataset:
    """Markov transition counts: for every adjacent pair of events of
    the same user (ordered by ts, event_id), count (from_type ->
    to_type) — the transition matrix behind next-event-prediction
    training pairs and session-flow analysis; SQL's lead() window.

    Same coarse-bucket shape as ``user_value_ma3`` (a user's rows land
    in ONE bucket, so no transition crosses a bucket): per bucket one
    lexsort, a shifted same-user compare, then a bincount over
    from*T+to codes — each bucket emits at most T*T pre-combined rows,
    and the final grouped Sum runs on those kilobytes."""
    import ray

    ds = read_clean(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )
    vocab = _event_type_vocab(sf_dir)
    T = len(vocab)
    B = max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)

    def tag(batch: pa.Table) -> pa.Table:
        part = _knuth_bucket(batch.column("user_id").to_numpy(), B)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "event_id": batch.column("event_id"),
                "code": pa.array(
                    np.searchsorted(
                        vocab,
                        batch.column("event_type").to_numpy(zero_copy_only=False),
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "part": pa.array(part, pa.int64()),
            }
        )

    def transitions(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        code = g.column("code").to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, code = uid[order], code[order]
        same = uid[1:] == uid[:-1]
        combo = code[:-1][same] * T + code[1:][same]
        cnt = np.bincount(combo, minlength=T * T)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "from_type": pa.array(vocab[nz // T], pa.string()),
                "to_type": pa.array(vocab[nz % T], pa.string()),
                "n_part": pa.array(cnt[nz], pa.int64()),
            }
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(transitions, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "from_type": batch.column("from_type"),
                "to_type": batch.column("to_type"),
                "n": pc.cast(batch.column("n"), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def fair_share_quota(sf_dir: str, *, budget: float = 9000.0) -> rd.Dataset:
    """Max-min fair-share (water-filling) budget allocation: split a
    global budget across users so everyone gets min(demand, L) with the
    level L chosen to spend the budget exactly — the crawl-scheduler
    computation that turns per-host frontier demand + a global fetch
    budget into per-host quotas (hot hosts capped at L, small hosts
    fully satisfied), expressed over the events table (demand = event
    count).

    Scale shape: demands via ONE grouped Count (thin rows), then the
    level is found on the DEMAND-VALUE HISTOGRAM — per-batch bincount
    partials folded on the driver (kilobytes: distinct demand VALUES,
    not users). Feasibility `csum_dem(v) + v * n_above(v) <= B` is
    constant within a tie block, so the histogram threshold equals the
    SQL row-ordered one exactly. Final quota is a shuffle-free map."""
    dem = (
        read_clean(_p(sf_dir, "events"), columns=["user_id"])
        .groupby("user_id")
        .aggregate(Count(alias_name="dem"))
    ).materialize()

    def hist(batch: pa.Table) -> pa.Table:
        d = batch.column("dem").to_numpy()
        cnt = np.bincount(d)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "v": pa.array(nz.astype(np.int64), pa.int64()),
                "c": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    acc: dict[int, int] = {}
    for b in dem.map_batches(hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for v, c in zip(b.column("v").to_numpy(), b.column("c").to_numpy()):
            acc[int(v)] = acc.get(int(v), 0) + int(c)
    vals = np.array(sorted(acc), dtype=np.float64)
    cnts = np.array([acc[int(v)] for v in vals], dtype=np.float64)
    n = cnts.sum()
    csum_users = np.cumsum(cnts)
    csum_dem = np.cumsum(vals * cnts)
    feasible = csum_dem + vals * (n - csum_users) <= budget
    if feasible.any():
        i = int(np.flatnonzero(feasible).max())
        k, psk = csum_users[i], csum_dem[i]
    else:
        k, psk = 0.0, 0.0
    level = np.inf if k >= n else (budget - psk) / (n - k)

    def quota(batch: pa.Table) -> pa.Table:
        d = batch.column("dem").to_numpy().astype(np.float64)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "demand": pa.array(d.astype(np.int64), pa.int64()),
                "quota": pa.array(
                    np.round(np.minimum(d, level) + 1e-9, 4), pa.float64()
                ),
            }
        )

    return dem.map_batches(quota, batch_format="pyarrow")


def cohort_retention(sf_dir: str, *, nparts: int | None = None) -> rd.Dataset:
    """Cohort retention matrix: users grouped by first-activity week
    (the cohort), then for each later week the fraction of the cohort
    still active — the classic product-analytics triangle, and the
    recrawl-policy analog (how many hosts discovered in week w are
    still yielding new pages k weeks on).

    Plan: distinct (user, week) via grouped Count (weeks as int64
    microseconds so Min/arithmetic stay in numpy); cohort = grouped Min
    per user; ONE hash join of the two thin sides on user_id; grouped
    count per (cohort, offset); cohort sizes are a week-count-sized
    driver fold broadcast into the final shuffle-free retention map."""
    import ray

    WEEK_US = 7 * 24 * 3600 * 1_000_000
    ev = read_clean(_p(sf_dir, "events"), columns=["user_id", "ts"])

    def wk(batch: pa.Table) -> pa.Table:
        w = pc.cast(
            pc.floor_temporal(batch.column("ts"), unit="week"), pa.int64()
        )
        return pa.table({"user_id": batch.column("user_id"), "wk": w})

    act = (
        ev.map_batches(wk, batch_format="pyarrow")
        .groupby(["user_id", "wk"])
        .count()
        .select_columns(["user_id", "wk"])
        .materialize()
    )
    # materialized: consumed twice (the sizes fold below executes it
    # eagerly; the join re-reads it when the caller consumes the result)
    first = (
        act.groupby("user_id")
        .aggregate(Min("wk", alias_name="cohort"))
        .materialize()
    )
    if nparts is None:
        nparts = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    joined = act.repartition(nparts).join(
        first.repartition(nparts),
        join_type="inner",
        num_partitions=nparts,
        on=("user_id",),
    )

    def offs(batch: pa.Table) -> pa.Table:
        wkv = batch.column("wk").to_numpy()
        co = batch.column("cohort").to_numpy()
        return pa.table(
            {
                "cohort": pa.array(co, pa.int64()),
                "week_offset": pa.array((wkv - co) // WEEK_US, pa.int64()),
            }
        )

    c = (
        joined.map_batches(offs, batch_format="pyarrow")
        .groupby(["cohort", "week_offset"])
        .aggregate(Count(alias_name="n_active"))
    )
    sizes: dict[int, int] = {}
    for b in first.map_batches(
        lambda t: pa.table({"cohort": t.column("cohort")}),
        batch_format="pyarrow",
    ).groupby("cohort").count().iter_batches(batch_format="pyarrow"):
        for co, n in zip(
            b.column("cohort").to_numpy(), b.column("count()").to_numpy()
        ):
            sizes[int(co)] = int(n)
    co_keys = np.array(sorted(sizes), dtype=np.int64)
    co_n = np.array([sizes[int(k)] for k in co_keys], dtype=np.float64)

    def finish(batch: pa.Table) -> pa.Table:
        co = batch.column("cohort").to_numpy()
        na = batch.column("n_active").to_numpy().astype(np.int64)
        denom = co_n[np.searchsorted(co_keys, co)]
        return pa.table(
            {
                "cohort": pc.cast(
                    pa.array(co, pa.int64()), pa.timestamp("us")
                ),
                "week_offset": batch.column("week_offset"),
                "n_active": pa.array(na, pa.int64()),
                "retention": pa.array(
                    np.round(na / denom + 1e-9, 4), pa.float64()
                ),
            }
        )

    return c.map_batches(finish, batch_format="pyarrow")


def doc_length_percentile(sf_dir: str) -> rd.Dataset:
    """PERCENT_RANK window: each document's length percentile WITHIN its
    source — rank-based quantile normalization, the score-calibration
    step a mixture pipeline runs before cross-source quality thresholds
    (absolute scores aren't comparable across sources; percentiles are).

    Group-parallel execution: sources are a bounded vocabulary (the
    same assumption the grouped-quantiles op documents), so ONE
    ``map_groups`` call per source runs a vectorized lexsort +
    closed-form (rank-1)/(n-1); lengths are computed in the pruned
    scan, the text never shuffles. (doc_id tiebreak makes ranks unique,
    so RANK == ROW_NUMBER and no tie-sharing pass is needed.)"""
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "source", "text"])

    def lens(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "n_bytes": pc.cast(
                    pc.binary_length(batch.column("text")), pa.int64()
                ),
            }
        )

    def pr(g: pa.Table) -> pa.Table:
        did = g.column("doc_id").to_numpy()
        nb = g.column("n_bytes").to_numpy()
        order = np.lexsort((did, nb))
        n = len(did)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n)
        denom = max(n - 1, 1)
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "source": g.column("source"),
                "pr": pa.array(np.round(rank / denom + 1e-9, 4), pa.float64()),
            }
        )

    return (
        ds.map_batches(lens, batch_format="pyarrow")
        .groupby("source")
        .map_groups(pr, batch_format="pyarrow")
    )


def winsorize_values(
    sf_dir: str, *, lo_q: float = 0.05, hi_q: float = 0.95
) -> rd.Dataset:
    """Winsorization: clamp each event's value to its type's
    [p05, p95] — the outlier-clipping pass run before training-data
    normalization (z-scores over raw heavy tails are garbage; clip
    first). Two stages: per-type exact quantile bounds via the
    distributed selection engine (``_grouped_quantiles`` — histogram-
    refinement bisection, no type's values ever gathered into one
    worker) collected as a types-sized broadcast, then one shuffle-free
    clip map over the events — the big table never moves. The engine
    replicates np.quantile's lerp (== DuckDB ``quantile_cont``), and
    interpolated bounds fall strictly between data points, so the clip
    decisions are bit-identical across engines."""
    ds = read_clean(
        _p(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )
    quants = _grouped_quantiles(
        ds.select_columns(["event_type", "value"]), "event_type", "value",
        (lo_q, hi_q),
    )
    b = [
        {"event_type": t, "lo": quants[(t, lo_q)], "hi": quants[(t, hi_q)]}
        for t in sorted({k for k, _ in quants})
    ]
    types = np.array(sorted(r["event_type"] for r in b))
    by = {r["event_type"]: r for r in b}
    lo = np.array([by[t]["lo"] for t in types], dtype=np.float64)
    hi = np.array([by[t]["hi"] for t in types], dtype=np.float64)

    def clip(batch: pa.Table) -> pa.Table:
        idx = np.searchsorted(
            types, batch.column("event_type").to_numpy(zero_copy_only=False)
        )
        v = batch.column("value").to_numpy()
        w = np.minimum(np.maximum(v, lo[idx]), hi[idx])
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "value_w": pa.array(np.round(w + 1e-9, 4), pa.float64()),
            }
        )

    return ds.map_batches(clip, batch_format="pyarrow")


def approx_type_overlap(sf_dir: str, *, p: int = 12) -> pa.Table:
    """Approximate audience overlap |users(A) ∩ users(B)| for every
    event-type pair via HyperLogLog inclusion-exclusion:
    est(A) + est(B) - est(A ∪ B), where the union sketch is the
    register-wise max — the mergeable-sketch answer to the question
    ``basket_cooccurrence`` answers exactly. No raw user ids ever
    shuffle: each block emits one ~4 KB sketch per type present, the
    driver folds kilobytes, pairwise unions are register maxima.
    Accuracy ±~1.6%/term at p=12 (linear-counting regime is near-exact
    at fixture scale); asserted against the exact overlap in tests.
    Rows-only for the driver (approximate ≠ SQL-exact)."""
    from ..functions.sketches import HyperLogLog

    vocab = _event_type_vocab(sf_dir)
    T = len(vocab)
    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "event_type"])

    def sketch_batch(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy()
        tis, blobs = [], []
        for i, t in enumerate(vocab):
            sel = uid[et == t]
            if len(sel) == 0:
                continue
            h = HyperLogLog(p)
            h.add_ints(sel)
            tis.append(i)
            blobs.append(h.serialize())
        return pa.table(
            {"ti": pa.array(tis, pa.int64()), "sketch": pa.array(blobs, pa.binary())}
        )

    per_type: list = [None] * T
    for b in ds.map_batches(
        sketch_batch, batch_size=8192, batch_format="pyarrow"
    ).iter_batches(batch_size=256, batch_format="pyarrow"):
        for ti, blob in zip(b.column("ti").to_pylist(), b.column("sketch").to_pylist()):
            s = HyperLogLog.deserialize(blob)
            per_type[ti] = s if per_type[ti] is None else per_type[ti].merge(s)

    ta, tb, est = [], [], []
    for i in range(T):
        for j in range(i + 1, T):
            a, b_ = per_type[i], per_type[j]
            if a is None or b_ is None:
                continue
            both = a.estimate() + b_.estimate() - a.merge(b_).estimate()
            ta.append(vocab[i])
            tb.append(vocab[j])
            est.append(max(0, int(round(both))))
    return pa.table(
        {
            "type_a": pa.array(ta, pa.string()),
            "type_b": pa.array(tb, pa.string()),
            "approx_both": pa.array(est, pa.int64()),
        }
    )


def session_trigrams(sf_dir: str) -> rd.Dataset:
    """Session-path trigrams: counts of every 3-event same-user path
    (ordered by ts, event_id) — the two-lead window extension of
    ``event_transitions``, the shape behind session-flow mining and
    next-k-event training data. Same coarse-bucket execution: one
    lexsort per bucket, a double shifted same-user compare, then one
    bincount over base-T³ codes — at most T³ pre-combined rows leave
    any bucket; the final grouped Sum runs on kilobytes."""
    import ray

    ds = read_clean(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )
    vocab = _event_type_vocab(sf_dir)
    T = len(vocab)
    B = max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)

    def tag(batch: pa.Table) -> pa.Table:
        part = _knuth_bucket(batch.column("user_id").to_numpy(), B)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "event_id": batch.column("event_id"),
                "code": pa.array(
                    np.searchsorted(
                        vocab,
                        batch.column("event_type").to_numpy(zero_copy_only=False),
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "part": pa.array(part, pa.int64()),
            }
        )

    def trigrams(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        code = g.column("code").to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, code = uid[order], code[order]
        same3 = (uid[2:] == uid[:-2]) & (uid[1:-1] == uid[:-2])
        combo = (
            code[:-2][same3] * T * T + code[1:-1][same3] * T + code[2:][same3]
        )
        cnt = np.bincount(combo, minlength=T * T * T)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "a": pa.array(vocab[nz // (T * T)], pa.string()),
                "b": pa.array(vocab[(nz // T) % T], pa.string()),
                "c": pa.array(vocab[nz % T], pa.string()),
                "n_part": pa.array(cnt[nz], pa.int64()),
            }
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(trigrams, batch_format="pyarrow")
        .groupby(["a", "b", "c"])
        .aggregate(Sum("n_part", alias_name="n"))
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "a": t.column("a"),
                "b": t.column("b"),
                "c": t.column("c"),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def value_trend_by_type(sf_dir: str) -> rd.Dataset:
    """Per-type OLS trend of event value on hour-of-day (SQL
    ``regr_slope`` / ``regr_intercept`` GROUP BY event_type) — the
    drift detector a curation pipeline runs to catch a source whose
    quality score decays over the day. Same distributed-raw-moments
    shape as ``value_hour_corr``, but grouped: each batch pre-combines
    (n, sx, sy, sxx, sxy) per type with ONE vectorized
    ``pa.Table.group_by``, the grouped Sum ships one 5-double row per
    (type, block), and the closed form runs on the types-sized result.
    Raw values never shuffle."""
    ds = read_clean(_p(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def moments(batch: pa.Table) -> pa.Table:
        x = pc.cast(pc.hour(batch.column("ts")), pa.float64())
        y = batch.column("value")
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": pa.array(np.ones(len(x)), pa.float64()),
                "sx": x,
                "sy": y,
                "sxx": pc.multiply(x, x),
                "sxy": pc.multiply(x, y),
            }
        )
        g = t.group_by("event_type").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("sxy", "sum")]
        )
        return g.rename_columns(["event_type", "n", "sx", "sy", "sxx", "sxy"])

    agg = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
            Sum("sxy", alias_name="sxy"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy()
        sx = t.column("sx").to_numpy()
        sy = t.column("sy").to_numpy()
        sxx = t.column("sxx").to_numpy()
        sxy = t.column("sxy").to_numpy()
        denom = n * sxx - sx * sx
        slope = np.where(denom != 0, (n * sxy - sx * sy) / np.where(denom == 0, 1.0, denom), 0.0)
        intercept = (sy - slope * sx) / n
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "slope": pa.array(np.round(slope + 1e-9, 4), pa.float64()),
                "intercept": pa.array(np.round(intercept + 1e-9, 4), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def lang_entropy_by_source(sf_dir: str) -> rd.Dataset:
    """Per-source Shannon entropy (bits) of the language mix — the
    diversity audit a multilingual mixture pipeline runs per upstream
    feed (a source whose entropy collapses stopped being multilingual).
    Counts pre-combine per batch (one row per (source, lang) per
    block), the grouped Sum is the only shuffle, and the bounded
    (source x lang) result folds to entropy with vectorized log2.
    Matches DuckDB's ``entropy()`` (base-2) under the shared
    round-nudge convention."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["source", "lang"])

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["source", "lang"]).aggregate([("lang", "count")])
        return g.rename_columns(["source", "lang", "c"])

    agg = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def entropy(g: pa.Table) -> pa.Table:
        c = g.column("c").to_numpy().astype(np.float64)
        n = c.sum()
        p = c / n
        h = float(-(p * np.log2(p)).sum())
        return pa.table(
            {
                "source": g.column("source").slice(0, 1),
                "n_docs": pa.array([int(n)], pa.int64()),
                "lang_entropy": pa.array(
                    [float(np.round(h + 1e-9, 4))], pa.float64()
                ),
            }
        )

    return agg.groupby("source").map_groups(entropy, batch_format="pyarrow")


def type_user_hhi(sf_dir: str) -> rd.Dataset:
    """Per-type Herfindahl-Hirschman concentration of events over
    users: HHI = sum_u (c_u / n)^2 — the skew audit that flags an
    event type dominated by a handful of users (bot traffic, hot-key
    hazard for any later per-user shuffle). Two grouped Sums: exact
    (type, user) counts (pre-combined per block), then per-type
    sum(c^2) / sum(c)^2 — user ids never reach the second shuffle, so
    the final exchange is types-sized."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "user_id"])

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate(
            [("user_id", "count")]
        )
        return g.rename_columns(["event_type", "user_id", "c"])

    per_user = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def partials(batch: pa.Table) -> pa.Table:
        c = pc.cast(batch.column("c"), pa.float64())
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "sc": c,
                "scc": pc.multiply(c, c),
                "nu": pa.array(np.ones(len(c)), pa.float64()),
            }
        )
        g = t.group_by("event_type").aggregate(
            [("sc", "sum"), ("scc", "sum"), ("nu", "sum")]
        )
        return g.rename_columns(["event_type", "sc", "scc", "nu"])

    agg = (
        per_user.map_batches(partials, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("sc", alias_name="sc"), Sum("scc", alias_name="scc"),
            Sum("nu", alias_name="nu"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        sc = t.column("sc").to_numpy()
        scc = t.column("scc").to_numpy()
        nu = t.column("nu").to_numpy()
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n_events": pa.array(sc.astype(np.int64), pa.int64()),
                "n_users": pa.array(nu.astype(np.int64), pa.int64()),
                "hhi": pa.array(
                    np.round(scc / (sc * sc) + 1e-9, 4), pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def rrf_keyword_search(
    sf_dir: str,
    *,
    keywords: tuple[str, ...] = ("spark", "merge", "window"),
    per_list: int = 100,
    k_rrf: int = 60,
    top_n: int = 20,
) -> pa.Table:
    """Reciprocal-rank-fusion hybrid retrieval: each keyword produces a
    term-frequency-ranked top-``per_list`` list (tf DESC, doc_id ASC —
    deterministic), fused as sum(1 / (k + rank)) and cut to ``top_n``.
    The rank-fusion step every multi-retriever search stack runs.

    Distributed shape mirrors ``knn_topk``: tf for all keywords is one
    vectorized ``pc.count_substring`` pass per batch, each batch prunes
    to its local top-``per_list`` per keyword (argpartition, no full
    sort), and only blocks x K x per_list candidate rows reach the
    driver for the exact global cut — the text column never leaves the
    scan. Non-overlapping substring counting matches SQL's
    replace-length idiom."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    kws = list(keywords)

    def local_topk(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy()
        outs = []
        for i, kw in enumerate(kws):
            tf = pc.count_substring(batch.column("text"), kw).to_numpy()
            m = tf > 0
            d, t = did[m], tf[m]
            if len(d) > per_list:
                # top per_list by (tf desc, doc_id asc): argpartition on
                # composite key keeps the cut exact without a full sort
                key = t.astype(np.int64) * (1 << 40) - d
                idx = np.argpartition(key, len(key) - per_list)[-per_list:]
                d, t = d[idx], t[idx]
            outs.append(
                pa.table(
                    {
                        "kw": pa.array(np.full(len(d), i), pa.int32()),
                        "doc_id": pa.array(d, pa.int64()),
                        "tf": pa.array(t.astype(np.int64), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    cand = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    if not cand:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "rrf": pa.array([], pa.float64())}
        )
    kw = np.array([r["kw"] for r in cand])
    did = np.array([r["doc_id"] for r in cand])
    tf = np.array([r["tf"] for r in cand])

    scores: dict[int, float] = {}
    for i in range(len(kws)):
        m = kw == i
        d, t = did[m], tf[m]
        order = np.lexsort((d, -t))[:per_list]
        for rank, doc in enumerate(d[order], start=1):
            scores[int(doc)] = scores.get(int(doc), 0.0) + 1.0 / (k_rrf + rank)
    docs = np.array(sorted(scores))
    sc = np.array([scores[int(x)] for x in docs])
    order = np.lexsort((docs, -sc))[:top_n]
    return pa.table(
        {
            "doc_id": pa.array(docs[order], pa.int64()),
            "rrf": pa.array(np.round(sc[order] + 1e-9, 4), pa.float64()),
        }
    )


def mad_anomaly_events(sf_dir: str, *, z_cut: float = 3.5) -> rd.Dataset:
    """Robust (median/MAD) outlier detection per event type — what
    ``zscore_anomaly_events`` should be when the tail itself is the
    contamination (mean/sd are dragged by the outliers they're meant to
    flag; median/MAD have a 50% breakdown point).

    Both grouped medians run on the distributed selection engine
    (``_grouped_quantiles``): histogram-refinement bisection over
    order-preserving integer keys — no event type's values are ever
    gathered into one worker, so unbounded group sizes are safe. The
    deviation pass tags |v - med| with the broadcast medians
    (shuffle-free map), and one more shuffle-free map emits rows with
    modified z = 0.6745 (v - med) / MAD beyond ``z_cut``. The cut
    compares the ROUNDED score on both engines (the selection engine
    replicates np.quantile's lerp == DuckDB quantile_cont, so medians
    are bit-identical)."""
    ds = read_clean(
        _p(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    thin = ds.select_columns(["event_type", "value"])
    m1 = _grouped_quantiles(thin, "event_type", "value", (0.5,))
    types = np.array(sorted(k for k, _ in m1))
    med = np.array([m1[(t, 0.5)] for t in types])

    def absdev(batch: pa.Table) -> pa.Table:
        idx = np.searchsorted(
            types, batch.column("event_type").to_numpy(zero_copy_only=False)
        )
        v = batch.column("value").to_numpy()
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "dev": pa.array(np.abs(v - med[idx]), pa.float64()),
            }
        )

    devs = ds.map_batches(absdev, batch_format="pyarrow")
    m2 = _grouped_quantiles(devs, "event_type", "dev", (0.5,))
    mad = np.array([m2[(t, 0.5)] for t in types])

    def flag(batch: pa.Table) -> pa.Table:
        idx = np.searchsorted(
            types, batch.column("event_type").to_numpy(zero_copy_only=False)
        )
        v = batch.column("value").to_numpy()
        rz = np.round(0.6745 * (v - med[idx]) / mad[idx] + 1e-9, 4)
        keep = np.abs(rz) > z_cut
        return pa.table(
            {
                "event_id": batch.column("event_id").filter(pa.array(keep)),
                "event_type": batch.column("event_type").filter(pa.array(keep)),
                "value": pa.array(np.round(v[keep], 4), pa.float64()),
                "rz": pa.array(rz[keep], pa.float64()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def time_decay_user_value(
    sf_dir: str, *, half_life_days: float = 7.0
) -> rd.Dataset:
    """Per-user exponentially time-decayed value sum (half-life
    ``half_life_days``) anchored at the corpus max timestamp — the
    recency-weighted engagement feature every ranking/recrawl model
    consumes. One cheap global Max, then per-batch decayed
    contributions feed ONE grouped Sum (Ray pre-combines per block, so
    only (user, partial) rows shuffle). Exponents are exact-integer
    microsecond differences divided once in double — bit-identical
    across engines; exp2/pow last-ulp noise dies in the shared
    round-nudge."""
    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def us(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"m": pc.cast(batch.column("ts"), pa.int64())}
        )

    mx = ds.map_batches(us, batch_format="pyarrow").aggregate(Max("m"))["max(m)"]
    denom = 86400000000.0 * half_life_days

    def decay(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        v = batch.column("value").to_numpy()
        w = v * np.exp2(-((mx - t).astype(np.float64) / denom))
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "wv": pa.array(w, pa.float64()),
            }
        )

    agg = (
        ds.map_batches(decay, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Count(alias_name="n_events"), Sum("wv", alias_name="wv"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n_events": pc.cast(t.column("n_events"), pa.int64()),
                "decayed_value": pa.array(
                    np.round(t.column("wv").to_numpy() + 1e-9, 4), pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def cumulative_users_by_day(sf_dir: str) -> pa.Table:
    """Running count of distinct users ever seen, per day — the
    audience-growth curve. COUNT(DISTINCT) OVER a window is quadratic
    in naive engines; here it is exact in two thin exchanges: grouped
    Min ships each user's FIRST day once (pre-combined per block), the
    bounded per-day first-appearance counts fold on the driver, and a
    vectorized cumsum over the day-sorted counts is the whole window.
    User ids never reach the second exchange."""
    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "ts"])

    def days(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": pc.cast(
                    pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.int64(),
                ),
            }
        )

    first = (
        ds.map_batches(days, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("day", alias_name="first_day"))
    )

    def cnt(batch: pa.Table) -> pa.Table:
        g = batch.group_by("first_day").aggregate([("first_day", "count")])
        return g.rename_columns(["day", "c"])

    parts = [
        b
        for b in first.map_batches(cnt, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if b.num_rows
    ]
    t = pa.concat_tables(parts).combine_chunks()
    day = t.column("day").to_numpy()
    c = t.column("c").to_numpy()
    order = np.argsort(day)
    uday, inv = np.unique(day[order], return_inverse=True)
    totals = np.bincount(inv, weights=c[order].astype(np.float64))
    return pa.table(
        {
            "day": pc.cast(pa.array(uday, pa.int64()), pa.timestamp("us")),
            "new_users": pa.array(totals.astype(np.int64), pa.int64()),
            "cum_users": pa.array(
                np.cumsum(totals).astype(np.int64), pa.int64()
            ),
        }
    )


def weekly_churn(sf_dir: str) -> pa.Table:
    """Week-over-week churn: of the users active in week w, how many
    are absent in week w+1 — the retention complement every growth
    dashboard carries. Fully distributed, no driver-side id
    materialization: distinct (user, week) pairs come from ONE grouped
    Count (pre-combined per block); each pair then votes twice — into
    its own week as ACTIVE and into the PREVIOUS week as a
    retention-candidate — so a second grouped Sum over (user, week)
    finds retained users as groups holding both votes, and the final
    exchange is the bounded per-week counts. User ids never reach the
    driver."""
    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "ts"])
    STEP = 604800000000  # one calendar week in epoch microseconds

    def weeks(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "week": pc.cast(
                    pc.floor_temporal(batch.column("ts"), unit="week"),
                    pa.int64(),
                ),
            }
        )

    uw = (
        ds.map_batches(weeks, batch_format="pyarrow")
        .groupby(["user_id", "week"])
        .aggregate(Count(alias_name="c"))
    )

    def votes(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id")
        w = batch.column("week")
        n = len(u)
        return pa.table(
            {
                "user_id": pa.concat_arrays(
                    [pc.cast(u, pa.int64()).combine_chunks(),
                     pc.cast(u, pa.int64()).combine_chunks()]
                ),
                "week": pa.concat_arrays(
                    [pc.cast(w, pa.int64()).combine_chunks(),
                     pc.cast(pc.subtract(w, STEP), pa.int64()).combine_chunks()]
                ),
                "a": pa.array(
                    np.concatenate([np.ones(n), np.zeros(n)]).astype(np.int64),
                    pa.int64(),
                ),
                "b": pa.array(
                    np.concatenate([np.zeros(n), np.ones(n)]).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    flags = (
        uw.map_batches(votes, batch_format="pyarrow")
        .groupby(["user_id", "week"])
        .aggregate(Sum("a", alias_name="sa"), Sum("b", alias_name="sb"))
    )

    def counts(batch: pa.Table) -> pa.Table:
        w = batch.column("week").to_numpy()
        sa = batch.column("sa").to_numpy()
        sb = batch.column("sb").to_numpy()
        act = sa > 0
        ret = act & (sb > 0)
        t = pa.table(
            {
                "week": pa.array(w[act], pa.int64()),
                "active": pa.array(np.ones(int(act.sum()), np.int64)),
                "retained": pa.array(ret[act].astype(np.int64), pa.int64()),
            }
        )
        g = t.group_by("week").aggregate([("active", "sum"), ("retained", "sum")])
        return g.rename_columns(["week", "active", "retained"])

    per_week = (
        flags.map_batches(counts, batch_format="pyarrow")
        .groupby("week")
        .aggregate(
            Sum("active", alias_name="active"),
            Sum("retained", alias_name="retained"),
        )
    )
    parts = [
        b for b in per_week.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    t = pa.concat_tables(parts).combine_chunks()
    w = t.column("week").to_numpy()
    order = np.argsort(w)
    w = w[order]
    active = t.column("active").to_numpy()[order]
    retained = t.column("retained").to_numpy()[order]
    keep = w < w.max()  # the max observed week has no successor
    churned = active[keep] - retained[keep]
    return pa.table(
        {
            "week": pc.cast(pa.array(w[keep], pa.int64()), pa.timestamp("us")),
            "active": pa.array(active[keep].astype(np.int64), pa.int64()),
            "churned": pa.array(churned.astype(np.int64), pa.int64()),
            "churn_rate": pa.array(
                np.round(churned / active[keep] + 1e-9, 4), pa.float64()
            ),
        }
    )


def length_gini_by_source(sf_dir: str) -> rd.Dataset:
    """Per-source Gini coefficient of document lengths — the
    inequality audit that catches a feed mixing stubs with full
    articles (high Gini = a few huge docs carry the corpus mass).
    Group-parallel like the other per-source order statistics (bounded
    source vocabulary): one vectorized sort per group and the
    closed-form sum((2i - n - 1) x_i) / (n sum x); text stays in the
    pruned scan — only (source, n_bytes) shuffles."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["source", "text"])

    def lens(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch.column("source"),
                "n_bytes": pc.cast(
                    pc.binary_length(batch.column("text")), pa.float64()
                ),
            }
        )

    def gini(g: pa.Table) -> pa.Table:
        x = np.sort(g.column("n_bytes").to_numpy())
        n = len(x)
        i = np.arange(1, n + 1, dtype=np.float64)
        gsum = float(((2.0 * i - n - 1.0) * x).sum())
        denom = n * float(x.sum())
        return pa.table(
            {
                "source": g.column("source").slice(0, 1),
                "n_docs": pa.array([n], pa.int64()),
                "gini": pa.array(
                    [float(np.round(gsum / denom + 1e-9, 4))], pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(lens, batch_format="pyarrow")
        .groupby("source")
        .map_groups(gini, batch_format="pyarrow")
    )


def autocorr_daily_value(sf_dir: str) -> rd.Dataset:
    """Lag-1 autocorrelation of each event type's daily value series —
    the one-number seasonality probe (near +1: trending/weekday-bound
    load, near 0: memoryless). The heavy exchange is the grouped daily
    Sum (pre-combined per block, ships at most types x days rows); the
    per-type Pearson correlation of (v_t, v_{t-1}) then runs inside
    ``map_groups`` on the bounded day series. Gaps in the calendar are
    ignored (lag over observed days), matching the SQL lag() window."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pc.cast(
                    pc.floor_temporal(batch.column("ts"), unit="day"), pa.int64()
                ),
                "value": batch.column("value"),
            }
        )

    daily = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("value", alias_name="v"))
    )

    def fin(g: pa.Table) -> pa.Table:
        day = g.column("day").to_numpy()
        v = g.column("v").to_numpy()[np.argsort(day)]
        if len(v) < 2:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                    "autocorr": pa.array([], pa.float64()),
                }
            )
        r = float(np.corrcoef(v[1:], v[:-1])[0, 1])
        return pa.table(
            {
                "event_type": g.column("event_type").slice(0, 1),
                "n_pairs": pa.array([len(v) - 1], pa.int64()),
                "autocorr": pa.array(
                    [float(np.round(r + 1e-9, 4))], pa.float64()
                ),
            }
        )

    return daily.groupby("event_type").map_groups(fin, batch_format="pyarrow")


def inter_arrival_gaps(sf_dir: str) -> pa.Table:
    """Inter-arrival statistics: per event type, the count / mean / min /
    max of the gaps between a user's consecutive events OF THAT TYPE —
    the cadence profile behind rate-limiter sizing and bot detection.
    Same coarse-bucket execution as ``session_trigrams``: events hash
    into ~4 buckets per CPU by user, one lexsort per bucket orders every
    (user, type) run, a shifted same-key compare yields the gaps, and
    per-type integer partials (n, sum_us, min_us, max_us — all exact in
    int64) pre-combine inside the bucket so the final grouped fold runs
    on kilobytes. User ids never leave their bucket."""
    import ray

    ds = read_clean(
        _p(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id"]
    )
    vocab = _event_type_vocab(sf_dir)
    B = max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)

    def tag(batch: pa.Table) -> pa.Table:
        part = _knuth_bucket(batch.column("user_id").to_numpy(), B)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": pc.cast(batch.column("ts"), pa.int64()),
                "event_id": batch.column("event_id"),
                "code": pa.array(
                    np.searchsorted(
                        vocab,
                        batch.column("event_type").to_numpy(zero_copy_only=False),
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "part": pa.array(part, pa.int64()),
            }
        )

    T = len(vocab)

    def gaps(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").to_numpy()
        eid = g.column("event_id").to_numpy()
        code = g.column("code").to_numpy()
        order = np.lexsort((eid, ts, code, uid))
        uid, ts, code = uid[order], ts[order], code[order]
        same = (uid[1:] == uid[:-1]) & (code[1:] == code[:-1])
        gap = (ts[1:] - ts[:-1])[same]
        cg = code[1:][same]
        n = np.bincount(cg, minlength=T)
        s = np.zeros(T, np.int64)
        mn = np.full(T, np.iinfo(np.int64).max)
        mx = np.full(T, np.iinfo(np.int64).min)
        np.add.at(s, cg, gap)
        np.minimum.at(mn, cg, gap)
        np.maximum.at(mx, cg, gap)
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "event_type": pa.array(vocab[nz], pa.string()),
                "n_part": pa.array(n[nz], pa.int64()),
                "s_part": pa.array(s[nz], pa.int64()),
                "mn_part": pa.array(mn[nz], pa.int64()),
                "mx_part": pa.array(mx[nz], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gaps, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_part", alias_name="n_gaps"),
            Sum("s_part", alias_name="s_us"),
            Min("mn_part", alias_name="mn_us"),
            Max("mx_part", alias_name="mx_us"),
        )
    )
    parts = [b for b in agg.iter_batches(batch_format="pyarrow") if b.num_rows]
    t = pa.concat_tables(parts).combine_chunks()
    n = t.column("n_gaps").to_numpy()
    s = t.column("s_us").to_numpy().astype(np.float64)
    return pa.table(
        {
            "event_type": t.column("event_type"),
            "n_gaps": pa.array(n, pa.int64()),
            "mean_gap_s": pa.array(
                np.round(s / 1e6 / n + 1e-9, 4), pa.float64()
            ),
            "min_gap_s": pa.array(
                t.column("mn_us").to_numpy() / 1e6, pa.float64()
            ),
            "max_gap_s": pa.array(
                t.column("mx_us").to_numpy() / 1e6, pa.float64()
            ),
        }
    )


def cusum_changepoint(sf_dir: str) -> rd.Dataset:
    """CUSUM change-point scan: for each event type, the day where the
    cumulative deviation of the daily value series from its own mean
    peaks — the classic level-shift detector (Page 1954) a crawl
    operator runs over throughput series to spot when a source changed
    behavior. One grouped daily Sum is the only wide exchange; the
    per-type scan is a vectorized cumsum over the bounded day series.
    The statistic is rounded to 4 decimals BEFORE the argmax (earliest
    day wins ties), so near-equal float peaks order identically in the
    SQL oracle's window rank."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pc.cast(
                    pc.floor_temporal(batch.column("ts"), unit="day"), pa.int64()
                ),
                "value": batch.column("value"),
            }
        )

    daily = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("value", alias_name="v"))
    )

    def fin(g: pa.Table) -> pa.Table:
        day = g.column("day").to_numpy()
        order = np.argsort(day)
        day = day[order]
        v = g.column("v").to_numpy()[order]
        cs = np.round(np.abs(np.cumsum(v - v.mean())) + 1e-9, 4)
        i = int(np.argmax(cs))  # first occurrence == earliest day
        return pa.table(
            {
                "event_type": g.column("event_type").slice(0, 1),
                "change_day": pc.cast(
                    pa.array([day[i]], pa.int64()), pa.timestamp("us")
                ),
                "cusum_stat": pa.array([float(cs[i])], pa.float64()),
            }
        )

    return daily.groupby("event_type").map_groups(fin, batch_format="pyarrow")


def hot_key_audit(sf_dir: str) -> pa.Table:
    """Shuffle-skew audit: per event type, how concentrated the rows
    are on their hottest user key — the number a distributed engine
    checks BEFORE partitioning by that key (this repo's own salting and
    coarse-bucket patterns exist because of exactly this measurement).
    Reports rows, distinct keys, and the top-1 key's share. One grouped
    Count over (type, user) — pre-combined per block — then a thin
    per-type fold of (max, sum, count) partials; raw keys never reach
    the driver."""
    ds = read_clean(_p(sf_dir, "events"), columns=["event_type", "user_id"])

    per_key = ds.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="c")
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "mx": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "k": pa.array([], pa.int64()),
                }
            )
        g = batch.group_by("event_type").aggregate(
            [("c", "max"), ("c", "sum"), ("c", "count")]
        )
        return g.rename_columns(["event_type", "mx", "s", "k"])

    agg = (
        per_key.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Max("mx", alias_name="mx"),
            Sum("s", alias_name="n_events"),
            Sum("k", alias_name="n_keys"),
        )
    )
    parts = [b for b in agg.iter_batches(batch_format="pyarrow") if b.num_rows]
    t = pa.concat_tables(parts).combine_chunks()
    mx = t.column("mx").to_numpy().astype(np.float64)
    n = t.column("n_events").to_numpy().astype(np.float64)
    return pa.table(
        {
            "event_type": t.column("event_type"),
            "n_events": t.column("n_events"),
            "n_keys": t.column("n_keys"),
            "top_key_rows": pc.cast(t.column("mx"), pa.int64()),
            "top_share": pa.array(np.round(mx / n + 1e-9, 4), pa.float64()),
        }
    )


def peak_concurrency_daily(
    sf_dir: str, *, duration_min: int = 30, n_buckets: int | None = None
) -> rd.Dataset:
    """Sweep-line max-overlap: treating every event as an open session
    interval [ts, ts + duration), the per-day PEAK number of
    simultaneously open sessions — the capacity number (max concurrent
    connections / politeness slots / decode workers) an operator sizes
    a fleet against, where grouped counts only give totals.

    A global running sum over +1/-1 boundary rows needs a distributed
    prefix sum, which Ray Data lacks; this reuses the ``global_rank``
    fine-histogram discipline (``pipelines/ordering.py``) with SIGNED
    per-bucket delta sums:

      1. one pass folds per-fine-bucket (sum of deltas, boundary count)
         to the driver — F int64 pairs, independent of row count;
      2. the driver's exclusive prefix over the delta sums is the exact
         concurrency ENTERING each fine bucket; contiguous fine buckets
         group into count-balanced coarse partitions (skew-proof cuts);
      3. each coarse partition sorts its boundaries, adds base + local
         cumsum, and pre-folds per-day maxima — one thin (day, peak)
         row per day per partition reaches the final grouped Max.

    Boundary ordering: composite key 2*(t - t0) + is_start sorts ends
    before starts at equal t (half-open intervals: a session ending
    exactly when another starts never overlaps it) and makes equal-key
    peers share one fine bucket, so no partition cut can split a tie.
    SQL's RANGE-frame running sum gives every (t, d) peer the group
    total; the per-row cumsum's within-peer max equals that total, so
    the per-day maxima agree row-for-row.

    Output: (day, peak) per day that contains at least one session
    START, day ascending."""
    import ray

    dur_us = int(duration_min) * 60_000_000
    ds = read_clean(_p(sf_dir, "events"), columns=["ts"]).materialize()
    mm = ds.aggregate(Min("ts"), Max("ts"))
    if mm is None or mm.get("min(ts)") is None:  # empty events table
        return rd.from_arrow(
            pa.table(
                {"day": pa.array([], pa.timestamp("us")),
                 "peak": pa.array([], pa.int64())}
            )
        )
    t0 = int(pa.scalar(mm["min(ts)"]).cast(pa.int64()).as_py())
    t1 = int(pa.scalar(mm["max(ts)"]).cast(pa.int64()).as_py())
    from .ordering import count_balanced_coarse, fine_bucket_count

    key_max = max((t1 + dur_us - t0) * 2 + 2, 2)
    C = max(4, int(ray.cluster_resources().get("CPU", 4)) * 2) if n_buckets is None else n_buckets
    F = fine_bucket_count(C, key_max)

    def keys_of(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        t = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        start_k = (t - t0) * 2 + 1
        end_k = (t + dur_us - t0) * 2
        return start_k, end_k

    def hist(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"b": pa.array([], pa.int64()), "d": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        sk, ek = keys_of(batch)
        dsum = np.bincount(sk * F // key_max, minlength=F).astype(np.int64)
        ecnt = np.bincount(ek * F // key_max, minlength=F).astype(np.int64)
        cnt = dsum + ecnt
        dsum -= ecnt
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"b": pa.array(nz, pa.int64()), "d": pa.array(dsum[nz], pa.int64()),
             "n": pa.array(cnt[nz], pa.int64())}
        )

    deltas = np.zeros(F, dtype=np.int64)
    counts = np.zeros(F, dtype=np.int64)
    for part in ds.map_batches(hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if part.num_rows:
            b = part.column("b").to_numpy()
            np.add.at(deltas, b, part.column("d").to_numpy())
            np.add.at(counts, b, part.column("n").to_numpy())
    empty = pa.table(
        {"day": pa.array([], pa.timestamp("us")), "peak": pa.array([], pa.int64())}
    )
    total = int(counts.sum())
    if total == 0:
        return rd.from_arrow(empty)
    base = np.cumsum(deltas) - deltas  # concurrency entering each bucket
    fine2coarse, base_coarse = count_balanced_coarse(counts, C, base)
    bundle_ref = ray.put((fine2coarse, base_coarse))

    def boundaries(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "d": pa.array([], pa.int64()),
                 "day": pa.array([], pa.int64()),
                 "_bucket": pa.array([], pa.int64())}
            )
        sk, ek = keys_of(batch)
        day = pc.cast(
            pc.floor_temporal(batch.column("ts"), unit="day"), pa.int64()
        ).to_numpy()
        k = np.concatenate([sk, ek])
        d = np.concatenate(
            [np.ones(len(sk), np.int64), -np.ones(len(ek), np.int64)]
        )
        dy = np.concatenate([day, np.zeros(len(ek), np.int64)])
        f2c, _ = ray.get(bundle_ref)
        return pa.table(
            {"k": pa.array(k, pa.int64()), "d": pa.array(d, pa.int64()),
             "day": pa.array(dy, pa.int64()),
             "_bucket": pa.array(f2c[k * F // key_max], pa.int64())}
        )

    def fold_peaks(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy()
        d = group.column("d").to_numpy()
        dy = group.column("day").to_numpy()
        order = np.argsort(k, kind="stable")  # key parity orders ends first
        _, bases = ray.get(bundle_ref)
        run = bases[int(group.column("_bucket")[0].as_py())] + np.cumsum(d[order])
        starts = d[order] > 0
        sdays = dy[order][starts]
        uniq, inv = np.unique(sdays, return_inverse=True)
        peaks = np.zeros(len(uniq), np.int64)
        np.maximum.at(peaks, inv, run[starts])
        return pa.table(
            {"day": pa.array(uniq, pa.int64()), "p": pa.array(peaks, pa.int64())}
        )

    folded = (
        ds.map_batches(boundaries, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(fold_peaks, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Max("p", alias_name="peak"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return empty
        return pa.table(
            {
                "day": pc.cast(batch.column("day"), pa.timestamp("us")),
                "peak": pc.cast(batch.column("peak"), pa.int64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow").sort("day")


def regional_revenue_q5(
    sf_dir: str,
    *,
    region: str = "ASIA",
    year: str = "1996",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """TPC-H Q5 (local-supplier volume): revenue per nation from line
    items where the CUSTOMER and the SUPPLIER sit in the same nation of
    one region, over one order-date year — the classic 6-table join
    stress every warehouse engine benchmarks.

    Join plan by table size, never by join count:

      * region -> nation (25 rows): folds to one in-memory set of
        qualifying nation keys at plan time;
      * supplier and customer: key -> nationkey BROADCAST bundles
        (sorted numpy via ``ray.put``, zero-copy in every task —
        fine to ~10^8 keys; past that each lookup becomes one more
        hash join on the already-shuffled orderkey rows);
      * lineitem (largest): one streaming map attaches the supplier
        nation, drops non-region rows EARLY, and pre-combines
        (orderkey, s_nat, rev) per batch — orderkey-clustered input
        makes this a near-total combine;
      * orders: date window pushed down to the parquet reader (row
        groups outside the year never leave storage), customer nation
        attached in the same map;
      * ONE big-big hash join on orderkey, then the c_nat == s_nat
        equality filter and a 25-row grouped Sum.

    Output (n_name, revenue round-2), revenue DESC / n_name ASC."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray

    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    t_lo = pa.compute.strptime(f"{year}-01-01", "%Y-%m-%d", "us").as_py()
    t_hi = pa.compute.strptime(f"{int(year) + 1}-01-01", "%Y-%m-%d", "us").as_py()

    nat = pq.read_table(
        _p(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pq.read_table(_p(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg.column("r_name"), region)).column(
        "r_regionkey"
    )[0].as_py()
    nat_in = nat.filter(pc.equal(nat.column("n_regionkey"), rkey))
    nat_keys = np.sort(nat_in.column("n_nationkey").to_numpy().astype(np.int64))
    name_by_key = dict(
        zip(
            nat_in.column("n_nationkey").to_pylist(),
            nat_in.column("n_name").to_pylist(),
        )
    )

    supp = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    cust = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    supp_ref = broadcast_table(table_to_mapping(supp, "s_suppkey", "s_nationkey"))
    cust_ref = broadcast_table(table_to_mapping(cust, "c_custkey", "c_nationkey"))
    nat_ref = ray.put(pa.array(nat_keys, pa.int32()))
    nat_semi = make_broadcast_semijoin_fn("s_nat", nat_ref)

    li = read_clean(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    supp_lookup = make_broadcast_map_fn("l_suppkey", "s_nat", supp_ref, pa.int32())

    def line_partial(batch: pa.Table) -> pa.Table:
        batch = supp_lookup(batch)
        batch = nat_semi(batch)  # region prune (shared semijoin helper)
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table(
            {
                "o_orderkey": batch.column("l_orderkey"),
                "s_nat": pc.cast(batch.column("s_nat"), pa.int64()),
                "rev": rev,
            }
        )
        g = t.group_by(["o_orderkey", "s_nat"]).aggregate([("rev", "sum")])
        return g.rename_columns(["o_orderkey", "s_nat", "rev"])

    per_line = li.map_batches(line_partial, batch_format="pyarrow")

    orders = read_clean(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pads.field("o_orderdate") >= pa.scalar(t_lo))
            & (pads.field("o_orderdate") < pa.scalar(t_hi))
        ),
    )
    cust_lookup = make_broadcast_map_fn("o_custkey", "c_nat", cust_ref, pa.int32())

    def order_rows(batch: pa.Table) -> pa.Table:
        batch = cust_lookup(batch)
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "c_nat": pc.cast(batch.column("c_nat"), pa.int64()),
            }
        )

    ord_thin = orders.map_batches(order_rows, batch_format="pyarrow")
    joined = per_line.join(
        ord_thin, join_type="inner", num_partitions=num_partitions,
        on=("o_orderkey",),
    )

    def local_only(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"s_nat": pa.array([], pa.int64()), "rev": pa.array([], pa.float64())}
            )
        keep = pc.equal(batch.column("s_nat"), batch.column("c_nat"))
        out = batch.filter(keep)
        return pa.table({"s_nat": out.column("s_nat"), "rev": out.column("rev")})

    agg = (
        joined.map_batches(local_only, batch_format="pyarrow")
        .groupby("s_nat")
        .aggregate(Sum("rev", alias_name="revenue"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"n_name": pa.array([], pa.string()),
                 "revenue": pa.array([], pa.float64())}
            )
        keys = batch.column("s_nat").to_pylist()
        return pa.table(
            {
                "n_name": pa.array([name_by_key[k] for k in keys], pa.string()),
                "revenue": pa.array(
                    np.round(batch.column("revenue").to_numpy(), 2), pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["revenue", "n_name"], descending=[True, False]
    )


def profile_events(sf_dir: str) -> pa.Table:
    """Column profiler (the Deequ/whylogs data-quality pass a pipeline
    runs before trusting a new snapshot): per numeric column — row
    count, null count, EXACT distinct count, min, max — in two thin
    exchanges. Row/null/min/max fold as one 5-number partial per
    column per block (driver holds a constant); exact distincts dedupe
    per batch, collapse in ONE hash aggregate over (column, value)
    rows, and count as per-block row partials — the same two-level
    shape as ``distinct_users_by_type``. At 10^10 rows the distinct
    half is the HLL sketch (``approx_distinct_users``); this is the
    exact small-table twin the SQL oracle can check."""
    cols = ["event_id", "user_id", "value"]
    # two consumers (stats fold + distinct shuffle): pay the read once
    ds = read_clean(_p(sf_dir, "events"), columns=cols).materialize()

    def stat_partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mns, mxs = [], [], [], [], []
        for i, c in enumerate(cols):
            col = batch.column(c)
            names.append(i)
            ns.append(batch.num_rows)
            nulls.append(col.null_count)
            v = col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
            mns.append(float(v.min()) if len(v) else np.inf)
            mxs.append(float(v.max()) if len(v) else -np.inf)
        return pa.table(
            {"i": pa.array(names, pa.int64()), "n": pa.array(ns, pa.int64()),
             "nulls": pa.array(nulls, pa.int64()),
             "mn": pa.array(mns, pa.float64()), "mx": pa.array(mxs, pa.float64())}
        )

    n = np.zeros(len(cols), np.int64)
    nulls = np.zeros(len(cols), np.int64)
    mn = np.full(len(cols), np.inf)
    mx = np.full(len(cols), -np.inf)
    for b in ds.map_batches(stat_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows == 0:
            continue
        i = b.column("i").to_numpy()
        np.add.at(n, i, b.column("n").to_numpy())
        np.add.at(nulls, i, b.column("nulls").to_numpy())
        np.minimum.at(mn, i, b.column("mn").to_numpy())
        np.maximum.at(mx, i, b.column("mx").to_numpy())

    def distinct_rows(batch: pa.Table) -> pa.Table:
        is_, vs = [], []
        for i, c in enumerate(cols):
            v = np.unique(
                batch.column(c).drop_null().to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            is_.append(np.full(len(v), i, np.int64))
            vs.append(v)
        return pa.table(
            {"i": pa.array(np.concatenate(is_), pa.int64()),
             "v": pa.array(np.concatenate(vs), pa.float64())}
        )

    from ray.data.aggregate import Sum as _Sum

    deduped = (
        ds.map_batches(distinct_rows, batch_format="pyarrow")
        .groupby(["i", "v"])
        .aggregate(Count(alias_name="_c"))
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"i": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        i = batch.column("i").to_numpy()
        u, c = np.unique(i, return_counts=True)
        return pa.table({"i": pa.array(u, pa.int64()), "d": pa.array(c, pa.int64())})

    dist = np.zeros(len(cols), np.int64)
    for b in deduped.map_batches(count_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            np.add.at(dist, b.column("i").to_numpy(), b.column("d").to_numpy())
    return pa.table(
        {
            "col": pa.array(cols, pa.string()),
            "n": pa.array(n, pa.int64()),
            "n_null": pa.array(nulls, pa.int64()),
            "n_distinct": pa.array(dist, pa.int64()),
            # all-NULL column: min/max don't exist — NULL, like the SQL
            "min_v": pa.array(
                [None if n[i] == nulls[i] else float(mn[i]) for i in range(len(cols))],
                pa.float64(),
            ),
            "max_v": pa.array(
                [None if n[i] == nulls[i] else float(mx[i]) for i in range(len(cols))],
                pa.float64(),
            ),
        }
    )


def fk_integrity_audit(sf_dir: str) -> pa.Table:
    """Referential-integrity audit (the cross-table half of
    ``profile_events``): orphan counts for every foreign key in the
    star schema — the check a warehouse runs on each snapshot before
    joins silently drop rows.

    Small parents (customer / supplier / part) audit as broadcast
    sorted-key membership probes inside ``map_batches`` — per-batch
    orphan-count partials, constant driver state; lineitem is read ONCE
    (3 thin columns, materialized) and both of its probe edges fold in
    a single pass. The big-big edge (lineitem.orderkey -> orders) uses
    the union + origin-flag + ONE hash aggregate shape
    (``incremental_exact_dedup``'s anti-join without a join): lineitem
    pre-combines (key, n) per batch over the same materialized read,
    orders ships (key, parent=1) once, one groupby folds both sides,
    and orphans = sum of child counts in groups with no parent — one
    row per distinct key in the only exchange.

    Output: (relation, n_rows, n_orphans), one row per FK edge."""
    import pyarrow.parquet as pq
    import ray

    def parent_keys(tbl: str, col: str) -> np.ndarray:
        return np.unique(
            pq.read_table(_p(sf_dir, tbl), columns=[col])
            .column(col)
            .to_numpy()
            .astype(np.int64)
        )

    def probe(ref, col: str):
        def miss_count(batch: pa.Table) -> int:
            k = batch.column(col).to_numpy().astype(np.int64)
            ks = ray.get(ref)
            pos = np.minimum(np.searchsorted(ks, k), max(len(ks) - 1, 0))
            hit = ks[pos] == k if len(ks) else np.zeros(len(k), bool)
            return int((~hit).sum())

        return miss_count

    # --- orders.custkey -> customer (one orders pass)
    cust_ref = ray.put(parent_keys("customer", "c_custkey"))
    cust_miss = probe(cust_ref, "o_custkey")
    # two consumers (custkey probe + parent rows for the orderkey edge)
    orders_keys = read_clean(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    ).materialize()

    def orders_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array([batch.num_rows], pa.int64()),
             "o": pa.array([cust_miss(batch)], pa.int64())}
        )

    o_n = o_o = 0
    for b in orders_keys.map_batches(
        orders_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        o_n += int(pc.sum(b.column("n")).as_py() or 0)
        o_o += int(pc.sum(b.column("o")).as_py() or 0)

    # --- lineitem: ONE 3-column read serves both probes and the
    # orderkey pre-combine
    li = read_clean(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_partkey"],
    ).materialize()
    supp_miss = probe(ray.put(parent_keys("supplier", "s_suppkey")), "l_suppkey")
    part_miss = probe(ray.put(parent_keys("part", "p_partkey")), "l_partkey")

    def li_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array([batch.num_rows], pa.int64()),
             "so": pa.array([supp_miss(batch)], pa.int64()),
             "po": pa.array([part_miss(batch)], pa.int64())}
        )

    li_n = li_so = li_po = 0
    for b in li.map_batches(li_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        li_n += int(pc.sum(b.column("n")).as_py() or 0)
        li_so += int(pc.sum(b.column("so")).as_py() or 0)
        li_po += int(pc.sum(b.column("po")).as_py() or 0)

    # --- big-big edge: lineitem.orderkey -> orders via union + aggregate
    def child_rows(batch: pa.Table) -> pa.Table:
        k, c = np.unique(
            batch.column("l_orderkey").to_numpy().astype(np.int64),
            return_counts=True,
        )
        return pa.table(
            {"k": pa.array(k, pa.int64()), "n": pa.array(c, pa.int64()),
             "p": pa.array(np.zeros(len(k), np.int64), pa.int64())}
        )

    def parent_rows(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy().astype(np.int64)
        return pa.table(
            {"k": pa.array(k, pa.int64()),
             "n": pa.array(np.zeros(len(k), np.int64), pa.int64()),
             "p": pa.array(np.ones(len(k), np.int64), pa.int64())}
        )

    both = li.map_batches(child_rows, batch_format="pyarrow").union(
        orders_keys.map_batches(parent_rows, batch_format="pyarrow")
    )
    per_key = both.groupby("k").aggregate(
        Sum("n", alias_name="n"), Sum("p", alias_name="p")
    )

    def orphan_partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"o": pa.array([0], pa.int64())}
            )
        n = batch.column("n").to_numpy()
        p = batch.column("p").to_numpy()
        return pa.table(
            {"o": pa.array([int(n[p == 0].sum())], pa.int64())}
        )

    ok_o = 0
    for b in per_key.map_batches(orphan_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        ok_o += int(pc.sum(b.column("o")).as_py() or 0)

    return pa.table(
        {
            "relation": pa.array(
                ["orders.custkey", "lineitem.suppkey", "lineitem.partkey",
                 "lineitem.orderkey"],
                pa.string(),
            ),
            "n_rows": pa.array([o_n, li_n, li_n, li_n], pa.int64()),
            "n_orphans": pa.array([o_o, li_so, li_po, ok_o], pa.int64()),
        }
    )


def apply_changes_docs(
    sf_dir: str, *, num_partitions: int | None = None
) -> rd.Dataset:
    """CDC MERGE: apply an insert / update / delete change stream to a
    base table in one grouped pass — the reference's upsert sinks
    (SURVEY K1/K2, first-wins on unique key) generalized to the full
    change-capture contract a warehouse sink implements.

    The change stream derives deterministically from the base table so
    the DuckDB oracle can rebuild it exactly: doc_id % 10 == 3 rows are
    UPDATEd ('updated <id>'), % 10 == 7 rows are DELETEd, and % 10 == 5
    rows INSERT a new key at doc_id + 1,000,000.

    Shape: base rows (pri 0) union change rows (pri 1) — NO broadcast,
    the change stream may be corpus-sized — coarse-bucketed by the
    shared Knuth key partitioner, then ONE vectorized winner kernel per
    bucket (lexsort by (id, pri), keep each id's last = highest
    priority, drop delete winners). Payload text crosses exactly one
    hash exchange; every decision is a segment operation, no per-key
    Python."""
    import ray

    B = (
        max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)
        if num_partitions is None
        else num_partitions
    )
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def tagged(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        text = batch.column("text")
        # base rows
        out_id = [ids]
        out_text = [text]
        out_op = [np.zeros(len(ids), np.int8)]  # 0 = base upsert
        out_pri = [np.zeros(len(ids), np.int8)]
        # updates
        um = ids % 10 == 3
        uid = ids[um]
        out_id.append(uid)
        out_text.append(pa.array(np.char.add("updated ", uid.astype(np.str_)), pa.string()))
        out_op.append(np.zeros(len(uid), np.int8))
        out_pri.append(np.ones(len(uid), np.int8))
        # deletes
        dm = ids % 10 == 7
        did = ids[dm]
        out_id.append(did)
        out_text.append(pa.nulls(len(did), pa.string()))
        out_op.append(np.ones(len(did), np.int8))  # 1 = delete
        out_pri.append(np.ones(len(did), np.int8))
        # inserts (new keys)
        im = ids % 10 == 5
        iid = ids[im]
        out_id.append(iid + 1_000_000)
        out_text.append(pa.array(np.char.add("inserted ", iid.astype(np.str_)), pa.string()))
        out_op.append(np.zeros(len(iid), np.int8))
        out_pri.append(np.ones(len(iid), np.int8))
        all_ids = np.concatenate(out_id)
        return pa.table(
            {
                "doc_id": pa.array(all_ids, pa.int64()),
                "text": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                     for c in out_text]
                ),
                "op": pa.array(np.concatenate(out_op), pa.int8()),
                "pri": pa.array(np.concatenate(out_pri), pa.int8()),
                "part": pa.array(_knuth_bucket(all_ids, B), pa.int64()),
            }
        )

    rows = docs.map_batches(tagged, batch_format="pyarrow")

    def winners(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy()
        pri = group.column("pri").to_numpy()
        order = np.lexsort((pri, ids))
        last = np.r_[ids[order][1:] != ids[order][:-1], True]
        win = order[last]
        keep = group.column("op").to_numpy()[win] == 0
        sel = pa.array(win[keep])
        return pa.table(
            {
                "doc_id": group.column("doc_id").take(sel),
                "text": group.column("text").take(sel),
            }
        )

    return rows.groupby("part").map_groups(winners, batch_format="pyarrow")


def late_event_audit(
    sf_dir: str, *, lateness_us: int = 3_600_000_000
) -> rd.Dataset:
    """Streaming watermark / out-of-order audit: per user, how many
    events arrive LATE — event time already overtaken by the user's
    running watermark (max event time seen so far in arrival order) by
    more than ``lateness_us`` — and the worst disorder in microseconds.
    The number that sizes a streaming window's allowed-lateness /
    state-retention budget; the batch windows here (`events_daily_window`,
    `user_sessions`) silently assume it is bounded.

    The fixture stream carries no ingest timestamp (it is perfectly
    ordered by event_id), so arrival time is a DETERMINISTIC synthetic
    ingest clock: ``arrival = ts + (knuth_hash(event_id) % 7.2e6) * 1ms``
    — up to 2 h of hash-jittered network delay, identically computable
    in SQL (a deployment replaces it with its real ingest column; the
    audit itself is unchanged).

    Shape: the shared coarse-bucket lexsort (users -> ~4P buckets, ONE
    map_groups call per bucket); inside, the per-user running watermark
    is a SEGMENTED PREFIX-MAX by doubling (log2(bucket) vectorized
    passes — max is idempotent, so run[i] = max(run[i], run[i-d]),
    d *= 2, masked at segment starts, is exact), then reduceat folds per
    user. Only (user_id, 3 counters) rows leave any bucket.
    """
    import ray

    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "ts", "event_id"])
    B = max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)

    def tag(batch: pa.Table) -> pa.Table:
        part = _knuth_bucket(batch.column("user_id").to_numpy(), B)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def audit(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        h = (eid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            4294967296
        )
        delay = (h % np.uint64(7_200_000)).astype(np.int64) * 1000
        arrival = ts + delay
        order = np.lexsort((eid, arrival, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        n = len(uid)
        bounds = np.empty(n, dtype=bool)
        bounds[0] = True
        bounds[1:] = uid[1:] != uid[:-1]
        seg_first = np.flatnonzero(bounds)
        seg_start = np.repeat(seg_first, np.diff(np.append(seg_first, n)))
        idx = np.arange(n)
        run = ts.copy()  # segmented prefix-max by doubling
        d = 1
        while d < n:
            ok = idx - d >= seg_start
            run[ok] = np.maximum(run[ok], run[idx[ok] - d])
            d *= 2
        # exclusive watermark: the running max BEFORE each event
        wm = np.empty(n, dtype=np.int64)
        wm[1:] = run[:-1]
        disorder = np.maximum(wm - ts, 0)
        disorder[seg_first] = 0  # first arrival per user has no watermark
        late = disorder > lateness_us
        return pa.table(
            {
                "user_id": pa.array(uid[seg_first], pa.int64()),
                "n_events": pa.array(
                    np.diff(np.append(seg_first, n)), pa.int64()
                ),
                "n_late": pa.array(
                    np.add.reduceat(late.astype(np.int64), seg_first), pa.int64()
                ),
                "max_disorder_us": pa.array(
                    np.maximum.reduceat(disorder, seg_first), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(audit, batch_format="pyarrow")
    )
