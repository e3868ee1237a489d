"""Multi-source union pipeline (reference ``GET /news``, SURVEY §3.2).

The reference fans out to N upstream news APIs, projects each source's
response shape into the canonical article schema (M10 normalizers,
``news_sources.py:74-89,110-132,156-170``), concatenates (D1), filters
excluded domains (M1), dedups (J1/D3) and stores. The Ray-Data-native
shape: N readers -> per-source normalize ``map_batches`` -> ``union`` ->
shared filter/dedup pipeline. A source-strategy registry mirrors the
reference's extension surface (``news_service.py:19-24``).

For DuckDB parity the demo sources are per-``source`` slices of the
``documents`` table, each deliberately exposed through a DIFFERENT raw
column shape — the normalize step earns its keep.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ..functions.io import read_clean


def _p(sf_dir: str, table: str) -> str:
    return str(Path(sf_dir) / f"{table}.parquet")


# ------------------------------------------------------ source strategies
# each returns a Dataset in that source's RAW shape (different col names)


def _src_alpha(sf_dir: str) -> rd.Dataset:
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("source"), "src0")).rename_columns(
            ["id", "body", "language", "feed"]
        ),
        batch_format="pyarrow",
    )


def _src_beta(sf_dir: str) -> rd.Dataset:
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("source"), "src1")).rename_columns(
            ["article_id", "content", "locale", "provider"]
        ),
        batch_format="pyarrow",
    )


def _src_gamma(sf_dir: str) -> rd.Dataset:
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.is_in(t.column("source"), value_set=pa.array(["src2", "src0"]))
        ),
        batch_format="pyarrow",
    )


# normalizers: raw shape -> canonical (doc_id, text, lang, source)


def _norm_rename(mapping: dict[str, str]) -> Callable[[pa.Table], pa.Table]:
    def norm(t: pa.Table) -> pa.Table:
        cols = {mapping.get(c, c): t.column(c) for c in t.column_names}
        return pa.table(
            {k: cols[k] for k in ("doc_id", "text", "lang", "source")}
        )

    return norm


SOURCE_STRATEGIES: dict[str, tuple[Callable[[str], rd.Dataset], Callable]] = {
    "alpha": (_src_alpha, _norm_rename({"id": "doc_id", "body": "text", "language": "lang", "feed": "source"})),
    "beta": (_src_beta, _norm_rename({"article_id": "doc_id", "content": "text", "locale": "lang", "provider": "source"})),
    "gamma": (_src_gamma, _norm_rename({})),
}


def multi_source_union(sf_dir: str, sources: list[str] | None = None) -> rd.Dataset:
    """N sources -> normalize -> union -> excluded filter -> first-wins
    dedup by doc_id (gamma deliberately overlaps alpha on src0 to exercise
    the dedup, like re-crawled URLs in the reference's J1 upsert)."""
    names = sources or list(SOURCE_STRATEGIES)
    parts = []
    for name in names:
        reader, norm = SOURCE_STRATEGIES[name]
        parts.append(reader(sf_dir).map_batches(norm, batch_format="pyarrow"))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    # excluded-domain analog: drop one feed wholesale (M1/J2)
    ds = ds.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("lang"), "zh")),
        batch_format="pyarrow",
    )
    # exact dedup on the canonical key (J1/D3): alpha and gamma overlap on
    # src0, like a re-crawled URL hitting the upsert — distinct keeps one
    from ray.data.aggregate import Count

    out = (
        ds.map_batches(
            lambda t: t.select(["doc_id", "source", "lang"]), batch_format="pyarrow"
        )
        .groupby(["doc_id", "source", "lang"])
        .aggregate(Count(alias_name="_n"))
    )
    return out.select_columns(["doc_id", "source", "lang"])


def user_sessions(sf_dir: str, *, gap_minutes: int = 60) -> rd.Dataset:
    """Gap-based sessionization (SURVEY §2.9 streaming analog): a new
    session starts when the gap to the user's previous event exceeds
    ``gap_minutes``.

    Coarse-bucket execution (queries._knuth_bucket; one pandas call per
    USER is the repo's measured slow idiom): users hash into ~4P
    buckets, ONE kernel call per bucket; inside, a single lexsort by
    (user, ts, event_id) then vectorized per-segment gap flags +
    ``np.add.reduceat`` fold every user's event/session counts at
    once. Ordering assumption: within-bucket sort — no global order
    needed, so this scales as a single hash shuffle by bucket."""
    import ray

    from .queries import _knuth_bucket

    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "ts", "event_id"])
    B = max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)
    gap_us = np.int64(gap_minutes) * 60_000_000

    def tag(batch: pa.Table) -> pa.Table:
        part = _knuth_bucket(batch.column("user_id").to_numpy(), B)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def sessions(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        n = len(uid)
        if n == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64()),
                 "n_sessions": pa.array([], pa.int64())}
            )
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.zeros(n, dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        breaks = (gap & ~new_user).astype(np.int64)
        seg_first = np.flatnonzero(new_user)
        n_events = np.diff(np.append(seg_first, n))
        n_sessions = np.add.reduceat(breaks, seg_first) + 1
        return pa.table(
            {
                "user_id": pa.array(uid[seg_first], pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
                "n_sessions": pa.array(n_sessions, pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sessions, batch_format="pyarrow")
    )


def user_session_rows(sf_dir: str, *, gap_minutes: int = 60) -> rd.Dataset:
    """Sessionization emitting ONE ROW PER SESSION (user_id,
    session_idx, n_events, start_ts, end_ts) — the materialized form a
    downstream funnel/attribution join consumes, vs ``user_sessions``'
    per-user rollup. Same coarse-bucket lexsort execution; session ids
    are a cumulative sum of gap flags reset per user, and the per-
    session bounds fold with ``np.minimum/maximum.reduceat`` — no
    Python call per user or per session."""
    import ray

    from .queries import _knuth_bucket

    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "ts", "event_id"])
    B = max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)
    gap_us = np.int64(gap_minutes) * 60_000_000

    def tag(batch: pa.Table) -> pa.Table:
        part = _knuth_bucket(batch.column("user_id").to_numpy(), B)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def sessions(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        n = len(uid)
        if n == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "session_idx": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64()),
                 "start_ts": pa.array([], pa.timestamp("us")),
                 "end_ts": pa.array([], pa.timestamp("us"))}
            )
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.zeros(n, dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess_start = new_user | gap
        s_first = np.flatnonzero(sess_start)
        s_cnt = np.diff(np.append(s_first, n))
        # per-user session index: global session ordinal minus the
        # ordinal at the user's first session
        ord_all = np.cumsum(sess_start) - 1
        user_first_ord = ord_all[np.flatnonzero(new_user)]
        # map each session to its user's first ordinal
        user_seg = np.cumsum(new_user) - 1
        sidx = ord_all[s_first] - user_first_ord[user_seg[s_first]]
        end_ts = ts[s_first + s_cnt - 1]
        return pa.table(
            {
                "user_id": pa.array(uid[s_first], pa.int64()),
                "session_idx": pa.array(sidx, pa.int64()),
                "n_events": pa.array(s_cnt, pa.int64()),
                "start_ts": pa.array(ts[s_first], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "end_ts": pa.array(end_ts, pa.int64()).cast(pa.timestamp("us")),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sessions, batch_format="pyarrow")
    )


def user_event_sequence(sf_dir: str) -> rd.Dataset:
    """Grouped ordered collect (reference A4 headline-cluster analog,
    ``google_news_crawler.py:388-440``): per user, the comma-joined
    event-type sequence in event_id order — deterministic, hashable.

    Coarse-bucket execution: users hash into ~4P buckets, ONE kernel
    call per bucket; inside, the bucket table sorts by (user, event_id)
    once, then Arrow's single-threaded grouped ``list`` aggregate (which
    preserves encounter order) + ``binary_join`` emit every user's
    joined sequence without a Python loop over users."""
    import ray

    from .queries import _knuth_bucket

    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "event_id", "event_type"])
    B = max(8, int(ray.cluster_resources().get("CPU", 4)) * 4)

    def tag(batch: pa.Table) -> pa.Table:
        part = _knuth_bucket(batch.column("user_id").to_numpy(), B)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def seq(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        eid = g.column("event_id").to_numpy()
        order = np.lexsort((eid, uid))
        if len(order) == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64()),
                 "sequence": pa.array([], pa.string())}
            )
        srt = pa.table(
            {
                "user_id": pa.array(uid[order], pa.int64()),
                "event_type": g.column("event_type").take(pa.array(order)),
            }
        )
        # use_threads=False keeps the grouped list aggregate in row
        # order, which the sort above made (user, event_id) order
        agg = srt.group_by("user_id", use_threads=False).aggregate(
            [("event_type", "list")]
        )
        lists = agg.column("event_type_list")
        return pa.table(
            {
                "user_id": agg.column("user_id"),
                "n_events": pc.cast(pc.list_value_length(lists), pa.int64()),
                "sequence": pc.binary_join(lists, ","),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(seq, batch_format="pyarrow")
    )

