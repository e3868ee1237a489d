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
    """Gap-based sessionization (SURVEY §2.9 streaming analog): events are
    partitioned by user and sorted by time inside ``map_groups``; a new
    session starts when the gap to the previous event exceeds
    ``gap_minutes``. Ordering assumption: within-group sort — no global
    order needed, so this scales as a single hash shuffle by user."""
    import pandas as pd

    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "ts", "event_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        n_sessions = int(gap.sum()) + 1
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_events": [len(g)],
                "n_sessions": [n_sessions],
            }
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def user_event_sequence(sf_dir: str) -> rd.Dataset:
    """Grouped ordered collect (reference A4 headline-cluster analog,
    ``google_news_crawler.py:388-440``): per user, the comma-joined
    event-type sequence in event_id order — deterministic, hashable."""
    import pandas as pd

    ds = read_clean(_p(sf_dir, "events"), columns=["user_id", "event_id", "event_type"])

    def seq(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_events": [len(g)],
                "sequence": [",".join(g["event_type"])],
            }
        )

    return ds.groupby("user_id").map_groups(seq, batch_format="pandas")
