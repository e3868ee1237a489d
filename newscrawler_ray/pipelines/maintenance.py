"""Stored-corpus maintenance: shard-wise schema migration with backfill.

The reference ships this as Postgres DDL scripts — add a ``domain``
column if absent (``scripts/add_domain_column.py:23-52``) and backfill
it from each row's URL (``scripts/populate_domains.py:20-50``). The
analog for a parquet/Lance corpus is a SHARD-WISE rewrite:

  * the "column already exists" check reads only each shard's footer
    (the ``IF NOT EXISTS`` of a file corpus) — migrated shards cost one
    metadata read, nothing else;
  * shards missing the column are rewritten tmp-then-``os.replace``
    (atomic on POSIX), so a killed migration leaves every shard either
    fully old or fully new and a rerun resumes by re-checking footers —
    the resumable-output discipline every 100 TB rewrite needs;
  * one Ray task per shard via ``map_batches`` over the shard list —
    embarrassingly parallel, no shuffle, no driver state beyond the
    manifest (path, action, n_rows) it returns.

Second runs are all-``skip`` (idempotent), exactly like the reference
script's "already up-to-date" path.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

_I64 = pa.int64()


def migrate_add_column(
    corpus_dir: str | Path,
    *,
    column: str,
    derive: Callable[[pa.Table], pa.Array],
    pattern: str = "**/*.parquet",
) -> rd.Dataset:
    """Add ``column = derive(shard)`` to every parquet shard under
    ``corpus_dir`` that does not already have it. Returns the manifest
    dataset (shard, action in {migrated, skip}, n_rows)."""
    root = Path(corpus_dir)
    paths = sorted(str(p) for p in root.glob(pattern))
    if not paths:
        return rd.from_arrow(
            pa.table(
                {"shard": pa.array([], pa.string()),
                 "action": pa.array([], pa.string()),
                 "n_rows": pa.array([], _I64)}
            )
        )

    def one_shard(batch: pa.Table) -> pa.Table:
        shards, actions, rows = [], [], []
        for p in batch.column("path").to_pylist():
            schema = pq.read_schema(p)  # footer-only "IF NOT EXISTS" check
            if column in schema.names:
                shards.append(p)
                actions.append("skip")
                rows.append(pq.read_metadata(p).num_rows)
                continue
            t = pq.read_table(p)
            t = t.append_column(column, derive(t))
            tmp = p + ".migrating"
            pq.write_table(t, tmp)
            os.replace(tmp, p)  # atomic: shard is fully old or fully new
            shards.append(p)
            actions.append("migrated")
            rows.append(t.num_rows)
        return pa.table(
            {
                "shard": pa.array(shards, pa.string()),
                "action": pa.array(actions, pa.string()),
                "n_rows": pa.array(rows, _I64),
            }
        )

    ds = rd.from_items([{"path": p} for p in paths])
    return ds.map_batches(one_shard, batch_format="pyarrow", batch_size=1)


# Common multi-label public suffixes: "news.bbc.co.uk" must reduce to
# "bbc.co.uk", not "co.uk". A deliberately small built-in subset of the
# public-suffix list (no network in this environment); extend as needed.
_MULTI_LABEL_SUFFIXES = frozenset(
    {
        "co.uk", "ac.uk", "gov.uk", "org.uk", "net.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au",
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
        "co.nz", "net.nz", "org.nz",
        "co.in", "net.in", "org.in", "gov.in",
        "com.br", "net.br", "org.br",
        "co.za", "com.mx", "com.cn", "com.sg", "com.hk",
    }
)


def registrable_domain(hosts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """``sub.site.example.com -> example.com``; null or empty host ->
    null, the reference's skip-missing-URL rule
    (``scripts/populate_domains.py:47-49``).

    DELIBERATE divergence from the reference: populate_domains stores the
    full ``urlparse(url).netloc``; we reduce to the *registrable* domain
    because per-site rollups (politeness, quality gates, domain_stats)
    want ``www.example.com`` and ``m.example.com`` to be one key. Known
    multi-label public suffixes (``co.uk``-style, see
    ``_MULTI_LABEL_SUFFIXES``) keep three labels so ``news.bbc.co.uk``
    -> ``bbc.co.uk`` rather than the wrong ``co.uk``."""
    out: list[str | None] = []
    for h in hosts.to_pylist():
        if not h:
            out.append(None)
            continue
        labels = h.split(".")
        if len(labels) >= 3 and ".".join(labels[-2:]) in _MULTI_LABEL_SUFFIXES:
            out.append(".".join(labels[-3:]))
        else:
            out.append(".".join(labels[-2:]) if len(labels) >= 2 else h)
    return pa.array(out, pa.string())


def backfill_domain(corpus_dir: str | Path, *, host_col: str = "host") -> rd.Dataset:
    """The reference's add-domain-column + populate-domains flow in one
    resumable pass: every shard gains ``domain`` = registrable domain of
    its ``host`` column. Shards already migrated are skipped via the
    footer check."""

    def derive(t: pa.Table) -> pa.Array:
        return registrable_domain(t.column(host_col))

    return migrate_add_column(corpus_dir, column="domain", derive=derive)
