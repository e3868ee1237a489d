"""Metadata-clean parquet reads.

The driver-written testdata parquet (and any pandas-written file) carries
a ``pandas`` schema-metadata blob that makes ``hash(schema)`` raise
``unhashable type: 'dict'`` — Ray Data's block-schema deduplication then
logs a warning per reduce task and falls back to the slow unify path.
``read_clean`` strips schema- and field-level metadata once at plan time
(driver side, one file-footer read) and hands Ray a hashable schema, so
every downstream shuffle dedupes schemas properly.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

_SCHEMA_CACHE: dict[str, pa.Schema] = {}


def _clean_schema(path: str) -> pa.Schema:
    full = _SCHEMA_CACHE.get(path)
    if full is None:
        p = Path(path)
        if p.is_dir():  # partitioned output dir: any one footer gives the schema
            p = next(iter(sorted(p.rglob("*.parquet"))))
        full = pq.read_schema(str(p))
        full = pa.schema([f.remove_metadata() for f in full])
        _SCHEMA_CACHE[path] = full
    return full


def read_clean(
    path: str, *, columns: list[str] | None = None, **kwargs
) -> rd.Dataset:
    """``ray.data.read_parquet`` with metadata-stripped (hashable) schema."""
    full = _clean_schema(path)
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)
