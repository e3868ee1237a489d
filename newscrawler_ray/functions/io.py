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

# keyed on (path, footer-file mtime_ns, size) so regenerating a fixture
# with a changed schema in the same session (gen_fixtures(force=True))
# never hands Ray a stale schema (advice round 2)
_SCHEMA_CACHE: dict[tuple[str, int, int], pa.Schema] = {}


def _clean_schema(path: str) -> pa.Schema:
    p = Path(path)
    if p.is_dir():  # partitioned output dir: any one footer gives the schema
        p = next(iter(sorted(p.rglob("*.parquet"))))
    st = p.stat()
    key = (str(p), st.st_mtime_ns, st.st_size)
    full = _SCHEMA_CACHE.get(key)
    if full is None:
        full = pq.read_schema(str(p))
        full = pa.schema([f.remove_metadata() for f in full])
        if len(_SCHEMA_CACHE) > 256:
            _SCHEMA_CACHE.clear()
        _SCHEMA_CACHE[key] = full
    return full


def read_clean(
    path: str, *, columns: list[str] | None = None, **kwargs
) -> rd.Dataset:
    """``ray.data.read_parquet`` with metadata-stripped (hashable) schema."""
    full = _clean_schema(path)
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)
