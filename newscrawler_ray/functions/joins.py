"""Broadcast-side join helpers.

The reference's only joins are point-lookup upserts and small-side
anti-joins (SURVEY.md §2.4: J1-J4) — at Ray scale these are
broadcast-small-side patterns: ``ray.put`` the lookup once on the driver,
resolve it once per worker (module cache), and map keys per batch with a
vectorized pandas ``Series.map``. No shuffle; the big side streams.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray

_LOOKUP_CACHE: dict = {}


def _resolve(ref):
    val = _LOOKUP_CACHE.get(ref)
    if val is None:
        val = ray.get(ref)
        if len(_LOOKUP_CACHE) > 8:
            _LOOKUP_CACHE.clear()
        _LOOKUP_CACHE[ref] = val
    return val


def make_broadcast_map_fn(
    key_col: str, out_col: str, mapping_ref, out_type=None, *, inner: bool = True
):
    """map_batches fn: adds ``out_col = mapping[key_col]``.

    ``inner=True`` (default) drops rows with no match — INNER JOIN
    semantics, matching the SQL oracles; ``inner=False`` keeps them with
    a null value (LEFT JOIN)."""

    def add_mapped(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mapping: dict = _resolve(mapping_ref)
        keys = batch.column(key_col).to_pandas()
        vals = keys.map(mapping)
        arr = pa.Array.from_pandas(vals, type=out_type)
        out = batch.append_column(out_col, arr)
        if inner:
            out = out.filter(pc.is_valid(out.column(out_col)))
        return out

    return add_mapped


def make_broadcast_semijoin_fn(key_col: str, keys_ref, anti: bool = False):
    """map_batches fn: keep rows whose key is (not, if anti) in the set."""

    def filt(batch: pa.Table) -> pa.Table:
        keyset = _resolve(keys_ref)
        keys = batch.column(key_col).to_pandas()
        mask = keys.isin(keyset).to_numpy()
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return filt


def table_to_mapping(t: pa.Table, key_col: str, val_col: str) -> dict:
    return dict(zip(t.column(key_col).to_pylist(), t.column(val_col).to_pylist()))


def broadcast_table(t: pa.Table | pd.DataFrame):
    return ray.put(t)
