"""Broadcast-side join helpers.

The reference's only joins are point-lookup upserts and small-side
anti-joins (SURVEY.md §2.4: J1-J4) — at Ray scale these are
broadcast-small-side patterns: ``ray.put`` the lookup once on the driver,
resolve it once per worker (module cache), and map keys per batch.

The broadcast payload is a pair of aligned numpy arrays (sorted keys +
values; fixed-width unicode for strings) resolved near-zero-copy from
the object store — NOT a Python dict, which would deserialize one
PyObject per key in every worker (repo perf rule; the same bundle shape
as ``stages/fetch.build_web_index``). Lookups are ``np.searchsorted``
(binary search, vectorized) and membership is ``pc.is_in`` — no Python
per row.
"""

from __future__ import annotations

import numpy as np
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

    ``mapping_ref`` is a ``ray.put`` of ``table_to_mapping``'s
    (sorted_keys, values) bundle. ``inner=True`` (default) drops rows
    with no match — INNER JOIN semantics, matching the SQL oracles;
    ``inner=False`` keeps them with a null value (LEFT JOIN)."""

    def add_mapped(batch: pa.Table) -> pa.Table:
        skeys, svals = _resolve(mapping_ref)
        if len(skeys) == 0:  # empty small side: no row matches (advice r2)
            if inner:  # slice BEFORE append so column lengths agree
                return batch.slice(0, 0).append_column(
                    out_col, pa.array([], out_type or pa.null())
                )
            return batch.append_column(
                out_col, pa.nulls(batch.num_rows, out_type or pa.null())
            )
        k = batch.column(key_col).to_numpy()
        pos = np.minimum(np.searchsorted(skeys, k), len(skeys) - 1)
        hit = skeys[pos] == k
        arr = pa.array(svals[pos], mask=~hit)
        if out_type is not None and arr.type != out_type:
            arr = arr.cast(out_type)
        out = batch.append_column(out_col, arr)
        if inner:
            out = out.filter(pa.array(hit))
        return out

    return add_mapped


def make_broadcast_semijoin_fn(key_col: str, keys_ref, anti: bool = False):
    """map_batches fn: keep rows whose key is (not, if anti) in the set.
    ``keys_ref`` holds an arrow array (or any iterable, converted once
    per worker); membership is ``pc.is_in`` — vectorized, no Python."""

    def filt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vs = _resolve(keys_ref)
        if not isinstance(vs, pa.Array):
            vs = pa.array(sorted(vs))
            _LOOKUP_CACHE[keys_ref] = vs  # memoize the converted form
        key = batch.column(key_col)
        mask = pc.is_in(key, value_set=vs)
        if anti:
            mask = pc.invert(mask)
        # null keys match nothing AND fail NOT IN — SQL semantics for
        # both paths. pc.is_in yields FALSE (not null) for null inputs,
        # so invert alone would keep null keys on anti: AND with
        # validity explicitly (advice r2/r3).
        mask = pc.and_kleene(pc.fill_null(mask, False), key.is_valid())
        return batch.filter(mask)

    return filt


def table_to_mapping(
    t: pa.Table, key_col: str, val_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted keys, aligned values) numpy bundle for broadcast lookup.
    String values become fixed-width unicode (contiguous buffer, no
    per-key Python objects on the wire)."""
    keys = t.column(key_col).to_numpy()
    order = np.argsort(keys)
    vals = t.column(val_col).to_numpy(zero_copy_only=False)[order]
    if vals.dtype == object:
        vals = vals.astype(str)
    return np.ascontiguousarray(keys[order]), np.ascontiguousarray(vals)


def broadcast_table(t):
    return ray.put(t)
