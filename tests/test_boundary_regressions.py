"""Regression pins for the round-3 correctness-boundary fixes
(VERDICT r3 "What's wrong" #3-#5): the unrounded jaccard threshold,
the empty-small-side broadcast short-circuit, broadcast NOT-IN null
semantics, and loud connected-components non-convergence."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data as rd


def _grams_ds(sets: dict[int, list[int]]) -> rd.Dataset:
    """(doc_id, grams, n_grams) dataset with explicit gram sets.
    Values must be uint64-ascending under the int64 storage view."""
    ids = sorted(sets)
    counts = np.array([len(sets[i]) for i in ids], np.int64)
    vals = np.concatenate([np.array(sets[i], np.uint64) for i in ids])
    offs = np.zeros(len(ids) + 1, np.int32)
    np.cumsum(counts, out=offs[1:])
    grams = pa.ListArray.from_arrays(
        pa.array(offs), pa.array(vals.view(np.int64), pa.int64())
    )
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "grams": grams,
                "n_grams": pa.array(counts, pa.int64()),
            }
        )
    )


def test_jaccard_threshold_is_unrounded(ray_session):
    """A pair with J = 9999/19999 ~ 0.49997 rounds to 0.5000 but must
    NOT pass threshold=0.5 — the SQL oracles filter the unrounded value
    (dedup.py jac kernel: threshold before rounding). A pair at exactly
    J = 0.5 must pass."""
    from newscrawler_ray.pipelines.dedup import jaccard_verify_pairs

    # B strictly inside A: |A∩B| = 9999, |A∪B| = |A| = 19999
    a = list(range(1, 20000))
    b = list(range(1, 10000))
    # C/D overlap exactly half: |C∩D| = 5000, |C∪D| = 10000
    c = list(range(100000, 107500))
    d = list(range(102500, 110000))
    grams = _grams_ds({1: a, 2: b, 3: c, 4: d})
    pairs = rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([1, 3], pa.int64()),
                "id_b": pa.array([2, 4], pa.int64()),
            }
        )
    )
    out = jaccard_verify_pairs(pairs, None, 0.5, 2, grams=grams).to_pandas()
    got = {(r.id_a, r.id_b): r.jaccard for r in out.itertuples()}
    assert (1, 2) not in got, "0.49997 rounds to 0.5 but must not pass t=0.5"
    assert got[(3, 4)] == 0.5


def test_broadcast_map_fn_empty_small_side(ray_session):
    """Empty mapping bundle: inner drops every row (no IndexError from
    searchsorted into a zero-length array), left yields typed nulls."""
    from newscrawler_ray.functions.joins import make_broadcast_map_fn

    ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))
    batch = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    inner = make_broadcast_map_fn("k", "v", ref, pa.int64())(batch)
    assert inner.num_rows == 0 and "v" in inner.schema.names
    left = make_broadcast_map_fn("k", "v", ref, pa.int64(), inner=False)(batch)
    assert left.num_rows == 3
    assert left.column("v").null_count == 3
    assert left.column("v").type == pa.int64()


def test_broadcast_semijoin_null_keys_sql_semantics(ray_session):
    """SQL NOT IN drops null keys (null fails both IN and NOT IN); the
    anti path must not keep them via a fill_null(True)."""
    from newscrawler_ray.functions.joins import make_broadcast_semijoin_fn

    ref = ray.put(pa.array([2, 4], pa.int64()))
    batch = pa.table({"k": pa.array([1, 2, None, 4, 5], pa.int64())})
    semi = make_broadcast_semijoin_fn("k", ref)(batch)
    assert semi.column("k").to_pylist() == [2, 4]
    anti = make_broadcast_semijoin_fn("k", ref, anti=True)(batch)
    assert anti.column("k").to_pylist() == [1, 5]  # null dropped, SQL NOT IN


def test_connected_components_nonconvergence_raises(ray_session):
    """A long path graph with max_rounds too small must raise, not emit
    silently-wrong component labels (CC underlies ~10 dedup pipelines)."""
    from newscrawler_ray.pipelines.graph import connected_components

    n = 200
    edges = rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array(range(n - 1), pa.int64()),
                "id_b": pa.array(range(1, n), pa.int64()),
            }
        )
    )
    # small_edges=0 forces the distributed star rounds (the single-task
    # union-find path has no round cap to exhaust)
    with pytest.raises(RuntimeError, match="fixed point"):
        connected_components(edges, max_rounds=1, small_edges=0)
    # and with enough rounds the same graph converges to one component
    labels = connected_components(edges, max_rounds=30, small_edges=0).to_pandas()
    assert labels["component"].nunique() == 1
