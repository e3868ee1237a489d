import numpy as np
import pytest

from newscrawler_ray.functions.sketches import HyperLogLog


def test_hll_accuracy_various_cardinalities():
    for n in [50, 1000, 50_000]:
        h = HyperLogLog(12)
        h.add_ints(np.arange(n, dtype=np.int64))
        est = h.estimate()
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_duplicates_dont_inflate():
    h = HyperLogLog(12)
    vals = np.arange(500, dtype=np.int64)
    for _ in range(10):
        h.add_ints(vals)
    assert abs(h.estimate() - 500) / 500 < 0.05


def test_hll_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add_ints(np.arange(0, 3000, dtype=np.int64))
    b.add_ints(np.arange(1500, 5000, dtype=np.int64))  # overlap 1500-3000
    merged = a.merge(b)
    assert abs(merged.estimate() - 5000) / 5000 < 0.05
    # merge is symmetric
    np.testing.assert_array_equal(merged.registers, b.merge(a).registers)


def test_hll_serialize_roundtrip():
    h = HyperLogLog(12)
    h.add_ints(np.arange(777, dtype=np.int64))
    h2 = HyperLogLog.deserialize(h.serialize())
    assert h2.estimate() == h.estimate()


def test_approx_distinct_users_vs_exact(ray_session):
    import duckdb

    from newscrawler_ray.pipelines.queries import approx_distinct_users

    sf = "/root/testdata/sf0.01"
    est = approx_distinct_users(sf)["approx_distinct_users"][0].as_py()
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05, (est, exact)


# ------------------------------------------------------------------ t-digest


def test_tdigest_rank_accuracy():
    from newscrawler_ray.functions.sketches import TDigest

    rng = np.random.default_rng(3)
    data = np.concatenate([rng.lognormal(0, 1, 40_000), rng.normal(50, 5, 10_000)])
    d = TDigest(200)
    for lo in range(0, len(data), 4096):
        d.add(data[lo : lo + 4096])
    srt = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = d.quantile(q)
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) < 0.01, (q, est, rank)


def test_tdigest_merge_matches_single():
    from newscrawler_ray.functions.sketches import TDigest

    rng = np.random.default_rng(4)
    data = rng.exponential(2.0, 30_000)
    parts = np.array_split(data, 7)
    merged = None
    for p in parts:
        d = TDigest(200)
        d.add(p)
        blob = d.serialize()  # exercise the wire format
        d2 = TDigest.deserialize(blob)
        merged = d2 if merged is None else merged.merge(d2)
    srt = np.sort(data)
    for q in (0.1, 0.5, 0.9, 0.99):
        rank = np.searchsorted(srt, merged.quantile(q)) / len(srt)
        assert abs(rank - q) < 0.015, (q, rank)


def test_tdigest_empty_and_single():
    from newscrawler_ray.functions.sketches import TDigest

    d = TDigest()
    assert np.isnan(d.quantile(0.5))
    d.add(np.array([7.0]))
    assert d.quantile(0.5) == 7.0


def test_approx_quantiles_close_to_exact(ray_session):
    from newscrawler_ray.pipelines.queries import approx_quantiles, value_quantiles

    sf = "/root/testdata/sf0.01"
    exact = {r["q"]: r["value"] for r in value_quantiles(sf).to_pylist()}
    approx = {r["q"]: r["value"] for r in approx_quantiles(sf).to_pylist()}
    import pyarrow.parquet as pq

    vals = np.sort(
        pq.read_table(f"{sf}/events.parquet", columns=["value"])["value"].to_numpy()
    )
    for q in exact:
        rank = np.searchsorted(vals, approx[q]) / len(vals)
        assert abs(rank - q) < 0.015, (q, exact[q], approx[q], rank)
