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
