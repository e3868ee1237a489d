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


# ------------------------------------------------------------ Misra-Gries


def test_misra_gries_exact_when_under_k():
    from newscrawler_ray.functions.sketches import MisraGries

    m = MisraGries(16)
    m.add_ints([1] * 50 + [2] * 30 + [3] * 5)
    assert dict(m.top(3)) == {1: 50, 2: 30, 3: 5}


def test_misra_gries_error_bound_and_guarantee():
    import numpy as np

    from newscrawler_ray.functions.sketches import MisraGries

    rng = np.random.default_rng(9)
    # zipf-ish stream: a few heavy keys + long uniform tail
    heavy = np.repeat(np.arange(5), 3000)          # 5 keys x 3000
    tail = rng.integers(100, 5000, size=15000)
    stream = np.concatenate([heavy, tail])
    rng.shuffle(stream)
    k = 64
    n = len(stream)
    # split into chunks, sketch each, merge (the distributed shape)
    parts = np.array_split(stream, 13)
    sketches = []
    for p in parts:
        m = MisraGries(k)
        m.add_ints(p)
        sketches.append(MisraGries.deserialize(m.serialize()))
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.merge(s)
    exact = {}
    for x in stream.tolist():
        exact[x] = exact.get(x, 0) + 1
    bound = n / (k + 1)
    # every key with true count > n/(k+1) must be present
    for key, c in exact.items():
        if c > bound:
            assert key in merged.counters, f"heavy key {key} (count {c}) missing"
    # counters never overestimate and underestimate by at most n/(k+1)
    for key, est in merged.counters.items():
        assert est <= exact[key]
        assert exact[key] - est <= bound


def test_frequent_users_sketch_vs_exact(ray_session):
    import pyarrow as pa

    from newscrawler_ray.pipelines.queries import (
        approx_frequent_users,
        frequent_users,
    )

    sf = "/root/testdata/sf0.01"
    exact = {
        r["user_id"]: r["n"] for r in frequent_users(sf, topn=10).take_all()
    }
    approx = approx_frequent_users(sf, topn=10, k=512)
    n_events = 10000
    bound = n_events / 513
    est = dict(
        zip(
            approx.column("user_id").to_pylist(),
            approx.column("est_count").to_pylist(),
        )
    )
    # estimated counts of surfaced keys within the MG bound of truth
    from collections import Counter

    import duckdb

    truth = dict(
        duckdb.sql(
            f"SELECT user_id, count(*) FROM read_parquet('{sf}/events.parquet') GROUP BY user_id"
        ).fetchall()
    )
    for key, e in est.items():
        assert truth[key] - e <= bound
        assert e <= truth[key]


def test_grouped_hll_distinct_bounds(ray_session):
    """Per-group HLL estimates land within the p=12 error envelope of
    the exact per-group distincts."""
    import duckdb

    from newscrawler_ray.pipelines.queries import approx_distinct_users_by_type

    sf = "/root/testdata/sf0.01"
    got = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_users_by_type(sf).take_all()
    }
    want = dict(
        duckdb.sql(
            f"""SELECT event_type, count(DISTINCT user_id)
                FROM read_parquet('{sf}/events.parquet') GROUP BY event_type"""
        ).fetchall()
    )
    assert set(got) == set(want)
    for k, exact in want.items():
        assert abs(got[k] - exact) <= max(3, 0.05 * exact), (k, got[k], exact)
