"""Retry/backoff/penalty semantics (reference T2/T3, on the virtual
clock): unit contracts of the shared plan functions, scalar/vector
parity, and e2e non-vacuity + per-row attempt parity vs the oracle."""

import numpy as np
import pytest

from newscrawler_ray.functions.retry import (
    RETRY_TOTAL,
    backoff_ms,
    penalty_ms,
    penalty_ms_batch,
    retry_plan,
    retry_plan_batch,
)
from newscrawler_ray.oracle import run_oracle
from newscrawler_ray.pipelines.crawl import crawl_output_dataset, run_crawl
from newscrawler_ray.synth import gen_fixtures


def test_retry_plan_contract():
    assert retry_plan(0, 503, 200) == (200, 1, 0)
    assert retry_plan(1, 503, 200) == (200, 2, 1000)
    assert retry_plan(2, 429, 200) == (200, 3, 3000)
    assert retry_plan(3, 500, 200) == (200, 4, 7000)
    # budget exhausted: the transient status becomes final
    assert retry_plan(4, 502, 200) == (502, 4, 7000)
    assert retry_plan(9, 429, 403) == (429, 4, 7000)
    # transients precede ANY base outcome, including errors
    assert retry_plan(2, 503, 403) == (403, 3, 3000)


def test_backoff_schedule_exponential():
    assert [backoff_ms(k) for k in range(4)] == [0, 1000, 3000, 7000]
    assert backoff_ms(RETRY_TOTAL) == 7000


def test_penalty_windows_and_determinism():
    for h in (0, 123456789, -987654321):
        p403 = penalty_ms(h, 403)
        p429 = penalty_ms(h, 429)
        assert 5_000 <= p403 < 10_000
        assert 10_000 <= p429 < 20_000
        assert penalty_ms(h, 403) == p403  # deterministic
    assert penalty_ms(42, 200) == 0
    assert penalty_ms(42, 503) == 0


def test_vector_matches_scalar():
    rng = np.random.default_rng(5)
    nt = rng.integers(0, 7, 200).astype(np.int32)
    ts = np.full(200, 503, dtype=np.int32)
    base = np.where(rng.random(200) < 0.8, 200, 403).astype(np.int32)
    f, a, b = retry_plan_batch(nt, ts, base)
    hashes = rng.integers(-(2**62), 2**62, 200)
    p = penalty_ms_batch(hashes, f)
    for i in range(200):
        sf, sa, sb = retry_plan(int(nt[i]), int(ts[i]), int(base[i]))
        assert (f[i], a[i], b[i]) == (sf, sa, sb)
        assert p[i] == penalty_ms(int(hashes[i]), sf)


@pytest.fixture(scope="module")
def retry_run(ray_session, tmp_path_factory):
    fx = gen_fixtures(tmp_path_factory.mktemp("rfx") / "n1500", n_urls=1500, seed=42)
    out = tmp_path_factory.mktemp("rcrawl") / "out"
    res = run_crawl(fx, out, n_seen_shards=2, n_frontier_shards=2, checkpoint=False)
    return res, out, run_oracle(fx)


def test_e2e_retry_rows_exist_and_match_oracle(retry_run):
    """Non-vacuity + parity: the fixture plants recovered and exhausted
    retries; every row's (status, n_attempts, error) matches the oracle."""
    res, out, oracle = retry_run
    rows = crawl_output_dataset(out).take_all()
    by_url = {r["url"]: r for r in rows}
    assert len(by_url) == len(oracle.records)
    recovered = exhausted = 0
    for url, rec in oracle.records.items():
        got = by_url[url]
        assert got["status"] == rec["status"], url
        assert got["n_attempts"] == rec["n_attempts"], url
        assert got["extraction_error"] == rec["extraction_error"], url
        if rec["n_attempts"] > 1 and rec["status"] == 200:
            recovered += 1
        if rec["n_attempts"] == RETRY_TOTAL + 1 and rec["status"] in (
            429, 500, 502, 503, 504,
        ):
            exhausted += 1
    assert recovered > 0 and exhausted > 0


def test_e2e_makespan_includes_backoff_and_penalties(retry_run):
    res, _, oracle = retry_run
    assert res["makespan_ms"] == oracle.makespan_ms
    assert oracle.metrics["retries"] > 0
    assert oracle.metrics["penalties"] > 0
    # makespan strictly exceeds the pure politeness-interval bound for at
    # least one host (i.e. the extra virtual ms actually landed)
    assert any(
        ms > 0 for ms in oracle.host_clock_ms.values()
    )
