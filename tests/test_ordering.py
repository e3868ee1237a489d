"""global_rank / shuffled_training_order / curriculum_training_order:
exact-permutation parity with a driver-side numpy oracle, skewed-key
balance, partition-count regression, empty input."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from newscrawler_ray.pipelines.ordering import (
    curriculum_training_order,
    global_prefix_cutoff,
    global_rank,
    sample_token_budget,
    shuffle_key,
    shuffled_training_order,
)

SF_DIR = "/root/testdata/sf0.001"


def _expected(seed: int) -> dict[int, int]:
    ids = pq.read_table(
        SF_DIR + "/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_numpy()
    sk = shuffle_key(ids, seed)
    order = np.lexsort((ids, sk))
    return {int(ids[order[i]]): i for i in range(len(ids))}


def test_shuffled_order_is_exact_permutation(ray_session):
    exp = _expected(17)
    got = {r["doc_id"]: r["pos"] for r in shuffled_training_order(SF_DIR).take_all()}
    assert got == exp


def test_shuffled_order_many_buckets(ray_session):
    # bucket-count-dependent regressions (the round-2 jaccard lesson):
    # far more buckets than rows per bucket, including empty buckets
    exp = _expected(17)
    out = shuffled_training_order(SF_DIR, n_buckets=256).take_all()
    assert {r["doc_id"]: r["pos"] for r in out} == exp


def test_seed_changes_order(ray_session):
    a = _expected(17)
    b = {
        r["doc_id"]: r["pos"]
        for r in shuffled_training_order(SF_DIR, seed=18).take_all()
    }
    assert set(a) == set(b) and a != b
    assert sorted(b.values()) == list(range(len(b)))


def test_global_rank_passthrough_and_empty(ray_session):
    t = pa.table(
        {
            "k": pa.array([5, 1, 3, 1], pa.int64()),
            "tb": pa.array([0, 1, 0, 0], pa.int64()),
            "payload": pa.array(["a", "b", "c", "d"]),
        }
    )
    out = global_rank(
        rd.from_arrow(t), "k", "tb", key_max=8, n_buckets=4
    ).take_all()
    by_pos = sorted(out, key=lambda r: r["pos"])
    assert [r["payload"] for r in by_pos] == ["d", "b", "c", "a"]
    assert [r["pos"] for r in by_pos] == [0, 1, 2, 3]

    empty = global_rank(
        rd.from_arrow(t.slice(0, 0)), "k", "tb", key_max=8, n_buckets=4
    )
    assert empty.count() == 0
    assert set(empty.schema().names) == {"k", "tb", "payload", "pos"}


def test_global_rank_skewed_keys_exact(ray_session):
    """99% of keys crammed into 0.1% of the key space (the distribution
    uniform bucketing would collapse into one partition): ranks must
    still be the exact lexsort permutation, with ties ordered by the
    tiebreak."""
    rng = np.random.RandomState(7)
    k = np.concatenate(
        [rng.randint(0, 4096, 1980), rng.randint(4096, 2**32, 20)]
    ).astype(np.int64)
    tb = np.arange(len(k), dtype=np.int64)
    out = global_rank(
        rd.from_arrow(pa.table({"k": k, "tb": tb})), "k", "tb", n_buckets=16
    ).take_all()
    got = {r["tb"]: r["pos"] for r in out}
    order = np.lexsort((tb, k))
    assert got == {int(tb[order[i]]): i for i in range(len(k))}


def _cutoff_oracle(k, tb, w, budget):
    """Driver-side numpy oracle: inclusive prefix-sum cut in (k, tb)
    order; returns {tb: cum} for the kept rows."""
    order = np.lexsort((tb, k))
    cum = np.cumsum(w[order])
    keep = cum <= budget
    return {int(tb[order[i]]): int(cum[i]) for i in np.nonzero(keep)[0]}


def test_prefix_cutoff_exact(ray_session):
    rng = np.random.RandomState(11)
    k = rng.randint(0, 2**32, 500).astype(np.int64)
    tb = np.arange(500, dtype=np.int64)
    w = rng.randint(1, 40, 500).astype(np.int64)
    budget = int(w.sum() // 3)
    out = global_prefix_cutoff(
        rd.from_arrow(pa.table({"k": k, "tb": tb, "w": w})),
        "k", "tb", "w", budget, n_buckets=16,
    ).take_all()
    assert {r["tb"]: r["cum"] for r in out} == _cutoff_oracle(k, tb, w, budget)


def test_prefix_cutoff_many_buckets_and_edges(ray_session):
    rng = np.random.RandomState(12)
    k = rng.randint(0, 2**32, 300).astype(np.int64)
    tb = np.arange(300, dtype=np.int64)
    w = rng.randint(0, 25, 300).astype(np.int64)  # zero weights too
    t = pa.table({"k": k, "tb": tb, "w": w})
    # bucket-count regression (round-2 jaccard lesson) + exact boundary:
    # budget equal to an attained prefix sum keeps that row
    order = np.lexsort((tb, k))
    budget = int(np.cumsum(w[order])[137])
    out = global_prefix_cutoff(
        rd.from_arrow(t), "k", "tb", "w", budget, n_buckets=256
    ).take_all()
    assert {r["tb"]: r["cum"] for r in out} == _cutoff_oracle(k, tb, w, budget)
    # budget below the first row's weight -> empty, schema intact
    first_w = int(w[order[np.nonzero(w[order])[0][0]]]) if w.any() else 1
    tiny = global_prefix_cutoff(
        rd.from_arrow(t.filter(pa.array(w > 0))), "k", "tb", "w",
        first_w - 1, n_buckets=8,
    )
    assert tiny.count() == 0
    # budget >= total keeps everything
    full = global_prefix_cutoff(
        rd.from_arrow(t), "k", "tb", "w", int(w.sum()), n_buckets=8
    )
    assert full.count() == len(tb)
    # empty input
    empty = global_prefix_cutoff(
        rd.from_arrow(t.slice(0, 0)), "k", "tb", "w", 100, n_buckets=8
    )
    assert empty.count() == 0
    assert set(empty.schema().names) == {"k", "tb", "w", "cum"}


def test_sample_token_budget_matches_oracle(ray_session):
    docs = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_numpy()
    toks = np.array(
        [len(t.split()) for t in docs.column("text").to_pylist()], np.int64
    )
    exp = _cutoff_oracle(shuffle_key(ids, 17), ids, toks, 2000)
    out = sample_token_budget(SF_DIR, budget=2000).take_all()
    assert {r["doc_id"]: r["cum"] for r in out} == exp
    for r in out:  # emitted columns are self-consistent
        assert r["skey"] == int(shuffle_key(np.array([r["doc_id"]]), 17)[0])


def test_curriculum_shortest_first(ray_session):
    out = sorted(curriculum_training_order(SF_DIR).take_all(), key=lambda r: r["pos"])
    lens = [r["n_chars"] for r in out]
    assert lens == sorted(lens)  # primary order: length ascending
    assert [r["pos"] for r in out] == list(range(len(out)))
    # within an equal-length run, order follows the seeded shuffle key
    for a, b in zip(out, out[1:]):
        if a["n_chars"] == b["n_chars"]:
            assert (a["skey"], a["doc_id"]) < (b["skey"], b["doc_id"])
