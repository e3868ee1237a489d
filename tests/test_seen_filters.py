"""Seen-filter tiers: bloom and cuckoo membership contracts, cuckoo
deletion (the recrawl/churn path the bloom cannot serve), full-table
rollback, and SeenShard forget/re-add + snapshot/restore for both kinds.
"""

import numpy as np
import ray

from newscrawler_ray.functions.hashing import splitmix64
from newscrawler_ray.state.seen import BloomFilter, CuckooFilter, SeenShard


def _keys(n, seed=1):
    return splitmix64(
        np.arange(seed, n + seed, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    ).view(np.int64)


def test_bloom_and_cuckoo_membership():
    ins, probe = _keys(20_000, 1), _keys(20_000, 10_000_000)
    probe = probe[~np.isin(probe, ins)]
    for f in (BloomFilter(n_bits=1 << 19), CuckooFilter(n_buckets=1 << 13)):
        if isinstance(f, CuckooFilter):
            assert f.add(ins).all()  # <40% load: every insert succeeds
        else:
            f.add(ins)
        assert f.maybe_contains(ins).all()  # no false negatives
        fp_rate = f.maybe_contains(probe).mean()
        assert fp_rate < 0.05, fp_rate
        assert f.maybe_contains(np.empty(0, np.int64)).shape == (0,)


def test_cuckoo_delete_and_readd():
    keys = _keys(5_000)
    f = CuckooFilter(n_buckets=1 << 12)
    assert f.add(keys).all()
    gone, kept = keys[:1000], keys[1000:]
    assert f.delete(gone).all()
    assert f.maybe_contains(kept).all()  # unrelated keys untouched
    # deleted keys are (almost all) absent — only fingerprint collisions
    # with surviving keys may still read as maybe-present
    assert f.maybe_contains(gone).mean() < 0.05
    assert f.add(gone).all()  # freed slots are reusable
    assert f.maybe_contains(keys).all()


def test_cuckoo_full_table_rollback_keeps_no_false_negatives():
    # 64 buckets x 4 slots = 256 capacity; offering 400 keys MUST fail
    # some inserts, and every key whose insert SUCCEEDED stays visible
    # (a failed insert's eviction chain is rolled back, never dropping
    # another key's fingerprint)
    keys = _keys(400)
    f = CuckooFilter(n_buckets=64)
    ok = f.add(keys)
    assert not ok.all() and ok.sum() > 200
    assert f.maybe_contains(keys[ok]).all()
    assert f.n_items == int(ok.sum())


def test_seen_shard_forget_and_snapshot_both_kinds(ray_session):
    urls = [f"http://h{i % 7}.example.com/p/{i}" for i in range(300)]
    hashes = _keys(300)
    for kind in ("bloom", "cuckoo"):
        shard = SeenShard.remote(0, n_bits=1 << 16, filter_kind=kind)
        novel = ray.get(shard.add_filter.remote(urls, hashes))
        assert novel.all()
        dup = ray.get(shard.add_filter.remote(urls[:50], hashes[:50]))
        assert not dup.any()
        # forget 50, re-add -> novel again (recrawl semantics)
        n = ray.get(shard.forget.remote(urls[:50], hashes[:50]))
        assert n == 50
        assert ray.get(shard.forget.remote(urls[:50], hashes[:50])) == 0
        re = ray.get(shard.add_filter.remote(urls[:50], hashes[:50]))
        assert re.all()
        # snapshot -> fresh shard -> restore: same decisions
        snap = ray.get(shard.snapshot.remote())
        clone = SeenShard.remote(99, filter_kind="bloom")  # kind from snap
        ray.get(clone.restore.remote(snap))
        again = ray.get(clone.add_filter.remote(urls, hashes))
        assert not again.any()
        assert ray.get(clone.contents.remote()) == sorted(set(urls))
