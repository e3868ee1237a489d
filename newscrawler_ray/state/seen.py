"""Partitioned URL-seen filter: bloom accelerator + exact authority.

Rebuild of the reference's two-tier exact dedup (SURVEY.md T6/D2/D3:
in-crawl ``seen_urls`` set ``google_news_crawler.py:269,307-309`` + durable
unique index ``database.py:28``) as a hash-partitioned actor set.

Each shard owns the key range ``url_hash64(url) -> shard_of_hash(h, n)``;
a URL is checked/added on exactly ONE shard, so check-and-add is atomic
without cross-shard coordination. The bloom filter is the scale-path fast
reject (at 10^10 URLs the exact set is the spill/disk tier and the bloom
keeps the hot path in memory); per SURVEY §7.5 the EXACT set remains the
authority so the final seen-set has zero false positives — a bloom alone
would drop URLs and break seen-set equality with the oracle.

State is snapshot/restorable for per-partition checkpointing with lineage
(wave id), per BASELINE.json north_rule.
"""

from __future__ import annotations

import numpy as np
import ray

from ..functions.hashing import splitmix64 as _splitmix64

_MASK63 = (1 << 63) - 1


def shard_of_hash(h: int | np.ndarray, n_shards: int):
    """Map signed 64-bit url hash -> owning seen shard."""
    return (h & _MASK63) % n_shards




class BloomFilter:
    """Plain numpy bloom filter over 64-bit key hashes (k derived probes)."""

    def __init__(self, n_bits: int = 1 << 23, k: int = 4):
        assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits >> 3, dtype=np.uint8)

    def _indices(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes.view(np.uint64)
        h2 = _splitmix64(h1)
        ks = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + ks * h2[None, :]) & np.uint64(self.n_bits - 1)).astype(
            np.int64
        )

    def maybe_contains(self, hashes: np.ndarray) -> np.ndarray:
        idx = self._indices(hashes)
        present = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return present.all(axis=0).astype(bool)

    def add(self, hashes: np.ndarray) -> None:
        idx = self._indices(hashes).reshape(-1)
        np.bitwise_or.at(self.bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))


@ray.remote
class SeenShard:
    """One partition of the URL-seen filter (check-and-add is atomic here)."""

    def __init__(self, shard_id: int, n_bits: int = 1 << 23):
        self.shard_id = shard_id
        self.bloom = BloomFilter(n_bits=n_bits)
        self.exact: set[str] = set()
        self.added = 0
        self.dup_hits = 0

    def add_filter(self, urls: list[str], hashes: np.ndarray) -> np.ndarray:
        """Return a bool mask: True where the URL was NOT seen before.

        Bloom fast-path: keys the bloom says are absent are definitely
        novel; 'maybe present' keys are resolved against the exact set.
        """
        hashes = np.asarray(hashes, dtype=np.int64)
        maybe = self.bloom.maybe_contains(hashes)
        novel = np.empty(len(urls), dtype=bool)
        batch_new: set[str] = set()  # duplicates WITHIN one call dedup too
        for i, u in enumerate(urls):
            if (maybe[i] and u in self.exact) or u in batch_new:
                novel[i] = False
            else:
                novel[i] = True
                batch_new.add(u)
        new_idx = np.nonzero(novel)[0]
        if len(new_idx):
            self.exact.update(batch_new)
            self.bloom.add(hashes[new_idx])
        self.added += int(len(new_idx))
        self.dup_hits += int(len(urls) - len(new_idx))
        return novel

    def contents(self) -> list[str]:
        return sorted(self.exact)

    def counters(self) -> dict:
        return {"added": self.added, "dup_hits": self.dup_hits}

    def snapshot(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "exact": list(self.exact),
            "bloom_bits": self.bloom.bits.tobytes(),
            "n_bits": self.bloom.n_bits,
            "added": self.added,
            "dup_hits": self.dup_hits,
        }

    def restore(self, snap: dict) -> None:
        self.shard_id = snap["shard_id"]
        self.exact = set(snap["exact"])
        self.bloom = BloomFilter(n_bits=snap["n_bits"])
        self.bloom.bits = np.frombuffer(snap["bloom_bits"], dtype=np.uint8).copy()
        self.added = snap["added"]
        self.dup_hits = snap["dup_hits"]
