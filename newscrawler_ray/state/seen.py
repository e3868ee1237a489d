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


class CuckooFilter:
    """Cuckoo filter over 64-bit key hashes (Fan/Andersen/Kaminsky/
    Mitzenmacher, "Cuckoo filter: practically better than Bloom",
    CoNEXT 2014): 4-slot buckets of 16-bit fingerprints with partial-key
    cuckoo hashing (alternate bucket = bucket XOR hash(fingerprint)).

    Why it exists next to :class:`BloomFilter`: DELETION. A bloom's bits
    can never be cleared, so under recrawl churn (pages purged and
    re-fetched) the stale bits accumulate and every re-added URL takes
    the slow exact-set path forever. The cuckoo filter removes one
    fingerprint copy per delete, so the fast-reject tier stays accurate
    across add/forget/re-add cycles — the property the north-rule
    "bloom/cuckoo URL-seen" names. Same no-false-negative contract as
    the bloom (as long as inserts succeed; at >95% load an insert may
    fail after max kicks, reported by ``add``'s return so the caller
    can fall back to exact-only for that key).
    """

    _FP_SEED = np.uint64(0x9E3779B97F4A7C15)

    def __init__(self, n_buckets: int = 1 << 18, bucket_size: int = 4):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        # 0 = empty slot; fingerprints are forced into [1, 0xFFFF]
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        self.n_items = 0

    def _fp_and_buckets(
        self, hashes: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        h = np.asarray(hashes).view(np.uint64)
        fp = (_splitmix64(h * self._FP_SEED) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        mask = np.uint64(self.n_buckets - 1)
        i1 = (h & mask).astype(np.int64)
        alt = _splitmix64(fp.astype(np.uint64)) & mask
        i2 = (i1.view(np.uint64) ^ alt).astype(np.int64)
        return fp, i1, i2

    def maybe_contains(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._fp_and_buckets(hashes)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def add(self, hashes: np.ndarray, max_kicks: int = 500) -> np.ndarray:
        """Insert every key; returns a bool mask of keys that made it
        into the table (False = table too full after max_kicks — the
        caller keeps exact-set authority for those). Idempotence is the
        CALLER's job (a seen shard only inserts novel keys), matching
        bloom semantics where double-add is harmless but here would
        consume a second slot.

        Vectorized fast path: one pass per candidate bucket places every
        key whose target bucket is unique WITHIN the pass (same-bucket
        batch collisions defer — rare: birthday bound over 4M buckets)
        and has an empty slot, via a first-empty argmax gather/scatter.
        Only batch-conflicting keys and keys needing eviction chains
        drop to the per-key Python loop (round-3 measurement: the old
        all-Python loop capped a shard at ~0.2M keys/s)."""
        fp, i1, i2 = self._fp_and_buckets(hashes)
        rng_state = np.uint64(0x2545F4914F6CDD1D)
        ok = np.ones(len(fp), dtype=bool)
        mask = np.uint64(self.n_buckets - 1)
        done = np.zeros(len(fp), dtype=bool)
        for target in (i1, i2):
            pend = np.nonzero(~done)[0]
            if len(pend) == 0:
                break
            t = target[pend]
            _, first_idx, counts = np.unique(
                t, return_index=True, return_counts=True
            )
            cand = pend[first_idx[counts == 1]]
            is_empty = self.table[target[cand]] == 0
            has_empty = is_empty.any(axis=1)
            cand = cand[has_empty]
            slot = is_empty[has_empty].argmax(axis=1)
            self.table[target[cand], slot] = fp[cand]
            done[cand] = True
            self.n_items += int(len(cand))
        # scalar uint64 ops below wrap intentionally (splitmix mixing);
        # numpy warns on SCALAR overflow only — suppress for the loop
        with np.errstate(over="ignore"):
            for j in np.nonzero(~done)[0]:
                f = fp[j]
                placed = False
                for b in (i1[j], i2[j]):
                    row = self.table[b]
                    empty = np.nonzero(row == 0)[0]
                    if len(empty):
                        row[empty[0]] = f
                        placed = True
                        break
                if placed:
                    self.n_items += 1
                    continue
                b = int(i1[j])
                chain: list[tuple[int, int]] = []  # (bucket, slot) swaps made
                for kick in range(max_kicks):
                    # deterministic slot choice (no global RNG: repo rule)
                    rng_state = _splitmix64(rng_state + np.uint64(kick + 1))
                    slot = int(rng_state & np.uint64(self.bucket_size - 1))
                    f, self.table[b, slot] = self.table[b, slot], f
                    chain.append((b, slot))
                    alt = _splitmix64(np.uint64(f)) & mask
                    b = int(np.uint64(b) ^ alt)
                    row = self.table[b]
                    empty = np.nonzero(row == 0)[0]
                    if len(empty):
                        row[empty[0]] = f
                        placed = True
                        break
                if placed:
                    self.n_items += 1
                else:
                    # table full: UNDO the eviction chain so no other key's
                    # fingerprint is lost (no-false-negative contract), then
                    # report failure for THIS key only
                    for cb, cs in reversed(chain):
                        f, self.table[cb, cs] = self.table[cb, cs], f
                    ok[j] = False
        return ok

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Remove ONE fingerprint copy per key; True where found."""
        fp, i1, i2 = self._fp_and_buckets(hashes)
        out = np.zeros(len(fp), dtype=bool)
        for j in range(len(fp)):
            for b in (i1[j], i2[j]):
                row = self.table[b]
                hit = np.nonzero(row == fp[j])[0]
                if len(hit):
                    row[hit[0]] = 0
                    self.n_items -= 1
                    out[j] = True
                    break
        return out


@ray.remote
class SeenShard:
    """One partition of the URL-seen filter (check-and-add is atomic
    here). ``filter_kind`` picks the fast-reject tier: "bloom"
    (default — cheapest per key, no deletion) or "cuckoo" (supports
    ``forget`` without leaving stale maybe-bits). The exact set stays
    the authority either way."""

    def __init__(self, shard_id: int, n_bits: int = 1 << 23,
                 filter_kind: str = "bloom"):
        self.shard_id = shard_id
        self.filter_kind = filter_kind
        if filter_kind == "cuckoo":
            # match the bloom's key capacity: n_bits/8 slots of 2 bytes
            self.bloom = CuckooFilter(n_buckets=max(1 << 10, n_bits >> 5))
        else:
            self.bloom = BloomFilter(n_bits=n_bits)
        self.exact: set[str] = set()
        self.added = 0
        self.dup_hits = 0

    def add_filter(self, urls: list[str], hashes: np.ndarray) -> np.ndarray:
        """Return a bool mask: True where the URL was NOT seen before.

        Bloom fast-path: keys the bloom says are absent are definitely
        novel; 'maybe present' keys are resolved against the exact set.
        (Measured: this plain loop beats an Arrow dictionary_encode
        rewrite ~2x — ``maybe[i] and`` already short-circuits the string
        lookup on the novel path, and Python set probes are cheaper than
        the Arrow round-trip at wave batch sizes.)
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

    def forget(self, urls: list[str], hashes: np.ndarray) -> int:
        """Remove URLs from the seen state (recrawl/purge path); returns
        how many were actually present. With the cuckoo tier the
        fingerprint is deleted too, so a later re-add takes the fast
        path again; with bloom the stale bit stays set (documented:
        correctness is preserved by the exact authority, only the
        fast-reject rate decays under churn)."""
        hashes = np.asarray(hashes, dtype=np.int64)
        present = np.array([u in self.exact for u in urls], dtype=bool)
        for u in np.asarray(urls, dtype=object)[present]:
            self.exact.discard(u)
        if self.filter_kind == "cuckoo" and present.any():
            self.bloom.delete(hashes[present])
        return int(present.sum())

    def contents(self) -> list[str]:
        return sorted(self.exact)

    def counters(self) -> dict:
        return {"added": self.added, "dup_hits": self.dup_hits}

    def snapshot(self) -> dict:
        snap = {
            "shard_id": self.shard_id,
            "exact": list(self.exact),
            "filter_kind": self.filter_kind,
            "added": self.added,
            "dup_hits": self.dup_hits,
        }
        if self.filter_kind == "cuckoo":
            snap["cuckoo_table"] = self.bloom.table.tobytes()
            snap["n_buckets"] = self.bloom.n_buckets
            snap["bucket_size"] = self.bloom.bucket_size
            snap["n_items"] = self.bloom.n_items
        else:
            snap["bloom_bits"] = self.bloom.bits.tobytes()
            snap["n_bits"] = self.bloom.n_bits
        return snap

    def restore(self, snap: dict) -> None:
        self.shard_id = snap["shard_id"]
        self.exact = set(snap["exact"])
        self.filter_kind = snap.get("filter_kind", "bloom")
        if self.filter_kind == "cuckoo":
            f = CuckooFilter(
                n_buckets=snap["n_buckets"], bucket_size=snap["bucket_size"]
            )
            f.table = (
                np.frombuffer(snap["cuckoo_table"], dtype=np.uint16)
                .reshape(snap["n_buckets"], snap["bucket_size"])
                .copy()
            )
            f.n_items = snap["n_items"]
            self.bloom = f
        else:
            self.bloom = BloomFilter(n_bits=snap["n_bits"])
            self.bloom.bits = np.frombuffer(
                snap["bloom_bits"], dtype=np.uint8
            ).copy()
        self.added = snap["added"]
        self.dup_hits = snap["dup_hits"]
