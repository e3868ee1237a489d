"""Mergeable sketches (approximate aggregates for the 100 TB path).

A bare ``groupby``/``unique`` for distinct-count shuffles every row; the
scale pattern is: build one small mergeable sketch per batch inside
``map_batches``, then merge the handful of sketches in a tiny final stage
(sketches are designed to be order-insensitive merges).

HyperLogLog (Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm", AofA 2007), with the
small-range linear-counting correction. Pure numpy; registers are a
2^p-byte array, so a sketch per batch costs ~4 KB at p=12
(±1.04/sqrt(2^p) ≈ 1.6% standard error).

TDigest (Dunning & Ertl 2019) — mergeable quantile sketch; the
shuffle-free counterpart of the exact sort-based quantile operator
(pipelines/queries.py value_quantiles vs approx_quantiles).
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

_U64 = np.uint64


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Vectorized add of pre-hashed 64-bit keys."""
        h = splitmix64(hashes.view(_U64).astype(_U64))
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        rest = (h << _U64(self.p)) | (_U64(1) << _U64(self.p - 1))  # sentinel
        # rank = leading zeros of the remaining bits + 1, capped
        # leading zeros via bit twiddling: find highest set bit position
        lz = np.zeros(len(h), dtype=np.uint8)
        x = rest.copy()
        hi = np.uint64(1) << np.uint64(63)
        mask = np.ones(len(h), dtype=bool)
        for r in range(64 - self.p + 1):
            top = (x & hi) != 0
            newly = mask & top
            lz[newly] = r
            mask &= ~top
            x = x << _U64(1)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add_ints(self, values: np.ndarray) -> None:
        self.add_hashes(values.astype(np.int64).view(_U64))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting, small range
        return raw

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        out = cls(data[0])
        out.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return out


class TDigest:
    """Merging t-digest (Dunning & Ertl, "Computing extremely accurate
    quantiles using t-digests", arXiv:1902.04023) — the mergeable
    alternative to the exact sort-based quantile path: a global sort is a
    full shuffle, while one ~``2*delta``-centroid digest per batch plus a
    tiny merge gives rank error O(q(1-q)/delta) with a few KB per sketch.

    Vectorized merge-compression: all (mean, weight) pairs are sorted and
    greedily folded under the k1 scale-function size bound. Buffered adds
    amortize compression; merge() concatenates + recompresses, so merges
    are associative up to compression (accuracy, not identity, is the
    contract — asserted vs the exact path in tests).
    """

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []

    # -- build ---------------------------------------------------------------

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            self._buf.append(v)
        if sum(len(b) for b in self._buf) >= 16 * self.delta:
            self._compress()

    def _compress(self) -> None:
        if self._buf:
            bm = np.concatenate(self._buf)
            self._buf = []
            means = np.concatenate([self.means, bm])
            weights = np.concatenate([self.weights, np.ones(len(bm))])
        else:
            means, weights = self.means, self.weights
        if len(means) == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        # k1 scale: centroid may absorb while k(q_right) - k(q_left) <= 1
        k_of = lambda q: self.delta / (2 * np.pi) * np.arcsin(2 * q - 1)  # noqa: E731
        out_m, out_w = [], []
        cur_m, cur_w, q_left = means[0], weights[0], 0.0
        for m, w in zip(means[1:], weights[1:]):
            q_right = q_left + (cur_w + w) / total
            if k_of(q_right) - k_of(q_left) <= 1.0:
                cur_m += (m - cur_m) * (w / (cur_w + w))
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q_left += cur_w / total
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    # -- query / merge -------------------------------------------------------

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(max(self.delta, other.delta))
        self._compress()
        other._compress()
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out._compress()
        return out

    def quantile(self, q: float) -> float:
        self._compress()
        n = len(self.means)
        if n == 0:
            return float("nan")
        if n == 1:
            return float(self.means[0])
        total = self.weights.sum()
        # centroid "centers" in cumulative-weight space
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * total
        return float(np.interp(target, cum, self.means))

    def serialize(self) -> bytes:
        self._compress()
        import struct

        return (
            struct.pack("<ii", self.delta, len(self.means))
            + self.means.tobytes()
            + self.weights.tobytes()
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "TDigest":
        import struct

        delta, n = struct.unpack_from("<ii", data)
        out = cls(delta)
        base = 8
        out.means = np.frombuffer(data, dtype=np.float64, count=n, offset=base).copy()
        out.weights = np.frombuffer(
            data, dtype=np.float64, count=n, offset=base + 8 * n
        ).copy()
        return out


class MisraGries:
    """Mergeable heavy-hitters (frequent-items) summary.

    Misra/Gries, "Finding repeated elements", Sci. Comput. Program. 1982;
    the counter-summing merge with (k+1)-th-largest decrement follows
    Agarwal et al., "Mergeable summaries", PODS 2012. Holds at most ``k``
    (key, counter) pairs; every item with true frequency > n/(k+1) is
    guaranteed present, and each counter underestimates its key's true
    count by at most n/(k+1). A ~k*16-byte summary per batch replaces a
    full shuffle of raw keys.
    """

    def __init__(self, k: int = 64):
        self.k = k
        self.counters: dict[int, int] = {}

    def add_ints(self, xs) -> None:
        import numpy as np

        keys, counts = np.unique(np.asarray(xs, dtype=np.int64), return_counts=True)
        for key, c in zip(keys.tolist(), counts.tolist()):
            self.counters[key] = self.counters.get(key, 0) + c
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counters) <= self.k:
            return
        import numpy as np

        vals = np.fromiter(self.counters.values(), dtype=np.int64)
        # decrement everything by the (k+1)-th largest and drop <= 0
        thresh = int(np.partition(vals, -(self.k + 1))[-(self.k + 1)])
        self.counters = {
            key: c - thresh for key, c in self.counters.items() if c > thresh
        }

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(self.k)
        out.counters = dict(self.counters)
        for key, c in other.counters.items():
            out.counters[key] = out.counters.get(key, 0) + c
        out._shrink()
        return out

    def top(self, n: int) -> list[tuple[int, int]]:
        """(key, estimated count) sorted by count desc, key asc."""
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))[:n]

    def serialize(self) -> bytes:
        import numpy as np

        keys = np.fromiter(self.counters.keys(), dtype=np.int64)
        vals = np.fromiter(self.counters.values(), dtype=np.int64)
        return (
            np.int64(self.k).tobytes() + keys.tobytes() + vals.tobytes()
        )

    @classmethod
    def deserialize(cls, blob: bytes) -> "MisraGries":
        import numpy as np

        arr = np.frombuffer(blob, dtype=np.int64)
        k = int(arr[0])
        rest = arr[1:]
        n = len(rest) // 2
        out = cls(k)
        out.counters = dict(zip(rest[:n].tolist(), rest[n : 2 * n].tolist()))
        return out
