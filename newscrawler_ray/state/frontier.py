"""Sharded URL frontier with per-host priority heaps + politeness budgets.

Rebuild of the reference's implicit frontier (SURVEY.md §1.1: the in-flight
href list per page) and its global per-domain rate limiter (T1,
``utils/article_extractor.py:77-108``: 2.0 s min interval per domain) as a
distributed-correct design: hosts are hash-partitioned across shards, so
each host's priority heap AND its politeness token bucket live in exactly
one actor — no double-spending a host's budget from two workers.

Politeness runs on a VIRTUAL clock (identical accounting to the oracle):
``pop_wave(window_ms)`` releases at most ``window_ms / min_interval_ms``
URLs per host and advances that host's virtual timeline; nothing sleeps, so
simulated crawls are CPU-bound while budget comparisons vs the reference
remain exact. Against a live web the same pop budget becomes the real
pacing contract for the fetch pool.

Within a host, release order is ``(priority DESC, url ASC)`` — recency
first, same deterministic tiebreak as the final output sort (SURVEY O1).

Skew note (north_rule): a hot host cannot flood a wave — the per-host
budget caps it — and popped rows are ``repartition``-ed before the fetch
stage, so fetch parallelism is independent of host skew. Salting a hot
host across shards is unnecessary under per-host politeness (its budget,
not its shard placement, is the binding constraint); shard placement only
balances heap MEMORY, which the hash partition already does.
"""

from __future__ import annotations

import heapq
import zlib

import pyarrow as pa
import ray


def shard_of_host(host: str, n_shards: int) -> int:
    return zlib.crc32(host.encode("utf-8")) % n_shards


FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.int64()),  # stable 64-bit canonical-URL hash
        ("priority", pa.int64()),  # epoch microseconds
        ("depth", pa.int32()),
    ]
)


@ray.remote
class FrontierShard:
    def __init__(
        self,
        shard_id: int,
        host_intervals: dict[str, int] | None = None,
        default_interval_ms: int = 2000,
    ):
        self.shard_id = shard_id
        self.host_intervals = host_intervals or {}
        self.default_interval_ms = default_interval_ms
        self.heaps: dict[str, list] = {}  # host -> [(-priority, url, depth)]
        self.host_clock_ms: dict[str, int] = {}
        self.pending = 0
        self.pushed = 0
        self.popped = 0

    def _interval(self, host: str) -> int:
        return self.host_intervals.get(host, self.default_interval_ms)

    def push(
        self,
        urls: list[str],
        hosts: list[str],
        priorities: list[int],
        depths: list[int],
        hashes: list[int],
    ) -> int:
        for u, h, p, d, uh in zip(urls, hosts, priorities, depths, hashes):
            heapq.heappush(self.heaps.setdefault(h, []), (-int(p), u, int(d), int(uh)))
        self.pending += len(urls)
        self.pushed += len(urls)
        return len(urls)

    def pop_wave(self, window_ms: int = 60_000) -> pa.Table | None:
        """Release <= window/interval URLs per host; advance virtual clocks."""
        urls, hosts, prios, depths, hashes = [], [], [], [], []
        empty_hosts = []
        for host, heap in self.heaps.items():
            interval = self._interval(host)
            budget = max(1, window_ms // interval)
            n = min(budget, len(heap))
            for _ in range(n):
                negp, u, d, uh = heapq.heappop(heap)
                urls.append(u)
                hosts.append(host)
                prios.append(-negp)
                depths.append(d)
                hashes.append(uh)
            self.host_clock_ms[host] = self.host_clock_ms.get(host, 0) + n * interval
            if not heap:
                empty_hosts.append(host)
        for h in empty_hosts:
            del self.heaps[h]
        self.pending -= len(urls)
        self.popped += len(urls)
        if not urls:
            return None
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "url_hash": pa.array(hashes, pa.int64()),
                "priority": pa.array(prios, pa.int64()),
                "depth": pa.array(depths, pa.int32()),
            },
            schema=FRONTIER_SCHEMA,
        )

    def add_clock(self, hosts: list[str], ms: list[int]) -> None:
        """Credit extra virtual ms (retry backoff / 403-429 penalties) to
        host clocks — additive, so batch composition cannot change the
        final makespan (identical accounting to the oracle)."""
        for h, m in zip(hosts, ms):
            self.host_clock_ms[h] = self.host_clock_ms.get(h, 0) + int(m)

    def size(self) -> int:
        return self.pending

    def counters(self) -> dict:
        return {
            "pending": self.pending,
            "pushed": self.pushed,
            "popped": self.popped,
            "makespan_ms": max(self.host_clock_ms.values(), default=0),
        }

    def host_clocks(self) -> dict[str, int]:
        return dict(self.host_clock_ms)

    def snapshot(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "heaps": {h: list(v) for h, v in self.heaps.items()},
            "host_clock_ms": dict(self.host_clock_ms),
            "pending": self.pending,
            "pushed": self.pushed,
            "popped": self.popped,
        }

    def restore(self, snap: dict) -> None:
        self.shard_id = snap["shard_id"]
        self.heaps = {h: list(map(tuple, v)) for h, v in snap["heaps"].items()}
        for v in self.heaps.values():
            heapq.heapify(v)
        self.host_clock_ms = dict(snap["host_clock_ms"])
        self.pending = snap["pending"]
        self.pushed = snap["pushed"]
        self.popped = snap["popped"]
