"""Link routing stage: canonicalize -> filter -> seen check -> frontier push.

The discovery half of the crawl loop (SURVEY.md J4 Full-Coverage expansion
``google_news_crawler.py:274-326`` + D2/D3 dedup + J2 excluded-domain
anti-join ``utils/url_utils.py:18-34``), distributed:

  1. explode each fetched row's out-links, canonicalize + hash (M8 analog)
  2. blocklist + robots disallow-prefix anti-filter (blocked URLs never
     reach the seen-set — identical rule in the oracle)
  3. batch-group by ``shard_of_hash`` and check-and-add on the owning
     SeenShard (atomic per shard -> no double-enqueue)
  4. group novel URLs by ``shard_of_host`` and push to FrontierShards with
     their priority — looked up by ``np.searchsorted`` on the broadcast
     hash-sorted priority array (the analog of the listing page's
     ``<time datetime>`` the reference parses per article, SURVEY M7)

Pushes and metric increments are ``ray.get``-ed before the batch returns,
so by the time a wave's sink finishes, every discovered URL is visible to
the next ``pop_wave`` — no lost frontier rows from in-flight messages.

The batch itself passes through unchanged minus the ``outlinks`` column
(payload bytes are untouched — routing ships only URL strings + hashes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.traps import url_template
from ..functions.urls import canonicalize_batch, is_blocked
from ..state.frontier import shard_of_host
from ..state.seen import shard_of_hash


def route_candidates(
    raw_urls: list[str],
    depths: list[int],
    seen_actors: list,
    frontier_actors: list,
    blocklist: frozenset,
    robots: dict[str, list[str]],
    priority_index: tuple[np.ndarray, np.ndarray],
    metrics_actor=None,
    default_priority: int = 0,
    trap_policy: dict | None = None,
) -> dict[str, int]:
    """Shared by the LinkRouter stage and the driver's seed push.

    ``priority_index`` = (hash_sorted int64[n], prio int64[n]) — the
    broadcast per-URL priority lookup, resolved zero-copy per worker.
    ``trap_policy`` (functions/traps.py): per-(host, template) hash
    damping, applied after blocklist/robots and BEFORE the seen check —
    identical rule + order to ``oracle.try_enqueue``.
    """
    if not raw_urls:
        return {"candidates": 0, "blocked": 0, "trap_skipped": 0, "novel": 0}
    canon, hosts, hashes = canonicalize_batch(raw_urls)

    keep = np.ones(len(canon), dtype=bool)
    blocked = 0
    for i, (c, h) in enumerate(zip(canon, hosts)):
        dis = robots.get(h)
        if is_blocked(h, blocklist) or (
            # path = from the first '/' after 'http://' (not 7+len(host),
            # which lands inside ':port' for non-default ports) — must stay
            # identical to oracle._allowed
            dis
            and any(
                (c[sl:] if (sl := c.find("/", 7)) != -1 else "").startswith(p)
                for p in dis
            )
        ):
            keep[i] = False
            blocked += 1
    trap_skipped = 0
    if trap_policy:
        # only URLs on a policy host pay the template regex; the low 16
        # bits of the (already-computed) url hash decide admission
        for i in np.nonzero(keep)[0]:
            rates = trap_policy.get(hosts[i])
            if not rates:
                continue
            rate = rates.get(url_template(canon[i]))
            if rate is not None and (int(hashes[i]) & 0xFFFF) >= rate:
                keep[i] = False
                trap_skipped += 1
    idx = np.nonzero(keep)[0]

    n_seen = len(seen_actors)
    shard = shard_of_hash(hashes, n_seen)
    futures, groups = [], []
    for s in range(n_seen):
        gi = idx[shard[idx] == s]
        if len(gi) == 0:
            continue
        futures.append(
            seen_actors[s].add_filter.remote([canon[i] for i in gi], hashes[gi])
        )
        groups.append(gi)
    novel_idx: list[int] = []
    for gi, mask in zip(groups, ray.get(futures)):
        novel_idx.extend(int(i) for i in gi[np.asarray(mask)])

    # vectorized priority lookup for the novel URLs
    hash_sorted, prio_sorted = priority_index
    prios: dict[int, int] = {}
    if novel_idx and len(hash_sorted):
        nh = hashes[novel_idx]
        pos = np.clip(np.searchsorted(hash_sorted, nh), 0, len(hash_sorted) - 1)
        found = hash_sorted[pos] == nh
        looked = np.where(found, prio_sorted[pos], default_priority)
        prios = dict(zip(novel_idx, looked.tolist()))

    n_frontier = len(frontier_actors)
    pushes = []
    by_shard: dict[int, list[int]] = {}
    for i in novel_idx:
        by_shard.setdefault(shard_of_host(hosts[i], n_frontier), []).append(i)
    for s, gi in by_shard.items():
        pushes.append(
            frontier_actors[s].push.remote(
                [canon[i] for i in gi],
                [hosts[i] for i in gi],
                [prios.get(i, default_priority) for i in gi],
                [int(depths[i]) for i in gi],
                [int(hashes[i]) for i in gi],
            )
        )
    counts = {
        "candidates": len(raw_urls),
        "blocked": blocked,
        "trap_skipped": trap_skipped,
        "novel": len(novel_idx),
    }
    if metrics_actor is not None:
        pushes.append(metrics_actor.add.remote(counts))
    if pushes:
        ray.get(pushes)
    return counts


_PRIORITY_CACHE: dict = {}


def _resolve_priority(priority_ref) -> tuple[np.ndarray, np.ndarray]:
    pi = _PRIORITY_CACHE.get(priority_ref)
    if pi is None:
        pi = ray.get(priority_ref)  # (hash_sorted, prio) numpy arrays, zero-copy
        _PRIORITY_CACHE.clear()
        _PRIORITY_CACHE[priority_ref] = pi
    return pi


def _route_batch(
    batch: pa.Table, seen, frontier, blocklist, robots, priority_index, metrics,
    trap_policy: dict | None = None,
) -> pa.Table:
    links_col = batch.column("outlinks")
    depths = batch.column("depth").to_pylist()
    raw, link_depths = [], []
    for row_links, d in zip(links_col.to_pylist(), depths):
        if row_links:
            raw.extend(row_links)
            link_depths.extend([d + 1] * len(row_links))
    route_candidates(
        raw, link_depths, seen, frontier, blocklist, robots, priority_index, metrics,
        trap_policy=trap_policy,
    )
    # credit retry/penalty virtual ms to the owning frontier shard's host
    # clocks (additive, so wave/batch composition cannot change makespan)
    extra = batch.column("extra_ms").to_numpy()
    nz = np.nonzero(extra)[0]
    if len(nz):
        hosts = batch.column("host").take(pa.array(nz)).to_pylist()
        per_host: dict[str, int] = {}
        for hst, ms in zip(hosts, extra[nz]):
            per_host[hst] = per_host.get(hst, 0) + int(ms)
        n_frontier = len(frontier)
        by_shard: dict[int, list[str]] = {}
        for hst in per_host:
            by_shard.setdefault(shard_of_host(hst, n_frontier), []).append(hst)
        ray.get(
            [
                frontier[s].add_clock.remote(hs, [per_host[h] for h in hs])
                for s, hs in by_shard.items()
            ]
        )
    return batch.drop_columns(["outlinks", "extra_ms"])


def make_route_fn(
    seen_actors,
    frontier_actors,
    blocklist: frozenset,
    robots: dict[str, list[str]],
    priority_ref,
    metrics_actor=None,
    trap_policy: dict | None = None,
):
    """Task-form router; the broadcast priority arrays resolve zero-copy
    once per worker process."""

    def route(batch: pa.Table) -> pa.Table:
        return _route_batch(
            batch,
            seen_actors,
            frontier_actors,
            blocklist,
            robots,
            _resolve_priority(priority_ref),
            metrics_actor,
            trap_policy,
        )

    return route


class LinkRouter:
    """Actor-pool form of the routing stage (kept for the live-web shape;
    the wave loop uses the fused task form above)."""

    def __init__(
        self,
        seen_actors,
        frontier_actors,
        blocklist: frozenset,
        robots: dict[str, list[str]],
        priority_ref,
        metrics_actor=None,
        trap_policy: dict | None = None,
    ):
        self.seen = seen_actors
        self.frontier = frontier_actors
        self.blocklist = blocklist
        self.robots = robots
        self.priority_index = ray.get(priority_ref)
        self.metrics = metrics_actor
        self.trap_policy = trap_policy

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _route_batch(
            batch, self.seen, self.frontier, self.blocklist, self.robots,
            self.priority_index, self.metrics, self.trap_policy,
        )
