"""The flagship crawl pipeline: wave-based frontier loop on Ray Data.

Rebuild of the reference's ``GET /crawlnews`` loop (SURVEY.md §3.1,
``main.py:163-255`` -> ``google_news_crawler.py:442-529``) as the
north_rule architecture:

  seed push -> loop {  FrontierShards.pop_wave (per-host politeness budget)
                       -> Dataset of frontier rows
                       -> map_batches(SimFetcher, actor pool)   [payload in]
                       -> map_batches(LinkRouter, actor pool)   [discover ->
                            canonicalize -> blocklist/robots -> SeenShards
                            check-and-add -> FrontierShards push]
                       -> map_batches(extract)                  [decode +
                            phash + summary + stored gate]
                       -> write_parquet(out/waves/wave=K)  }    [resumable]
  -> final order = sort(priority DESC, url ASC) over stored rows

Determinism: the final seen-set is the BFS closure under shared
canonicalization/filter rules (wave composition cannot change it) and the
output ordering is a data-derived sort — so the distributed run matches
the single-threaded oracle byte-for-byte regardless of scheduling.

Checkpointing (north_rule): after each wave the driver snapshots every
shard (frontier heaps + virtual clocks, seen bloom bits + exact set,
metrics) to ``out/checkpoint/wave=K/`` with a lineage manifest
(wave id, fixture digest, shard counts). ``resume=True`` restores the
latest complete checkpoint, prunes any partially-written newer wave
directory, and continues — outputs equal an uninterrupted run (tested).

Scale notes: frontier/seen shards hold only URL strings + 8-byte hashes
(at 10^10 URLs: shard count scales those sets across nodes; bloom bits
give the in-memory fast path). Payload bytes stream fetch->extract->sink
within a wave and never cross a shuffle; the only driver-side data are
per-wave shard handles and counters.
"""

from __future__ import annotations

import json
import pickle
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.urls import canonicalize_url
from ..oracle import ts_us
from ..stages.extract import make_extract_stage
from ..stages.fetch import make_fetch_fn
from ..stages.route import make_route_fn, route_candidates
from ..state import FrontierShard, MetricsActor, SeenShard


def _load_config(fixture_dir: Path):
    pol = pq.read_table(fixture_dir / "politeness.parquet").to_pylist()
    intervals = {r["host"]: int(r["min_interval_ms"]) for r in pol}
    robots = {
        r["host"]: list(r["robots_disallow"]) for r in pol if r["robots_disallow"]
    }
    cfg = json.loads((fixture_dir / "config.json").read_text())
    return intervals, robots, frozenset(cfg["blocklist"])


def _priority_map(fixture_dir: Path) -> dict[str, int]:
    t = pq.read_table(fixture_dir / "pages.parquet", columns=["url", "priority"])
    urls = t.column("url").to_pylist()
    prios = [ts_us(x) for x in t.column("priority").to_pylist()]
    return dict(zip(urls, prios))


class CrawlState:
    """Actor handles + broadcast refs for one crawl run."""

    def __init__(self, fixture_dir: Path, n_seen: int, n_frontier: int):
        self.intervals, self.robots, self.blocklist = _load_config(fixture_dir)
        self.seen = [SeenShard.remote(i) for i in range(n_seen)]
        self.frontier = [
            FrontierShard.remote(i, self.intervals) for i in range(n_frontier)
        ]
        self.metrics = MetricsActor.remote()
        self.pages_ref = ray.put(pq.read_table(fixture_dir / "pages.parquet"))
        self.images_ref = ray.put(pq.read_table(fixture_dir / "images.parquet"))
        self.links_ref = ray.put(pq.read_table(fixture_dir / "links.parquet"))
        self.priority_of = _priority_map(fixture_dir)
        self.priority_ref = ray.put(self.priority_of)

    def kill(self):
        for a in [*self.seen, *self.frontier, self.metrics]:
            ray.kill(a)


def _checkpoint(state: CrawlState, ckpt_dir: Path, wave: int, fixture_dir: Path):
    wdir = ckpt_dir / f"wave={wave:04d}"
    tmp = ckpt_dir / f".tmp_wave={wave:04d}"
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    snaps = ray.get(
        [a.snapshot.remote() for a in [*state.seen, *state.frontier, state.metrics]]
    )
    n_seen = len(state.seen)
    n_frontier = len(state.frontier)
    for i in range(n_seen):
        (tmp / f"seen_{i}.pkl").write_bytes(pickle.dumps(snaps[i]))
    for i in range(n_frontier):
        (tmp / f"frontier_{i}.pkl").write_bytes(pickle.dumps(snaps[n_seen + i]))
    (tmp / "metrics.pkl").write_bytes(pickle.dumps(snaps[-1]))
    shutil.rmtree(wdir, ignore_errors=True)
    tmp.rename(wdir)  # atomic publish
    (ckpt_dir / "MANIFEST.json").write_text(
        json.dumps(
            {
                "completed_wave": wave,
                "n_seen": n_seen,
                "n_frontier": n_frontier,
                "fixture_dir": str(fixture_dir),
            }
        )
    )


def _restore(state: CrawlState, ckpt_dir: Path) -> int:
    manifest = json.loads((ckpt_dir / "MANIFEST.json").read_text())
    wave = manifest["completed_wave"]
    wdir = ckpt_dir / f"wave={wave:04d}"
    futures = []
    for i, a in enumerate(state.seen):
        futures.append(
            a.restore.remote(pickle.loads((wdir / f"seen_{i}.pkl").read_bytes()))
        )
    for i, a in enumerate(state.frontier):
        futures.append(
            a.restore.remote(pickle.loads((wdir / f"frontier_{i}.pkl").read_bytes()))
        )
    futures.append(
        state.metrics.restore.remote(pickle.loads((wdir / "metrics.pkl").read_bytes()))
    )
    ray.get(futures)
    return wave


def run_crawl(
    fixture_dir: str | Path,
    out_dir: str | Path,
    *,
    n_seen_shards: int = 4,
    n_frontier_shards: int = 4,
    wave_window_ms: int = 600_000,
    min_content_len: int = 1000,
    batch_size: int = 256,
    checkpoint: bool = True,
    stop_after_wave: int | None = None,
    resume: bool = False,
) -> dict:
    fixture_dir = Path(fixture_dir)
    out_dir = Path(out_dir)
    waves_dir = out_dir / "waves"
    ckpt_dir = out_dir / "checkpoint"

    state = CrawlState(fixture_dir, n_seen_shards, n_frontier_shards)
    try:
        start_wave = 0
        if resume and (ckpt_dir / "MANIFEST.json").exists():
            completed = _restore(state, ckpt_dir)
            start_wave = completed + 1
            # prune any partially-written newer wave outputs
            for d in sorted(waves_dir.glob("wave=*")):
                if int(d.name.split("=")[1]) >= start_wave:
                    shutil.rmtree(d)
        else:
            shutil.rmtree(out_dir, ignore_errors=True)
            waves_dir.mkdir(parents=True, exist_ok=True)
            # seed push (analog of the category seed map, SURVEY S6/T4)
            seeds = pq.read_table(fixture_dir / "seeds.parquet")
            route_candidates(
                seeds.column("url").to_pylist(),
                seeds.column("depth").to_pylist(),
                state.seen,
                state.frontier,
                state.blocklist,
                state.robots,
                state.priority_of,
                state.metrics,
            )
            if checkpoint:
                ckpt_dir.mkdir(parents=True, exist_ok=True)
                _checkpoint(state, ckpt_dir, -1, fixture_dir)
                start_wave = 0

        # task-form stages: worker-global caches make per-wave setup zero,
        # and Ray fuses the task operators into one pipeline stage
        fetch = make_fetch_fn(state.pages_ref, state.images_ref, state.links_ref)
        route = make_route_fn(
            state.seen,
            state.frontier,
            state.blocklist,
            state.robots,
            state.priority_ref,
            state.metrics,
        )
        extract = make_extract_stage(min_content_len)
        wave = start_wave
        while True:
            tables = [
                t
                for t in ray.get(
                    [f.pop_wave.remote(wave_window_ms) for f in state.frontier]
                )
                if t is not None
            ]
            if not tables:
                break
            ds = rd.from_arrow(tables)
            ds = ds.map_batches(fetch, batch_size=batch_size, batch_format="pyarrow")
            ds = ds.map_batches(route, batch_size=batch_size, batch_format="pyarrow")
            ds = ds.map_batches(extract, batch_size=batch_size, batch_format="pyarrow")
            ds.write_parquet(str(waves_dir / f"wave={wave:04d}"))
            if checkpoint:
                _checkpoint(state, ckpt_dir, wave, fixture_dir)
            if stop_after_wave is not None and wave >= stop_after_wave:
                return {"stopped_after_wave": wave, "partial": True}
            wave += 1

        # final metrics
        seen_counts = ray.get([a.counters.remote() for a in state.seen])
        frontier_counts = ray.get([a.counters.remote() for a in state.frontier])
        route_counts = ray.get(state.metrics.get.remote())
        seen_urls = sorted(
            u for part in ray.get([a.contents.remote() for a in state.seen]) for u in part
        )
        return {
            "waves": wave,
            "enqueued": sum(c["added"] for c in seen_counts),
            "dedup_hits": sum(c["dup_hits"] for c in seen_counts),
            "blocked": route_counts.get("blocked", 0),
            "fetched": sum(c["popped"] for c in frontier_counts),
            "makespan_ms": max(c["makespan_ms"] for c in frontier_counts),
            "seen": seen_urls,
            "out_dir": str(out_dir),
            "partial": False,
        }
    finally:
        state.kill()


# ---------------------------------------------------------------- readback


def crawl_output_dataset(out_dir: str | Path) -> rd.Dataset:
    return rd.read_parquet(str(Path(out_dir) / "waves"))


def crawl_order(out_dir: str | Path) -> list[str]:
    """Final crawl ordering: stored rows by (priority DESC, url ASC).

    Test-scale helper (materializes URLs on the driver); at scale consume
    ``crawl_output_dataset(...).sort(...)`` as a stream instead.
    """
    ds = crawl_output_dataset(out_dir)
    ds = ds.map_batches(
        lambda t: t.filter(t.column("stored")).select(["url", "priority"]),
        batch_format="pyarrow",
    )
    ds = ds.sort(["priority", "url"], descending=[True, False])
    return [r["url"] for r in ds.take_all()]


def crawl_error_rows(out_dir: str | Path) -> pa.Table:
    ds = crawl_output_dataset(out_dir)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.is_valid(t.column("extraction_error"))).select(
            ["url", "status", "extraction_error"]
        ),
        batch_format="pyarrow",
    )
    return pa.Table.from_pylist(ds.take_all())
