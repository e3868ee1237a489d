"""Crawl metrics actor: per-partition counters merged centrally.

Analog of the reference's inserted/updated tally (SURVEY.md T7/A6,
``main.py:181,219-230``) generalized to the whole pipeline. Stages send
small count dicts (one fire-and-forget call per BATCH, never per row);
the driver reads the merged view per wave and at the end.
"""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote
class MetricsActor:
    def __init__(self):
        self.counts: dict[str, int] = defaultdict(int)
        self.per_partition: dict[tuple, dict] = {}

    def add(self, deltas: dict[str, int], partition: tuple | None = None) -> None:
        for k, v in deltas.items():
            self.counts[k] += int(v)
        if partition is not None:
            slot = self.per_partition.setdefault(tuple(partition), defaultdict(int))
            for k, v in deltas.items():
                slot[k] += int(v)

    def get(self) -> dict[str, int]:
        return dict(self.counts)

    def get_partitions(self) -> dict:
        return {k: dict(v) for k, v in self.per_partition.items()}

    def snapshot(self) -> dict:
        return {"counts": dict(self.counts),
                "per_partition": {k: dict(v) for k, v in self.per_partition.items()}}

    def restore(self, snap: dict) -> None:
        self.counts = defaultdict(int, snap["counts"])
        self.per_partition = {
            tuple(k): defaultdict(int, v) for k, v in snap["per_partition"].items()
        }
