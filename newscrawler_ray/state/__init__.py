"""Distributed crawl state: URL-seen filter shards, frontier shards, metrics.

These are the pieces the Ray Data Dataset API genuinely cannot express —
shared mutable indexes that must survive across waves — so they are plain
``@ray.remote`` actors (SURVEY.md §7.3). Everything that flows THROUGH them
is still Arrow batches inside ``map_batches`` stages.
"""

from .seen import SeenShard, shard_of_hash
from .frontier import FrontierShard, shard_of_host
from .metrics import MetricsActor

__all__ = [
    "SeenShard",
    "FrontierShard",
    "MetricsActor",
    "shard_of_hash",
    "shard_of_host",
]
