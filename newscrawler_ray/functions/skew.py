"""Skew mitigation: salted two-phase aggregation (north_rule requirement).

A ``groupby`` on a hot key concentrates that key's every row in one
reduce partition. The standard fix: salt the key into K sub-keys, partial
aggregate on (key, salt) — K-way parallel even for a single hot key —
then do a tiny final aggregate on the (cardinality x K) partials.

The same pattern covers the crawl's hot hosts (SURVEY §4): the frontier's
per-host politeness budget already serializes a host's FETCHES by design
(politeness is a per-host rate limit), so salting applies to the
analytics side — e.g. per-host fetch counts over billions of rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum


def salted_groupby_sum(
    ds: rd.Dataset,
    key: str,
    value_cols: dict[str, str],
    *,
    n_salt: int = 16,
    count_alias: str | None = None,
) -> rd.Dataset:
    """Two-phase grouped sum with key salting.

    ``value_cols`` maps input column -> output alias. Phase 1 groups by
    (key, salt) — the shuffle spreads each hot key over ``n_salt``
    partitions; phase 2 merges the small partial table by key alone.
    Result is identical to a direct ``groupby(key).sum()``.
    """

    def add_salt(batch: pa.Table) -> pa.Table:
        # deterministic row-position salt: cheap, uniform, reproducible
        salt = np.arange(batch.num_rows, dtype=np.int32) % n_salt
        return batch.append_column("_salt", pa.array(salt))

    aggs = [Sum(src, alias_name=dst) for src, dst in value_cols.items()]
    if count_alias:
        aggs.append(Count(alias_name="_partial_n"))
    partial = ds.map_batches(add_salt, batch_format="pyarrow").groupby(
        [key, "_salt"]
    ).aggregate(*aggs)

    final_aggs = [Sum(dst, alias_name=dst) for dst in value_cols.values()]
    if count_alias:
        final_aggs.append(Sum("_partial_n", alias_name=count_alias))
    out = partial.groupby(key).aggregate(*final_aggs)
    return out
