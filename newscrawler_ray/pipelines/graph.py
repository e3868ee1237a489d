"""Distributed graph clustering: connected components + headline clusters.

The reference groups related stories into headline clusters before
collecting titles (``services/apis/google_news_crawler.py:334-440`` drives
grouped story collection). The rebuild expresses the *grouping half* as a
first-class engine operator: near-dup candidate pairs (simhash buckets,
machinery from ``pipelines/dedup.py``) are edges of a similarity graph and
cluster assignment = connected components of that graph.

Connected components run as alternating large-star / small-star rounds
(Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
Components in MapReduce and Beyond", SoCC 2014): each round is ONE hash
groupby over fixed-width (node, node) int64 edges — no joins, no driver
state, converges in O(log^2 n) rounds (2-4 in practice for the
short-chain clusters near-dup graphs produce). Edge count only shrinks;
the per-round materialize holds (2 x int64) x |edges|, tiny next to the
corpus the pairs were mined from.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from pathlib import Path

from ..functions.hashing import splitmix64
from ..functions.io import read_clean

_I64 = pa.int64()


def _p(sf_dir: str, table: str) -> str:
    return str(Path(sf_dir) / f"{table}.parquet")


def _pairs(a: np.ndarray, b: np.ndarray) -> pa.Table:
    return pa.table({"u": pa.array(a, _I64), "v": pa.array(b, _I64)})


def _large_star(group: pa.Table) -> pa.Table:
    """Connect every neighbor LARGER than u to the minimum of u's
    neighborhood (incl. u). Input rows: (u, v) for every orientation."""
    u = group.column("u")[0].as_py()
    nb = np.unique(group.column("v").to_numpy())
    m = min(u, int(nb[0]))
    big = nb[nb > u]
    return _pairs(big, np.full(len(big), m, dtype=np.int64))


def _small_star(group: pa.Table) -> pa.Table:
    """Connect every neighbor SMALLER than u (and u itself) to the
    minimum of that set. Input rows: (u, v) oriented so v < u."""
    u = group.column("u")[0].as_py()
    nb = np.unique(group.column("v").to_numpy())
    members = np.append(nb, u)  # nb sorted ascending, all < u
    m = members[0]
    out = members[members != m]
    return _pairs(out, np.full(len(out), m, dtype=np.int64))


def _symmetrize(batch: pa.Table) -> pa.Table:
    if batch.num_columns == 0:  # empty hash-shuffle partition
        return _pairs(np.empty(0, np.int64), np.empty(0, np.int64))
    u = batch.column("u").to_numpy()
    v = batch.column("v").to_numpy()
    keep = u != v
    u, v = u[keep], v[keep]
    return _pairs(np.concatenate([u, v]), np.concatenate([v, u]))


def _orient_down(batch: pa.Table) -> pa.Table:
    """(max, min) orientation; self-loops dropped."""
    if batch.num_columns == 0:  # empty hash-shuffle partition
        return _pairs(np.empty(0, np.int64), np.empty(0, np.int64))
    u = batch.column("u").to_numpy()
    v = batch.column("v").to_numpy()
    keep = u != v
    u, v = u[keep], v[keep]
    return _pairs(np.maximum(u, v), np.minimum(u, v))


def _checksum(edges: rd.Dataset) -> tuple[int, int]:
    """(n_edges, order-independent mix) of the canonical edge set —
    one tiny row per block reaches the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy().astype(np.uint64)
        v = batch.column("v").to_numpy().astype(np.uint64)
        h = splitmix64(np.maximum(u, v) * np.uint64(0x9E3779B97F4A7C15) ^ np.minimum(u, v))
        return pa.table(
            {
                "n": pa.array([len(u)], _I64),
                "x": pa.array([int(h.sum(dtype=np.uint64))], pa.uint64()),
            }
        )

    n, x = 0, 0
    for b in edges.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        n += int(pa.compute.sum(b.column("n")).as_py() or 0)
        x = (x + int(pa.compute.sum(b.column("x")).as_py() or 0)) % (1 << 64)
    return n, x


@ray.remote
def _cc_union_find(*blocks: pa.Table) -> pa.Table:
    """Single-task union-find over a small edge set (runs on a worker,
    NOT the driver). The O(n alpha) sequential algorithm beats multiple
    distributed shuffle rounds until edges reach the hundreds of
    thousands; above that the star rounds take over."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for t in blocks:
        if t.num_columns == 0:  # empty hash-shuffle partition
            continue
        us = t.column("u").to_numpy()
        vs = t.column("v").to_numpy()
        for a, b in zip(us.tolist(), vs.tolist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    comp = [find(x) for x in nodes]  # roots are component minima
    return pa.table(
        {"node": pa.array(nodes, _I64), "component": pa.array(comp, _I64)}
    )


def connected_components(
    edges: rd.Dataset,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 30,
    small_edges: int = 200_000,
) -> rd.Dataset:
    """Component label (= min node id in the component) for every node
    that appears in ``edges``. Returns columns (node, component),
    including one (root, root) row per component.

    Edge sets under ``small_edges`` run as ONE worker-side union-find
    task (each distributed round costs two hash shuffles of latency, a
    bad trade for small graphs). Larger graphs alternate large-star /
    small-star rounds until the canonical edge set is unchanged
    (checksum compare — two int64s per round on the driver). Each round
    materializes the shrunken edge list so lineage does not re-run
    prior rounds. Roots are component minima in both paths, so the two
    paths agree exactly (asserted in tests).
    """
    empty_assign = rd.from_arrow(
        pa.table({"node": pa.array([], _I64), "component": pa.array([], _I64)})
    )
    sch = edges.schema(fetch_if_missing=True)
    if sch is None or len(sch.names) == 0:
        return empty_assign  # no candidate pairs at all
    ds = edges.select_columns([src, dst]).rename_columns(["u", "v"])
    ds = ds.map_batches(_orient_down, batch_format="pyarrow").materialize()
    prev = _checksum(ds)
    if prev[0] == 0:
        return empty_assign  # only self-loops
    if prev[0] <= small_edges:
        return rd.from_arrow_refs(
            [_cc_union_find.remote(*ds.to_arrow_refs())]
        )
    for _ in range(max_rounds):
        big = ds.map_batches(_symmetrize, batch_format="pyarrow")
        ds = big.groupby("u").map_groups(_large_star, batch_format="pyarrow")
        ds = ds.map_batches(_orient_down, batch_format="pyarrow")
        ds = ds.groupby("u").map_groups(_small_star, batch_format="pyarrow")
        ds = ds.map_batches(_orient_down, batch_format="pyarrow").materialize()
        cur = _checksum(ds)
        if cur == prev:
            break
        prev = cur
    # converged stars: every edge is (node, root)
    stars = ds.groupby(["u", "v"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )

    def with_roots(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy()
        v = batch.column("v").to_numpy()
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v]), _I64),
                "component": pa.array(np.concatenate([v, v]), _I64),
            }
        )

    out = stars.map_batches(with_roots, batch_format="pyarrow")
    return out.groupby("node").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# --------------------------------------------------------------- headlines


def headline_of(batch: pa.Table, text_col: str = "text", n_words: int = 8) -> pa.Array:
    """First ``n_words`` words — the synthetic corpus' headline analog
    (vectorized: split / slice / rejoin)."""
    import pyarrow.compute as pc

    words = pc.utf8_split_whitespace(batch.column(text_col))
    return pc.binary_join(pc.list_slice(words, 0, n_words), " ")


def headline_clusters(
    sf_dir: str,
    *,
    max_hamming: int = 3,
    docs: rd.Dataset | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Group near-duplicate headlines into story clusters and collect
    member ids + a representative title per cluster (reference
    ``google_news_crawler.py:334-440``: related-story grouping + title
    collection, rebuilt as simhash pairs -> connected components ->
    grouped collect).

    Output: (cluster_id = min doc_id, n_docs, doc_ids comma-joined in
    ascending order, headline of the representative doc). Singleton docs
    form their own cluster. Shuffles ship only (id, id) edges, the
    (node, component) assignment, and one headline string per doc.
    """
    from .dedup import simhash_near_dup_pairs

    if docs is None:
        docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)

    def headlines(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text": headline_of(batch)}
        )

    hl = docs.map_batches(headlines, batch_format="pyarrow")
    pairs = simhash_near_dup_pairs(sf_dir, max_hamming=max_hamming, docs=hl)
    # assignment is tiny (only nodes that appear in a pair); materializing
    # lets the all-singleton case skip the join (zero-block right sides
    # break the arrow hash join)
    assign = connected_components(pairs).materialize()
    hl_nodes = hl.rename_columns(["node", "headline"])
    if assign.count() == 0:
        joined = hl_nodes.map_batches(
            lambda b: b.append_column("component", pa.nulls(b.num_rows, _I64)),
            batch_format="pyarrow",
        )
    else:
        joined = hl_nodes.join(
            assign,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("node",),
        )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        comp = pc.coalesce(batch.column("component"), batch.column("node"))
        return pa.table(
            {
                "cluster_id": comp,
                "doc_id": batch.column("node"),
                "headline": batch.column("headline"),
            }
        )

    members = joined.map_batches(finish, batch_format="pyarrow")

    def collect(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        heads = group.column("headline").take(pa.array(order))
        return pa.table(
            {
                "cluster_id": pa.array([int(ids[0])], _I64),
                "n_docs": pa.array([len(ids)], _I64),
                "doc_ids": pa.array([",".join(map(str, ids.tolist()))]),
                "headline": pa.array([heads[0].as_py()]),
            }
        )

    return members.groupby("cluster_id").map_groups(collect, batch_format="pyarrow")
