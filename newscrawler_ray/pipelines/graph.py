"""Distributed graph clustering: connected components + headline clusters.

The reference groups related stories into headline clusters before
collecting titles (``services/apis/google_news_crawler.py:334-440`` drives
grouped story collection). The rebuild expresses the *grouping half* as a
first-class engine operator: near-dup candidate pairs (simhash buckets,
machinery from ``pipelines/dedup.py``) are edges of a similarity graph and
cluster assignment = connected components of that graph.

Connected components run as alternating large-star / small-star rounds
(Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
Components in MapReduce and Beyond", SoCC 2014). Each star is fully
vectorized: per-node neighborhood minima are computed as per-block
partial minima (argsort + ``np.minimum.reduceat`` inside map_batches)
merged on the driver and broadcast back with ``ray.put``, then a numpy
map emits the star edges — no per-node Python calls (a round-2 review
finding: ``map_groups`` costs one interpreter call per node and crawls
at millions of nodes) and no per-round join actor pools (measured ~10x
the per-round constant). Converges in O(log^2 n) rounds (2-4 in
practice for the short-chain clusters near-dup graphs produce); every
shuffle ships fixed-width (int64, int64) edges, the driver holds 16
bytes per active node per round (see ``_collect_minima`` for the
sharded-join alternative beyond ~10^8 nodes), and the per-round
materialize holds (2 x int64) x |edges|, tiny next to the corpus the
pairs were mined from.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from pathlib import Path

from ..functions.hashing import splitmix64
from ..functions.io import read_clean

_I64 = pa.int64()


def _p(sf_dir: str, table: str) -> str:
    return str(Path(sf_dir) / f"{table}.parquet")


def _pairs(a: np.ndarray, b: np.ndarray) -> pa.Table:
    return pa.table({"u": pa.array(a, _I64), "v": pa.array(b, _I64)})


def _empty_uv() -> pa.Table:
    return _pairs(np.empty(0, np.int64), np.empty(0, np.int64))


def _symmetrize(batch: pa.Table) -> pa.Table:
    if batch.num_columns == 0:  # empty hash-shuffle partition
        return _empty_uv()
    u = batch.column("u").to_numpy()
    v = batch.column("v").to_numpy()
    keep = u != v
    u, v = u[keep], v[keep]
    return _pairs(np.concatenate([u, v]), np.concatenate([v, u]))


def _make_orient(src: str, dst: str):
    """map_batches fn: project ANY edge schema straight to canonical
    (u=max, v=min) rows, self-loops dropped. Folding projection + rename
    into one map sidesteps ``select_columns().rename_columns()``, whose
    lazily-derived schema can still report the UNPROJECTED columns at
    higher partition counts (the round-2 ``jaccard_dedup_docs`` crash);
    0-column blocks from empty hash-shuffle partitions normalize to the
    empty (u, v) schema so every block downstream agrees."""

    def orient(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _empty_uv()
        u = batch.column(src).to_numpy()
        v = batch.column(dst).to_numpy()
        keep = u != v
        u, v = u[keep], v[keep]
        return _pairs(np.maximum(u, v), np.minimum(u, v))

    return orient


_orient_down = _make_orient("u", "v")


def _distinct_uv(ds: rd.Dataset) -> rd.Dataset:
    """Distinct canonical edges via the vectorized hash aggregate (one
    shuffle, no per-group Python)."""
    out = ds.groupby(["u", "v"]).aggregate(Count(alias_name="_c"))
    return out.drop_columns(["_c"])


def _collect_minima(edges: rd.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """(sorted distinct u, per-u min of v) over an edge dataset,
    computed as per-block partial minima (argsort + minimum.reduceat
    inside map_batches) merged on the driver. Only the thin partials —
    one (int64, int64) row per distinct u per block, O(active nodes)
    total — ever reach the driver; the edges themselves never do.

    Scale note: each star round holds 16 bytes per active node on the
    driver (and broadcasts the same), fine to ~10^8 nodes. Beyond that,
    swap this for groupby("u").aggregate(Min) hash-joined back onto the
    edges — same semantics, fully sharded, but one actor-pool join per
    round (measured ~10x the per-round constant on this box, which is
    why the broadcast form is the default)."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _empty_uv()
        u = batch.column("u").to_numpy()
        v = batch.column("v").to_numpy()
        order = np.argsort(u, kind="stable")
        us, vs = u[order], v[order]
        uniq, starts = np.unique(us, return_index=True)
        return _pairs(uniq, np.minimum.reduceat(vs, starts))

    nodes_l, mins_l = [], []
    for b in edges.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_columns and b.num_rows:
            nodes_l.append(b.column("u").to_numpy())
            mins_l.append(b.column("v").to_numpy())
    if not nodes_l:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    n = np.concatenate(nodes_l)
    m = np.concatenate(mins_l)
    order = np.argsort(n, kind="stable")
    n, m = n[order], m[order]
    uniq, starts = np.unique(n, return_index=True)
    return np.ascontiguousarray(uniq), np.minimum.reduceat(m, starts)


def _make_large_emit(minima_ref):
    """Large-star emission over the symmetrized edges: connect each
    neighbor v > u to m(u) = min(u, min-neighborhood(u)). Output rows
    are already (max, min) oriented with no self-loops (m <= u < v)."""

    def emit(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _empty_uv()
        u = batch.column("u").to_numpy()
        v = batch.column("v").to_numpy()
        keep = v > u
        u, v = u[keep], v[keep]
        nodes, m = ray.get(minima_ref)  # zero-copy numpy from plasma
        return _pairs(v, m[np.searchsorted(nodes, u)])

    return emit


def _make_small_emit(minima_ref):
    """Small-star emission over (u=max, v=min) oriented edges: connect
    each smaller neighbor AND u itself to u's minimum neighbor mv.
    Output rows are (bigger, smaller) by construction (v > mv when
    v != mv; u > mv always). The per-u self row (u, mv) is emitted once
    per distinct u per batch; cross-batch duplicates collapse in the
    end-of-round distinct."""

    def emit(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _empty_uv()
        u = batch.column("u").to_numpy()
        v = batch.column("v").to_numpy()
        nodes, mins = ray.get(minima_ref)
        mv = mins[np.searchsorted(nodes, u)]
        keep = v != mv
        uniq, first = np.unique(u, return_index=True)
        return _pairs(
            np.concatenate([v[keep], uniq]),
            np.concatenate([mv[keep], mv[first]]),
        )

    return emit


def _checksum(edges: rd.Dataset) -> tuple[int, int]:
    """(n_edges, order-independent mix) of the canonical edge set —
    one tiny row per block reaches the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:  # empty hash-shuffle partition
            return pa.table(
                {"n": pa.array([0], _I64), "x": pa.array([0], pa.uint64())}
            )
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
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Component label (= min node id in the component) for every node
    that appears in ``edges``. Returns columns (node, component),
    including one (root, root) row per component. Extra edge columns
    beyond (src, dst) are ignored (projected away in the first map).

    Edge sets under ``small_edges`` run as ONE worker-side union-find
    task (each distributed round costs several hash shuffles of latency,
    a bad trade for small graphs). Larger graphs alternate vectorized
    large-star / small-star rounds until the distinct canonical edge set
    is unchanged (checksum compare — two int64s per round on the
    driver). Each round materializes the shrunken edge list so lineage
    does not re-run prior rounds. Roots are component minima in both
    paths, so the two paths agree exactly (asserted in tests). Raises
    ``RuntimeError`` if ``max_rounds`` is exhausted before the fixed
    point (a non-converged edge set must never be silently read as
    converged stars — advice round 2)."""
    empty_assign = rd.from_arrow(
        pa.table({"node": pa.array([], _I64), "component": pa.array([], _I64)})
    )
    # No fetch_if_missing here: fetching the schema of a lazy pair-mining
    # lineage EXECUTES it (the root is an all-to-all), and the
    # materialize below would then run the whole thing a second time —
    # measured as ~2x wall on every *_dedup_docs pipeline. A
    # pre-materialized empty edge set still short-circuits for free;
    # lazy lineages that execute to zero pairs are caught by the
    # checksum after the single materialization (_make_orient normalizes
    # every block, including 0-column shuffle partitions, to (u, v)).
    sch = edges.schema(fetch_if_missing=False)
    if sch is not None and len(sch.names) == 0:
        return empty_assign  # no candidate pairs at all
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    ds = edges.map_batches(_make_orient(src, dst), batch_format="pyarrow")
    # Bound the block count before the distinct: pair-mining stages can
    # emit one (mostly tiny) block per task — e.g. embedding_near_dup's
    # B(B+1)/2 block-pair tasks are 528 blocks at 32 CPUs — and the
    # hash-shuffle groupby inherits its input block count, so every
    # downstream pass would pay ~45 ms dispatch per tiny block (measured
    # 11 s for an 84-edge set). The repartition moves only thin (u, v)
    # rows and caps all star-round stages at num_partitions blocks.
    ds = ds.repartition(num_partitions)
    ds = _distinct_uv(ds).materialize()
    prev = _checksum(ds)
    if prev[0] == 0:
        return empty_assign  # only self-loops
    if prev[0] <= small_edges:
        return rd.from_arrow_refs(
            [_cc_union_find.remote(*ds.to_arrow_refs())]
        )
    converged = False
    for _ in range(max_rounds):
        big = ds.map_batches(_symmetrize, batch_format="pyarrow")
        nodes, mins = _collect_minima(big)
        large_ref = ray.put((nodes, np.minimum(nodes, mins)))
        ls = big.map_batches(_make_large_emit(large_ref), batch_format="pyarrow")
        s_nodes, s_mins = _collect_minima(ls)
        small_ref = ray.put((s_nodes, s_mins))
        ss = ls.map_batches(_make_small_emit(small_ref), batch_format="pyarrow")
        ds = _distinct_uv(ss).materialize()
        cur = _checksum(ds)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components: no fixed point after {max_rounds} star "
            "rounds — refusing to emit labels from a non-converged edge set"
        )

    # converged stars: every (already-distinct) edge is (node, root)
    def with_roots(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:  # empty hash-shuffle partition
            return pa.table(
                {"node": pa.array([], _I64), "component": pa.array([], _I64)}
            )
        u = batch.column("u").to_numpy()
        v = batch.column("v").to_numpy()
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v]), _I64),
                "component": pa.array(np.concatenate([v, v]), _I64),
            }
        )

    out = ds.map_batches(with_roots, batch_format="pyarrow")
    # at the fixed point every node has exactly one root; the (root,
    # root) rows emitted once per star edge collapse in the aggregate
    return out.groupby("node").aggregate(Min("component", alias_name="component"))


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


# --------------------------------------------------------------- pagerank


def _merge_key_sums(
    keys_l: list[np.ndarray], vals_l: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Merge per-block (key, partial-sum) rows on the driver: one
    concat + argsort + ``np.add.reduceat``. Keys come back sorted."""
    if not keys_l:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    k = np.concatenate(keys_l)
    v = np.concatenate(vals_l)
    order = np.argsort(k, kind="stable")
    k, v = k[order], v[order]
    uniq, starts = np.unique(k, return_index=True)
    return np.ascontiguousarray(uniq), np.add.reduceat(v, starts)


def _pr_degrees(
    edges: rd.Dataset, src: str, dst: str
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted distinct nodes, out-degree with multiplicity) over an edge
    dataset — per-block ``np.unique`` partials, one thin (node, deg) row
    per distinct endpoint per block, merged on the driver. Nodes that
    only ever appear as ``dst`` come back with degree 0 (dangling)."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"node": pa.array([], _I64), "s": pa.array([], pa.float64())}
            )
        s = batch.column(src).to_numpy()
        d = batch.column(dst).to_numpy()
        su, sc = np.unique(s, return_counts=True)
        du = np.unique(d)
        return pa.table(
            {
                "node": pa.array(np.concatenate([su, du]), _I64),
                "s": pa.array(
                    np.concatenate(
                        [sc.astype(np.float64), np.zeros(len(du), np.float64)]
                    ),
                    pa.float64(),
                ),
            }
        )

    return _fold_partials(edges, partial)


def _make_inflow_partial(src: str, dst: str, bundle_ref):
    """map_batches fn: per-block partial inflow sums. Looks up each edge's
    source weight w(src) = damping * rank / outdeg in the broadcast
    (sorted nodes, w) bundle (zero-copy numpy from plasma), then reduces
    per destination inside the block (argsort + ``np.add.reduceat``) so
    only one (dst, partial) row per distinct dst per block leaves."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"node": pa.array([], _I64), "s": pa.array([], pa.float64())}
            )
        s = batch.column(src).to_numpy()
        d = batch.column(dst).to_numpy()
        nodes, w = ray.get(bundle_ref)
        vals = w[np.searchsorted(nodes, s)]  # src is always in nodes
        order = np.argsort(d, kind="stable")
        d, vals = d[order], vals[order]
        uniq, starts = np.unique(d, return_index=True)
        return pa.table(
            {
                "node": pa.array(uniq, _I64),
                "s": pa.array(np.add.reduceat(vals, starts), pa.float64()),
            }
        )

    return partial


def pagerank(
    edges: rd.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 5,
) -> rd.Dataset:
    """PageRank over a directed (src, dst) edge dataset — the crawl-
    frontier priority signal (the reference ranks hosts/pages by a
    hand-tuned priority, ``services/news_service.py`` seed ordering; this
    is the principled replacement a web-scale crawler actually uses).

    Semantics: multiset edges (a duplicated edge contributes twice and
    counts twice in the out-degree); self-loops allowed; the node set is
    every id appearing as src or dst; dangling nodes' (out-degree 0)
    rank mass is redistributed uniformly each iteration, so ranks sum
    to 1 exactly at every step:

        r'(v) = (1-d)/N + d * dangling_mass/N
                        + sum_{(u,v) in E} d * r(u) / outdeg(u)

    Execution shape (the ``connected_components`` pattern): the edge
    dataset is materialized once and streamed ``n_iter`` times; each
    iteration broadcasts the (sorted nodes, d*rank/outdeg) bundle via
    ``ray.put`` (resolved zero-copy per worker), computes per-block
    partial inflow sums inside ``map_batches`` (argsort +
    ``np.add.reduceat`` — one thin row per distinct dst per block), and
    merges the partials on the driver. The driver holds 24 bytes per
    node (rank + degree + id) — fine to ~10^8 nodes like the CC minima;
    beyond that, swap the driver fold for ``groupby(dst).aggregate(Sum)``
    hash-joined back onto a distributed node table (same semantics, one
    shuffle per iteration).

    Float caveat: per-block partial sums depend on block boundaries, so
    ranks are reproducible only to float-sum reordering (~1e-15
    relative); callers wanting hash-stable output round the emitted
    column (see ``link_pagerank``).

    Returns a Dataset of (node int64, rank float64); empty input yields
    an empty result."""
    empty = rd.from_arrow(
        pa.table({"node": pa.array([], _I64), "rank": pa.array([], pa.float64())})
    )
    sch = edges.schema(fetch_if_missing=True)
    if sch is None or len(sch.names) == 0:
        return empty
    edges = edges.select_columns([src, dst]).materialize()
    nodes, outdeg = _pr_degrees(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return empty
    dangling = outdeg == 0.0
    safe_deg = np.maximum(outdeg, 1.0)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        w = np.where(dangling, 0.0, damping * r / safe_deg)
        bundle_ref = ray.put((nodes, w))
        in_nodes, in_sums = _fold_partials(
            edges, _make_inflow_partial(src, dst, bundle_ref)
        )
        base = (1.0 - damping) / n + damping * float(r[dangling].sum()) / n
        r = np.full(n, base)
        if len(in_nodes):
            r[np.searchsorted(nodes, in_nodes)] += in_sums
    return rd.from_arrow(
        pa.table({"node": pa.array(nodes, _I64), "rank": pa.array(r, pa.float64())})
    )


# deterministic synthetic link-graph parameters shared with the SQL oracle
_PR_MUL, _PR_ADD, _PR_SKIP = 48271, 10007, 7


def doc_link_edges(sf_dir: str, *, k: int = 3) -> rd.Dataset:
    """Deterministic link graph over the documents table, derived with
    SQL-expressible integer arithmetic so ``link_pagerank`` gets a hard
    DuckDB oracle: every doc with ``doc_id % 7 != 0`` links to ``k``
    targets ``(doc_id * 48271 + j * 10007 + 1) % n_docs``; docs with
    ``doc_id % 7 == 0`` publish nothing, so any in-links they receive
    make them dangling nodes (exercising the dangling-mass term)."""
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id"])
    n = docs.count()  # one metadata-only count; the modulus for targets

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        ids = ids[ids % _PR_SKIP != 0]
        s = np.repeat(ids, k)
        j = np.tile(np.arange(k, dtype=np.int64), len(ids))
        d = (s * _PR_MUL + j * _PR_ADD + 1) % n
        return pa.table({"src": pa.array(s, _I64), "dst": pa.array(d, _I64)})

    return docs.map_batches(emit, batch_format="pyarrow")


def link_pagerank(
    sf_dir: str, *, k: int = 3, damping: float = 0.85, n_iter: int = 5
) -> rd.Dataset:
    """PageRank over the deterministic document link graph; rank rounded
    to 8 decimals (+1e-9 tie nudge, repo rounding convention) for
    hash-stable DuckDB parity."""
    pr = pagerank(
        doc_link_edges(sf_dir, k=k), src="src", dst="dst",
        damping=damping, n_iter=n_iter,
    )

    def finish(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy()
        return pa.table(
            {
                "node": batch.column("node"),
                "rank": pa.array(np.round(r + 1e-9, 8), pa.float64()),
            }
        )

    return pr.map_batches(finish, batch_format="pyarrow")


def crawl_pagerank(
    crawl_out_dir,
    fixture_dir,
    *,
    k_top: int = 50,
    damping: float = 0.85,
    n_iter: int = 5,
) -> rd.Dataset:
    """Tier composition: rank the CRAWLED pages by PageRank over the
    link graph the crawl itself discovered (the principled replacement
    for the reference's hand-tuned priority ordering — reference
    ``services/news_service.py`` seed ordering / SURVEY O1).

    Wave output does not persist out-links (route consumes them), so the
    page-parser stage (M7) replays over the stored 200-status rows — the
    simulated web is a pure function, so the edges regenerate
    deterministically. Edges are restricted to the closed crawled world
    (dst must itself be a crawled page, via a broadcast hash-set
    semi-join), PageRank runs on (src_hash, dst_hash) int64 pairs, and
    only the k_top survivors join back to URLs — the rank->url join
    broadcasts the TINY top-k mapping over the crawled rows, never the
    full rank table.

    Output: (url, rank) rows, ordered rank desc / url asc, k_top rows.
    Rank ties at the k_top boundary are resolved at SELECTION time by
    url_hash asc (the node-level sort, before URLs are joined back);
    the url-asc ordering applies within the returned set only."""
    import pyarrow.compute as pc

    from ..functions.joins import make_broadcast_map_fn, table_to_mapping
    from ..stages.fetch import make_fetch_fn
    from ..functions.urls import canonicalize_batch
    from .crawl import _cached_web_index

    waves = str(Path(crawl_out_dir) / "waves")
    crawled = read_clean(waves, columns=["url", "host", "url_hash", "status"])

    def ok_rows(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("status"), 200))
        n = batch.num_rows
        return pa.table(
            {
                "url": batch.column("url"),
                "host": batch.column("host"),
                "url_hash": batch.column("url_hash"),
                "priority": pa.array(np.zeros(n, np.int64), _I64),
                "depth": pa.array(np.zeros(n, np.int32), pa.int32()),
            }
        )

    ok = crawled.map_batches(ok_rows, batch_format="pyarrow").materialize()

    # closed-world membership: the crawled hash set (node-set-sized
    # broadcast — the same driver-state class as pagerank itself)
    hashes = []
    for b in ok.select_columns(["url_hash"]).iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            hashes.append(b.column("url_hash").to_numpy())
    crawled_hashes = (
        np.unique(np.concatenate(hashes)) if hashes else np.empty(0, np.int64)
    )
    set_ref = ray.put(crawled_hashes)

    _, web_ref = _cached_web_index(Path(fixture_dir))
    fetch = make_fetch_fn(web_ref)

    def edges(batch: pa.Table) -> pa.Table:
        out = fetch(batch)
        links = out.column("outlinks").combine_chunks()
        cnt = pc.list_value_length(links).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(links)
        if len(flat) == 0:
            return pa.table(
                {"src": pa.array([], _I64), "dst": pa.array([], _I64)}
            )
        _, _, dst_hash = canonicalize_batch(flat)
        src = np.repeat(out.column("url_hash").to_numpy(), cnt)
        members = ray.get(set_ref)
        pos = np.minimum(np.searchsorted(members, dst_hash), max(len(members) - 1, 0))
        keep = len(members) > 0 and members[pos] == dst_hash
        keep = keep if isinstance(keep, np.ndarray) else np.zeros(len(dst_hash), bool)
        return pa.table(
            {
                "src": pa.array(src[keep], _I64),
                "dst": pa.array(dst_hash[keep], _I64),
            }
        )

    edge_ds = ok.map_batches(edges, batch_format="pyarrow")
    pr = pagerank(edge_ds, src="src", dst="dst", damping=damping, n_iter=n_iter)

    def round_rank(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "rank": pa.array(
                    np.round(batch.column("rank").to_numpy() + 1e-9, 8),
                    pa.float64(),
                ),
            }
        )

    top = (
        pr.map_batches(round_rank, batch_format="pyarrow")
        .sort(["rank", "node"], descending=[True, False])
        .limit(k_top)
        .take_all()
    )
    top_tbl = pa.table(
        {
            "url_hash": pa.array([r["node"] for r in top], _I64),
            "rank": pa.array([r["rank"] for r in top], pa.float64()),
        }
    )
    map_ref = ray.put(table_to_mapping(top_tbl, "url_hash", "rank"))
    joined = ok.map_batches(
        make_broadcast_map_fn("url_hash", "rank", map_ref, out_type=pa.float64()),
        batch_format="pyarrow",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.select(["url", "rank"])

    return (
        joined.map_batches(finish, batch_format="pyarrow")
        .sort(["rank", "url"], descending=[True, False])
        .limit(k_top)
    )


def _fold_partials(edges: rd.Dataset, partial) -> tuple[np.ndarray, np.ndarray]:
    """Run a per-block (node, s) partial over the edges and merge the
    thin rows on the driver (shared by the pagerank/HITS iterations)."""
    keys_l, vals_l = [], []
    for b in edges.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_columns and b.num_rows:
            keys_l.append(b.column("node").to_numpy())
            vals_l.append(b.column("s").to_numpy())
    return _merge_key_sums(keys_l, vals_l)


def hits(
    edges: rd.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
) -> rd.Dataset:
    """HITS hubs & authorities (Kleinberg 1999) over a directed (src,
    dst) edge dataset — the hub/authority split matters for a news
    crawler (aggregator pages vs story pages) where PageRank conflates
    the two roles.

    Each iteration: a(v) = sum of h over in-edges, L2-normalized; then
    h(u) = sum of the NEW a over out-edges, L2-normalized. Multiset
    edges count with multiplicity. Execution shape = ``pagerank``'s:
    edges stream twice per iteration against a broadcast (nodes, vec)
    bundle with per-block ``add.reduceat`` partials; the driver holds
    O(nodes) like the CC minima (same sharded-fold escape beyond ~10^8
    nodes).

    Returns (node, authority, hub); empty input yields an empty
    result."""
    empty = rd.from_arrow(
        pa.table(
            {
                "node": pa.array([], _I64),
                "authority": pa.array([], pa.float64()),
                "hub": pa.array([], pa.float64()),
            }
        )
    )
    sch = edges.schema(fetch_if_missing=True)
    if sch is None or len(sch.names) == 0:
        return empty
    edges = edges.select_columns([src, dst]).materialize()
    nodes, _ = _pr_degrees(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return empty
    h = np.ones(n, np.float64)
    a = np.zeros(n, np.float64)

    def fold(weights: np.ndarray, key_from: str, group_by: str) -> np.ndarray:
        ref = ray.put((nodes, weights))
        in_nodes, sums = _fold_partials(
            edges, _make_inflow_partial(key_from, group_by, ref)
        )
        out = np.zeros(n, np.float64)
        if len(in_nodes):
            out[np.searchsorted(nodes, in_nodes)] = sums
        return out

    for _ in range(n_iter):
        a = fold(h, src, dst)
        za = np.sqrt(np.sum(a * a))
        a = a / za if za > 0 else a
        h = fold(a, dst, src)
        zh = np.sqrt(np.sum(h * h))
        h = h / zh if zh > 0 else h
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, _I64),
                "authority": pa.array(a, pa.float64()),
                "hub": pa.array(h, pa.float64()),
            }
        )
    )


def link_hits(sf_dir: str, *, k: int = 3, n_iter: int = 5) -> rd.Dataset:
    """HITS over the same deterministic document link graph as
    ``link_pagerank``; both scores rounded to 8 decimals (+1e-9 nudge)
    for hash-stable DuckDB parity."""
    out = hits(doc_link_edges(sf_dir, k=k), src="src", dst="dst", n_iter=n_iter)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "authority": pa.array(
                    np.round(batch.column("authority").to_numpy() + 1e-9, 8),
                    pa.float64(),
                ),
                "hub": pa.array(
                    np.round(batch.column("hub").to_numpy() + 1e-9, 8),
                    pa.float64(),
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def triangle_count(
    sf_dir: str, *, num_partitions: int | None = None,
    events: rd.Dataset | None = None,
) -> pa.Table:
    """Triangle count over the co-purchase projection graph: users are
    adjacent when they purchased in the same (day, floor(value)) bucket.
    Completes the graph-analytics family (PageRank / HITS / connected
    components) with the classic clustering-coefficient primitive.

    Node-iterator with DEGREE ORIENTATION (Suri/Vassilvitskii,
    "Counting triangles and the curse of the last reducer", WWW 2011):
    orient each edge from the lower-(degree, id) endpoint to the
    higher, emit the out-neighbor pairs of every node as wedges, and
    count wedges whose closing edge exists. Orientation bounds
    out-degree by ~sqrt(m) regardless of skew — the hub node of a star
    graph emits ZERO wedges instead of deg^2 — so per-group work stays
    bounded at any corpus size. Every shuffle ships fixed-width int64
    rows; wedge emission reuses the coarse-partition pair kernel.

    Returns a one-row Arrow table (n_edges, n_triangles): the global
    count is driver-sized by definition; all heavy stages stream."""
    import ray as _ray

    from .dedup import _bucket_pair_indices

    if num_partitions is None:
        num_partitions = max(2, int(_ray.cluster_resources().get("CPU", 4)) // 2)
    import pyarrow.compute as pc

    ev = (
        events
        if events is not None
        else read_clean(
            _p(sf_dir, "events"), columns=["user_id", "event_type", "ts", "value"]
        )
    )

    def bucket_rows(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("event_type"), "purchase")
        batch = batch.filter(m)
        day = pc.cast(
            pc.floor_temporal(batch.column("ts"), unit="day"), pa.int64()
        ).to_numpy() // 86_400_000_000  # us -> day ordinal
        vb = np.floor(batch.column("value").to_numpy()).astype(np.int64)
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        # local distinct (user repeats within a bucket pair-inflate)
        o = np.lexsort((uid, vb, day))
        day, vb, uid = day[o], vb[o], uid[o]
        keep = np.r_[True, (day[1:] != day[:-1]) | (vb[1:] != vb[:-1]) | (uid[1:] != uid[:-1])]
        day, vb, uid = day[keep], vb[keep], uid[keep]
        part = (
            splitmix64(day.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) ^ vb.astype(np.uint64))
            % np.uint64(num_partitions * 4)
        ).astype(np.int32)
        return pa.table(
            {"part": pa.array(part), "day": pa.array(day, _I64),
             "vb": pa.array(vb, _I64), "user_id": pa.array(uid, _I64)}
        )

    rows = ev.map_batches(bucket_rows, batch_format="pyarrow")

    def co_pairs(group: pa.Table) -> pa.Table:
        day = group.column("day").to_numpy()
        vb = group.column("vb").to_numpy()
        uid = group.column("user_id").to_numpy()
        # exact distinct within the coarse part (cross-batch repeats)
        o = np.lexsort((uid, vb, day))
        day, vb, uid = day[o], vb[o], uid[o]
        keep = np.r_[True, (day[1:] != day[:-1]) | (vb[1:] != vb[:-1]) | (uid[1:] != uid[:-1])]
        day, vb, uid = day[keep], vb[keep], uid[keep]
        ia, ib, order = _bucket_pair_indices([day, vb], uid)
        srt = uid[order]
        return _pairs(srt[ia], srt[ib])

    cand = rows.groupby("part").map_groups(co_pairs, batch_format="pyarrow")
    # distinct undirected edges (same pair arises from many buckets);
    # repartition coalesces the 0-column empty hash-shuffle blocks that
    # would otherwise break the joins below (join-quirk rule)
    edges = (
        cand.groupby(["u", "v"]).aggregate(Count(alias_name="_c")).drop_columns(["_c"])
    ).repartition(num_partitions).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table(
            {"n_edges": pa.array([0], _I64), "n_triangles": pa.array([0], _I64)}
        )

    def endpoints(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table({"node": pa.array([], _I64)})
        u = batch.column("u").to_numpy()
        v = batch.column("v").to_numpy()
        return pa.table({"node": pa.array(np.concatenate([u, v]), _I64)})

    deg = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
        .repartition(num_partitions)
    )

    def dside(name: str) -> rd.Dataset:
        return deg.rename_columns({"node": name, "deg": f"deg_{name}"})

    j = edges.join(dside("u"), join_type="inner", num_partitions=num_partitions, on=("u",))
    j = j.repartition(num_partitions)
    j = j.join(dside("v"), join_type="inner", num_partitions=num_partitions, on=("v",))

    def orient(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table({"part": pa.array([], pa.int32()),
                             "src": pa.array([], _I64), "dst": pa.array([], _I64)})
        u = batch.column("u").to_numpy()
        v = batch.column("v").to_numpy()
        du = batch.column("deg_u").to_numpy()
        dv = batch.column("deg_v").to_numpy()
        u_first = (du < dv) | ((du == dv) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        part = (splitmix64(src.astype(np.uint64)) % np.uint64(num_partitions * 4)).astype(np.int32)
        return pa.table(
            {"part": pa.array(part), "src": pa.array(src, _I64), "dst": pa.array(dst, _I64)}
        )

    oriented = j.map_batches(orient, batch_format="pyarrow")

    def wedges(group: pa.Table) -> pa.Table:
        src = group.column("src").to_numpy()
        dst = group.column("dst").to_numpy()
        ia, ib, order = _bucket_pair_indices([src], dst)
        srt = dst[order]
        return _pairs(srt[ia], srt[ib])  # x < y within each src

    w = oriented.groupby("part").map_groups(wedges, batch_format="pyarrow")
    # every wedge row whose closing edge exists is exactly one triangle
    # (degree orientation makes the center unique), so NO per-(u,v)
    # wedge-count aggregate is needed: inner-join the wedge multiset
    # against the distinct edge set and count rows. (Measured: the
    # grouped count cost 53 s on 1.5M wedges at sf0.1; the join + count
    # runs in ~2 s and ships the same bytes.)
    w = w.repartition(num_partitions)
    closed = w.join(
        edges, join_type="inner", num_partitions=num_partitions, on=("u", "v")
    )
    n_tri = closed.count()
    return pa.table(
        {"n_edges": pa.array([n_edges], _I64), "n_triangles": pa.array([n_tri], _I64)}
    )


def kcore_nodes(
    sf_dir: str,
    *,
    k: int = 4,
    rounds: int = 12,
    link_k: int = 3,
    edges: rd.Dataset | None = None,
) -> rd.Dataset:
    """k-core of the document link graph: the maximal subgraph where
    every node keeps degree >= k, the classic density filter a crawl
    pipeline runs over its link graph to separate well-connected hubs
    from peripheral leaf pages (reference discovers page graphs via
    out-link parsing, ``utils/article_extractor.py`` link walk; the
    rebuild adds the density analytic the reference leaves on the
    table). Completes the graph family next to PageRank / HITS /
    connected components / triangles.

    Distributed peeling (Montresor, De Pellegrini, Miorandi, "Distributed
    k-core decomposition", PODC 2011, specialized to a fixed k): each
    round computes per-node degrees as per-block partial bincounts folded
    on the driver (same O(active nodes) driver budget as the pagerank
    rank fold and the CC minima fold — see ``_collect_minima`` for the
    sharded-join alternative beyond ~10^8 nodes), broadcasts the sorted
    survivor array with ``ray.put``, and drops incident edges inside
    ``map_batches`` via two searchsorted probes. Edges only shrink, so
    each round re-materializes a smaller dataset; the loop stops early at
    the fixed point (extra rounds are no-ops, so the fixed ``rounds``
    unroll in the SQL oracle agrees whenever it, too, has converged —
    tests assert convergence at the shipped defaults).

    Returns (node, deg): every k-core member with its degree inside the
    core (>= k by construction)."""
    e = edges if edges is not None else doc_link_edges(sf_dir, k=link_k)
    # simple undirected graph: canonical (u=max, v=min), self-loops out,
    # duplicates collapsed — one hash aggregate, no per-group Python
    cur = _distinct_uv(e.map_batches(_make_orient("src", "dst"), batch_format="pyarrow"))
    cur = cur.map_batches(_orient_down, batch_format="pyarrow").materialize()

    def _degrees(ds: rd.Dataset) -> tuple[np.ndarray, np.ndarray]:
        """(sorted distinct node, degree) folded from per-block partials."""
        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return pa.table({"node": pa.array([], _I64), "c": pa.array([], _I64)})
            both = np.concatenate(
                [batch.column("u").to_numpy(), batch.column("v").to_numpy()]
            )
            nodes, cnt = np.unique(both, return_counts=True)
            return pa.table(
                {"node": pa.array(nodes, _I64), "c": pa.array(cnt, _I64)}
            )

        acc_n = np.empty(0, np.int64)
        acc_c = np.empty(0, np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            if b.num_rows == 0:
                continue
            n = np.concatenate([acc_n, b.column("node").to_numpy()])
            c = np.concatenate([acc_c, b.column("c").to_numpy()])
            acc_n, inv = np.unique(n, return_inverse=True)
            acc_c = np.bincount(inv, weights=c).astype(np.int64)
        return acc_n, acc_c

    n_edges = cur.count()
    for _ in range(rounds):
        if n_edges == 0:
            break
        nodes, deg = _degrees(cur)
        keep = nodes[deg >= k]
        if len(keep) == len(nodes):  # fixed point: every node survives
            break
        keep_ref = ray.put(keep)

        def drop(batch: pa.Table, _ref=keep_ref) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return _empty_uv()
            kp = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
            u = batch.column("u").to_numpy()
            v = batch.column("v").to_numpy()
            pu = np.searchsorted(kp, u)
            pv = np.searchsorted(kp, v)
            ok = (
                (pu < len(kp)) & (pv < len(kp))
            )
            ok[ok] &= (kp[pu[ok]] == u[ok]) & (kp[pv[ok]] == v[ok])
            return _pairs(u[ok], v[ok])

        cur = cur.map_batches(drop, batch_format="pyarrow").materialize()
        n_edges = cur.count()

    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], _I64), "deg": pa.array([], _I64)})
        )
    nodes, deg = _degrees(cur)
    return rd.from_arrow(
        pa.table({"node": pa.array(nodes, _I64), "deg": pa.array(deg, _I64)})
    )


def bfs_depth(
    edges: rd.Dataset,
    seeds: np.ndarray,
    *,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 6,
) -> rd.Dataset:
    """Multi-source BFS: minimum number of directed hops from ANY seed
    to each reachable node, capped at ``max_depth`` — the crawl-depth
    analytic (the reference's frontier expands exactly this way,
    ``services/news_service.py`` wave loop; here it runs over an
    arbitrary edge dataset instead of the live frontier).

    Execution shape = ``pagerank``'s: the thin edge set is materialized
    once and streamed once per level against the broadcast sorted
    frontier array (``ray.put``, zero-copy numpy in every task); each
    block emits its DISTINCT matched destinations, the driver merges
    them (O(frontier) per round) and subtracts the visited set. The
    driver holds one int64 per reachable node — the same ~10^8-node
    budget as the CC minima fold, with the same sharded-join escape
    (visited set as a Dataset + hash anti-join) documented there.

    Returns (node, depth): seeds at depth 0, unreachable nodes absent."""
    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    empty = rd.from_arrow(
        pa.table({"node": pa.array([], _I64), "depth": pa.array([], _I64)})
    )
    if len(seeds) == 0:
        return empty
    sch = edges.schema(fetch_if_missing=True)
    have_edges = sch is not None and len(sch.names) > 0
    if have_edges:
        edges = edges.select_columns([src, dst]).materialize()
    visited = seeds
    depths = np.zeros(len(seeds), np.int64)
    frontier = seeds
    for level in range(1, max_depth + 1):
        if not have_edges or len(frontier) == 0:
            break
        ref = ray.put(frontier)

        def nbrs(batch: pa.Table, _ref=ref) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return pa.table({"node": pa.array([], _I64)})
            f = ray.get(_ref)
            s = batch.column(src).to_numpy()
            d = batch.column(dst).to_numpy()
            pos = np.searchsorted(f, s)
            ok = pos < len(f)
            ok[ok] = f[pos[ok]] == s[ok]
            return pa.table({"node": pa.array(np.unique(d[ok]), _I64)})

        found = []
        for b in edges.map_batches(nbrs, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            if b.num_rows:
                found.append(b.column("node").to_numpy())
        if not found:
            break
        cand = np.unique(np.concatenate(found))
        # exact membership (searchsorted alone only bounds): keep cand
        # not present in visited
        mask = np.ones(len(cand), bool)
        pos = np.searchsorted(visited, cand)
        inside = pos < len(visited)
        mask[inside] = visited[pos[inside]] != cand[inside]
        new = cand[mask]
        if len(new) == 0:
            break
        order_all = np.argsort(np.concatenate([visited, new]), kind="stable")
        merged_nodes = np.concatenate([visited, new])[order_all]
        merged_depths = np.concatenate(
            [depths, np.full(len(new), level, np.int64)]
        )[order_all]
        visited, depths, frontier = merged_nodes, merged_depths, new
    return rd.from_arrow(
        pa.table({"node": pa.array(visited, _I64), "depth": pa.array(depths, _I64)})
    )


def link_bfs_depth(
    sf_dir: str, *, seed_mod: int = 100, max_depth: int = 6, link_k: int = 3
) -> rd.Dataset:
    """BFS depth over the deterministic document link graph from the
    SQL-expressible seed set ``doc_id % seed_mod == 0`` — hard DuckDB
    oracle via a WITH RECURSIVE min-depth closure."""
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id"])

    def seed_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return pa.table({"node": pa.array(ids[ids % seed_mod == 0], _I64)})

    seed_l = []
    for b in docs.map_batches(seed_rows, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            seed_l.append(b.column("node").to_numpy())
    seeds = np.concatenate(seed_l) if seed_l else np.empty(0, np.int64)
    return bfs_depth(
        doc_link_edges(sf_dir, k=link_k), seeds, max_depth=max_depth
    )


def degree_assortativity(
    edges: rd.Dataset, *, src: str = "src", dst: str = "dst"
) -> pa.Table:
    """Degree assortativity (Newman 2002) of a directed multiset edge
    set: Pearson correlation between source OUT-degree and destination
    IN-degree over the edges — do hubs link to hubs (assortative, > 0)
    or to leaves (disassortative, < 0)? A web crawler reads this to
    predict frontier growth: disassortative graphs fan out fast from
    hubs and then die in leaves.

    Shape: two driver degree folds (the ``pagerank`` node budget), one
    broadcast (nodes, out-deg, in-deg) bundle, then per-block 6-number
    moment partials (n, sx, sy, sxx, syy, sxy) over one streamed edge
    pass — the exchange is constant-sized per block.

    Returns a one-row table (n_edges, assortativity round-4 +1e-9);
    assortativity is null when either degree sequence is constant."""
    empty = pa.table(
        {"n_edges": pa.array([0], _I64),
         "assortativity": pa.array([None], pa.float64())}
    )
    sch = edges.schema(fetch_if_missing=True)
    if sch is None or len(sch.names) == 0:
        return empty
    edges = edges.select_columns([src, dst]).materialize()
    nodes, outdeg = _pr_degrees(edges, src, dst)
    _, indeg = _pr_degrees(edges, dst, src)
    if len(nodes) == 0:
        return empty
    bundle_ref = ray.put((nodes, outdeg, indeg))

    def moments(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({c: pa.array([0.0], pa.float64())
                             for c in ("n", "sx", "sy", "sxx", "syy", "sxy")})
        nds, od, idg = ray.get(bundle_ref)
        x = od[np.searchsorted(nds, batch.column(src).to_numpy())]
        y = idg[np.searchsorted(nds, batch.column(dst).to_numpy())]
        return pa.table(
            {
                "n": pa.array([float(len(x))], pa.float64()),
                "sx": pa.array([float(x.sum())], pa.float64()),
                "sy": pa.array([float(y.sum())], pa.float64()),
                "sxx": pa.array([float((x * x).sum())], pa.float64()),
                "syy": pa.array([float((y * y).sum())], pa.float64()),
                "sxy": pa.array([float((x * y).sum())], pa.float64()),
            }
        )

    acc = dict.fromkeys(("n", "sx", "sy", "sxx", "syy", "sxy"), 0.0)
    for b in edges.map_batches(moments, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for c in acc:
            acc[c] += float(pa.compute.sum(b.column(c)).as_py() or 0.0)
    n = acc["n"]
    if n == 0:
        return empty
    vx = n * acc["sxx"] - acc["sx"] ** 2
    vy = n * acc["syy"] - acc["sy"] ** 2
    if vx <= 0 or vy <= 0:
        return pa.table(
            {"n_edges": pa.array([int(n)], _I64),
             "assortativity": pa.array([None], pa.float64())}
        )
    r = (n * acc["sxy"] - acc["sx"] * acc["sy"]) / np.sqrt(vx * vy)
    return pa.table(
        {"n_edges": pa.array([int(n)], _I64),
         "assortativity": pa.array([round(r + 1e-9, 4)], pa.float64())}
    )


def doc_link_edges_vardeg(sf_dir: str, *, k_max: int = 5) -> rd.Dataset:
    """Variable-out-degree variant of ``doc_link_edges``: doc i emits
    ``1 + (i % k_max)`` edges (same SQL-expressible target formula).
    ``doc_link_edges``' constant k makes every out-degree equal — fine
    for rank/reach analytics, degenerate (zero variance) for any
    degree-correlation statistic, which needs this graph."""
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id"])
    n = docs.count()

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        ids = ids[ids % _PR_SKIP != 0]
        cnt = 1 + (ids % k_max)
        s = np.repeat(ids, cnt)
        starts = np.zeros(len(cnt), np.int64)
        if len(cnt):
            np.cumsum(cnt[:-1], out=starts[1:])
        j = np.arange(len(s), dtype=np.int64) - np.repeat(starts, cnt)
        d = (s * _PR_MUL + j * _PR_ADD + 1) % n
        return pa.table({"src": pa.array(s, _I64), "dst": pa.array(d, _I64)})

    return docs.map_batches(emit, batch_format="pyarrow")


def link_degree_assortativity(sf_dir: str, *, k_max: int = 5) -> pa.Table:
    """Assortativity of the variable-degree deterministic link graph —
    hard DuckDB oracle via grouped degree CTEs + ``corr()``."""
    return degree_assortativity(doc_link_edges_vardeg(sf_dir, k_max=k_max))
