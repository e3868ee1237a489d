"""Connected components (large-star/small-star) + headline clustering.

Oracle: a driver-side union-find on the same edge list must produce the
identical node -> min-id-component labeling; planted headline groups must
come back as exactly the planted clusters.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from newscrawler_ray.pipelines.graph import (
    connected_components,
    headline_clusters,
)


def _edges_ds(pairs):
    a = [int(p[0]) for p in pairs]
    b = [int(p[1]) for p in pairs]
    return rd.from_arrow(
        pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})
    )


def _union_find_labels(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in pairs:
        a, b = int(a), int(b)
        if a == b:
            continue
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for x in sorted(nodes):
        comp_min.setdefault(find(x), x)
    return {x: comp_min[find(x)] for x in nodes}


def _cc_labels(pairs, small_edges=200_000):
    return {
        r["node"]: r["component"]
        for r in connected_components(
            _edges_ds(pairs), small_edges=small_edges
        ).take_all()
    }


def test_cc_matches_union_find_random(ray_session):
    rng = np.random.default_rng(7)
    pairs = rng.integers(0, 300, size=(220, 2)).tolist()
    expect = _union_find_labels(pairs)
    # both paths: single-task union-find AND distributed star rounds
    assert _cc_labels(pairs) == expect
    assert _cc_labels(pairs, small_edges=0) == expect


def test_cc_descending_chain_needs_rounds(ray_session):
    # worst-ish case for min propagation: a long path given in
    # max-to-min order, plus a second path interleaved; force the
    # distributed star path (small_edges=0)
    pairs = [(i + 1, i) for i in range(60)] + [(1000 + i, 1002 + i) for i in range(0, 40, 2)]
    labels = _cc_labels(pairs, small_edges=0)
    assert labels == _union_find_labels(pairs)
    assert set(labels[i] for i in range(61)) == {0}


def test_cc_self_loops_and_empty(ray_session):
    assert _cc_labels([(5, 5), (9, 9)]) == {}
    empty = _edges_ds([])
    assert connected_components(empty).take_all() == []


def test_headline_clusters_planted(ray_session, tmp_path):
    # 30 docs: planted cluster A = {0,1,2}, B = {10, 11}, rest unique salads
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(900)]
    texts = []
    for i in range(30):
        salad = " ".join(rng.choice(vocab, size=40))
        if i in (0, 1, 2):
            texts.append("alpha beta gamma delta epsilon zeta eta theta " + salad)
        elif i in (10, 11):
            texts.append("one two three four five six seven eight " + salad)
        else:
            texts.append(salad)
    t = pa.table(
        {"doc_id": pa.array(range(30), pa.int64()), "text": pa.array(texts)}
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")
    out = pa.concat_tables(
        headline_clusters(str(tmp_path)).iter_batches(batch_format="pyarrow")
    )
    by_cluster = {
        r["cluster_id"]: r["doc_ids"] for r in out.to_pylist()
    }
    assert by_cluster[0] == "0,1,2"
    assert by_cluster[10] == "10,11"
    assert out.num_rows == 30 - 2 - 1  # 27 clusters
    # representative headline comes from the min doc of the cluster
    heads = {r["cluster_id"]: r["headline"] for r in out.to_pylist()}
    assert heads[0] == "alpha beta gamma delta epsilon zeta eta theta"
    assert heads[10] == "one two three four five six seven eight"


def test_headline_clusters_no_pairs_all_singletons(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(4000)]
    texts = [" ".join(rng.choice(vocab, size=20, replace=False)) for _ in range(12)]
    t = pa.table(
        {"doc_id": pa.array(range(12), pa.int64()), "text": pa.array(texts)}
    )
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")
    out = pa.concat_tables(
        headline_clusters(str(tmp_path)).iter_batches(batch_format="pyarrow")
    )
    assert out.num_rows == 12
    assert out.column("n_docs").to_pylist() == [1] * 12


def test_cc_star_path_moderate_graph_bounded(ray_session):
    """The distributed star path must stay vectorized: ~25k edges with
    chains + a random giant component converge in bounded time (round 2:
    per-node map_groups made this path minutes at these sizes) and match
    the driver union-find exactly."""
    import time

    rng = np.random.default_rng(9)
    pairs = [(i * 6 + o + 1, i * 6 + o) for i in range(2000) for o in range(4)]
    pairs += list(
        zip(
            rng.integers(100_000, 112_000, size=17_000).tolist(),
            rng.integers(100_000, 112_000, size=17_000).tolist(),
        )
    )
    t0 = time.monotonic()
    labels = _cc_labels(pairs, small_edges=0)
    elapsed = time.monotonic() - t0
    assert labels == _union_find_labels(pairs)
    assert elapsed < 240


# --------------------------------------------------------------- pagerank


def _pagerank_dense(pairs, n_iter=5, damping=0.85):
    """Driver-side dense reference: same multiset/self-loop/dangling
    semantics as the distributed kernel."""
    from collections import Counter

    nodes = sorted({int(a) for a, _ in pairs} | {int(b) for _, b in pairs})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = Counter(int(a) for a, _ in pairs)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        w = {u: damping * r[idx[u]] / d for u, d in deg.items()}
        nxt = np.zeros(n)
        for a, b in pairs:
            nxt[idx[int(b)]] += w[int(a)]
        dang = sum(r[idx[v]] for v in nodes if v not in deg)
        nxt += (1.0 - damping) / n + damping * dang / n
        r = nxt
    return dict(zip(nodes, r))


def _pr_ds(pairs, **kw):
    from newscrawler_ray.pipelines.graph import pagerank

    a = [int(p[0]) for p in pairs]
    b = [int(p[1]) for p in pairs]
    ds = rd.from_arrow(
        pa.table({"src": pa.array(a, pa.int64()), "dst": pa.array(b, pa.int64())})
    )
    out = pagerank(ds, **kw).to_pandas()
    return dict(zip(out["node"].tolist(), out["rank"].tolist()))


def test_pagerank_cycle_uniform(ray_session):
    """A k-cycle is rank-regular: every node gets exactly 1/k."""
    pairs = [(i, (i + 1) % 5) for i in range(5)]
    got = _pr_ds(pairs)
    assert set(got) == set(range(5))
    for v in got.values():
        assert abs(v - 0.2) < 1e-12


def test_pagerank_matches_dense_reference(ray_session):
    """Random multigraph with self-loops, duplicate edges, and dangling
    nodes: distributed ranks == dense driver reference, and ranks sum
    to 1 (dangling mass redistributed)."""
    rng = np.random.default_rng(17)
    pairs = list(
        zip(rng.integers(0, 120, 600).tolist(), rng.integers(0, 150, 600).tolist())
    )
    pairs += [(5, 5), (5, 5), (7, 9), (7, 9)]  # self-loops + duplicates
    got = _pr_ds(pairs)
    ref = _pagerank_dense(pairs)
    assert set(got) == set(ref)
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-12, k
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_dangling_sink(ray_session):
    """Two sources point at one sink with no out-edges: the sink
    accumulates the most rank and total mass stays 1."""
    pairs = [(1, 3), (2, 3)]
    got = _pr_ds(pairs)
    assert got[3] > got[1] == got[2]
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_empty(ray_session):
    from newscrawler_ray.pipelines.graph import pagerank

    ds = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    out = pagerank(ds)
    assert out.count() == 0
    assert out.schema().names == ["node", "rank"]


def test_crawl_pagerank_matches_dense_reference(ray_session, fixture_dir, tmp_path):
    """The crawl->PageRank composition must equal a dense driver
    reference computed from the fixtures' ground-truth links table
    restricted to the crawled 200-status world (same canonicalization),
    and the emitted top-k must be rank-sorted."""
    import glob

    import pyarrow.parquet as pq

    from newscrawler_ray.functions.urls import canonicalize_batch
    from newscrawler_ray.pipelines.crawl import run_crawl
    from newscrawler_ray.pipelines.graph import crawl_pagerank

    out = tmp_path / "crawl_pr"
    run_crawl(fixture_dir, out, n_seen_shards=2, n_frontier_shards=2,
              checkpoint=False, collect_seen=False)

    got = crawl_pagerank(out, fixture_dir, k_top=30).to_pandas()
    assert len(got) == 30
    assert got["rank"].tolist() == sorted(got["rank"].tolist(), reverse=True)

    # ground-truth edges: links of crawled-200 srcs whose dst was crawled
    waves = pa.concat_tables(
        pq.read_table(f, columns=["url", "url_hash", "status"])
        for f in glob.glob(str(out / "waves" / "**" / "*.parquet"), recursive=True)
    )
    ok = waves.filter(pa.compute.equal(waves.column("status"), 200))
    hash_of = dict(zip(ok.column("url").to_pylist(),
                       ok.column("url_hash").to_pylist()))
    crawled = set(hash_of.values())
    links = pq.read_table(fixture_dir / "links.parquet")
    _, _, src_h = canonicalize_batch(links.column("src_url").combine_chunks())
    _, _, dst_h = canonicalize_batch(links.column("dst_url").combine_chunks())
    pairs = [
        (int(s), int(d))
        for s, d in zip(src_h.tolist(), dst_h.tolist())
        if s in crawled and d in crawled
    ]
    ref = _pagerank_dense(pairs)
    top_ref = sorted(
        ((round(r + 1e-9, 8), n) for n, r in ref.items()),
        key=lambda t: (-t[0], t[1]),
    )[:30]
    # selection ties break by node (url_hash); the returned rows order by
    # url — canonicalize both sides to (-rank, node) before comparing
    got_pairs = sorted(
        ((float(r), hash_of[u]) for u, r in zip(got["url"], got["rank"])),
        key=lambda t: (-t[0], t[1]),
    )
    assert got_pairs == [(r, n) for r, n in top_ref]


def test_hits_matches_dense_reference(ray_session):
    """HITS on a random multigraph equals a dense driver reference
    (same half-step ordering and L2 normalization); a pure hub (only
    out-edges) gets authority 0, a pure sink gets hub 0."""
    from newscrawler_ray.pipelines.graph import hits

    rng = np.random.default_rng(23)
    pairs = list(
        zip(rng.integers(0, 60, 300).tolist(), rng.integers(20, 90, 300).tolist())
    )
    pairs += [(100, 30), (100, 31), (32, 101)]  # pure hub 100, pure sink 101
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(5):
        a = np.zeros(n)
        for u, v in pairs:
            a[idx[v]] += h[idx[u]]
        a /= np.sqrt((a * a).sum())
        h = np.zeros(n)
        for u, v in pairs:
            h[idx[u]] += a[idx[v]]
        h /= np.sqrt((h * h).sum())

    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )
    got = hits(ds).to_pandas().set_index("node")
    assert sorted(got.index.tolist()) == nodes
    for v in nodes:
        assert abs(got.loc[v, "authority"] - a[idx[v]]) < 1e-12
        assert abs(got.loc[v, "hub"] - h[idx[v]]) < 1e-12
    assert got.loc[100, "authority"] == 0.0
    assert got.loc[101, "hub"] == 0.0


def test_pagerank_large_graph_bounded(ray_session):
    """Scale shape check: ~300k multiset edges over 60k nodes (Zipf-ish
    targets, 10% dangling) complete 5 iterations in bounded time, ranks
    sum to 1, and the top node by rank has the most in-links from
    high-degree sources (sanity, not a full dense replay)."""
    import time

    from newscrawler_ray.pipelines.graph import pagerank

    rng = np.random.default_rng(31)
    n = 60_000
    src = rng.integers(0, int(n * 0.9), 300_000)  # top 10% of ids never emit
    dst = (rng.zipf(1.3, 300_000) - 1) % n
    ds = rd.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    ).repartition(8)
    t0 = time.monotonic()
    out = pagerank(ds).to_pandas()
    elapsed = time.monotonic() - t0
    assert abs(out["rank"].sum() - 1.0) < 1e-6
    assert len(out) == len(set(src.tolist()) | set(dst.tolist()))
    # node 0 receives by far the most zipf mass -> must be top-ranked
    assert out.sort_values("rank", ascending=False).iloc[0]["node"] == 0
    assert elapsed < 180


def test_triangle_count_planted_clique(ray_session):
    from datetime import datetime

    from newscrawler_ray.pipelines.graph import triangle_count

    day = datetime(2024, 3, 1, 12, 0, 0)
    other = datetime(2024, 3, 2, 12, 0, 0)
    rows = []
    # users 1,2,3: purchases in the same (day, floor(value)) bucket ->
    # 3-clique -> exactly one triangle
    for u in (1, 2, 3):
        rows.append({"user_id": u, "event_type": "purchase", "ts": day, "value": 7.4})
    # users 4,5 share a different bucket -> one extra edge, no triangle
    for u in (4, 5):
        rows.append({"user_id": u, "event_type": "purchase", "ts": other, "value": 3.2})
    # noise: non-purchase events and a lone purchaser never create edges
    rows.append({"user_id": 1, "event_type": "click", "ts": other, "value": 3.2})
    rows.append({"user_id": 9, "event_type": "purchase", "ts": other, "value": 50.0})
    # duplicate purchases in the same bucket must not inflate the count
    rows.append({"user_id": 2, "event_type": "purchase", "ts": day, "value": 7.9})
    ev = rd.from_items(rows).repartition(4)
    out = triangle_count("unused", events=ev, num_partitions=4)
    assert out.column("n_edges").to_pylist() == [4]
    assert out.column("n_triangles").to_pylist() == [1]


def test_bfs_depth_planted(ray_session):
    """Hand graph: shortest path wins when two routes reach a node,
    edges are DIRECTED, the depth cap prunes, and isolated seeds stay
    at depth 0."""
    import pyarrow as pa
    import ray.data as rd

    from newscrawler_ray.pipelines.graph import bfs_depth

    #   0 -> 1 -> 2 -> 3 -> 4 -> 5 -> 6 -> 7   (chain)
    #   0 -> 9 -> 3                            (shortcut: 3 at depth 2)
    #   8 -> 0                                 (into the seed, not out)
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 2, 3, 4, 5, 6, 0, 9, 8], pa.int64()),
                "dst": pa.array([1, 2, 3, 4, 5, 6, 7, 9, 3, 0], pa.int64()),
            }
        )
    ).repartition(4)
    out = {
        r["node"]: r["depth"]
        for r in bfs_depth(edges, [0, 100], max_depth=4).take_all()
    }
    assert out == {
        0: 0, 100: 0,          # seeds (100 isolated)
        1: 1, 9: 1,
        2: 2, 3: 2,            # shortcut beats the 3-hop chain route
        4: 3, 5: 4,            # capped at max_depth=4: 6, 7 absent
    }
    assert 8 not in out  # directed: in-edge to the seed doesn't reach 8


def test_degree_assortativity_planted(ray_session):
    """Hand graph with known correlation (-0.5 by hand computation);
    constant degree sequences (a pure star) yield null, not NaN."""
    import pyarrow as pa
    import ray.data as rd

    from newscrawler_ray.pipelines.graph import degree_assortativity

    def edge_ds(srcs, dsts):
        return rd.from_arrow(
            pa.table(
                {"src": pa.array(srcs, pa.int64()),
                 "dst": pa.array(dsts, pa.int64())}
            )
        ).repartition(3)

    # x = outdeg(src) = [2, 2, 1]; y = indeg(dst) = [2, 1, 2] -> r = -0.5
    out = degree_assortativity(edge_ds([0, 0, 3], [1, 2, 1]))
    assert out.column("n_edges").to_pylist() == [3]
    assert out.column("assortativity").to_pylist() == [-0.5]

    # star 0 -> {1,2,3}: both degree sequences constant -> undefined
    out = degree_assortativity(edge_ds([0, 0, 0], [1, 2, 3]))
    assert out.column("n_edges").to_pylist() == [3]
    assert out.column("assortativity").to_pylist() == [None]
