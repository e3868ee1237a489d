"""Similarity search over an embedding column (training-data ops).

``knn_topk``  — brute-force cosine top-k: per-batch numpy matmul against a
               broadcast query matrix, per-batch top-k prune, tiny global
               merge. The per-batch prune means only ``k`` candidate rows
               per batch reach the final sort — the pattern that holds at
               100 TB (the full corpus never concentrates anywhere).
``ivf_*``     — IVF-bucketed approximate variant: deterministic coarse
               centroids (seeded k-means on a sample), vectors assigned to
               cells, queries probe the ``nprobe`` nearest cells only.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ..functions.io import read_clean


def _p(sf_dir: str, table: str) -> str:
    return str(Path(sf_dir) / f"{table}.parquet")


def _norm(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def emb_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from a ``list<float>`` Arrow column without
    per-row Python (flatten -> one numpy view -> reshape)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = col.flatten()
    return flat.to_numpy(zero_copy_only=False).astype(np.float64).reshape(n, -1)


def _load_query(sf_dir: str, query_vec_id: int) -> np.ndarray:
    """Filtered read of ONE query vector (row-group predicate pushdown) —
    never the whole embeddings table on the driver."""
    t = pq.read_table(
        _p(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", query_vec_id)],
    )
    return emb_matrix(t.column("embedding"))[0]


def knn_topk(sf_dir: str, *, query_vec_id: int = 0, k: int = 10) -> pa.Table:
    """Exact cosine top-k vs one query vector (brute-force baseline)."""
    q = _norm(_load_query(sf_dir, query_vec_id))
    q_ref = ray.put(q)
    ds = read_clean(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def batch_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = batch.column("vec_id").to_numpy()
        E = _norm(emb_matrix(batch.column("embedding")))
        sims = E @ qv
        mask = ids != query_vec_id
        ids, sims = ids[mask], sims[mask]
        # tie-break by vec_id ASC within equal sims (matches the oracle's
        # ORDER BY sim DESC, vec_id) so ties never prune a true top-k row
        top = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {"vec_id": pa.array(ids[top], pa.int64()), "sim": pa.array(sims[top])}
        )

    parts = ds.map_batches(batch_topk, batch_format="pyarrow")
    rows = parts.sort(["sim", "vec_id"], descending=[True, False]).limit(k).take_all()
    return pa.table({"vec_id": pa.array([r["vec_id"] for r in rows], pa.int64())})


def knn_multi(
    sf_dir: str, *, n_queries: int = 5, k: int = 5
) -> pa.Table:
    """Multi-query brute-force top-k: every batch is matmul-ed against a
    BROADCAST QUERY MATRIX (one numpy GEMM per batch, all queries at
    once); per-batch top-k per query pruned before the tiny global merge.
    This is the shape that scales: queries ship once, batches stream."""
    # driver reads the thin id column to pick the queries, then a
    # FILTERED read of just those rows — never the whole embedding column
    ids_only = pq.read_table(_p(sf_dir, "embeddings"), columns=["vec_id"])
    all_ids = ids_only.column("vec_id").to_numpy()
    q_ids = np.sort(all_ids)[:n_queries]
    t = pq.read_table(
        _p(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", q_ids.tolist())],
    )
    order = np.argsort(t.column("vec_id").to_numpy())
    q_ids = t.column("vec_id").to_numpy()[order]
    Q = _norm(emb_matrix(t.column("embedding"))[order])
    q_ref = ray.put((q_ids, Q))

    ds = read_clean(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def batch_topk(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        bids = batch.column("vec_id").to_numpy()
        B = _norm(emb_matrix(batch.column("embedding")))
        sims = B @ qm.T  # (batch, n_queries) — one GEMM
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qids):
            mask = bids != qid
            cand_ids, cand_sims = bids[mask], sims[mask, j]
            top = np.lexsort((cand_ids, -cand_sims))[:k]
            out_q.extend([int(qid)] * len(top))
            out_v.extend(cand_ids[top].tolist())
            out_s.extend(cand_sims[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s),
            }
        )

    parts = ds.map_batches(batch_topk, batch_format="pyarrow")
    rows = parts.sort(["query_id", "sim", "vec_id"], descending=[False, True, False]).take_all()
    out_q, out_v, seen_count = [], [], {}
    for r in rows:
        c = seen_count.get(r["query_id"], 0)
        if c < k:
            out_q.append(r["query_id"])
            out_v.append(r["vec_id"])
            seen_count[r["query_id"]] = c + 1
    return pa.table(
        {"query_id": pa.array(out_q, pa.int64()), "vec_id": pa.array(out_v, pa.int64())}
    )


# ------------------------------------------------------------------ IVF


def ivf_build(
    sf_dir: str,
    *,
    n_cells: int = 16,
    iters: int = 3,
    seed: int = 42,
    train_max: int = 8192,
    ds: rd.Dataset | None = None,
    id_col: str = "vec_id",
):
    """Deterministic coarse quantizer: seeded k-means on a TRAINING
    SAMPLE drawn distributedly (hash-of-id modulus inside
    ``map_batches`` — deterministic regardless of block layout, unlike
    ``random_sample``), so only ~``train_max`` vectors ever reach the
    driver. The centroid matrix is tiny (n_cells x d) and broadcasts.
    Pass ``ds`` (int64 ``id_col`` + ``embedding``) to train over any
    vector source, e.g. image embeddings, instead of the sf_dir table."""
    from ..functions.hashing import splitmix64

    if ds is None:
        ds = read_clean(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    n_rows = ds.count()
    mod = max(1, n_rows // train_max)

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().view(np.uint64)
        keep = (splitmix64(ids + np.uint64(seed)) % np.uint64(mod)) == 0
        return batch.filter(pa.array(keep))

    rows = ds.map_batches(sample, batch_format="pyarrow").take_all()
    E = _norm(
        np.array([r["embedding"] for r in sorted(rows, key=lambda r: r[id_col])],
                 dtype=np.float64)
    )
    rng = np.random.default_rng(seed)
    cents = E[rng.choice(len(E), size=min(n_cells, len(E)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(E @ cents.T, axis=1)
        for c in range(len(cents)):
            member = E[assign == c]
            if len(member):
                cents[c] = _norm(member.mean(axis=0))
    return cents


def knn_ivf(
    sf_dir: str, *, query_vec_id: int = 0, k: int = 10, n_cells: int = 16, nprobe: int = 8
) -> pa.Table:
    """Approximate top-k: only vectors in the ``nprobe`` nearest cells are
    scored. Recall vs brute force is asserted in tests. NOTE: on corpora
    with real cluster structure nprobe/n_cells can be far smaller; the
    driver testdata embeddings are near-uniform, so recall ~ nprobe/n_cells."""
    cents = ivf_build(sf_dir, n_cells=n_cells)
    q = _norm(_load_query(sf_dir, query_vec_id))
    probe_cells = set(np.argsort(-(cents @ q))[:nprobe].tolist())
    refs = ray.put((cents, q, probe_cells))
    ds = read_clean(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def batch_topk(batch: pa.Table) -> pa.Table:
        c, qv, probes = ray.get(refs)
        ids = batch.column("vec_id").to_numpy()
        E = _norm(emb_matrix(batch.column("embedding")))
        cells = np.argmax(E @ c.T, axis=1)
        mask = np.isin(cells, list(probes)) & (ids != query_vec_id)
        ids, E = ids[mask], E[mask]
        sims = E @ qv
        top = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {"vec_id": pa.array(ids[top], pa.int64()), "sim": pa.array(sims[top])}
        )

    parts = ds.map_batches(batch_topk, batch_format="pyarrow")
    rows = parts.sort(["sim", "vec_id"], descending=[True, False]).limit(k).take_all()
    return pa.table({"vec_id": pa.array([r["vec_id"] for r in rows], pa.int64())})


def kmeans_assign(
    sf_dir: str,
    *,
    n_cells: int = 16,
    iters: int = 3,
    full_iters: int = 3,
    seed: int = 42,
    return_centroids: bool = False,
    ds: rd.Dataset | None = None,
    id_col: str = "vec_id",
):
    """Distributed spherical k-means over the FULL embeddings table
    (SemDeDup-style corpus clustering: cluster once, then dedup/curate
    within clusters). ``ivf_build``'s sample-trained centroids seed the
    loop; each Lloyd iteration is ONE streaming pass — every batch emits
    (n_cells x d) partial centroid sums + counts, the driver folds the
    batch partials (centroid-sized, NOT data-sized) and renormalizes.
    Deterministic: seeded init, argmax ties break to the lowest cell id.

    Output: (vec_id, cluster, sim) for every vector — assignment under
    the final centroids (also returned when ``return_centroids``).
    Iterative -> rows-only for the driver; the pytest oracle checks
    assignment optimality against the returned centroids exactly, plus
    determinism and Lloyd objective improvement. Partial folds happen
    in bkey order so reruns are bit-identical at a fixed batch layout.
    """
    if ds is None:
        ds = read_clean(
            _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
        )
    cents = ivf_build(
        sf_dir, n_cells=n_cells, iters=iters, seed=seed, ds=ds, id_col=id_col
    )

    for _ in range(full_iters):
        ref = ray.put(cents)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            C = ray.get(_ref)
            E = _norm(emb_matrix(batch.column("embedding")))
            if len(E) == 0:
                k, d = C.shape
                return pa.table(
                    {"cell": pa.array([], pa.int64()),
                     "cnt": pa.array([], pa.int64()),
                     "vsum": pa.array([], pa.binary())}
                )
            assign = np.argmax(E @ C.T, axis=1)
            k, d = C.shape
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, assign, E)
            cnt = np.bincount(assign, minlength=k).astype(np.int64)
            bkey = int(batch.column(id_col).to_numpy().min())
            return pa.table(
                {
                    "bkey": pa.array(np.full(k, bkey, dtype=np.int64)),
                    "cell": pa.array(np.arange(k, dtype=np.int64)),
                    "cnt": pa.array(cnt),
                    "vsum": pa.array(
                        [sums[c].tobytes() for c in range(k)], pa.binary()
                    ),
                }
            )

        k, d = cents.shape
        tot_cnt = np.zeros(k, dtype=np.int64)
        tot_sum = np.zeros((k, d), dtype=np.float64)
        # fold batch partials in bkey order: batch ARRIVAL order varies
        # run to run, and float summation order must not (determinism
        # invariant); the fold itself stays centroid-sized
        partials: list[tuple[int, np.ndarray, np.ndarray, list]] = []
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            if b.num_rows == 0:
                continue
            partials.append(
                (
                    int(b.column("bkey")[0].as_py()),
                    b.column("cell").to_numpy(),
                    b.column("cnt").to_numpy(),
                    b.column("vsum").to_pylist(),
                )
            )
        for _, cells, cnts, vsums in sorted(partials, key=lambda p: p[0]):
            tot_cnt[cells] += cnts
            for i, c in enumerate(cells.tolist()):
                tot_sum[c] += np.frombuffer(vsums[i], dtype=np.float64)
        nonzero = tot_cnt > 0
        cents = cents.copy()
        cents[nonzero] = _norm(tot_sum[nonzero] / tot_cnt[nonzero, None])

    final_ref = ray.put(cents)

    def assign_rows(batch: pa.Table) -> pa.Table:
        C = ray.get(final_ref)
        E = _norm(emb_matrix(batch.column("embedding")))
        if len(E) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "cluster": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        sims = E @ C.T
        assign = np.argmax(sims, axis=1)
        best = np.round(sims[np.arange(len(E)), assign] + 1e-9, 4)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(assign.astype(np.int64)),
                "sim": pa.array(best, pa.float64()),
            }
        )

    out = ds.map_batches(assign_rows, batch_format="pyarrow")
    return (out, cents) if return_centroids else out


# ------------------------------------------------------------------- PQ


def pq_train(
    sf_dir: str,
    *,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    train_max: int = 8192,
    ds: rd.Dataset | None = None,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Product-quantization codebooks (Jégou, Douze, Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split the d
    dims into ``m`` subspaces and k-means each on the SAME deterministic
    hash-sample ``ivf_build`` trains on (only ~train_max vectors reach
    the driver; the codebook is (m, n_codes, d/m) — kilobytes).

    At 10^10 vectors the 1-byte-per-subspace codes are what stays hot
    (m bytes/vector vs 8d raw — 64x smaller at d=64, m=8); raw vectors
    are touched only to refine. Returns the codebook array."""
    from ..functions.hashing import splitmix64

    if ds is None:
        ds = read_clean(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    n_rows = ds.count()
    mod = max(1, n_rows // train_max)

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().view(np.uint64)
        keep = (splitmix64(ids + np.uint64(seed)) % np.uint64(mod)) == 0
        return batch.filter(pa.array(keep))

    rows = ds.map_batches(sample, batch_format="pyarrow").take_all()
    E = _norm(
        np.array(
            [r["embedding"] for r in sorted(rows, key=lambda r: r[id_col])],
            dtype=np.float64,
        )
    )
    n, d = E.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, n_codes, sub), np.float64)
    for j in range(m):
        X = E[:, j * sub : (j + 1) * sub]
        cents = X[rng.choice(n, size=min(n_codes, n), replace=False)]
        for _ in range(5):
            d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                member = X[assign == c]
                if len(member):
                    cents[c] = member.mean(axis=0)
        books[j, : len(cents)] = cents
    return books


def _pq_codes(E: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: per-subspace nearest codeword (L2)."""
    n, d = E.shape
    m, n_codes, sub = books.shape
    codes = np.zeros((n, m), np.uint8)
    for j in range(m):
        X = E[:, j * sub : (j + 1) * sub]
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
        d2 = -2.0 * (X @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_encode(
    sf_dir: str,
    *,
    m: int = 8,
    n_codes: int = 16,
    books: np.ndarray | None = None,
) -> rd.Dataset:
    """Encode every vector to its m-byte PQ code (one streaming pass,
    broadcast codebook). Output: (vec_id, code binary[m])."""
    if books is None:
        books = pq_train(sf_dir, m=m, n_codes=n_codes)
    ref = ray.put(books)
    ds = read_clean(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def encode(batch: pa.Table) -> pa.Table:
        B = ray.get(ref)
        E = _norm(emb_matrix(batch.column("embedding")))
        if len(E) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "code": pa.array([], pa.binary())}
            )
        codes = _pq_codes(E, B)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "code": pa.array([c.tobytes() for c in codes], pa.binary()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def knn_pq(
    sf_dir: str,
    *,
    query_vec_id: int = 0,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    refine: int | None = None,
    ds: rd.Dataset | None = None,
    query: np.ndarray | None = None,
) -> pa.Table:
    """Approximate top-k via asymmetric distance computation: per batch,
    approx sim = sum over subspaces of a (m, n_codes) query lookup table
    indexed by the batch's codes (no GEMM against raw vectors), then the
    per-batch top-``refine`` candidates are EXACT-rescored in place (the
    raw rows are in the same batch — zero extra reads) before the tiny
    global merge. Recall vs brute force is asserted in tests.

    The 100 TB shape: the ADC scan touches m bytes/vector; exact
    rescoring touches raw floats for only refine rows per batch.

    Pass ``ds`` ((vec_id int64, embedding) from any vector source, e.g.
    the image tower) and ``query`` (the query vector) to search a
    non-sf_dir corpus — then NO id is excluded (``query_vec_id`` only
    masks the query row when the query was loaded by id; an external
    caller owns its own exclusion, and vec_id 0 must stay searchable)."""
    refine = refine or 8 * k
    if ds is None:
        ds = read_clean(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    exclude_id = query_vec_id if query is None else None
    books = pq_train(sf_dir, m=m, n_codes=n_codes, ds=ds)
    q = _norm(query if query is not None else _load_query(sf_dir, query_vec_id))
    mm, ncod, sub = books.shape
    # lookup[j][c] = q_j . book[j][c] -> approx cosine = sum_j lookup[j][code_j]
    lut = np.einsum("jc,jkc->jk", q.reshape(mm, sub), books)
    ref = ray.put((books, lut, q))

    def batch_topk(batch: pa.Table) -> pa.Table:
        B, L, qv = ray.get(ref)
        ids = batch.column("vec_id").to_numpy()
        E = _norm(emb_matrix(batch.column("embedding")))
        if exclude_id is not None:
            mask = ids != exclude_id
            ids, E = ids[mask], E[mask]
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        codes = _pq_codes(E, B)
        approx = L[np.arange(L.shape[0])[None, :], codes].sum(axis=1)
        cand = np.lexsort((ids, -approx))[:refine]
        sims = E[cand] @ qv  # exact rescoring, in-batch rows only
        top = np.lexsort((ids[cand], -sims))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[cand][top], pa.int64()),
                "sim": pa.array(sims[top], pa.float64()),
            }
        )

    parts = ds.map_batches(batch_topk, batch_format="pyarrow")
    rows = parts.sort(["sim", "vec_id"], descending=[True, False]).limit(k).take_all()
    return pa.table({"vec_id": pa.array([r["vec_id"] for r in rows], pa.int64())})
