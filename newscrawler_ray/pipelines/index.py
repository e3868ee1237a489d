"""Inverted term index + index-backed search.

The reference's ``/search`` endpoint (``main.py:271-294``) scans every
stored row per query. At 100 TB a search service builds the index ONCE
and answers queries with point lookups — this module is that rebuild:

  build_term_index  — one tokenize pass emits per-doc-unique
                      (term_hash, doc_id) posting rows; postings land in
                      term-hash bucket directories (sorted by term so
                      row-group stats prune point lookups), each bucket
                      finished with an atomic ``_DONE`` marker (the
                      resumable-export discipline — reruns skip finished
                      buckets).
  search_index      — per query term: read ONLY its bucket with a
                      term_hash row filter (footer-stats pruning),
                      intersect the posting lists (numpy), then fetch +
                      RE-VERIFY the candidate docs with the exact
                      whole-word regex mask the scan search uses. The
                      verify step makes index search EQUAL the scan
                      (and its SQL oracle) even under word-hash prefix
                      collisions — index prunes, verify confirms.

Scale shape: the index build is one map + a bucket-partitioned write
(no global sort); postings per term are doc-list-sized and read on the
driver exactly like a search service's point lookup; the candidate
fetch is a broadcast semi-join over the doc table (candidate set is
query-result-sized).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.hashing import tokenize_word_hashes
from ..functions.io import read_clean

_I64 = pa.int64()


def _p(sf_dir: str, table: str) -> str:
    return str(Path(sf_dir) / f"{table}.parquet")


def build_term_index(
    sf_dir: str, out_dir: str | Path, *, n_buckets: int = 16
) -> pa.Table:
    """Build the bucket-partitioned posting index over documents.text.
    Returns the manifest (bucket, n_postings, skipped)."""
    import json

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    meta_path = out_dir / "_meta.json"
    if meta_path.exists():
        prev = json.loads(meta_path.read_text()).get("n_buckets")
        if prev != n_buckets:
            raise ValueError(
                f"index at {out_dir} was built with n_buckets={prev}; "
                f"rebuild into a fresh directory to change it to {n_buckets}"
            )
    else:
        meta_path.write_text(json.dumps({"n_buckets": n_buckets}))
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def postings(batch: pa.Table) -> pa.Table:
        flat, offsets = tokenize_word_hashes(batch.column("text"))
        ids = batch.column("doc_id").to_numpy()
        lens = np.diff(offsets)
        doc_of = np.repeat(ids, lens)
        pairs = np.stack([flat.view(np.int64), doc_of], axis=1)
        uniq = np.unique(pairs, axis=0)  # one posting per (term, doc)
        th = uniq[:, 0]
        return pa.table(
            {
                "term_hash": pa.array(th, _I64),
                "doc_id": pa.array(uniq[:, 1], _I64),
                "bucket": pa.array(
                    (th.view(np.uint64) % np.uint64(n_buckets)).astype(np.int64),
                    _I64,
                ),
            }
        )

    pending = [
        b
        for b in range(n_buckets)
        if not (out_dir / f"bucket={b}" / "_DONE").exists()
    ]
    if pending:
        import shutil

        for b in pending:  # partials from a crashed run rewrite cleanly
            shutil.rmtree(out_dir / f"bucket={b}", ignore_errors=True)
        rows = docs.map_batches(postings, batch_format="pyarrow")
        if len(pending) < n_buckets:
            cond = " or ".join(f"bucket == {b}" for b in pending)
            rows = rows.filter(expr=f"({cond})")
        # ONE parallel hive-partitioned write (all buckets at once);
        # the global sort puts term-contiguous row groups in every
        # bucket file so footer stats prune point lookups
        rows.sort(["bucket", "term_hash", "doc_id"]).write_parquet(
            str(out_dir), partition_cols=["bucket"]
        )
        for b in pending:
            bdir = out_dir / f"bucket={b}"
            bdir.mkdir(parents=True, exist_ok=True)  # zero-posting bucket
            (bdir / "_DONE").touch()  # marker written only after the data
    manifest = []
    for b in range(n_buckets):
        n = sum(
            pq.read_metadata(f).num_rows
            for f in (out_dir / f"bucket={b}").glob("*.parquet")
        )
        manifest.append((b, n, b not in pending))
    return pa.table(
        {
            "bucket": pa.array([m[0] for m in manifest], _I64),
            "n_postings": pa.array([m[1] for m in manifest], _I64),
            "skipped": pa.array([m[2] for m in manifest]),
        }
    )


def search_index(
    index_dir: str | Path,
    sf_dir: str,
    *,
    words: tuple[str, ...] = ("spark", "merge"),
    min_chars: int = 100,
) -> rd.Dataset:
    """Index-backed whole-word AND search — output identical to the scan
    search (``queries.search_keywords``) and its SQL oracle.

    The bucket count comes from the index's own ``_meta.json`` (never a
    caller guess — a mismatched modulus silently probed empty buckets in
    an earlier version). A multi-token query word ("spark-merge") prunes
    on the intersection of its tokens' posting lists — a superset of the
    phrase matches — and the exact regex verify confirms adjacency; a
    word with NO tokens contributes no pruning and is enforced by the
    verify regex alone."""
    import json

    import pyarrow.compute as pc

    from ..functions.joins import make_broadcast_semijoin_fn
    from ..functions.text import keyword_search_mask

    index_dir = Path(index_dir)
    meta_path = index_dir / "_meta.json"
    if not meta_path.exists():
        raise ValueError(f"no term index at {index_dir} (missing _meta.json)")
    n_buckets = int(json.loads(meta_path.read_text())["n_buckets"])

    empty = pa.table(
        {"doc_id": pa.array([], _I64), "source": pa.array([], pa.string()),
         "n_chars": pa.array([], _I64)}
    )
    cand: np.ndarray | None = None
    tokens = tokenize_word_hashes(list(words))[0].view(np.int64)
    for h in (int(t) for t in tokens):
        # uint64 bucket arithmetic, matching the build side exactly
        bucket = (h & 0xFFFFFFFFFFFFFFFF) % n_buckets
        bdir = index_dir / f"bucket={bucket}"
        if not (bdir / "_DONE").exists():
            raise ValueError(f"index bucket {bucket} at {index_dir} is not built")
        files = sorted(bdir.glob("*.parquet"))
        if not files:
            ids = np.empty(0, np.int64)
        else:
            t = pq.read_table(
                [str(f) for f in files],
                columns=["doc_id"],
                filters=[("term_hash", "==", h)],
            )
            ids = t.column("doc_id").to_numpy()
        cand = ids if cand is None else np.intersect1d(cand, ids)
        if len(cand) == 0:
            return rd.from_arrow(empty)  # no co-occurrence: skip the scan

    docs = read_clean(
        _p(sf_dir, "documents"), columns=["doc_id", "source", "n_chars", "text"]
    )
    if cand is not None:
        cand_ref = ray.put(pa.array(np.sort(cand), _I64))
        semi = make_broadcast_semijoin_fn("doc_id", cand_ref)
    else:  # no query word produced a token: index can't prune
        semi = None

    def verify(batch: pa.Table) -> pa.Table:
        if semi is not None:
            batch = semi(batch)
        # exact whole-word re-check: hash collisions prune wrong, never
        # emit wrong (same mask as the scan search)
        mask = keyword_search_mask(batch, list(words), ["text"])
        mask = pc.and_(mask, pc.greater_equal(batch.column("n_chars"), min_chars))
        return batch.filter(mask).select(["doc_id", "source", "n_chars"])

    return docs.map_batches(verify, batch_format="pyarrow")
