"""Model-in-the-loop curation: train a linear quality classifier ON the
engine, then score the corpus with it.

The CCNet/Dolma pattern: a cheap hand-written gate (here the composite
``textstats`` quality score) weak-labels the corpus, a hashed
bag-of-words logistic regression distills the gate into a model, and
the MODEL becomes the reusable curation signal (fastText-style quality
classifiers are exactly this shape). Everything is expressed as Ray
Data passes:

  * features — hashed unigram term frequencies (the shared tokenizer;
    ``hash % dim`` feature buckets, no vocabulary state anywhere),
    computed ONCE into a materialized feature dataset (list<int64>
    bucket column + dense floats + weak label). Tokenization and the
    weak-label gate are the expensive part of an epoch; recomputing
    them ``epochs`` times cost ~30x what the linear algebra does.
    The features are about the size of the tokenized corpus, so at
    100 TB the materialized dataset spills through the object store —
    the standard featurize-then-iterate tradeoff (spill I/O per epoch
    vs full re-tokenization per epoch);
  * training — full-batch gradient descent, one streaming pass per
    epoch over the FEATURE blocks: every block emits a model-sized
    dense gradient partial (``np.add.at`` scatter) + loss, the driver
    folds partials in bkey order (the ``kmeans_assign`` determinism
    discipline: float summation order must not depend on block ARRIVAL
    order) and steps;
  * scoring — one broadcast-model pass over the same feature blocks.

Driver state is model-sized (dim+1 floats, ~0.5 MB at dim=2^16) — the
same class as the unigram LM broadcast; gradients fold tree-style at
cluster scale. No labels, embeddings or text ever concentrate.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import tokenize_word_hashes, word_hashes
from ..functions.io import read_clean

_I64 = pa.int64()


def _p(sf_dir: str, table: str) -> str:
    return str(Path(sf_dir) / f"{table}.parquet")


def _doc_features(batch: pa.Table, dim: int):
    """(buckets, doc_of, inv_len, dense, n_docs): hashed-unigram tf
    features plus three dense features — length, punctuation ratio and
    mean word length. tf is length-normalized, so without the dense
    block the model is length-blind and the (length-heavy) gate is
    unlearnable; a real fastText-style quality classifier carries the
    same dense side-features."""
    import pyarrow.compute as pc

    texts = batch.column("text")
    flat, offsets = tokenize_word_hashes(texts)
    lens = np.diff(offsets)
    n_docs = batch.num_rows
    buckets = (flat % np.uint64(dim)).astype(np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    inv_len = 1.0 / np.maximum(lens, 1)
    nc = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    npu = (
        pc.count_substring_regex(texts, r"[^\w\s]")
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    dense = np.stack(
        [
            np.clip(nc / 500.0, 0, 1),
            np.clip(npu / np.maximum(nc, 1), 0, 1),
            np.clip(nc / np.maximum(lens, 1) / 8.0, 0, 1),
        ],
        axis=1,
    )
    return buckets, doc_of, inv_len, dense, n_docs


def _weak_labels(batch: pa.Table, stop_en: np.ndarray, threshold: float):
    from .textstats import quality_batch

    q = quality_batch(batch, stop_en).column("quality").to_numpy()
    return (q >= threshold).astype(np.float64)


def quality_classifier_scores(
    sf_dir: str,
    *,
    dim: int = 1 << 16,
    epochs: int = 30,
    lr: float = 10.0,
    threshold: float = 0.55,
    return_history: bool = False,
):
    """Train the distilled quality classifier and score every document.

    Output: (doc_id, prob, weak_label) — prob rounded to 4 (+1e-9
    nudge); ``return_history`` additionally returns the per-epoch mean
    log-loss list (monotone-ish decrease asserted in tests). Rows-only
    for the driver: iterative training is not SQL-expressible; the
    pytest oracle checks loss decrease, agreement with the weak labels,
    and rerun determinism."""
    from .textstats import _LANG_STOPWORDS

    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    stop_en = np.sort(word_hashes(sorted(_LANG_STOPWORDS["en"])))
    n_dense = 3

    def featurize(batch: pa.Table) -> pa.Table:
        buckets, doc_of, inv_len, dense, n_docs = _doc_features(batch, dim)
        y = _weak_labels(batch, stop_en, threshold)
        lens = np.bincount(doc_of, minlength=n_docs) if n_docs else np.zeros(0, np.int64)
        offsets = np.zeros(n_docs + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "buckets": pa.LargeListArray.from_arrays(
                    pa.array(offsets, pa.int64()), pa.array(buckets, _I64)
                ),
                "inv_len": pa.array(inv_len, pa.float64()),
                "d0": pa.array(dense[:, 0], pa.float64()),
                "d1": pa.array(dense[:, 1], pa.float64()),
                "d2": pa.array(dense[:, 2], pa.float64()),
                "y": pa.array(y, pa.float64()),
            }
        )

    feats = docs.map_batches(featurize, batch_format="pyarrow").materialize()

    def _unpack(batch: pa.Table):
        """Zero-copy-ish rebuild of (buckets, doc_of, inv_len, dense, y)
        from a feature block (slice-safe: offsets are rebased)."""
        ll = batch.column("buckets").combine_chunks()
        offs = ll.offsets.to_numpy()
        vals = ll.values.to_numpy(zero_copy_only=False)[offs[0] : offs[-1]]
        lens = np.diff(offs)
        doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        inv_len = batch.column("inv_len").to_numpy()
        dense = np.stack(
            [batch.column(c).to_numpy() for c in ("d0", "d1", "d2")], axis=1
        )
        return vals, doc_of, inv_len, dense, batch.column("y").to_numpy()

    w = np.zeros(dim + n_dense + 1, np.float64)  # [hashed..., dense..., bias]
    history: list[float] = []

    for _ in range(epochs):
        ref = ray.put(w)

        def grad_partial(batch: pa.Table, _ref=ref) -> pa.Table:
            wv = ray.get(_ref)
            n_docs = batch.num_rows
            if n_docs == 0:
                return pa.table(
                    {"bkey": pa.array([], _I64), "n": pa.array([], _I64),
                     "loss": pa.array([], pa.float64()),
                     "grad": pa.array([], pa.binary())}
                )
            buckets, doc_of, inv_len, dense, y = _unpack(batch)
            z = (
                np.bincount(
                    doc_of, weights=wv[buckets] * inv_len[doc_of], minlength=n_docs
                )
                + dense @ wv[dim : dim + n_dense]
                + wv[dim + n_dense]
            )
            p = 1.0 / (1.0 + np.exp(-z))
            g = p - y
            grad = np.zeros(dim + n_dense + 1, np.float64)
            np.add.at(grad, buckets, (g * inv_len)[doc_of])
            grad[dim : dim + n_dense] = dense.T @ g
            grad[dim + n_dense] = g.sum()
            eps = 1e-12
            loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
            bkey = int(batch.column("doc_id").to_numpy().min())
            return pa.table(
                {
                    "bkey": pa.array([bkey], _I64),
                    "n": pa.array([n_docs], _I64),
                    "loss": pa.array([loss], pa.float64()),
                    "grad": pa.array([grad.tobytes()], pa.binary()),
                }
            )

        partials = []
        for b in feats.map_batches(grad_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            for r in b.to_pylist():
                partials.append((r["bkey"], r["n"], r["loss"], r["grad"]))
        total_g = np.zeros(dim + n_dense + 1, np.float64)
        n_total, loss_total = 0, 0.0
        for _, n, loss, blob in sorted(partials, key=lambda t: t[0]):
            total_g += np.frombuffer(blob, np.float64)
            n_total += n
            loss_total += loss
        if n_total == 0:
            break
        w = w - lr * total_g / n_total
        history.append(loss_total / n_total)

    final_ref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        wv = ray.get(final_ref)
        n_docs = batch.num_rows
        buckets, doc_of, inv_len, dense, y = _unpack(batch)
        z = (
            np.bincount(
                doc_of, weights=wv[buckets] * inv_len[doc_of], minlength=n_docs
            )
            + dense @ wv[dim : dim + n_dense]
            + wv[dim + n_dense]
            if n_docs
            else np.zeros(0)
        )
        p = 1.0 / (1.0 + np.exp(-z))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "prob": pa.array(np.round(p + 1e-9, 4), pa.float64()),
                "weak_label": pa.array(y.astype(np.int64), _I64),
            }
        )

    out = feats.map_batches(score, batch_format="pyarrow")
    return (out, history) if return_history else out
