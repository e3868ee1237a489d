"""Model-in-the-loop curation: train a linear quality classifier ON the
engine, then score the corpus with it.

The CCNet/Dolma pattern: a cheap hand-written gate (here the composite
``textstats`` quality score) weak-labels the corpus, a hashed
bag-of-words logistic regression distills the gate into a model, and
the MODEL becomes the reusable curation signal (fastText-style quality
classifiers are exactly this shape). Everything is expressed as Ray
Data passes:

  * features — hashed unigram term frequencies (the shared tokenizer;
    ``hash % dim`` feature buckets, no vocabulary state anywhere);
  * training — full-batch gradient descent, one streaming pass per
    epoch: every block emits a model-sized dense gradient partial
    (``np.add.at`` scatter) + loss, the driver folds partials in
    bkey order (the ``kmeans_assign`` determinism discipline: float
    summation order must not depend on block ARRIVAL order) and steps;
  * scoring — one broadcast-model pass.

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
    w = np.zeros(dim + n_dense + 1, np.float64)  # [hashed..., dense..., bias]
    history: list[float] = []

    for _ in range(epochs):
        ref = ray.put(w)

        def grad_partial(batch: pa.Table, _ref=ref) -> pa.Table:
            wv = ray.get(_ref)
            buckets, doc_of, inv_len, dense, n_docs = _doc_features(batch, dim)
            if n_docs == 0:
                return pa.table(
                    {"bkey": pa.array([], _I64), "n": pa.array([], _I64),
                     "loss": pa.array([], pa.float64()),
                     "grad": pa.array([], pa.binary())}
                )
            z = (
                np.bincount(
                    doc_of, weights=wv[buckets] * inv_len[doc_of], minlength=n_docs
                )
                + dense @ wv[dim : dim + n_dense]
                + wv[dim + n_dense]
            )
            p = 1.0 / (1.0 + np.exp(-z))
            y = _weak_labels(batch, stop_en, threshold)
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
        for b in docs.map_batches(grad_partial, batch_format="pyarrow").iter_batches(
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
        buckets, doc_of, inv_len, dense, n_docs = _doc_features(batch, dim)
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
        y = _weak_labels(batch, stop_en, threshold)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "prob": pa.array(np.round(p + 1e-9, 4), pa.float64()),
                "weak_label": pa.array(y.astype(np.int64), _I64),
            }
        )

    out = docs.map_batches(score, batch_format="pyarrow")
    return (out, history) if return_history else out
