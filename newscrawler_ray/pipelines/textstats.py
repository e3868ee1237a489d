"""Text analysis operators (training-data ops over the documents table).

  bpe_token_stats — BPE-ish regex token counting, fully vectorized
  lang_id         — n-gram/stopword-heuristic language identification
  quality_score   — document quality features + composite score
  fingerprint_docs — winnowing document fingerprints (rolling hash)

All are per-batch vectorized or tight per-doc numpy; state (compiled
regexes, language profiles) is built once per worker.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ..functions.io import read_clean

_TOKEN_RE = r"\w+|[^\w\s]"  # BPE-ish pre-tokenizer split (words + punct)


def _p(sf_dir: str, table: str) -> str:
    return str(Path(sf_dir) / f"{table}.parquet")


def bpe_token_stats(sf_dir: str) -> rd.Dataset:
    """Token counts under a BPE-style pre-tokenizer regex; vectorized with
    ``pc.count_substring_regex`` (RE2 — same engine as the DuckDB oracle)."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        counts = pc.count_substring_regex(batch.column("text"), _TOKEN_RE)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pc.cast(counts, pa.int64()),
            }
        )

    return ds.map_batches(toks, batch_format="pyarrow")


# ------------------------------------------------------------------ lang id

# tiny built-in stopword profiles (public common-word lists)
_LANG_STOPWORDS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "den"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los", "las", "por"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour", "dans"},
    "zh": set(),  # CJK detected by codepoint range, not stopwords
}
_WORD = re.compile(r"\w+")
_CJK = re.compile(r"[一-鿿]")


class LangId:
    """Callable class for ``map_batches(LangId, concurrency=N)`` — the
    stateful-stage shape: profiles compiled once per actor."""

    def __init__(self):
        self.profiles = _LANG_STOPWORDS
        self.word = _WORD
        self.cjk = _CJK

    def guess(self, text: str) -> tuple[str, float]:
        if self.cjk.search(text):
            return "zh", 1.0
        words = self.word.findall(text.lower())
        if not words:
            return "unknown", 0.0
        scores = {
            lang: sum(w in sw for w in words) / len(words)
            for lang, sw in self.profiles.items()
            if sw
        }
        best = max(scores, key=scores.get)
        return (best, round(scores[best], 4)) if scores[best] > 0 else ("unknown", 0.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, confs = [], []
        for t in batch.column("text").to_pylist():
            p, c = self.guess(t)
            preds.append(p)
            confs.append(c)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds, pa.string()),
                "confidence": pa.array(confs, pa.float64()),
            }
        )


def lang_id(sf_dir: str) -> rd.Dataset:
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=2)


# ------------------------------------------------------------- quality


def quality_score(sf_dir: str) -> rd.Dataset:
    """Length / punctuation / stopword-ratio quality features + composite
    score in [0,1] — the usual pre-training corpus filters, vectorized."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    stop_en = _LANG_STOPWORDS["en"]

    def feats(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        n_chars = pc.cast(pc.utf8_length(texts), pa.int64())
        n_tokens = pc.cast(
            pc.list_value_length(
                pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), r"\s+")
            ),
            pa.int64(),
        )
        n_punct = pc.cast(pc.count_substring_regex(texts, r"[^\w\s]"), pa.int64())
        stop_ratio = []
        for t in texts.to_pylist():
            ws = _WORD.findall(t.lower())
            stop_ratio.append(
                round(sum(w in stop_en for w in ws) / len(ws), 4) if ws else 0.0
            )
        nc = n_chars.to_numpy().astype(np.float64)
        nt = np.maximum(n_tokens.to_numpy().astype(np.float64), 1)
        npu = n_punct.to_numpy().astype(np.float64)
        sr = np.array(stop_ratio)
        length_score = np.clip(nc / 500.0, 0, 1)
        punct_score = 1.0 - np.clip(npu / nc, 0, 1)
        word_len_score = np.clip((nc / nt) / 8.0, 0, 1)
        score = np.round(
            0.4 * length_score + 0.2 * punct_score + 0.2 * word_len_score
            + 0.2 * np.clip(sr * 4, 0, 1),
            4,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_punct": n_punct,
                "stopword_ratio": pa.array(sr, pa.float64()),
                "quality": pa.array(score, pa.float64()),
            }
        )

    return ds.map_batches(feats, batch_format="pyarrow")


# ----------------------------------------------------------- fingerprints


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003): k-gram rolling hashes, per-window
    minimum -> fingerprint set. Deterministic, order-robust doc identity."""
    data = text.lower().encode("utf-8")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(arr) - k + 1
    base = np.uint64(1099511628211)
    powers = base ** np.arange(k, dtype=np.uint64)[::-1]
    grams = np.lib.stride_tricks.sliding_window_view(arr, k)
    hashes = (grams * powers[None, :]).sum(axis=1)
    if n <= window:
        return np.unique(hashes.min(keepdims=True))
    wins = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return np.unique(wins.min(axis=1))


def fingerprint_docs(sf_dir: str) -> rd.Dataset:
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        ns, mins = [], []
        for t in batch.column("text").to_pylist():
            f = winnow_fingerprints(t)
            ns.append(len(f))
            mins.append(int(f.min()) - (1 << 63))  # to signed int64 range
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_fingerprints": pa.array(ns, pa.int64()),
                "min_fingerprint": pa.array(mins, pa.int64()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")
