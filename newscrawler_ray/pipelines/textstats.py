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
from ..functions.hashing import _SCRATCH, tokenize_word_hashes, word_hashes
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


def scrub_blocklist_docs(
    sf_dir: str,
    *,
    blocklist: tuple[str, ...] = ("slow", "fast"),
    mask: str = "[SCRUBBED]",
) -> rd.Dataset:
    """C4-style blocklist scrubbing (reference: the crawler stores raw
    extracted text with no content policy pass; a training-data pipeline
    needs one — C4 dropped any page containing a blocklisted term,
    Dolma/FineWeb mask PII spans in place). Emits per doc: the hit count
    and the text with every whole-word blocklist match replaced by
    ``mask`` — downstream either filters ``n_flagged > 0`` (the C4 drop
    rule) or keeps the scrubbed text (the masking rule).

    Both kernels are single RE2 passes (``pc.count_substring_regex`` /
    ``pc.replace_substring_regex``) — the same regex engine DuckDB uses,
    so the oracle is byte-exact. In production the default pattern set
    is the PII family (emails, IPv4s, phone numbers); the word blocklist
    is the sandbox-visible instance (the fixture corpus is letters-only
    by construction). Shuffle-free single map; no Python touches a row.
    """
    pat = r"\b(" + "|".join(blocklist) + r")\b"
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_flagged": pc.cast(pc.count_substring_regex(txt, pat), pa.int64()),
                "clean_text": pc.replace_substring_regex(txt, pat, mask),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


# PII patterns (Dolma/FineWeb masking family). RE2 syntax on both
# engines (pyarrow.compute and DuckDB), so the oracle is byte-exact.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{4}\b"


def mask_pii_docs(sf_dir: str) -> rd.Dataset:
    """PII masking (the Dolma/FineWeb curation step ``scrub_blocklist_docs``
    names but doesn't implement): replace emails, IPv4 addresses and
    phone numbers in place with typed sentinels, keeping per-class hit
    counts — the release-gating numbers a corpus card reports.

    The fixture corpus is letters-only by construction, so the PII
    surface is PLANTED deterministically on both sides — each doc gains
    a contact footer that is a pure function of ``doc_id``, built
    identically in the Ray kernel and the SQL oracle (the
    ``token_dropout_docs`` precedent applied to regex masking). A
    deployment deletes the footer stage and points the same three
    replace kernels at raw text.

    Masking is sequential (emails, then IPs, then phones) and each
    class is COUNTED on the text the previous stage produced, so the
    counts are well-defined even when patterns could overlap; the SQL
    oracle mirrors the same staging. Shuffle-free single map; one RE2
    pass per class; no Python touches a row.
    """
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def mask(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sep = ""  # binary_join_element_wise: last arg is the separator

        def s(a: np.ndarray) -> pa.Array:
            return pa.array(a.astype("U"), pa.string())

        t0 = pc.binary_join_element_wise(
            pc.fill_null(batch.column("text"), ""),
            " contact u", s(ids), "@ex", s(ids % 7),
            ".net ip 10.", s(ids % 256), ".0.", s((ids * 7) % 256),
            " tel 555-",
            pc.utf8_lpad(s(ids % 10000), 4, "0"),
            sep,
        )
        n_email = pc.cast(pc.count_substring_regex(t0, _PII_EMAIL), pa.int64())
        t1 = pc.replace_substring_regex(t0, _PII_EMAIL, "<EMAIL>")
        n_ip = pc.cast(pc.count_substring_regex(t1, _PII_IPV4), pa.int64())
        t2 = pc.replace_substring_regex(t1, _PII_IPV4, "<IP>")
        n_phone = pc.cast(pc.count_substring_regex(t2, _PII_PHONE), pa.int64())
        t3 = pc.replace_substring_regex(t2, _PII_PHONE, "<PHONE>")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_emails": n_email,
                "n_ips": n_ip,
                "n_phones": n_phone,
                "masked_text": t3,
            }
        )

    return ds.map_batches(mask, batch_format="pyarrow")


# ------------------------------------------------------------------ lang id

# tiny built-in stopword profiles (public common-word lists)
_LANG_STOPWORDS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "den"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los", "las", "por"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour", "dans"},
    "zh": set(),  # CJK detected by codepoint range, not stopwords
}
# ASCII tokenization to match the shared Arrow tokenizer (RE2 \W+ is
# ASCII): every text stage in the engine agrees on one token definition
_WORD = re.compile(r"\w+", re.ASCII)
_CJK = re.compile(r"[一-鿿]")
_CJK_RE2 = r"[\x{4E00}-\x{9FFF}]"  # same range, RE2 spelling for Arrow


def _stopword_hash_profiles() -> tuple[list[str], list[np.ndarray]]:
    """(langs-in-tiebreak-order, sorted uint64 hashes of each stopword
    set) — membership against the shared word-hash kernel, so scoring
    needs no Python strings at all."""
    langs = [lang for lang, sw in _LANG_STOPWORDS.items() if sw]
    return langs, [
        np.sort(word_hashes(sorted(_LANG_STOPWORDS[lang]))) for lang in langs
    ]


def _stopword_hits(
    flat: np.ndarray, starts: np.ndarray, lens: np.ndarray, sw_sorted: np.ndarray
) -> np.ndarray:
    """Per-doc count of words whose hash is in ``sw_sorted`` (every
    occurrence counts), via searchsorted membership + ``add.reduceat``."""
    n = len(lens)
    if len(flat) == 0 or len(sw_sorted) == 0:
        return np.zeros(n, np.int64)
    pos = np.minimum(np.searchsorted(sw_sorted, flat), len(sw_sorted) - 1)
    hit = (sw_sorted[pos] == flat).astype(np.int64)
    sums = np.add.reduceat(hit, starts)
    sums[lens == 0] = 0  # reduceat echoes the next element for empty segments
    return sums


class LangId:
    """Callable class for ``map_batches(LangId, concurrency=N)`` — the
    stateful-stage shape: profiles hashed once per actor. The batch path
    is fully vectorized (Arrow tokenize -> hashed-stopword membership ->
    segment sums); ``guess`` keeps the readable per-doc reference
    implementation the batch kernel is tested against."""

    def __init__(self):
        self.profiles = _LANG_STOPWORDS
        self.word = _WORD
        self.cjk = _CJK
        self.langs, self.sw_hashes = _stopword_hash_profiles()

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
        # +1e-9: tie-free rounding, same nudge as the batch path
        return (
            (best, round(scores[best] + 1e-9, 4))
            if scores[best] > 0
            else ("unknown", 0.0)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        cjk = pc.greater(
            pc.count_substring_regex(texts, _CJK_RE2), 0
        ).to_numpy(zero_copy_only=False)
        flat, offsets = tokenize_word_hashes(texts)
        n = len(offsets) - 1
        lens = np.diff(offsets)
        starts = np.minimum(offsets[:-1], max(len(flat) - 1, 0))
        score = np.zeros((n, len(self.langs)), np.float64)
        denom = np.maximum(lens, 1).astype(np.float64)
        for li, sw in enumerate(self.sw_hashes):
            score[:, li] = _stopword_hits(flat, starts, lens, sw) / denom
        best = np.argmax(score, axis=1)  # first max = profile tie-break order
        best_score = score[np.arange(n), best]
        preds = np.array(self.langs, dtype=object)[best]
        confs = np.round(best_score + 1e-9, 4)  # tie-free (see quality_score)
        none = best_score <= 0
        preds[none] = "unknown"
        confs[none] = 0.0
        preds[cjk] = "zh"
        confs[cjk] = 1.0
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds, pa.string()),
                "confidence": pa.array(confs, pa.float64()),
            }
        )


def lang_id(sf_dir: str) -> rd.Dataset:
    import ray

    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    # autoscaling actor pool up to the cluster width — a fixed tiny pool
    # would cap this stage while the rest of the pipeline scales
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    return ds.map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, max(2, ncpu))
    )


# ------------------------------------------------------------- quality


def quality_batch(batch: pa.Table, stop_en: np.ndarray) -> pa.Table:
    """Per-batch quality-feature kernel (module-level so compositions —
    curate_text_corpus — reuse the EXACT arithmetic the SQL oracle
    recomputes)."""
    return _quality_feats(batch, stop_en)


def quality_score(sf_dir: str) -> rd.Dataset:
    """Length / punctuation / stopword-ratio quality features + composite
    score in [0,1] — the usual pre-training corpus filters, vectorized."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    stop_en = np.sort(word_hashes(sorted(_LANG_STOPWORDS["en"])))

    def feats(batch: pa.Table) -> pa.Table:
        return _quality_feats(batch, stop_en)

    return ds.map_batches(feats, batch_format="pyarrow")


def _quality_feats(batch: pa.Table, stop_en: np.ndarray) -> pa.Table:
        texts = batch.column("text")
        n_chars = pc.cast(pc.utf8_length(texts), pa.int64())
        n_tokens = pc.cast(
            pc.list_value_length(
                pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), r"\s+")
            ),
            pa.int64(),
        )
        n_punct = pc.cast(pc.count_substring_regex(texts, r"[^\w\s]"), pa.int64())
        # stopword ratio via the hashed-membership kernel (round-2 review
        # finding: this was a per-doc Python loop on the hottest column)
        flat, offsets = tokenize_word_hashes(texts)
        lens = np.diff(offsets)
        starts = np.minimum(offsets[:-1], max(len(flat) - 1, 0))
        hits = _stopword_hits(flat, starts, lens, stop_en)
        # +1e-9 before rounding everywhere a SQL oracle recomputes the
        # value: exact .5 ties (e.g. 1/32 -> x.xxx25) round differently
        # under numpy (half-even) vs DuckDB's vectorized round, and even
        # DuckDB's own constant-folding disagrees with its executor on
        # ties. The nudge lands both engines on the same side of every
        # boundary (raw IEEE sums are bit-identical across the two).
        stop_ratio = np.round(hits / np.maximum(lens, 1) + 1e-9, 4)
        stop_ratio[lens == 0] = 0.0
        nc = n_chars.to_numpy().astype(np.float64)
        nt = np.maximum(n_tokens.to_numpy().astype(np.float64), 1)
        npu = n_punct.to_numpy().astype(np.float64)
        sr = stop_ratio
        length_score = np.clip(nc / 500.0, 0, 1)
        punct_score = 1.0 - np.clip(npu / nc, 0, 1)
        word_len_score = np.clip((nc / nt) / 8.0, 0, 1)
        score = np.round(
            0.4 * length_score + 0.2 * punct_score + 0.2 * word_len_score
            + 0.2 * np.clip(sr * 4, 0, 1) + 1e-9,  # tie-free (see above)
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


def chunk_documents(
    sf_dir: str,
    *,
    chunk_tokens: int = 128,
    stride: int = 64,
    docs: rd.Dataset | None = None,
) -> rd.Dataset:
    """Sliding-window token chunking — the preprocessing step between
    curation and packing for docs longer than a training context:
    every doc splits into windows of ``chunk_tokens`` whitespace tokens
    starting every ``stride`` tokens (stride < chunk_tokens = the
    standard overlapping-window recipe, so no token is seen only at a
    window edge). Output: (doc_id, chunk_id, n_chunk_tokens,
    chunk_text); chunk_text is the window's tokens re-joined with
    single spaces (token chunking canonicalizes whitespace by
    construction). Token definition matches ``token_stats`` exactly,
    so every doc — even an empty one, which holds one empty token under
    that contract — emits ceil(n_tokens / stride) >= 1 chunks.

    One shuffle-free vectorized map: split once per batch, build all
    window gather indices with arange algebra (no per-doc Python), one
    ``pc.binary_join`` rebuilds the texts. SQL-exact vs
    generate_series + list_slice."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if docs is None:
        docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ids = batch.column("doc_id").to_numpy()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch.column("text")), r"\s+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy().astype(np.int64)
        doc_off = np.zeros(len(ids) + 1, np.int64)
        np.cumsum(n, out=doc_off[1:])
        c = -(-n // stride)  # chunks per doc = ceil(n / stride)
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), c)
        chunk_idx = _ranges(c)
        starts = chunk_idx * stride
        sizes = np.minimum(chunk_tokens, n[doc_of] - starts)
        begins = doc_off[doc_of] + starts
        gather = np.repeat(begins, sizes) + _ranges(sizes)
        offs = np.zeros(len(sizes) + 1, np.int32)
        np.cumsum(sizes, out=offs[1:])
        win = pa.ListArray.from_arrays(
            pa.array(offs), flat.take(pa.array(gather))
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_of], pa.int64()),
                "chunk_id": pa.array(chunk_idx, pa.int64()),
                "n_chunk_tokens": pa.array(sizes, pa.int64()),
                "chunk_text": pc.binary_join(win, " "),
            }
        )

    return docs.map_batches(chunks, batch_format="pyarrow")


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (vectorized arange-per-group)."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    return np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )


def winnow_stats_batch(
    texts, k: int = 8, window: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """(n_fingerprints, min_fingerprint-as-uint64) per doc for a whole
    Arrow string batch — bit-identical to per-doc
    ``winnow_fingerprints`` (asserted in tests) with zero Python per
    doc: one lowered byte buffer, docs zero-padded to >= k in place (the
    per-doc convention), one rolling-hash chain with windows crossing
    doc boundaries masked out by gather, sliding-window minima as a
    k-way ``np.minimum``, then per-doc distinct counting via lexsort +
    transition flags (round-2 review finding: the per-doc loop was the
    hottest fingerprint stage)."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), pa.string())
    low = pc.utf8_lower(texts)
    if isinstance(low, pa.ChunkedArray):
        low = low.combine_chunks()
    n_docs = len(low)
    if n_docs == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    offs = np.frombuffer(low.buffers()[1], np.int32)[
        low.offset : low.offset + n_docs + 1
    ].astype(np.int64)
    dbuf = low.buffers()[2]
    data = np.frombuffer(dbuf, np.uint8) if dbuf is not None else np.zeros(0, np.uint8)
    lens = np.diff(offs)
    if len(lens) and int(lens.min()) >= k:
        # fast path: no doc needs zero-padding, so the Arrow value
        # buffer IS the padded buffer — zero copies
        newlens = lens
        noffs = offs - offs[0]
        buf = data[offs[0] : offs[-1]]
        total = int(noffs[-1])
    else:
        # scatter doc bytes into a buffer where every doc occupies
        # max(len, k) slots — short docs end up zero-padded exactly like
        # winnow_fingerprints' data + b"\x00" * (k - len)
        newlens = np.maximum(lens, k)
        noffs = np.zeros(n_docs + 1, np.int64)
        np.cumsum(newlens, out=noffs[1:])
        total = int(noffs[-1])
        # scratch-buffer reuse throughout: fresh MB-scale temporaries
        # are mmap-backed and re-fault per call on this box (perf rule)
        buf = _SCRATCH.get("wn_buf", total, np.uint8)
        buf[:] = 0
        src = np.repeat(offs[:-1], lens) + _ranges(lens)
        dst = np.repeat(noffs[:-1], lens) + _ranges(lens)
        buf[dst] = data[src]
    # rolling polynomial hash over the padded buffer (uint64 wraparound)
    base = np.uint64(1099511628211)
    powers = base ** np.arange(k, dtype=np.uint64)[::-1]
    m = total - k + 1
    h = _SCRATCH.get("wn_h", m, np.uint64)
    h[:] = 0
    tmp = _SCRATCH.get("wn_tmp", m, np.uint64)
    for j in range(k):
        np.copyto(tmp, buf[j : j + m], casting="unsafe")
        tmp *= powers[j]
        h += tmp
    # valid k-gram hashes per doc: [noffs[d], noffs[d] + newlens[d]-k]
    nh = newlens - k + 1
    gidx = np.repeat(noffs[:-1], nh) + _ranges(nh)
    hv = np.take(h, gidx, out=_SCRATCH.get("wn_hv", len(gidx), np.uint64))
    starts = np.zeros(n_docs, np.int64)
    np.cumsum(nh[:-1], out=starts[1:])
    n_fp = np.empty(n_docs, np.int64)
    min_fp = np.empty(n_docs, np.uint64)
    # docs with nh <= window: ONE fingerprint (the global min)
    small = nh <= window
    if small.any():
        gmins = np.minimum.reduceat(hv, starts)
        n_fp[small] = 1
        min_fp[small] = gmins[small]
    big = ~small
    if big.any():
        # sliding-window minima within each doc: a `window`-way minimum
        # over shifted views; positions whose window would cross into the
        # next doc are excluded by gathering only nw per doc
        nw_all = np.maximum(nh - window + 1, 0)
        nw = np.where(big, nw_all, 0)
        span = len(hv) - window + 1
        wm_all = _SCRATCH.get("wn_wm", span, np.uint64)
        np.copyto(wm_all, hv[:span])
        for j in range(1, window):
            np.minimum(wm_all, hv[j : j + span], out=wm_all)
        widx = np.repeat(starts, nw) + _ranges(nw)
        wm = np.take(wm_all, widx, out=_SCRATCH.get("wn_wmv", len(widx), np.uint64))
        # run-compress before sorting: window minima persist ~`window`
        # positions, and distinct(values) == distinct(run heads), so the
        # lexsort (the dominant cost) runs on ~1/window of the rows.
        # Doc ids are derived only AT the head positions (searchsorted on
        # the per-doc boundaries) — no full-length doc_of materializes.
        gstarts = np.zeros(n_docs + 1, np.int64)
        np.cumsum(nw, out=gstarts[1:])
        head = np.empty(len(wm), bool)
        head[0] = True
        np.not_equal(wm[1:], wm[:-1], out=head[1:])
        head[gstarts[:-1][nw > 0]] = True  # every doc's first window
        hpos = np.nonzero(head)[0]
        wmh = wm[hpos]
        doch = np.searchsorted(gstarts[1:], hpos, side="right")
        order = np.lexsort((wmh, doch))
        dvals, wvals = doch[order], wmh[order]
        first = np.ones(len(wvals), bool)
        first[1:] = (dvals[1:] != dvals[:-1]) | (wvals[1:] != wvals[:-1])
        n_fp[big] = np.bincount(dvals[first], minlength=n_docs)[big]
        doc_start = np.ones(len(wvals), bool)
        doc_start[1:] = dvals[1:] != dvals[:-1]
        min_fp[dvals[doc_start]] = wvals[doc_start]
    return n_fp, min_fp


def fingerprint_docs(sf_dir: str) -> rd.Dataset:
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        ns, mins = winnow_stats_batch(batch.column("text"))
        # same signed-int64 mapping as `int(f.min()) - (1 << 63)`
        signed = (mins ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_fingerprints": pa.array(ns, pa.int64()),
                "min_fingerprint": pa.array(signed, pa.int64()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


# --------------------------------------------------------- sequence packing


def pack_token_bins(
    sf_dir: str, *, capacity: int = 256, num_blocks: int = 8
) -> rd.Dataset:
    """Greedy sequence packing for LLM training batches: assign each doc
    to a bin so no bin's total BPE-token count exceeds ``capacity``
    (a doc larger than capacity gets a bin alone).

    Distribution contract — the one every distributed packer makes:
    packing runs INDEPENDENTLY PER BLOCK (bin ids are namespaced by the
    block's min doc_id, so they are globally unique and deterministic
    for a fixed blocking); consolidating bins ACROSS blocks would be a
    global sequential dependency, and per-block packing loses at most
    one under-half-full bin per block vs a global pass (tested
    invariant). Within a block: first-fit-decreasing — the descending
    sort is vectorized, the fit loop is the useful compute of the
    operator (inherently sequential, bounded by block size).

    Output: (doc_id, n_bpe_tokens, bin_id). Invariants tested in
    ``tests/``: every doc in exactly one bin; every bin <= capacity
    unless a single oversized doc; per block at most one bin <= half
    full (first-fit property); bit-identical across runs.
    """
    ds = read_clean(
        _p(sf_dir, "documents"),
        columns=["doc_id", "text"],
        override_num_blocks=num_blocks,
    )

    def pack(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_bpe_tokens": pa.array([], pa.int64()),
                 "bin_id": pa.array([], pa.int64())}
            )
        ids = batch.column("doc_id").to_numpy()
        nt = pc.cast(
            pc.count_substring_regex(batch.column("text"), _TOKEN_RE), pa.int64()
        ).to_numpy()
        order = np.lexsort((ids, -nt))  # first-fit-DECREASING, stable
        bins: list[int] = []  # remaining capacity per open bin
        local = np.empty(len(ids), np.int64)
        for row in order:
            need = int(nt[row])
            for b, rem in enumerate(bins):
                if rem >= need:
                    bins[b] = rem - need
                    local[row] = b
                    break
            else:
                local[row] = len(bins)
                bins.append(max(capacity - need, 0))
        block_key = int(ids.min())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bpe_tokens": pa.array(nt, pa.int64()),
                "bin_id": pa.array(block_key * 100_000 + local, pa.int64()),
            }
        )

    # batch_size=None: one call per block — the packing unit IS the block
    return ds.map_batches(pack, batch_size=None, batch_format="pyarrow")


# ----------------------------------------------------------- repetition


def _dup_run_stats(
    doc_of: np.ndarray, h: np.ndarray, n_docs: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (sum of run lengths over runs with length >= 2, max run
    length) for (doc, hash) pairs — one lexsort + run-length segments,
    no Python per doc or per token."""
    dup = np.zeros(n_docs, dtype=np.int64)
    top = np.zeros(n_docs, dtype=np.int64)
    if len(h) == 0:
        return dup, top
    order = np.lexsort((h, doc_of))
    d = doc_of[order]
    hh = h[order]
    new_run = np.empty(len(hh), dtype=bool)
    new_run[0] = True
    new_run[1:] = (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])
    run_starts = np.flatnonzero(new_run)
    run_lens = np.diff(np.append(run_starts, len(hh)))
    run_doc = d[run_starts]
    dup[:] = np.bincount(
        run_doc, weights=np.where(run_lens >= 2, run_lens, 0), minlength=n_docs
    ).astype(np.int64)
    # runs of one doc are contiguous (sorted by doc first) -> reduceat max
    doc_bounds = np.flatnonzero(
        np.r_[True, run_doc[1:] != run_doc[:-1]]
    )
    top[run_doc[doc_bounds]] = np.maximum.reduceat(run_lens, doc_bounds)
    return dup, top


def gopher_repetition(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetition filters per document (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Table A1), adapted from
    character fractions to word-position fractions over the shared
    ``\\W+`` tokenizer:

      dupword_frac — fraction of word positions whose word occurs >= 2
                     times within the doc
      dup2_frac    — fraction of 2-gram positions whose 2-gram repeats
                     within the doc
      top2_frac    — share of the single most frequent 2-gram
      keep         — 1 iff all three sit under the corpus thresholds
                     (0.8 / 0.08 / 0.05, chosen so the synthetic corpus
                     splits non-degenerately; compared on the ROUNDED
                     values so the DuckDB oracle agrees bit-for-bit)

    One ``map_batches`` pass, no shuffle: tokenize -> 64-bit word/2-gram
    hashes -> lexsort run-length segments per doc. Counting duplicates by
    hash equals counting by string absent a 64-bit collision (parity with
    the string-based SQL oracle is asserted at sf0.01 in tests).
    """
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(repetition_batch, batch_format="pyarrow")


def repetition_batch(batch: pa.Table) -> pa.Table:
        """Per-batch Gopher-repetition kernel (module-level so
        compositions reuse the exact oracle arithmetic)."""
        from ..functions.hashing import splitmix64

        n_docs = batch.num_rows
        flat, offsets = tokenize_word_hashes(batch.column("text"))
        lens = np.diff(offsets)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        dup_w, _ = _dup_run_stats(doc_of, flat, n_docs)
        # adjacent-pair 2-gram hashes, masked at doc boundaries
        if len(flat) > 1:
            adj = doc_of[:-1] == doc_of[1:]
            g = (splitmix64(flat[:-1]) ^ flat[1:])[adj]
            gdoc = doc_of[:-1][adj]
        else:
            g = np.empty(0, dtype=np.uint64)
            gdoc = np.empty(0, dtype=np.int64)
        dup_2, top_2 = _dup_run_stats(gdoc, g, n_docs)
        n2 = np.maximum(lens - 1, 0)
        nw_f = np.maximum(lens, 1).astype(np.float64)
        n2_f = np.maximum(n2, 1).astype(np.float64)
        # +1e-9 pre-round: tie-free vs DuckDB (see quality_score)
        dupword_frac = np.round(dup_w / nw_f + 1e-9, 4)
        dup2_frac = np.round(dup_2 / n2_f + 1e-9, 4)
        top2_frac = np.round(top_2 / n2_f + 1e-9, 4)
        keep = (
            (dupword_frac <= 0.8) & (dup2_frac <= 0.08) & (top2_frac <= 0.05)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(lens, pa.int64()),
                "dupword_frac": pa.array(dupword_frac, pa.float64()),
                "dup2_frac": pa.array(dup2_frac, pa.float64()),
                "top2_frac": pa.array(top2_frac, pa.float64()),
                "keep": pa.array(keep, pa.int64()),
            }
        )


def char_entropy_docs(sf_dir: str) -> rd.Dataset:
    """Per-document Shannon entropy over characters — the classic
    gibberish/boilerplate detector (low entropy = repeated chars or
    tiny alphabets; curation pipelines gate on it alongside the
    length/stopword signals in ``quality_score_docs``).

    Byte-level histogram per doc, fully vectorized: one ``bincount``
    over (doc_index * 256 + byte) per batch — no Python touches a row.
    Byte entropy == character entropy on the ASCII fixture corpus (the
    SQL oracle splits characters); non-ASCII corpora would diverge and
    should use a codepoint decode stage instead. Shuffle-free single
    map."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def ent(batch: pa.Table) -> pa.Table:
        arr = batch.column("text")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
            offs[0] : offs[-1]
        ]
        lens = np.diff(offs)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        hist = np.bincount(
            doc_of * 256 + data.astype(np.int64), minlength=n * 256
        ).reshape(n, 256)
        safe = np.maximum(lens, 1).astype(np.float64)
        p = hist / safe[:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            term = np.where(p > 0, p * np.log2(p), 0.0)
        h = -term.sum(axis=1)
        keep = lens > 0  # SQL's unnest emits no rows for empty text
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "char_entropy": pa.array(
                    np.round(h[keep] + 1e-9, 4), pa.float64()
                ),
            }
        )

    return ds.map_batches(ent, batch_format="pyarrow")


def token_dropout_docs(sf_dir: str, *, rate_num: int = 214748365) -> rd.Dataset:
    """Deterministic token dropout (the text half of EDA augmentation,
    Wei & Zou 2019): drop ~10% of each doc's whitespace tokens, chosen
    by a Knuth multiplicative hash of (doc_id, position) — reruns and
    retried partitions augment identically (no RNG state), and the
    integer hash is SQL-expressible, so the whole augmentation carries
    a hard DuckDB oracle (the ``hash_sample_events`` precedent applied
    to a TRANSFORM).

    Hash: h = ((doc_id * 1000003 + pos) % 2^31) * 2654435761 % 2^31,
    drop when h < rate_num (default ~10% of 2^31). Every step stays
    under 2^63 so DuckDB BIGINT and numpy int64 agree exactly.

    Shuffle-free: one vectorized map (split offsets -> per-token
    position arithmetic -> masked rejoin). Output: (doc_id, n_tokens,
    n_dropped, aug_text) — aug_text joins survivors with single spaces
    (the normalized stream convention of ``strip_dup_spans``)."""
    ds = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def drop(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column("text"), "")
        lists = pc.split_pattern_regex(texts, r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offs = lists.offsets.to_numpy()
        flat = lists.values.slice(offs[0], offs[-1] - offs[0])
        keep_tok = pc.not_equal(pc.binary_length(flat), 0)
        keep_np = keep_tok.to_numpy(zero_copy_only=False)
        n_docs = batch.num_rows
        doc_raw = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
        doc_of = doc_raw[keep_np]
        toks = flat.filter(keep_tok)
        lens = np.bincount(doc_of, minlength=n_docs)
        starts = np.zeros(n_docs, np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        # 1-based position within the doc (matches SQL generate_series)
        pos = np.arange(len(doc_of), dtype=np.int64) - starts[doc_of] + 1
        ids = batch.column("doc_id").to_numpy()
        h = ((ids[doc_of] * 1000003 + pos) % 2147483648) * 2654435761 % 2147483648
        kept = h >= rate_num
        # masked rejoin: null out dropped tokens, binary_join skips null
        # only with null_handling — rebuild per doc via list slices
        tok_np = toks.to_pylist()
        out_txt = []
        n_drop = np.zeros(n_docs, np.int64)
        np.add.at(n_drop, doc_of[~kept], 1)
        for d in range(n_docs):
            s, e = int(starts[d]), int(starts[d] + lens[d])
            out_txt.append(
                " ".join(t for t, k in zip(tok_np[s:e], kept[s:e]) if k)
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(lens, pa.int64()),
                "n_dropped": pa.array(n_drop, pa.int64()),
                "aug_text": pa.array(out_txt, pa.string()),
            }
        )

    return ds.map_batches(drop, batch_format="pyarrow")
