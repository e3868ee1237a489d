"""Shared integer mix + vectorized text hashing (single source of truth).

splitmix64 is used both for bloom-filter probe derivation
(state/seen.py) and MinHash permutations / band folding
(pipelines/dedup.py) — the two MUST stay bit-identical, so the mix
lives here once.

word_hashes / shingle_hashes are the batch-vectorized text kernels the
near-dup family (pipelines/dedup.py) is built on: one fixed-width
codepoint matrix per call and a short chain of uint64 vector ops — no
per-word Python hashing. On ~300-char docs this is the difference
between ~10k docs/s (blake2b per shingle) and >100k docs/s per worker.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
    x ^= x >> _U64(30)
    x *= _U64(0xBF58476D1CE4E5B9)
    x ^= x >> _U64(27)
    x *= _U64(0x94D049BB133111EB)
    x ^= x >> _U64(31)
    return x


# Fixed-width word hashing: the FNV chain runs over the first _WORD_PAD
# UTF-8 bytes (zero-padded); longer words collide only on a shared
# 24-byte prefix — deterministic and negligible for natural tokens.
_WORD_PAD = 24
_FNV_PRIME = _U64(1099511628211)
_FNV_BASIS = _U64(0xCBF29CE484222325)


def splitmix64_inplace(x: np.ndarray, tmp: np.ndarray) -> np.ndarray:
    """splitmix64 mutating ``x`` (uint64), using ``tmp`` (same shape) as
    scratch — zero allocations. Large fresh numpy temporaries are
    mmap-backed and re-fault on every op on this class of box (~80 MB/s),
    so hot kernels must reuse buffers. Bit-identical to ``splitmix64``."""
    x += _U64(0x9E3779B97F4A7C15)
    np.right_shift(x, _U64(30), out=tmp)
    x ^= tmp
    x *= _U64(0xBF58476D1CE4E5B9)
    np.right_shift(x, _U64(27), out=tmp)
    x ^= tmp
    x *= _U64(0x94D049BB133111EB)
    np.right_shift(x, _U64(31), out=tmp)
    x ^= tmp
    return x


class _Scratch:
    """Grow-only named scratch buffers, reused across batch calls.

    Ray workers run one task at a time per process, so module-level
    scratch is safe; without it every batch re-allocates MB-scale
    temporaries that this box's allocator returns to the OS immediately
    (mmap), re-faulting the pages on first touch each call."""

    def __init__(self):
        self._bufs: dict[str, np.ndarray] = {}

    def get(self, name: str, size: int, dtype) -> np.ndarray:
        buf = self._bufs.get(name)
        if buf is None or len(buf) < size or buf.dtype != np.dtype(dtype):
            buf = np.empty(max(size, 2 * (len(buf) if buf is not None else 0)), dtype)
            self._bufs[name] = buf
        return buf[:size]


_SCRATCH = _Scratch()


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR — numpy<2 has no bitwise_count);
    returns int64 bit counts."""
    x = x.astype(_U64, copy=True)
    x -= (x >> _U64(1)) & _U64(0x5555555555555555)
    x = (x & _U64(0x3333333333333333)) + ((x >> _U64(2)) & _U64(0x3333333333333333))
    x = (x + (x >> _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
    return ((x * _U64(0x0101010101010101)) >> _U64(56)).astype(np.int64)


def hash_string_array(arr) -> np.ndarray:
    """uint64 FNV+splitmix hash per string of an Arrow string array,
    computed straight off the array's byte buffers — no per-word Python.

    Batch-independent: equal strings hash equally regardless of batch
    composition (the per-batch early-exit is corrected by a uniform
    ``P^(PAD-maxlen)`` multiply, the exact value a full 24-iteration
    zero-padded chain would produce)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=_U64)
    data = arr.buffers()[2]
    buf = np.frombuffer(data, dtype=np.uint8) if data is not None else np.zeros(1, np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ]
    starts = offs[:-1]
    lens = offs[1:] - starts
    maxlen = min(int(lens.max()) if n else 0, _WORD_PAD)
    h = _SCRATCH.get("hsa_h", n, _U64)
    h[:] = _FNV_BASIS
    idx = _SCRATCH.get("hsa_idx", n, np.int32)
    col = _SCRATCH.get("hsa_col", n, np.uint8)
    for j in range(maxlen):
        np.add(starts, np.int32(j), out=idx)
        np.minimum(idx, np.int32(len(buf) - 1), out=idx)
        np.take(buf, idx, out=col)
        np.multiply(col, j < lens, out=col, casting="unsafe")  # 0 past end
        h *= _FNV_PRIME
        np.bitwise_xor(h, col, out=h, casting="unsafe")
    # uniform tail: remaining zero-padded iterations only multiply by P
    h *= _U64(pow(int(_FNV_PRIME), _WORD_PAD - maxlen, 1 << 64))
    tmp = _SCRATCH.get("hsa_tmp", n, _U64)
    return splitmix64_inplace(h, tmp).copy()


_HT_SEED_A = 0x243F6A88  # pi fractional bits
_HT_SEED_B = 0x13198A2E


def hash_text_array_128(arr) -> "tuple[np.ndarray, np.ndarray]":
    """Two independent uint64 FULL-CONTENT hashes per string of an Arrow
    string array — the 128-bit content-hash pair exact dedup groups on
    (verdict r4 #3: the per-row ``hashlib.blake2b`` loop at ~80 MB/s/core
    was the slowest possible scan shape for the cheapest op, and 64 bits
    hit the birthday bound at 10^10 docs; two lanes push collision odds
    to ~n^2/2^129).

    Kernel: polars ``Series.hash`` (vectorized xxhash over the Arrow
    buffers, zero-copy in via ``pl.from_arrow``; measured ~2 GB/s/core,
    25x the blake2b loop) under two fixed seeds. Deterministic across
    processes for a fixed polars version (every Ray worker ships the same
    wheel), which is all a dedup partition key needs — equal strings hash
    equal regardless of batch composition, and the value never lands in
    an output or oracle. Not cryptographic — ``table_checksum`` keeps md5
    for SQL parity. Nulls hash as nulls do in polars (a fixed constant);
    callers treat null text as empty upstream. Returns (lane_a, lane_b)
    int64 views."""
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")  # before first import
    import polars as pl
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z
    s = pl.from_arrow(arr)
    a = s.hash(seed=_HT_SEED_A).to_numpy().view(np.int64)
    b = s.hash(seed=_HT_SEED_B).to_numpy().view(np.int64)
    return a, b


def word_hashes(words: list[str]) -> np.ndarray:
    """uint64 hash per word (list form; see ``hash_string_array``)."""
    import pyarrow as pa

    if not words:
        return np.empty(0, dtype=_U64)
    return hash_string_array(pa.array(words, pa.string()))


def tokenize_words(texts) -> "tuple[object, np.ndarray]":
    """Arrow-native batch tokenizer: lowercase -> RE2 ``\\W+`` split ->
    drop empties. Returns (flat Arrow string array of words, int64 doc
    offsets[n_docs+1]). ``texts`` is an Arrow string array/chunked array
    or a list of str. The whole path is C/vectorized — zero Python per
    word. Note RE2 ``\\W`` is ASCII: unsegmented CJK text yields no
    tokens (word shingling needs a real segmenter there regardless)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    lists = pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(texts, "")), r"\W+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offs_np = lists.offsets.to_numpy()
    # align values with the (possibly sliced) list array
    flat = lists.values.slice(offs_np[0], offs_np[-1] - offs_np[0])
    keep = pc.not_equal(pc.binary_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    raw_counts = np.diff(offs_np)
    doc_of_word = np.repeat(np.arange(n_docs, dtype=np.int64), raw_counts)
    counts = np.bincount(doc_of_word[keep_np], minlength=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return flat.filter(keep), offsets


def tokenize_word_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 word hashes, int64 doc offsets[n_docs+1]) — the
    hashed form of ``tokenize_words`` (one shared token definition for
    every text stage in the engine)."""
    words, offsets = tokenize_words(texts)
    return hash_string_array(words), offsets


def shingle_hashes(wh: np.ndarray, k: int) -> np.ndarray:
    """Hashes of k consecutive word hashes (position-sensitive chain).

    Fewer than k words -> ONE shingle over all words (same convention as
    joining the whole word list); empty input -> empty output.
    """
    n = len(wh)
    if n == 0:
        return wh
    k = min(k, n)
    m = n - k + 1
    acc = wh[:m]
    for j in range(1, k):
        acc = splitmix64(acc) ^ wh[j : j + m]
    return splitmix64(acc)
