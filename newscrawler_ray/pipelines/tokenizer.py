"""BPE tokenizer training over the corpus (training-data op).

A 100 TB pipeline doesn't just filter and dedup text — it trains the
tokenizer ON the corpus it curated (GPT-2 / Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016). The
reference has no tokenizer at all (SURVEY §2.8 stops at string scalars);
this module adds corpus-level BPE as two first-class operators:

  train_bpe_merges  — learn the merge table from corpus word frequencies
  bpe_encode_docs   — apply the learned merges corpus-wide (per-doc
                      token counts under the trained vocabulary)

Scale shape (the same split every real BPE trainer uses — HF tokenizers,
sentencepiece, Sennrich's learn_bpe all train over the word-TYPE
frequency table, not the token stream):

  1. The DISTRIBUTED stage is the corpus scan: per-batch partial
     (word, count) via Arrow dictionary-encode, one ``groupby(word)``
     sum — the only pass that touches every byte.
  2. The word-type table is model-sized, not corpus-sized (Heaps' law:
     ~10^6-10^7 types for web-scale corpora), so the driver fold +
     merge loop over it is the intended shape — the same licence as
     the unigram-LM and df-map folds (``corpusstats._unigram_model``,
     ``dedup.ngram_jaccard_pairs``). ``max_word_types`` caps the fold:
     below the cap (every sandbox run) training is EXACT; above it the
     rarest types are dropped, which perturbs only tail merges (their
     pair mass is bounded by the dropped frequency sum).
  3. Encoding streams: merges broadcast to an actor pool; each batch
     dictionary-encodes its words so every DISTINCT word is merged
     once (Zipf makes distinct << total) and the per-actor memo cache
     carries hot words across batches.

Determinism: ties in pair frequency break on the lexicographically
smallest (left, right) pair, so the merge list is a pure function of
the word-frequency table; tests train a brute-force reference trainer
on the same counts and assert exact equality.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.io import read_clean
from ..functions.hashing import tokenize_words
from ..stages import _pool_width

_I64 = pa.int64()


def _p(sf_dir: str, table: str) -> str:
    return str(Path(sf_dir) / f"{table}.parquet")


# ------------------------------------------------------------- word counts


def _word_count_table(
    docs: rd.Dataset, max_word_types: int, token_fn=None
) -> tuple[list[str], np.ndarray]:
    """(word types, int64 counts) for the whole corpus, frequency-desc
    with word-asc tiebreak, capped at ``max_word_types`` (most frequent
    kept). One distributed pass: per-batch dictionary-encode partials,
    then a hash ``groupby(word)`` sum; the fold collects the TYPE table
    only (see module docstring for the scale licence).

    ``token_fn`` (text Arrow column -> flat Arrow string array of
    tokens) swaps the pre-tokenizer: default is the shared ``\\W+``
    word tokenizer; the byte-level trainer passes the GPT-2 regex
    splitter."""

    def partial(batch: pa.Table) -> pa.Table:
        if token_fn is None:
            words, _ = tokenize_words(batch.column("text"))
        else:
            words = token_fn(batch.column("text"))
        if len(words) == 0:
            return pa.table(
                {"word": pa.array([], pa.string()), "cnt": pa.array([], _I64)}
            )
        d = words.dictionary_encode()
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        )
        return pa.table(
            {"word": d.dictionary, "cnt": pa.array(cnt.astype(np.int64), _I64)}
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def _trim(ws: list[str], cnt: np.ndarray, k: int):
        order = np.lexsort((np.array(ws), -cnt))[:k]
        return [ws[i] for i in order], cnt[order]

    # running-cap fold (the df-map discipline): the stream is
    # post-groupby, so each word type arrives EXACTLY ONCE with its
    # final count — a running top-K trim is therefore an EXACT
    # selection, and driver memory stays bounded by 2*cap rows at any
    # corpus size
    words: list[str] = []
    cnt = np.empty(0, np.int64)
    for b in agg.iter_batches(batch_format="pyarrow"):
        if not b.num_rows:
            continue
        words.extend(b.column("word").to_pylist())
        cnt = np.concatenate([cnt, b.column("cnt").to_numpy().astype(np.int64)])
        if len(words) > 2 * max_word_types:
            words, cnt = _trim(words, cnt, max_word_types)
    if not words:
        return [], np.empty(0, np.int64)
    # frequency desc, word asc — the deterministic training order
    return _trim(words, cnt, max_word_types)


# ---------------------------------------------------------- the merge loop


def learn_bpe(
    words: list[str],
    freqs: np.ndarray,
    n_merges: int,
    *,
    min_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn BPE merges from a word-frequency table (pure function —
    the driver-side model build, reused verbatim by the test oracle).

    Classic Sennrich learn_bpe with indexed incremental updates: each
    word starts as its character sequence; each round merges the
    globally most frequent adjacent symbol pair (count desc, then
    lexicographic (left, right) asc — fully deterministic), rewriting
    only the words that contain the pair. Stops early when the best
    pair drops below ``min_count``. Returns [(left, right, count)] in
    merge order.
    """
    syms: list[list[str]] = [list(w) for w in words]
    stats: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wi, (s, f) in enumerate(zip(syms, freqs)):
        f = int(f)
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            stats[p] = stats.get(p, 0) + f
            index.setdefault(p, set()).add(wi)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        if not stats:
            break
        # max count, lexicographic-min pair on ties
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        pair, count = best
        if count < min_count:
            break
        merges.append((pair[0], pair[1], count))
        new_sym = pair[0] + pair[1]
        for wi in sorted(index.pop(pair, ())):
            s, f = syms[wi], int(freqs[wi])
            # retract this word's pair contributions
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                stats[p] -= f
                if stats[p] <= 0:
                    del stats[p]
                ix = index.get(p)
                if ix is not None:
                    ix.discard(wi)
                    if not ix:
                        del index[p]
            # merge left-to-right, non-overlapping
            out: list[str] = []
            i = 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == pair[0] and s[i + 1] == pair[1]:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[wi] = out
            # re-add contributions
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                stats[p] = stats.get(p, 0) + f
                index.setdefault(p, set()).add(wi)
    return merges


def train_bpe_merges(
    sf_dir: str,
    *,
    n_merges: int = 64,
    min_count: int = 2,
    max_word_types: int = 1_000_000,
    docs: rd.Dataset | None = None,
) -> rd.Dataset:
    """Train a BPE merge table on the document corpus. Returns the
    merge table as a Dataset: (rank, left, right, pair_count) in merge
    order — the artifact a training pipeline writes next to its shards.
    Rows-only for the driver (iterative); the pytest oracle retrains
    brute-force from DuckDB word counts and asserts exact equality."""
    if docs is None:
        docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    words, freqs = _word_count_table(docs, max_word_types)
    merges = learn_bpe(words, freqs, n_merges, min_count=min_count)
    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array(np.arange(len(merges), dtype=np.int64), _I64),
                "left": pa.array([m[0] for m in merges], pa.string()),
                "right": pa.array([m[1] for m in merges], pa.string()),
                "pair_count": pa.array([m[2] for m in merges], _I64),
            }
        )
    )


# ---------------------------------------------------------------- encoding


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with a trained merge-rank table (classic BPE
    apply: repeatedly merge the lowest-rank adjacent pair). Pure —
    shared with the test oracle."""
    s = list(word)
    while len(s) > 1:
        best_rank, best_i = None, -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # merge EVERY occurrence of that pair (left-to-right), matching
        # how training rewrote words
        pair = (s[best_i], s[best_i + 1])
        out: list[str] = []
        i = 0
        while i < len(s):
            if i < len(s) - 1 and (s[i], s[i + 1]) == pair:
                out.append(pair[0] + pair[1])
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


class _BPEEncodeStage:
    """Actor-pool encode stage: merge ranks build once per actor; every
    batch dictionary-encodes its words so each DISTINCT word is merged
    once, and the memo cache carries hot words across batches (Zipf:
    distinct << total). Emits per-doc token counts."""

    def __init__(self, merges: list[tuple[str, str]]):
        self._ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
        self._cache: dict[str, int] = {}

    def _tok_len(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(encode_word(word, self._ranks))
            if len(self._cache) > 1_000_000:  # bound actor heap
                self._cache.clear()
            self._cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        words, offsets = tokenize_words(batch.column("text"))
        n_docs = batch.num_rows
        n_words = np.diff(offsets)
        if len(words):
            d = words.dictionary_encode()
            lens = np.fromiter(
                (self._tok_len(w) for w in d.dictionary.to_pylist()),
                dtype=np.int64,
                count=len(d.dictionary),
            )
            per_word = lens[d.indices.to_numpy(zero_copy_only=False)]
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)
            n_tokens = np.bincount(doc_of, weights=per_word, minlength=n_docs)
            n_tokens = n_tokens.astype(np.int64)
        else:
            n_tokens = np.zeros(n_docs, np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_words, _I64),
                "n_tokens": pa.array(n_tokens, _I64),
            }
        )


# ------------------------------------------------------- byte-level BPE
#
# GPT-2 / tiktoken-class tokenizer (verdict r4 #5): regex
# pre-tokenization + byte-level initial alphabet. Same engine shape as
# the word-level trainer — the distributed pass counts pre-token TYPES,
# the driver merge loop runs over the type table, encode streams via an
# actor pool with a per-type memo — only the pre-tokenizer differs.

# ASCII form of the GPT-2 split pattern (Radford et al. 2019): the
# stdlib `re` supports the trailing-whitespace lookahead but not
# \p{L}/\p{N} unicode property classes, so letter/number classes are
# ASCII here. Both the engine and the test oracle compile THIS pattern,
# so encode parity is exact; swapping in the `regex` module's \p form
# changes only the pre-token boundaries, not the engine.
GPT2_SPLIT_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)|\s+"
)


def bytes_to_unicode() -> "dict[int, str]":
    """GPT-2's reversible byte->printable-unicode-char map (public
    algorithm from the GPT-2 release): the 188 printable latin-1 bytes
    map to themselves, the rest to 256+n — so every byte string becomes
    a same-length str of SYMBOL characters and the char-pair merge
    engine (``learn_bpe`` / ``encode_word``) applies unchanged."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAD))
        + list(range(0xAE, 0x100))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def _pretokenize_column(texts) -> pa.Array:
    """Flat Arrow string array of GPT-2 pre-tokens for a text column
    (compiled-regex findall per doc — the regex engine is C; per-doc
    token lists are immediately re-batched into one Arrow array)."""
    import re

    pat = re.compile(GPT2_SPLIT_PATTERN)
    toks: list[str] = []
    for t in texts.to_pylist():
        if t:
            toks.extend(pat.findall(t))
    return pa.array(toks, pa.string())


def _to_symbols(pretok: str, b2u: "dict[int, str]") -> str:
    """UTF-8 bytes of a pre-token as the symbol string the merge engine
    consumes (one char per byte)."""
    return "".join(b2u[b] for b in pretok.encode("utf-8"))


def byte_bpe_merges(
    sf_dir: str,
    *,
    n_merges: int = 64,
    min_count: int = 2,
    max_word_types: int = 1_000_000,
    docs: rd.Dataset | None = None,
) -> rd.Dataset:
    """Train byte-level BPE on the corpus: GPT-2 regex pre-tokens,
    UTF-8-byte initial symbols (via ``bytes_to_unicode``), then the
    shared deterministic merge loop. Returns (rank, left, right,
    pair_count) in merge order. Rows-only for the driver (iterative);
    the pytest oracle retrains brute-force from an independently
    computed pre-token count table and asserts exact equality."""
    if docs is None:
        docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    types, freqs = _word_count_table(
        docs, max_word_types, token_fn=_pretokenize_column
    )
    b2u = bytes_to_unicode()
    sym_words = [_to_symbols(w, b2u) for w in types]
    merges = learn_bpe(sym_words, freqs, n_merges, min_count=min_count)
    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array(np.arange(len(merges), dtype=np.int64), _I64),
                "left": pa.array([m[0] for m in merges], pa.string()),
                "right": pa.array([m[1] for m in merges], pa.string()),
                "pair_count": pa.array([m[2] for m in merges], _I64),
            }
        )
    )


class _ByteBPEEncodeStage:
    """Actor-pool byte-level encode: merge ranks + byte map build once
    per actor; distinct pre-tokens encode once per batch (dictionary
    encode) with a memo across batches. Emits per-doc pre-token and
    token counts."""

    def __init__(self, merges: "list[tuple[str, str]]"):
        import re

        self._ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
        self._b2u = bytes_to_unicode()
        self._pat = re.compile(GPT2_SPLIT_PATTERN)
        self._cache: dict = {}

    def _tok_len(self, pretok: str) -> int:
        n = self._cache.get(pretok)
        if n is None:
            n = len(encode_word(_to_symbols(pretok, self._b2u), self._ranks))
            if len(self._cache) > 1_000_000:
                self._cache.clear()
            self._cache[pretok] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        toks: list[str] = []
        n_pre = np.zeros(n_docs, np.int64)
        for i, t in enumerate(batch.column("text").to_pylist()):
            if t:
                found = self._pat.findall(t)
                n_pre[i] = len(found)
                toks.extend(found)
        if toks:
            d = pa.array(toks, pa.string()).dictionary_encode()
            lens = np.fromiter(
                (self._tok_len(w) for w in d.dictionary.to_pylist()),
                dtype=np.int64,
                count=len(d.dictionary),
            )
            per_tok = lens[d.indices.to_numpy(zero_copy_only=False)]
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_pre)
            n_tokens = np.bincount(
                doc_of, weights=per_tok, minlength=n_docs
            ).astype(np.int64)
        else:
            n_tokens = np.zeros(n_docs, np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_pretokens": pa.array(n_pre, _I64),
                "n_tokens": pa.array(n_tokens, _I64),
            }
        )


def byte_bpe_encode_docs(
    sf_dir: str,
    *,
    n_merges: int = 64,
    min_count: int = 2,
    max_word_types: int = 1_000_000,
    concurrency: "int | tuple | None" = None,
) -> rd.Dataset:
    """Train byte-level BPE on the corpus, then encode the corpus under
    the trained vocabulary: (doc_id, n_pretokens, n_tokens). The
    byte-level twin of ``bpe_encode_docs`` — every byte is representable
    (no unknown-token path), which is why production tokenizers are
    byte-level."""
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    types, freqs = _word_count_table(
        docs, max_word_types, token_fn=_pretokenize_column
    )
    b2u = bytes_to_unicode()
    merges = [
        (l, r)
        for l, r, _ in learn_bpe(
            [_to_symbols(w, b2u) for w in types], freqs, n_merges,
            min_count=min_count,
        )
    ]
    return docs.map_batches(
        _ByteBPEEncodeStage,
        batch_format="pyarrow",
        fn_constructor_args=(merges,),
        concurrency=_pool_width(concurrency),
    )


def bpe_encode_docs(
    sf_dir: str,
    *,
    n_merges: int = 64,
    min_count: int = 2,
    max_word_types: int = 1_000_000,
    concurrency: "int | tuple | None" = None,
) -> rd.Dataset:
    """Train BPE on the corpus, then encode the corpus under the trained
    vocabulary: (doc_id, n_words, n_tokens). The token-count artifact
    every data-mixing / sequence-packing stage downstream consumes
    (``pack_token_bins`` packs by exactly such counts)."""
    docs = read_clean(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    words, freqs = _word_count_table(docs, max_word_types)
    merges = [
        (l, r) for l, r, _ in learn_bpe(words, freqs, n_merges, min_count=min_count)
    ]
    return docs.map_batches(
        _BPEEncodeStage,
        batch_format="pyarrow",
        fn_constructor_args=(merges,),
        concurrency=_pool_width(concurrency),
    )
