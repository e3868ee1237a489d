"""Vectorized text-hash kernels: golden pins + batch/per-doc parity.

The near-dup family (minhash/simhash/LSH buckets) groups rows ACROSS
batches by hash value, so the kernels must be batch-composition-invariant
and stable across releases — the goldens pin that contract.
"""

import numpy as np
import pyarrow as pa
import pytest

from newscrawler_ray.functions.hashing import (
    hash_string_array,
    shingle_hashes,
    tokenize_word_hashes,
    word_hashes,
)
from newscrawler_ray.pipelines.dedup import (
    minhash_signature,
    minhash_signatures_batch,
    ngram_jaccard,
    simhash64,
    simhash64_batch,
)

_DOC = "the quick brown fox jumps over the lazy dog"
_EDGE = ["", "one", "two words", "a b c d", "Héllo, wörld!", "x " * 500]


def test_minhash_golden_pin():
    sig = minhash_signature(_DOC)
    assert sig[:4].tolist() == [
        841992645867285354,
        3893889135144769253,
        486172634642817767,
        798991624439975087,
    ]


def test_simhash_golden_pin():
    assert simhash64(_DOC) == 6560616592138111587


def test_batch_matches_per_doc():
    docs = [_DOC, *_EDGE, _DOC + " again"]
    sigs = minhash_signatures_batch(docs)
    sims = simhash64_batch(docs)
    for i, d in enumerate(docs):
        np.testing.assert_array_equal(sigs[i], minhash_signature(d))
        assert sims[i] == simhash64(d)


def test_batch_composition_invariant():
    """Hash of a doc must not depend on which other docs share its batch
    (bucket groupby joins hashes across batches)."""
    solo = minhash_signatures_batch([_DOC])[0]
    mixed = minhash_signatures_batch(["zzz " * 100, _DOC, "a"])[1]
    np.testing.assert_array_equal(solo, mixed)
    assert simhash64_batch([_DOC])[0] == simhash64_batch(["b c", _DOC])[1]


def test_arrow_column_input_matches_list():
    docs = [_DOC, *_EDGE]
    col = pa.array(docs, pa.string())
    np.testing.assert_array_equal(
        minhash_signatures_batch(col), minhash_signatures_batch(docs)
    )
    np.testing.assert_array_equal(simhash64_batch(col), simhash64_batch(docs))


def test_word_hash_prefix_truncation_is_deterministic():
    long_a = "a" * 30 + "x"
    long_b = "a" * 30 + "y"  # same 24-byte prefix -> same hash (documented)
    ha, hb = word_hashes([long_a, long_b])
    assert ha == hb
    assert word_hashes(["abc"])[0] != word_hashes(["abd"])[0]


def test_tokenizer_offsets_and_empties():
    flat, offs = tokenize_word_hashes(["a b", "", "!!", "c"])
    assert offs.tolist() == [0, 2, 2, 2, 3]
    assert len(flat) == 3
    # null-safe
    flat2, offs2 = tokenize_word_hashes(pa.array(["a b", None], pa.string()))
    assert offs2.tolist() == [0, 2, 2]


def test_shingle_short_doc_convention():
    wh = word_hashes(["a", "b"])
    sh = shingle_hashes(wh, k=3)
    assert len(sh) == 1  # <k words -> one shingle over all words
    assert len(shingle_hashes(np.empty(0, np.uint64), 3)) == 0


def test_hash_string_array_sliced():
    arr = pa.array(["pad", "x", "y", "z"]).slice(1, 3)
    h = hash_string_array(arr)
    np.testing.assert_array_equal(h, word_hashes(["x", "y", "z"]))


def test_jaccard_unaffected():
    assert ngram_jaccard(_DOC, _DOC) == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0
    near = _DOC.replace("lazy", "sleepy")
    assert 0.0 < ngram_jaccard(_DOC, near) < 1.0


# ---------------------------------------------- 128-bit content hash pair


def test_hash_text_array_128_batch_invariant():
    """Equal strings hash equal regardless of batch composition, slicing,
    offset, chunking, or string/large_string storage."""
    from newscrawler_ray.functions.hashing import hash_text_array_128

    texts = ["", "a", "hello world", "x" * 7, "x" * 8, "x" * 9,
             "the quick brown fox" * 50, "éü unicode 中文"]
    arr = pa.array(texts, pa.string())
    a1, b1 = hash_text_array_128(arr)
    assert a1.dtype == np.int64 and b1.dtype == np.int64
    for i, t in enumerate(texts):
        a2, b2 = hash_text_array_128(pa.array([t], pa.string()))
        assert (a2[0], b2[0]) == (a1[i], b1[i])
    a3, b3 = hash_text_array_128(arr.slice(2, 4))
    assert a3.tolist() == a1[2:6].tolist() and b3.tolist() == b1[2:6].tolist()
    a4, _ = hash_text_array_128(pa.array(texts, pa.large_string()))
    assert a4.tolist() == a1.tolist()
    a5, _ = hash_text_array_128(
        pa.chunked_array([arr.slice(0, 3), arr.slice(3)])
    )
    assert a5.tolist() == a1.tolist()
    az, bz = hash_text_array_128(pa.array([], pa.string()))
    assert len(az) == 0 and len(bz) == 0


def test_hash_text_array_128_full_content_sensitivity():
    """The hash covers ALL bytes (not a fixed-width prefix like
    hash_string_array) and the two lanes are independent."""
    from newscrawler_ray.functions.hashing import hash_text_array_128

    long_shared_prefix = "p" * 500
    a, b = hash_text_array_128(
        pa.array([long_shared_prefix + "x", long_shared_prefix + "y",
                  "ab cd", "cd ab", "abcd ", " abcd"])
    )
    assert len(set(a.tolist())) == 6  # order + tail sensitive
    assert len(set(b.tolist())) == 6
    assert a.tolist() != b.tolist()  # lanes differ
    # scalar twin stays available for spot checks
    from newscrawler_ray.pipelines.dedup import content_hash64

    assert content_hash64("abc") != content_hash64("abd")


def test_hash_text_array_128_collision_free_at_test_scale():
    from newscrawler_ray.functions.hashing import hash_text_array_128

    many = pa.array([f"doc {i} payload" for i in range(50_000)])
    a, b = hash_text_array_128(many)
    assert len(set(zip(a.tolist(), b.tolist()))) == 50_000
