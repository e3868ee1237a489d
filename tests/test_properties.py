"""Property-based tests (hypothesis) for the deterministic kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from newscrawler_ray import codecs
from newscrawler_ray.functions.text import clean_text
from newscrawler_ray.functions.urls import canonicalize_url, url_hash64

_host = st.from_regex(r"[a-z]{1,10}(\.[a-z]{2,6}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,12}){0,4}", fullmatch=True)


@given(
    scheme=st.sampled_from(["http", "https"]),
    www=st.booleans(),
    host=_host,
    path=_path,
    slash=st.booleans(),
    frag=st.sampled_from(["", "#x", "#frag-1"]),
)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent_and_variant_invariant(scheme, www, host, path, slash, frag):
    url = f"{scheme}://{'www.' if www else ''}{host}{path}{'/' if slash else ''}{frag}"
    canon = canonicalize_url(url)
    # idempotent: canonical form is a fixed point
    assert canonicalize_url(canon) == canon
    # variant-invariant: scheme/www/trailing-slash/fragment never matter
    assert canon == canonicalize_url(f"http://{host}{path}")
    # hash is stable under variants
    assert url_hash64(canon) == url_hash64(canonicalize_url(f"https://www.{host}{path}/"))


@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    seed=st.integers(0, 2**31 - 1),
    fmt=st.sampled_from(["ppm", "png"]),
)
@settings(max_examples=40, deadline=None)
def test_lossless_roundtrip_property(h, w, seed, fmt):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode(codecs.encode(img, fmt), fmt), img)


@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_qnt_psnr_property(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = codecs.decode(codecs.encode(img, "qnt"), "qnt")
    assert codecs.psnr(img, out) >= 40.0


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_clean_text_properties(s):
    out = clean_text(s)
    # no control chars, no doubled whitespace, no leading/trailing space
    assert not any(ord(c) < 32 and c != " " for c in out)
    assert "  " not in out
    assert out == out.strip()
    # idempotent
    assert clean_text(out) == out


@given(
    st.lists(
        st.lists(st.integers(0, 12), min_size=0, max_size=25),
        min_size=2,
        max_size=14,
    ),
    st.sampled_from([0.31, 0.6, 0.85]),
)
@settings(max_examples=12, deadline=None)
def test_prefix_filter_join_equals_brute_force(docs_words, threshold):
    """The prefix-filter set-similarity join is EXACT: on arbitrary small
    corpora it returns precisely the pairs brute-force Jaccard accepts."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from newscrawler_ray.pipelines.dedup import ngram_jaccard_pairs, ngram_jaccard

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=4, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    texts = [" ".join(f"w{w}" for w in words) for words in docs_words]
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts)}
        )
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            "unused", threshold=threshold, docs=ds, num_partitions=2
        ).take_all()
    )
    nonempty = [bool(t.split()) for t in texts]
    # SQL semantics: zero-gram docs pair with nothing (the operator
    # matches the oracle, not ngram_jaccard's empty==empty convention)
    exp = sorted(
        (i, j, round(ngram_jaccard(texts[i], texts[j], 3), 4))
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if nonempty[i] and nonempty[j]
        and round(ngram_jaccard(texts[i], texts[j], 3), 4) >= threshold
    )
    assert got == exp
