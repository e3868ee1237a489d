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
