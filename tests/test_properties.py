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


@given(
    st.lists(
        st.lists(st.integers(0, 12), min_size=0, max_size=25),
        min_size=2,
        max_size=14,
    ),
    st.sampled_from([0.4, 0.65, 0.9]),
)
@settings(max_examples=10, deadline=None)
def test_containment_join_equals_brute_force(docs_words, threshold):
    """The containment prefix filter is EXACT on arbitrary small corpora:
    precisely the pairs with |A∩B| / min(|A|,|B|) >= t, no extras."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from newscrawler_ray.pipelines.dedup import (
        _shingles,
        ngram_containment_pairs,
    )

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
        (r["id_a"], r["id_b"], r["containment"])
        for r in ngram_containment_pairs(
            "unused", threshold=threshold, docs=ds, num_partitions=2
        ).take_all()
    )
    gs = [set(_shingles(t, 3).tolist()) for t in texts]
    exp = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            lo = min(len(gs[i]), len(gs[j]))
            if lo == 0:
                continue
            c = len(gs[i] & gs[j]) / lo
            if c >= threshold:
                exp.append((i, j, round(c, 4)))
    assert got == sorted(exp)


@given(
    st.lists(
        st.tuples(st.integers(0, 2**32 - 1), st.integers(0, 30)),
        min_size=0,
        max_size=60,
    ),
    st.integers(0, 400),
)
@settings(max_examples=10, deadline=None)
def test_prefix_cutoff_equals_running_sum(rows, budget):
    """global_prefix_cutoff == the driver-side inclusive running-sum cut
    for arbitrary keys/weights/budgets (duplicate keys break ties by the
    tiebreak column; zero weights ride along at the boundary)."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from newscrawler_ray.pipelines.ordering import global_prefix_cutoff

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=4, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    k = np.array([r[0] for r in rows], np.int64)
    w = np.array([r[1] for r in rows], np.int64)
    tb = np.arange(len(rows), dtype=np.int64)
    out = global_prefix_cutoff(
        rd.from_arrow(pa.table({"k": k, "tb": tb, "w": w})),
        "k", "tb", "w", budget, n_buckets=8,
    ).take_all()
    order = np.lexsort((tb, k))
    cum = np.cumsum(w[order]) if len(rows) else np.zeros(0, np.int64)
    keep = cum <= budget
    exp = {int(tb[order[i]]): int(cum[i]) for i in np.nonzero(keep)[0]}
    assert {r["tb"]: r["cum"] for r in out} == exp


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=0, max_size=40
    ),
    split=st.integers(1, 5),
)
@settings(max_examples=300, deadline=None)
def test_skyline_kernel_equals_brute_force(rows, split):
    """_skyline2d == O(n^2) strict-Pareto domination; and the
    block-local-then-global composition is exact for any block split
    (tiny domains force heavy duplicate/tie coverage)."""
    from newscrawler_ray.pipelines.queries import _skyline2d

    price = np.array([r[0] for r in rows], np.float64)
    date = np.array([r[1] for r in rows], np.int64)
    n = len(rows)
    brute = np.ones(n, bool)
    for i in range(n):
        for j in range(n):
            if (
                price[j] >= price[i]
                and date[j] >= date[i]
                and (price[j] > price[i] or date[j] > date[i])
            ):
                brute[i] = False
                break
    got = _skyline2d(price, date)
    assert got.tolist() == brute.tolist()
    # distributed composition: local skyline per block, then global
    idx = np.arange(n)
    cand = []
    for b in range(split):
        blk = idx[idx % split == b]
        if len(blk):
            cand.append(blk[_skyline2d(price[blk], date[blk])])
    cand = np.concatenate(cand) if cand else np.array([], np.int64)
    final = cand[_skyline2d(price[cand], date[cand])]
    assert sorted(final.tolist()) == sorted(idx[brute].tolist())
