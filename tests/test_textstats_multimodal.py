import numpy as np
import pyarrow as pa
import pytest

from newscrawler_ray import codecs
from newscrawler_ray.pipelines import multimodal, textstats

SF = "/root/testdata/sf0.01"


def test_bpe_token_stats_matches_sql(ray_session):
    import duckdb

    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in textstats.bpe_token_stats(SF).take_all()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = dict(
        con.execute(
            r"SELECT doc_id, len(regexp_extract_all(text, '\w+|[^\w\s]')) FROM documents"
        ).fetchall()
    )
    assert got == want


def test_lang_id_heuristics():
    lid = textstats.LangId()
    assert lid.guess("the cat sat on the mat and it was happy")[0] == "en"
    assert lid.guess("der hund ist nicht in der küche und die katze")[0] == "de"
    assert lid.guess("这是一个中文句子")[0] == "zh"
    assert lid.guess("")[0] == "unknown"


def test_lang_id_pipeline_runs(ray_session):
    out = textstats.lang_id(SF).take(20)
    assert all(r["lang_pred"] in {"en", "de", "es", "fr", "zh", "unknown"} for r in out)


def test_quality_score_bounds(ray_session):
    rows = textstats.quality_score(SF).take(50)
    for r in rows:
        assert 0.0 <= r["quality"] <= 1.0
        assert r["n_tokens"] > 0


def test_winnow_fingerprints_properties():
    a = textstats.winnow_fingerprints("the quick brown fox jumps over the lazy dog")
    b = textstats.winnow_fingerprints("the quick brown fox jumps over the lazy dog")
    np.testing.assert_array_equal(a, b)
    c = textstats.winnow_fingerprints("totally different text with other content here")
    assert set(a.tolist()) != set(c.tolist())
    # shared long substring -> shared fingerprints (the winnowing guarantee)
    d = textstats.winnow_fingerprints(
        "PREFIX the quick brown fox jumps over the lazy dog SUFFIX"
    )
    assert len(set(a.tolist()) & set(d.tolist())) > 0


def test_image_features_real_decode(ray_session, fixture_dir):
    ds = multimodal.image_features(fixture_dir / "images.parquet")
    rows = ds.take(40)
    for r in rows:
        if r["fmt"] in codecs.LOSSLESS_FMTS:
            assert r["phash_decoded"] == r["phash"]
        assert r["feature_error"] is None
        thumb = codecs.decode_ppm(r["thumbnail"])
        assert thumb.shape == (16, 16, 3)
        assert 0.0 <= r["mean_r"] <= 255.0


def test_image_features_stub_for_unknown_fmt(ray_session):
    import ray.data as rd

    img = np.zeros((8, 8, 3), np.uint8)
    tbl = pa.table(
        {
            "image_id": ["x", "y"],
            "bytes": pa.array([codecs.encode_ppm(img), b"\xff\xd8fakejpeg"], pa.binary()),
            "w": pa.array([8, 8], pa.int32()),
            "h": pa.array([8, 8], pa.int32()),
            "fmt": ["ppm", "jpeg"],
            "caption": ["a", "b"],
            "phash": pa.array([0, 0], pa.int64()),
        }
    )
    out = rd.from_arrow(tbl).map_batches(
        multimodal.ImageFeatures, batch_format="pyarrow", concurrency=1
    ).take_all()
    by_id = {r["image_id"]: r for r in out}
    assert by_id["x"]["feature_error"] is None
    assert "external codec" in by_id["y"]["feature_error"]
    assert by_id["y"]["thumbnail"] is None


def test_phash_near_dup_groups(ray_session, fixture_dir):
    groups = multimodal.phash_near_dup_groups(fixture_dir / "images.parquet").take_all()
    assert len(groups) > 0
    assert all(g["n_images"] > 1 for g in groups)


def test_video_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.sample_video_frames(b"abc")


def test_lang_id_batch_matches_guess_loop(ray_session):
    """The vectorized batch path (hashed-stopword membership + segment
    sums) must reproduce the per-doc reference `guess` exactly —
    including empty docs, CJK, ties, and rounding."""
    import pyarrow.parquet as pq

    texts = (
        pq.read_table(f"{SF}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()[:300]
    )
    texts += ["", "   ", "the of and", "der die und das ist", "这是中文",
              "one two three", "el la de que y en un"]
    lid = textstats.LangId()
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = lid(batch)
    preds = out.column("lang_pred").to_pylist()
    confs = out.column("confidence").to_pylist()
    for i, t in enumerate(texts):
        p, c = lid.guess(t)
        assert (p, round(c, 4)) == (preds[i], round(confs[i], 4)), repr(t)


def test_winnow_batch_matches_per_doc():
    """winnow_stats_batch must be bit-identical to per-doc
    winnow_fingerprints — short docs (zero-padding path), empty docs,
    repeated k-grams, and the n<=window single-fingerprint branch."""
    import pyarrow.parquet as pq

    texts = (
        pq.read_table(f"{SF}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()[:200]
    )
    texts += ["", "a", "ab", "x" * 7, "x" * 8, "x" * 9, "abcd" * 4,
              "the the the the", "word " * 100]
    ns, mins = textstats.winnow_stats_batch(texts)
    for i, t in enumerate(texts):
        f = textstats.winnow_fingerprints(t)
        assert len(f) == ns[i] and int(f.min()) == int(mins[i]), repr(t)


def test_pack_token_bins_invariants(ray_session):
    """Sequence packing: exact cover, capacity bound (oversized docs get
    a bin alone), the first-fit property (at most one bin <= half full
    per block), and bit-identical determinism across runs."""
    import collections

    from newscrawler_ray.pipelines.textstats import pack_token_bins

    cap = 256
    rows = pack_token_bins(SF, capacity=cap).take_all()
    rows2 = pack_token_bins(SF, capacity=cap).take_all()
    key = lambda rs: sorted((r["doc_id"], r["bin_id"]) for r in rs)  # noqa: E731
    assert key(rows) == key(rows2)
    assert len({r["doc_id"] for r in rows}) == len(rows)  # exact cover
    per = collections.defaultdict(int)
    members = collections.Counter()
    for r in rows:
        per[r["bin_id"]] += r["n_bpe_tokens"]
        members[r["bin_id"]] += 1
    for b, total in per.items():
        assert total <= cap or members[b] == 1, (b, total, members[b])
    byblock = collections.defaultdict(list)
    for b, total in per.items():
        byblock[b // 100_000].append(total)
    for blk, totals in byblock.items():
        assert sum(v <= cap // 2 for v in totals) <= 1, (blk, totals)


def test_gopher_repetition_brute_force(ray_session, tmp_path):
    """gopher_repetition matches a per-doc Python brute force, including
    the edge docs (empty, single word, all-identical words)."""
    import re
    from collections import Counter

    texts = [
        "",                     # 0 words
        "word",                 # 1 word, 0 2-grams
        "a a a a a a",          # fully duplicated
        "one two three four five six seven eight",   # all unique
        "x y x y x y z q r s t u v w",               # mixed
        "Sp!it-on  punct,and CASE case",             # tokenizer edges
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    import pyarrow.parquet as pq
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = {
        r["doc_id"]: r
        for r in textstats.gopher_repetition(str(tmp_path)).take_all()
    }
    for i, t in enumerate(texts):
        words = [w for w in re.split(r"\W+", t.lower()) if w]
        grams = [
            (words[j], words[j + 1]) for j in range(max(len(words) - 1, 0))
        ]
        wc, gc = Counter(words), Counter(grams)
        dup_w = sum(k for k in wc.values() if k >= 2)
        dup_2 = sum(k for k in gc.values() if k >= 2)
        top_2 = max(gc.values(), default=0)
        r = out[i]
        assert r["n_words"] == len(words)
        assert r["dupword_frac"] == round(
            dup_w / max(len(words), 1) + 1e-9, 4)
        assert r["dup2_frac"] == round(dup_2 / max(len(grams), 1) + 1e-9, 4)
        assert r["top2_frac"] == round(top_2 / max(len(grams), 1) + 1e-9, 4)
        assert r["keep"] == int(
            r["dupword_frac"] <= 0.8
            and r["dup2_frac"] <= 0.08
            and r["top2_frac"] <= 0.05
        )


def test_bloom_dedup_images_matches_exact(ray_session, fixture_dir):
    """No false negatives vs a driver-side exact computation; FP drops
    bounded; survivors are first-wins per phash within the snapshot."""
    import pyarrow.parquet as pq

    from newscrawler_ray.functions.hashing import hash_string_array

    t = pq.read_table(fixture_dir / "images.parquet", columns=["image_id", "phash"])
    ids = t.column("image_id").to_numpy(zero_copy_only=False)
    hs = hash_string_array(t.column("image_id").combine_chunks()) % np.uint64(7)
    ph = t.column("phash").to_numpy()
    old_ph = set(ph[hs < 5].tolist())
    new_ids, new_ph = ids[hs >= 5], ph[hs >= 5]
    exact = {}
    for i, h in sorted(zip(new_ids.tolist(), new_ph.tolist())):
        if h not in old_ph and h not in exact:
            exact[h] = i
    exact_ids = set(exact.values())

    got = set(
        multimodal.bloom_dedup_images(fixture_dir / "images.parquet")
        .to_pandas()["image_id"]
        .tolist()
    )
    assert got <= exact_ids  # bloom never keeps what exact drops
    assert len(exact_ids - got) <= max(2, int(0.05 * len(exact_ids)))
    assert len(got) > 0


def test_quality_classifier_distills_gate(ray_session):
    """Training on the engine: per-epoch mean log-loss decreases from
    the ln(2) start, the trained model agrees with the weak labels far
    above the majority-class rate, and reruns are bit-identical
    (bkey-ordered gradient folds)."""
    from newscrawler_ray.pipelines.classify import quality_classifier_scores

    sf = "/root/testdata/sf0.01"
    out, hist = quality_classifier_scores(sf, return_history=True)
    df = out.to_pandas()
    assert len(hist) == 30
    assert hist[0] <= 0.6932  # first step from w=0: exactly ln 2
    assert hist[-1] < hist[0] * 0.9  # loss actually fell
    pred = (df["prob"] >= 0.5).astype(int)
    acc = (pred == df["weak_label"]).mean()
    majority = max(df["weak_label"].mean(), 1 - df["weak_label"].mean())
    assert acc >= max(0.8, majority), (acc, majority)

    df2 = quality_classifier_scores(sf).to_pandas()
    m1 = df.sort_values("doc_id", ignore_index=True)
    m2 = df2.sort_values("doc_id", ignore_index=True)
    assert (m1["prob"].values == m2["prob"].values).all()


def test_phash_radius_near_dup_matches_brute(ray_session, fixture_dir):
    """The 4-band pigeonhole over phashes must equal the brute-force
    all-pairs hamming scan (nonzero hashes; zero-hash rows form a star
    — none in this fixture)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        fixture_dir / "images.parquet", columns=["image_id", "phash"]
    )
    ids = t.column("image_id").to_pylist()
    h = t.column("phash").to_numpy().view(np.uint64)
    want = {}
    x = h[:, None] ^ h[None, :]
    # vectorized popcount via unpackbits on the byte view
    ham = np.unpackbits(x.view(np.uint8).reshape(len(h), len(h), 8), axis=2).sum(
        axis=2
    )
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            if ham[i, j] <= 3:
                a, b = sorted((ids[i], ids[j]))
                want[(a, b)] = int(ham[i, j])
    got = {
        (r["image_id_a"], r["image_id_b"]): r["hamming"]
        for r in multimodal.phash_radius_near_dup(
            fixture_dir / "images.parquet"
        ).take_all()
    }
    assert got == want and len(got) > 0


def test_phash_radius_zero_hash_star(ray_session, tmp_path):
    """Planted all-zero phashes (blank images) form a spanning star, not
    a quadratic clique; nonzero near-zero hashes are not paired with
    them (documented deviation)."""
    import pyarrow.parquet as pq

    ids = [f"img-{i:08d}" for i in range(8)]
    ph = [0, 0, 0, 1, (1 << 5) | 1, 7 << 60, (7 << 60) | 2, 1 << 63]
    pq.write_table(
        pa.table(
            {"image_id": pa.array(ids),
             "phash": pa.array(np.array(ph, dtype=np.uint64).view(np.int64))}
        ),
        tmp_path / "images.parquet",
    )
    got = {
        (r["image_id_a"], r["image_id_b"]): r["hamming"]
        for r in multimodal.phash_radius_near_dup(
            tmp_path / "images.parquet"
        ).take_all()
    }
    # star over the three zero rows
    assert got[(ids[0], ids[1])] == 0 and got[(ids[0], ids[2])] == 0
    assert (ids[1], ids[2]) not in got
    # nonzero near-dups found by the pigeonhole
    assert got[(ids[3], ids[4])] == 1  # 1 ^ 33 = 32: one differing bit
    assert got[(ids[5], ids[6])] == 1
    # zero rows never pair with nonzero hashes (even hamming-1 ones)
    assert (ids[0], ids[3]) not in got and (ids[0], ids[7]) not in got


def test_chunk_documents_window_invariants(ray_session, tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.RandomState(3)
    texts = [
        " ".join(f"t{j}" for j in range(n))
        for n in (1, 5, 12, 13, 24, 25, 40, 100)
    ] + ["", "   "]  # empty/whitespace: one empty token (token_stats rule)
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}),
        tmp_path / "documents.parquet",
    )
    rows = textstats.chunk_documents(
        str(tmp_path), chunk_tokens=24, stride=12
    ).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    for d, text in enumerate(texts):
        toks = text.strip().split(" ") if text.strip() else [""]
        # token_stats contract: split on \s+ after trim; '' -> ['']
        import re
        toks = re.split(r"\s+", text.strip()) if text.strip() else [""]
        n = len(toks)
        want_chunks = -(-n // 12)
        got = by_doc[d]
        assert sorted(got) == list(range(want_chunks)), (d, n)
        for cid, r in got.items():
            window = toks[cid * 12: cid * 12 + 24]
            assert r["chunk_text"] == " ".join(window)
            assert r["n_chunk_tokens"] == len(window)
        # stride < chunk: consecutive windows overlap by chunk - stride
        # unless the doc ends first; every token index is covered
        covered = set()
        for cid in got:
            covered.update(range(cid * 12, min(cid * 12 + 24, n)))
        assert covered == set(range(n))


def test_chunk_documents_rejects_bad_params(ray_session):
    with pytest.raises(ValueError):
        textstats.chunk_documents("unused", chunk_tokens=0)
    with pytest.raises(ValueError):
        textstats.chunk_documents("unused", stride=0)


def test_phash_dedup_images_matches_union_find(ray_session, fixture_dir):
    """Survivor set == driver union-find over the brute-force <=3-hamming
    pair graph (zero-hash rows form their own star component)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        fixture_dir / "images.parquet", columns=["image_id", "phash"]
    )
    ids = t.column("image_id").to_pylist()
    h = t.column("phash").to_numpy().view(np.uint64)
    parent = list(range(len(ids)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    x = h[:, None] ^ h[None, :]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(h), len(h), 8), axis=2).sum(axis=2)
    zero = h == 0
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            linked = (
                (zero[i] and zero[j])          # star bucket
                or (not zero[i] and not zero[j] and ham[i, j] <= 3)
            )
            if linked:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comp = {}
    for i in range(len(ids)):
        comp.setdefault(find(i), []).append(ids[i])
    want = sorted(min(members) for members in comp.values())
    got = sorted(
        r["image_id"]
        for r in multimodal.phash_dedup_images(fixture_dir / "images.parquet").take_all()
    )
    assert got == want and 0 < len(got) < len(ids)


def test_phash_keep_best_planted_policy(ray_session):
    """Keep-best picks the max-pixel member per cluster, min id on ties;
    singletons always survive."""
    import ray.data as rd

    ha = 0x123456789ABCDEF0
    hb = 0x0F0F0F0FF0F0F0F0  # hamming(ha, hb) = 36: never merges with A
    rows = [
        # cluster A: identical phash, id 3 has the most pixels
        {"image_id": "img-00000001", "phash": ha, "w": 10, "h": 10},
        {"image_id": "img-00000002", "phash": ha, "w": 50, "h": 40},
        {"image_id": "img-00000003", "phash": ha, "w": 100, "h": 90},
        # cluster B: pixel tie -> smaller id wins
        {"image_id": "img-00000004", "phash": hb, "w": 64, "h": 64},
        {"image_id": "img-00000005", "phash": hb ^ 3, "w": 64, "h": 64},
        # singleton far from everything
        {"image_id": "img-00000009", "phash": -123456789, "w": 1, "h": 1},
    ]
    got = sorted(
        r["image_id"]
        for r in multimodal.phash_dedup_keep_best(
            rd.from_items(rows).repartition(3)
        ).take_all()
    )
    assert got == ["img-00000003", "img-00000004", "img-00000009"]


def test_phash_keep_best_matches_union_find(ray_session, fixture_dir):
    """Survivor set == driver union-find + (max pixels, min id) winner
    per component over the brute-force pair graph."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        fixture_dir / "images.parquet", columns=["image_id", "phash", "w", "h"]
    )
    ids = t.column("image_id").to_pylist()
    px = (
        t.column("w").to_numpy().astype(np.int64)
        * t.column("h").to_numpy().astype(np.int64)
    )
    h = t.column("phash").to_numpy().view(np.uint64)
    parent = list(range(len(ids)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    x = h[:, None] ^ h[None, :]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(h), len(h), 8), axis=2).sum(axis=2)
    zero = h == 0
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            if (zero[i] and zero[j]) or (
                not zero[i] and not zero[j] and ham[i, j] <= 3
            ):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comp: dict[int, list[int]] = {}
    for i in range(len(ids)):
        comp.setdefault(find(i), []).append(i)
    want = sorted(
        ids[min((m for m in members), key=lambda m: (-px[m], ids[m]))]
        for members in comp.values()
    )
    got = sorted(
        r["image_id"]
        for r in multimodal.phash_dedup_keep_best(
            fixture_dir / "images.parquet"
        ).take_all()
    )
    assert got == want and 0 < len(got) < len(ids)


def test_image_channel_stats_brute(ray_session, fixture_dir):
    """Distributed fold equals a single-process brute force over every
    decodable image, and the skipped-format counter is exact."""
    import numpy as np
    import pyarrow.parquet as pq

    out = multimodal.image_channel_stats(fixture_dir / "images.parquet")
    t = pq.read_table(fixture_dir / "images.parquet", columns=["bytes", "fmt"])
    s = np.zeros(3)
    s2 = np.zeros(3)
    n = 0
    failed = 0
    for raw, fmt in zip(t.column("bytes").to_pylist(), t.column("fmt").to_pylist()):
        try:
            img = multimodal.decode_any(raw, fmt).reshape(-1, 3).astype(np.float64)
        except NotImplementedError:
            failed += 1
            continue
        s += img.sum(axis=0)
        s2 += (img * img).sum(axis=0)
        n += img.shape[0]
    mean = s / n
    std = np.sqrt(s2 / n - mean * mean)
    assert out.column("channel").to_pylist() == ["r", "g", "b"]
    assert out.column("n_pixels").to_pylist() == [n] * 3
    assert out.column("n_failed").to_pylist() == [failed] * 3
    np.testing.assert_allclose(out.column("mean").to_numpy(), np.round(mean, 6), atol=1e-6)
    np.testing.assert_allclose(out.column("std").to_numpy(), np.round(std, 6), atol=1e-6)


# ------------------------------------------------- strip_image_metadata


def test_strip_restores_planted_bytes_exactly(ray_session, fixture_dir):
    import pyarrow.parquet as pq

    orig = {
        r["image_id"]: r["bytes"]
        for r in pq.read_table(fixture_dir / "images.parquet")
        .select(["image_id", "bytes"])
        .to_pylist()
    }
    out = multimodal.strip_image_metadata(
        fixture_dir / "images.parquet", plant=True
    ).take_all()
    assert len(out) == len(orig)
    for r in out:
        # planted-then-stripped payload is byte-identical to the original
        assert r["bytes"] == orig[r["image_id"]], r["image_id"]
        if r["fmt"] in ("png", "ppm"):
            assert r["n_meta"] == 1
            assert r["bytes_removed"] > 0
        else:  # qnt has no metadata container
            assert r["n_meta"] == 0
            assert r["bytes_removed"] == 0


def test_strip_flags_malformed_png_instead_of_crashing(ray_session):
    """A truncated/overrunning PNG chunk stream must flag the row
    (strip_error) and pass the payload through — not fail the task."""
    import ray.data as rd

    from newscrawler_ray import codecs

    good = codecs.encode_png(np.zeros((4, 4, 3), np.uint8))
    truncated = good[:20]  # signature + partial IHDR header
    # declared chunk length overruns the buffer
    import struct as _struct

    overrun = (
        multimodal._PNG_SIG
        + _struct.pack(">I", 1 << 20)
        + b"IHDR"
        + b"\x00" * 8
    )
    t = pa.table(
        {
            "image_id": ["ok", "trunc", "overrun"],
            "bytes": pa.array([good, truncated, overrun], pa.binary()),
            "fmt": ["png"] * 3,
        }
    )
    out = {
        r["image_id"]: r
        for r in multimodal.strip_image_metadata(rd.from_arrow(t)).take_all()
    }
    assert out["ok"]["strip_error"] is None
    assert out["trunc"]["strip_error"] and out["trunc"]["bytes"] == truncated
    assert out["overrun"]["strip_error"] and out["overrun"]["bytes"] == overrun


def test_strip_is_identity_on_clean_corpus(ray_session, fixture_dir):
    out = multimodal.strip_image_metadata(
        fixture_dir / "images.parquet", plant=False
    ).take_all()
    assert all(r["n_meta"] == 0 and r["bytes_removed"] == 0 for r in out)


def test_planted_payloads_still_decode_to_same_pixels(ray_session, fixture_dir):
    # the planted metadata is invisible to the decoders (ancillary chunk
    # skip / comment tolerance), so a non-scrubbing consumer still works
    import pyarrow.parquet as pq
    import ray.data as rd

    t = pq.read_table(fixture_dir / "images.parquet").slice(0, 64)
    planted = multimodal.plant_image_metadata(rd.from_arrow(t)).take_all()
    orig = {r["image_id"]: r for r in t.to_pylist()}
    for r in planted:
        a = multimodal.decode_any(r["bytes"], r["fmt"])
        b = multimodal.decode_any(orig[r["image_id"]]["bytes"], r["fmt"])
        np.testing.assert_array_equal(a, b)
