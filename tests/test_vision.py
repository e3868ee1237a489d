"""Image-text pair curation (vision.py): determinism, filter semantics,
planted near-dup recall. The encoder towers are deterministic stand-ins
(see vision.py module docstring) — these tests pin the contract that
makes them safe to swap for a real model."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from newscrawler_ray import codecs
from newscrawler_ray.pipelines import vision


def _read_images(fixture_dir, n=None):
    t = pq.read_table(fixture_dir / "images.parquet")
    return t.slice(0, n) if n else t


def test_pair_encoder_deterministic(fixture_dir):
    t = _read_images(fixture_dir, 32)
    a, b = vision.PairEncoder()(t), vision.PairEncoder()(t)
    assert a.equals(b)
    E = np.array(a.column("img_emb").to_pylist())
    T = np.array(a.column("txt_emb").to_pylist())
    np.testing.assert_allclose(np.linalg.norm(E, axis=1), 1.0, atol=1e-9)
    np.testing.assert_allclose(np.linalg.norm(T, axis=1), 1.0, atol=1e-9)
    assert np.all(np.abs(a.column("clip_score").to_numpy()) <= 1.0 + 1e-9)


def test_clip_score_filter_matches_driver_recompute(ray_session, fixture_dir):
    path = fixture_dir / "images.parquet"
    tau = 0.05
    got = {
        r["image_id"]: r["clip_score"]
        for r in vision.clip_score_filter(path, tau=tau).take_all()
    }
    ref = vision.PairEncoder()(_read_images(fixture_dir))
    scores = ref.column("clip_score").to_numpy()
    ids = ref.column("image_id").to_pylist()
    want = {i: s for i, s in zip(ids, scores) if s >= tau}
    assert got == pytest.approx(want)
    assert 0 < len(got) < len(ids)  # tau actually separates the corpus


def test_image_quality_filter_gates(ray_session, fixture_dir):
    path = fixture_dir / "images.parquet"
    rows = vision.image_quality_filter(path, min_w=32, min_h=32).take_all()
    assert len(rows) == _read_images(fixture_dir).num_rows  # tagging keeps all
    for r in rows:
        small = r["w"] < 32 or r["h"] < 32
        if r["keep"]:
            assert not small and r["reject_reason"] is None
        elif r["reject_reason"] == "too_small":
            assert small
    # fixture dims are {16,32,64}x{16,32,48} -> both outcomes occur
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)


def test_image_quality_filter_flat_image(ray_session, tmp_path):
    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8).astype(np.uint8)
    t = pa.table(
        {
            "image_id": ["img-00000000", "img-00000001"],
            "bytes": [codecs.encode_ppm(flat), codecs.encode_ppm(noisy)],
            "w": pa.array([16, 16], pa.int32()),
            "h": pa.array([16, 16], pa.int32()),
            "fmt": ["ppm", "ppm"],
            "phash": pa.array(
                [codecs.phash64(flat), codecs.phash64(noisy)], pa.int64()
            ),
        }
    )
    path = tmp_path / "flat.parquet"
    pq.write_table(t, path)
    rows = {
        r["image_id"]: r
        for r in vision.image_quality_filter(path, min_w=16, min_h=16).take_all()
    }
    assert rows["img-00000000"]["reject_reason"] == "flat_image"
    assert rows["img-00000001"]["keep"]


def test_image_near_dup_finds_planted(ray_session, fixture_dir):
    path = fixture_dir / "images.parquet"
    n = _read_images(fixture_dir).num_rows
    planted = {
        (f"img-{i - 1:08d}", f"img-{i:08d}") for i in range(1, n) if i % 97 == 0
    }
    assert planted  # fixture really plants pixel-identical dups
    found = {
        (r["image_a"], r["image_b"])
        for r in vision.image_near_dup_emb(path, tau=0.999).take_all()
    }
    assert planted <= found  # identical pixels -> cosine 1.0 -> always found
    # precision: every reported pair really clears tau under the encoder
    ref = vision.PairEncoder()(_read_images(fixture_dir))
    emb = {
        i: np.array(e)
        for i, e in zip(
            ref.column("image_id").to_pylist(), ref.column("img_emb").to_pylist()
        )
    }
    for a, b in found:
        assert float(emb[a] @ emb[b]) >= 0.999 - 1e-9


def test_curate_image_corpus_matches_driver_oracle(ray_session, fixture_dir):
    """Full-composition oracle: recompute quality AND clip AND
    dedup-after-filter on the driver (brute-force cosine + union-find)
    and require exact survivor-set equality. Brute force sees strictly
    more pairs than IVF, so oracle survivors <= pipeline survivors would
    signal missed dups; equality here also pins IVF recall at tau=0.999
    (pixel-identical dups land in the same cell by construction)."""
    path = fixture_dir / "images.parquet"
    min_w = min_h = 32
    tau_clip, tau_dup = 0.05, 0.999

    got = sorted(
        r["image_id"]
        for r in vision.curate_image_corpus(
            path, min_w=min_w, min_h=min_h, tau_clip=tau_clip, tau_dup=tau_dup
        ).take_all()
    )

    t = _read_images(fixture_dir)
    enc = vision.PairEncoder()(t)
    feats = {}
    for i in range(t.num_rows):
        img = codecs_decode(t.column("bytes")[i].as_py(), t.column("fmt")[i].as_py())
        feats[t.column("image_id")[i].as_py()] = float(img.std())
    ids = enc.column("image_id").to_pylist()
    scores = enc.column("clip_score").to_numpy()
    E = np.array(enc.column("img_emb").to_pylist())
    w = t.column("w").to_numpy()
    h = t.column("h").to_numpy()
    aspect = np.maximum(w, h) / np.minimum(w, h)
    good = [
        i
        for i in range(len(ids))
        if w[i] >= min_w and h[i] >= min_h and aspect[i] <= 3.0
        and feats[ids[i]] >= 1.0 and scores[i] >= tau_clip
    ]
    # union-find over brute-force pairs among good rows only
    parent = {i: i for i in good}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    G = E[good]
    sims = G @ G.T
    for a in range(len(good)):
        for b in range(a + 1, len(good)):
            if sims[a, b] >= tau_dup:
                ra, rb = find(good[a]), find(good[b])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = sorted(ids[i] for i in good if find(i) == i)
    assert got == want


def codecs_decode(data, fmt):
    from newscrawler_ray.pipelines.multimodal import decode_any

    return decode_any(data, fmt)


def test_image_knn_planted_twin_and_brute_parity(ray_session, fixture_dir):
    # img-00000097 is pixel-identical to img-00000096 (i%97==0 planting)
    path = fixture_dir / "images.parquet"
    out = vision.image_knn(path, query_image_id="img-00000097", k=5)
    got = out.column("image_id").to_pylist()
    assert got[0] == "img-00000096"
    assert out.column("sim")[0].as_py() == pytest.approx(1.0)
    # full parity vs brute-force driver recompute
    t = _read_images(fixture_dir)
    enc = vision.PairEncoder()(t)
    ids = np.array(enc.column("image_id").to_pylist())
    E = np.array(enc.column("img_emb").to_pylist())
    qi = int(np.nonzero(ids == "img-00000097")[0][0])
    sims = E @ E[qi]
    mask = ids != "img-00000097"
    order = np.lexsort((ids[mask], -sims[mask]))[:5]
    assert got == ids[mask][order].tolist()


def test_curate_crawl_output_matches_manual_dedup(ray_session, fixture_dir, tmp_path):
    """Crawl -> curate composition: equal to curating a manually
    first-wins-deduped parquet of the same stored rows."""
    import glob

    from newscrawler_ray.pipelines.crawl import run_crawl

    out = tmp_path / "crawl"
    run_crawl(fixture_dir, out, n_seen_shards=2, n_frontier_shards=2,
              checkpoint=False)
    got = sorted(
        r["image_id"]
        for r in vision.curate_crawl_output(out, min_w=16, min_h=16).take_all()
    )
    # oracle: pandas first-wins dedup by (image_id, min url_hash)
    import pandas as pd

    parts = [pq.read_table(p) for p in sorted(glob.glob(str(out / "waves" / "*" / "*.parquet")))]
    df = pa.concat_tables(parts, promote_options="default").to_pandas()
    df = df[df["stored"]]
    df = df.sort_values(["image_id", "url_hash"]).groupby("image_id", as_index=False).first()
    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    manual = tmp_path / "manual.parquet"
    pq.write_table(pa.Table.from_pandas(df[cols], preserve_index=False), manual)
    want = sorted(
        r["image_id"]
        for r in vision.curate_image_corpus(manual, min_w=16, min_h=16).take_all()
    )
    assert got == want
    assert len(got) == len(set(got))  # survivors are unique image_ids


def test_curate_image_corpus_empty_gate(ray_session, fixture_dir):
    # cosine can never exceed 1 -> nothing survives; the empty side must
    # short-circuit (all-empty datasets are zero-column and break joins)
    out = vision.curate_image_corpus(fixture_dir / "images.parquet", tau_clip=1.1)
    assert out.count() == 0
    assert out.schema().names == ["image_id"]


def test_curate_image_corpus_at_high_partition_count(ray_session, fixture_dir):
    """Production partition counts leave many hash partitions EMPTY on
    small pair sets; joins reject the resulting zero-column blocks
    unless each join output is coalesced before the next (this crashed
    curate_crawl_output at 32 CPUs while 4-CPU runs passed). Survivor
    set must match the default-partition run exactly. 8 partitions on a
    handful of pairs leaves most partitions empty — the crash shape —
    while staying schedulable at the 4-CPU test session (chained
    16-partition joins oversubscribe the aggregator actors there)."""
    path = fixture_dir / "images.parquet"
    want = sorted(
        r["image_id"] for r in vision.curate_image_corpus(path).take_all()
    )
    got = sorted(
        r["image_id"]
        for r in vision.curate_image_corpus(path, num_partitions=8).take_all()
    )
    assert got == want and len(got) > 0


def test_image_kmeans_planted_twins_cocluster(ray_session, fixture_dir):
    """Pixel-identical planted dups have identical embeddings, so they
    MUST land in the same cluster; output covers every decodable image,
    uses more than one cluster, and reruns identically."""
    path = fixture_dir / "images.parquet"
    out = {
        r["image_id"]: r["cluster"]
        for r in vision.image_kmeans(path).take_all()
    }
    n = _read_images(fixture_dir).num_rows
    planted = [
        (f"img-{i - 1:08d}", f"img-{i:08d}") for i in range(1, n) if i % 97 == 0
    ]
    assert planted
    for a, b in planted:
        if a in out and b in out:  # both decodable
            assert out[a] == out[b], (a, b)
    assert len(set(out.values())) > 1
    out2 = {
        r["image_id"]: r["cluster"]
        for r in vision.image_kmeans(path).take_all()
    }
    assert out2 == out


def test_image_knn_pq_recall(ray_session, fixture_dir):
    """PQ-code visual search recovers most of the exact image_knn
    top-k (ADC + exact refine; image tower vectors are structured, so
    recall is high) and is deterministic."""
    from newscrawler_ray.pipelines.vision import image_knn, image_knn_pq

    p = fixture_dir / "images.parquet"
    exact = image_knn(p, query_image_id="img-00000097", k=10)["image_id"].to_pylist()
    approx = image_knn_pq(p, query_image_id="img-00000097", k=10)["image_id"].to_pylist()
    assert len(set(approx) & set(exact)) / len(exact) >= 0.6
    again = image_knn_pq(p, query_image_id="img-00000097", k=10)["image_id"].to_pylist()
    assert again == approx


def test_export_image_shards_resumable(ray_session, fixture_dir, tmp_path):
    """Sharded curated-pair export: rows == curation survivors with full
    payload columns, shard assignment pure in image_id, rerun skips all,
    and a shard with its _DONE removed rewrites byte-identically."""
    path = fixture_dir / "images.parquet"
    out = tmp_path / "imgshards"
    man = vision.export_image_shards(path, out, n_shards=4).to_pylist()
    assert not any(r["skipped"] for r in man)

    surv = sorted(
        r["image_id"] for r in vision.curate_image_corpus(path).take_all()
    )
    rows = {}
    for s in range(4):
        sdir = out / f"shard={s:04d}"
        assert (sdir / "_DONE").exists()
        for f in sorted(sdir.glob("*.parquet")):
            for r in pq.read_table(f).to_pylist():
                rows[r["image_id"]] = (s, r)
    assert sorted(rows) == surv and len(surv) > 0
    # payload columns survive intact vs the source table
    src = {r["image_id"]: r for r in _read_images(fixture_dir).to_pylist()}
    for iid, (_, r) in rows.items():
        for col in ("bytes", "w", "h", "fmt", "caption", "phash"):
            assert r[col] == src[iid][col], (iid, col)

    # rerun: everything skipped
    man2 = vision.export_image_shards(path, out, n_shards=4).to_pylist()
    assert all(r["skipped"] for r in man2)

    # crash-resume: drop one shard's marker, rerun rewrites identical
    # rows (same contract as export_training_shards — the parquet file
    # layout may differ, the sorted row content may not)
    redo = next(s for s in range(4) if any(v[0] == s for v in rows.values()))
    sdir = out / f"shard={redo:04d}"
    before = pq.read_table(sdir).sort_by("image_id")
    (sdir / "_DONE").unlink()
    man3 = {r["shard"]: r for r in vision.export_image_shards(path, out, n_shards=4).to_pylist()}
    assert not man3[redo]["skipped"]
    after = pq.read_table(sdir).sort_by("image_id")
    assert before.equals(after)


def test_mine_hard_negatives_matches_brute_force(ray_session, fixture_dir):
    """Distributed all-pairs top-k == driver brute force exactly: same
    (image -> ranked negative captions) under the same 9-decimal sim
    rounding and (sim desc, cand asc) tie-break; a row's own caption
    never appears; every image with a valid encode gets exactly
    min(k, n-1) negatives."""
    path = fixture_dir / "images.parquet"
    k = 4
    got = {}
    for r in vision.mine_hard_negatives(path, k=k).take_all():
        got.setdefault(r["image_id"], []).append(
            (r["rank"], r["neg_image_id"], r["sim"])
        )
    for v in got.values():
        v.sort()

    enc = vision.PairEncoder()(_read_images(fixture_dir))
    ok = enc.filter(pc.is_null(enc.column("encode_error")))
    ids = ok.column("image_id").to_pylist()
    A = np.array(ok.column("img_emb").to_pylist())
    B = np.array(ok.column("txt_emb").to_pylist())
    sims = np.round(A @ B.T, 9)
    n = len(ids)
    assert set(got) == set(ids)
    for i in range(n):
        cands = sorted(
            ((-sims[i, j], ids[j]) for j in range(n) if j != i),
        )[:k]
        want = [(rk, cid, -negsim) for rk, (negsim, cid) in enumerate(cands)]
        assert got[ids[i]] == want, ids[i]
        assert len(got[ids[i]]) == min(k, n - 1)


def test_aspect_bucket_images_optimal_and_deterministic(ray_session, fixture_dir):
    path = fixture_dir / "images.parquet"
    rows = vision.aspect_bucket_images(path).take_all()
    t = _read_images(fixture_dir)
    assert len(rows) == t.num_rows  # every image gets a bucket
    blog = np.log(
        np.array([bw / bh for bw, bh in vision.DEFAULT_ASPECT_BUCKETS])
    )
    by_id = {r["image_id"]: r for r in rows}
    for iid, w, h in zip(
        t.column("image_id").to_pylist(),
        t.column("w").to_pylist(),
        t.column("h").to_pylist(),
    ):
        r = by_id[iid]
        # brute-force nearest-log-aspect with first-minimum tie-break
        d = np.abs(np.log(w / h) - blog)
        want = int(np.argmin(d))
        assert r["bucket_id"] == want, (iid, w, h)
        bw, bh = vision.DEFAULT_ASPECT_BUCKETS[want]
        assert (r["bucket_w"], r["bucket_h"]) == (bw, bh)
        assert (r["w"], r["h"]) == (w, h)
    # rerun determinism
    again = {r["image_id"]: r["bucket_id"]
             for r in vision.aspect_bucket_images(path).take_all()}
    assert again == {k: v["bucket_id"] for k, v in by_id.items()}


def test_aspect_bucket_extreme_ratios(ray_session, tmp_path):
    # wider-than-any-bucket and taller-than-any-bucket images clamp to
    # the widest / tallest rungs of the ladder
    t = pa.table(
        {
            "image_id": pa.array(["wide", "tall", "square"]),
            "w": pa.array([2048, 64, 100], pa.int32()),
            "h": pa.array([64, 2048, 100], pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "images.parquet")
    got = {
        r["image_id"]: (r["bucket_w"], r["bucket_h"])
        for r in vision.aspect_bucket_images(tmp_path / "images.parquet").take_all()
    }
    assert got["wide"] == (512, 128)
    assert got["tall"] == (128, 512)
    assert got["square"] == (256, 256)


def test_bucketed_training_batches_schedule(ray_session, fixture_dir):
    path = fixture_dir / "images.parquet"
    B = 8
    rows = vision.bucketed_training_batches(path, batch_size=B, seed=17).take_all()
    # exact numpy recompute: per bucket, order by (shuffle_key, int id),
    # cut to a multiple of B, then step/slot by position
    from newscrawler_ray.pipelines.ordering import shuffle_key

    t = _read_images(fixture_dir)
    ids = t.column("image_id").to_pylist()
    ints = np.array([int(i[4:]) for i in ids], np.int64)
    w = np.array(t.column("w").to_pylist(), np.float64)
    h = np.array(t.column("h").to_pylist(), np.float64)
    blog = np.log(np.array([bw / bh for bw, bh in vision.DEFAULT_ASPECT_BUCKETS]))
    bid = np.argmin(np.abs(np.log(w / h)[:, None] - blog[None, :]), axis=1)
    sk = shuffle_key(ints, 17)
    want = {}
    for b in np.unique(bid):
        m = np.nonzero(bid == b)[0]
        order = m[np.lexsort((ints[m], sk[m]))]
        cut = (len(order) // B) * B
        for within, idx in enumerate(order[:cut]):
            want[ids[idx]] = (int(b), within // B, within % B)
    got = {r["image_id"]: (r["bucket_id"], r["step"], r["slot"]) for r in rows}
    assert got == want and len(got) > 0
    # invariant: every (bucket, step) group holds exactly B slots 0..B-1
    groups = {}
    for r in rows:
        groups.setdefault((r["bucket_id"], r["step"]), []).append(r["slot"])
    for slots in groups.values():
        assert sorted(slots) == list(range(B))


def test_aspect_bucket_crop_geometry(ray_session, fixture_dir):
    # cover-resize + centered crop invariants: the resized image always
    # covers the bucket, the crop box sits inside it, and at least one
    # resized dimension is tight against the bucket (minimal scaling)
    rows = vision.aspect_bucket_images(fixture_dir / "images.parquet").take_all()
    for r in rows:
        assert r["resize_w"] >= r["bucket_w"] and r["resize_h"] >= r["bucket_h"]
        assert 0 <= r["crop_x"] <= r["resize_w"] - r["bucket_w"]
        assert 0 <= r["crop_y"] <= r["resize_h"] - r["bucket_h"]
        # centered crop
        assert r["crop_x"] == (r["resize_w"] - r["bucket_w"]) // 2
        assert r["crop_y"] == (r["resize_h"] - r["bucket_h"]) // 2
        # minimal cover: shrinking either resized dim by 1 would uncover
        scale = max(r["bucket_w"] / r["w"], r["bucket_h"] / r["h"])
        assert r["resize_w"] <= int(np.ceil(r["w"] * scale - 1e-9)) or (
            r["resize_w"] == r["bucket_w"]
        )
        # aspect preserved within rounding
        assert abs(r["resize_w"] / r["resize_h"] - r["w"] / r["h"]) < 0.2


def test_caption_dedup_images_first_wins(ray_session, fixture_dir):
    got = sorted(
        r["image_id"]
        for r in vision.caption_dedup_images(fixture_dir / "images.parquet").take_all()
    )
    t = _read_images(fixture_dir)
    first = {}
    for iid, cap in zip(
        t.column("image_id").to_pylist(), t.column("caption").to_pylist()
    ):
        if cap not in first or iid < first[cap]:
            first[cap] = iid
    assert got == sorted(first.values())


def test_sample_pixel_budget_matches_oracle(ray_session, fixture_dir):
    from newscrawler_ray.pipelines.ordering import shuffle_key

    t = _read_images(fixture_dir)
    ids = t.column("image_id").to_pylist()
    ints = np.array([int(i[4:]) for i in ids], np.int64)
    px = (
        np.array(t.column("w").to_pylist(), np.int64)
        * np.array(t.column("h").to_pylist(), np.int64)
    )
    sk = shuffle_key(ints, 17)
    order = np.lexsort((ints, sk))
    cum = np.cumsum(px[order])
    budget = int(cum[-1] // 3)
    keep = cum <= budget
    want = {ids[order[i]]: int(cum[i]) for i in np.nonzero(keep)[0]}
    got = {
        r["image_id"]: r["cum"]
        for r in vision.sample_pixel_budget(
            fixture_dir / "images.parquet", budget=budget
        ).take_all()
    }
    assert got == want and 0 < len(got) < len(ids)


def test_caption_dedup_images_planted_dups(ray_session, tmp_path):
    # planted boilerplate captions: 'image' shared by 3 rows, 'IMG'
    # shared by 2 — first (min id) wins; unique captions all survive
    ids = [f"img-{i:08d}" for i in range(10)]
    caps = ["image", "c1", "image", "IMG", "c2", "IMG", "image",
            "c3", "c4", "c5"]
    pq.write_table(
        pa.table({"image_id": pa.array(ids), "caption": pa.array(caps)}),
        tmp_path / "images.parquet",
    )
    got = sorted(
        r["image_id"]
        for r in vision.caption_dedup_images(tmp_path / "images.parquet").take_all()
    )
    want = sorted(ids[i] for i in (0, 1, 3, 4, 7, 8, 9))
    assert got == want


def test_augment_images_pixel_oracle_and_determinism(ray_session, fixture_dir):
    from newscrawler_ray.functions.hashing import splitmix64
    from newscrawler_ray.pipelines.multimodal import decode_any

    path = fixture_dir / "images.parquet"
    src = _read_images(fixture_dir, 24)
    out = (
        vision.augment_images(path, seed=7, out_w=32, out_h=48)
        .to_pandas()
        .set_index("image_id")
    )
    assert len(out) == _read_images(fixture_dir).num_rows
    assert out["aug_error"].isna().all()
    # brute-force per-row oracle: replay the documented transform chain
    ids = src.column("image_id").to_pylist()
    raws = src.column("bytes").to_pylist()
    fmts = src.column("fmt").to_pylist()
    seed = np.uint64((7 * 0x9E3779B97F4A7C15 + 1) % (1 << 64))
    for i in range(src.num_rows):
        img = decode_any(raws[i], fmts[i])
        h, w = img.shape[:2]
        d = int(splitmix64(np.array([int(ids[i][4:])], np.uint64) ^ seed)[0])
        ch, cw = max(1, int(h * 0.875)), max(1, int(w * 0.875))
        cy, cx = (d >> 1) % (h - ch + 1), (d >> 32) % (w - cw + 1)
        win = img[cy : cy + ch, cx : cx + cw]
        if d & 1:
            win = win[:, ::-1]
        iy = (np.arange(48) * ch) // 48
        ix = (np.arange(32) * cw) // 32
        want = win[iy][:, ix]
        row = out.loc[ids[i]]
        got = codecs.decode_ppm(row["bytes"])
        assert got.shape == (48, 32, 3)
        np.testing.assert_array_equal(got, want)
        assert (row["flipped"], row["crop_y"], row["crop_x"]) == (
            bool(d & 1), cy, cx,
        )
    # determinism across runs / partitionings: byte-identical output
    again = (
        vision.augment_images(path, seed=7, out_w=32, out_h=48, batch_size=5)
        .to_pandas()
        .set_index("image_id")
    )
    assert (out["bytes"] == again.loc[out.index, "bytes"]).all()
    # a different seed changes at least one crop or flip
    other = (
        vision.augment_images(path, seed=8, out_w=32, out_h=48)
        .to_pandas()
        .set_index("image_id")
    )
    assert (out["bytes"] != other.loc[out.index, "bytes"]).any()


def test_crawl_channel_stats_debiased(ray_session, fixture_dir, tmp_path):
    """Crawl -> channel stats equals a brute force over the FIRST-WINS
    DEDUPED stored rows (a duplicate fetch of one image must not bias
    the normalization constants)."""
    import glob

    import numpy as np
    from newscrawler_ray.pipelines import multimodal
    from newscrawler_ray.pipelines.crawl import run_crawl

    out = tmp_path / "crawl"
    run_crawl(fixture_dir, out, n_seen_shards=2, n_frontier_shards=2,
              checkpoint=False)
    got = vision.crawl_channel_stats(out)

    import pandas as pd

    parts = [pq.read_table(p) for p in sorted(glob.glob(str(out / "waves" / "*" / "*.parquet")))]
    df = pa.concat_tables(parts, promote_options="default").to_pandas()
    df = df[df["stored"]]
    df = df.sort_values(["image_id", "url_hash"]).groupby("image_id", as_index=False).first()
    s = np.zeros(3)
    s2 = np.zeros(3)
    n = 0
    for raw, fmt in zip(df["bytes"], df["fmt"]):
        img = multimodal.decode_any(raw, fmt).reshape(-1, 3).astype(np.float64)
        s += img.sum(axis=0)
        s2 += (img * img).sum(axis=0)
        n += img.shape[0]
    mean = s / n
    std = np.sqrt(s2 / n - mean * mean)
    assert got.column("n_pixels").to_pylist() == [n] * 3
    np.testing.assert_allclose(got.column("mean").to_numpy(), np.round(mean, 6), atol=1e-6)
    np.testing.assert_allclose(got.column("std").to_numpy(), np.round(std, 6), atol=1e-6)


def test_validate_payload_fidelity(ray_session, fixture_dir, tmp_path):
    """The fidelity pipeline passes on an honest crawl, catches a
    corrupted payload row, and catches a caption swap."""
    import glob

    from newscrawler_ray.pipelines.crawl import run_crawl
    from newscrawler_ray.pipelines.multimodal import validate_payload_fidelity

    out = tmp_path / "crawl"
    run_crawl(fixture_dir, out, n_seen_shards=2, n_frontier_shards=2,
              checkpoint=False)
    rep = {r["fmt"]: r for r in validate_payload_fidelity(out, 2000, 42).to_pylist()}
    assert rep, "no stored rows"
    for fmt, r in rep.items():
        assert r["pass_40db"], (fmt, r)
        assert r["n_caption_mismatch"] == 0
        if fmt in ("ppm", "png"):
            assert r["n_exact_pixel"] == r["n_rows"]
            assert r["min_psnr"] is None
        else:
            assert r["min_psnr"] is None or r["min_psnr"] >= 40.0

    # corrupt one stored row's caption in a copied crawl output
    bad = tmp_path / "bad"
    import shutil

    shutil.copytree(out, bad)
    files = sorted(glob.glob(str(bad / "waves" / "*" / "*.parquet")))
    t = pq.read_table(files[0])
    stored_idx = [i for i, v in enumerate(t.column("stored").to_pylist()) if v]
    assert stored_idx
    caps = t.column("caption").to_pylist()
    caps[stored_idx[0]] = "WRONG CAPTION"
    t = t.set_column(t.schema.get_field_index("caption"), "caption",
                     pa.array(caps, pa.string()))
    pq.write_table(t, files[0])
    rep2 = validate_payload_fidelity(bad, 2000, 42).to_pylist()
    assert sum(r["n_caption_mismatch"] for r in rep2) == 1
    assert any(not r["pass_40db"] for r in rep2)


def test_export_webdataset_shards(ray_session, fixture_dir, tmp_path):
    """Tar export: members read back byte-equal to the curated rows,
    reruns are byte-identical AND skip every finished shard, and a
    deleted shard is rebuilt bit-for-bit."""
    import hashlib
    import tarfile

    out = tmp_path / "wds"
    m1 = vision.export_webdataset_shards(
        fixture_dir / "images.parquet", out, n_shards=4
    )
    assert sorted(m1.column("shard").to_pylist()) == [0, 1, 2, 3]
    assert not any(m1.column("skipped").to_pylist())
    digests = {
        p.name: hashlib.sha256(p.read_bytes()).hexdigest()
        for p in sorted(out.glob("shard-*.tar"))
    }
    assert len(digests) == 4

    # member readback: every curated survivor appears exactly once with
    # its payload bytes and caption
    survivors = {
        r["image_id"]
        for r in vision.curate_image_corpus(fixture_dir / "images.parquet").take_all()
    }
    src = pq.read_table(
        fixture_dir / "images.parquet",
        columns=["image_id", "bytes", "fmt", "caption"],
    )
    by_id = {
        r["image_id"]: r for r in src.to_pylist() if r["image_id"] in survivors
    }
    seen = {}
    for p in sorted(out.glob("shard-*.tar")):
        with tarfile.open(p) as tf:
            for mem in tf.getmembers():
                assert mem.mtime == 0 and mem.uid == 0
                stem, ext = mem.name.rsplit(".", 1)
                data = tf.extractfile(mem).read()
                if ext == "txt":
                    assert data.decode() == by_id[stem]["caption"]
                else:
                    assert ext == by_id[stem]["fmt"]
                    assert data == by_id[stem]["bytes"]
                    seen[stem] = True
    assert set(seen) == survivors

    # rerun: all shards skipped, bytes untouched
    m2 = vision.export_webdataset_shards(
        fixture_dir / "images.parquet", out, n_shards=4
    )
    assert all(m2.column("skipped").to_pylist())
    assert digests == {
        p.name: hashlib.sha256(p.read_bytes()).hexdigest()
        for p in sorted(out.glob("shard-*.tar"))
    }

    # crash recovery: a missing shard rebuilds byte-identically
    victim = sorted(out.glob("shard-*.tar"))[1]
    name = victim.name
    victim.unlink()
    m3 = vision.export_webdataset_shards(
        fixture_dir / "images.parquet", out, n_shards=4
    )
    assert m3.column("skipped").to_pylist().count(False) == 1
    assert hashlib.sha256((out / name).read_bytes()).hexdigest() == digests[name]


def test_mixup_images_planted(ray_session, fixture_dir):
    """MixUp: per-row pixels equal the brute-force lambda blend of the
    augmented image with its sorted-id ring partner inside the same
    hash bucket; reruns byte-identical at a different partitioning."""
    import numpy as np

    from newscrawler_ray import codecs
    from newscrawler_ray.functions.hashing import splitmix64

    src = fixture_dir / "images.parquet"
    out = {r["image_id"]: r for r in vision.mixup_images(src, seed=3).take_all()}
    aug = {
        r["image_id"]: r
        for r in vision.augment_images(src, seed=3).take_all()
        if r["aug_error"] is None
    }
    assert set(out) == set(aug)
    # recompute one bucket brute-force
    B = 16  # recompute bucket assignment with the op's formula
    # (the op derives B from the cluster; re-derive per-row from hashes)
    ids = np.array([int(k.split("-")[1]) for k in aug], dtype=np.uint64)
    # EVERY row must reproduce from its own emitted (partner_id, lam)
    # columns (review r3c: a sampled check missed rounding-boundary rows)
    for k in sorted(out):
        r = out[k]
        i = int(k.split("-")[1])
        # find the partner via the emitted column and verify the blend
        p = r["partner_id"]
        a = codecs.decode_ppm(aug[k]["bytes"]).astype(np.float64)
        b = codecs.decode_ppm(aug[p]["bytes"]).astype(np.float64)
        lam = r["lam"]
        want = np.clip(np.round(lam * a + (1 - lam) * b), 0, 255).astype(np.uint8)
        got = codecs.decode_ppm(r["bytes"])
        np.testing.assert_array_equal(got, want)
        # lambda reproduces from the hash contract (round-6 is the
        # emitted AND blended precision)
        d = splitmix64(np.array([i], dtype=np.uint64) ^ np.uint64(3))[0]
        assert round(0.3 + (d / 2**64) * 0.4, 6) == lam
    # determinism across partitionings
    again = {
        r["image_id"]: r
        for r in vision.mixup_images(src, seed=3, num_buckets=5).take_all()
    }
    # bucket count changes the RING, so compare only the per-row lambda
    # (partner set differs by construction); full determinism holds at
    # equal bucket count:
    same = {r["image_id"]: r for r in vision.mixup_images(src, seed=3).take_all()}
    assert all(same[k]["bytes"] == out[k]["bytes"] for k in out)
    assert all(abs(again[k]["lam"] - out[k]["lam"]) < 1e-12 for k in out)


def test_read_webdataset_roundtrip(ray_session, fixture_dir, tmp_path):
    """write -> read roundtrip: every curated row comes back byte-equal;
    a torn shard (payload without caption) fails loudly."""
    import tarfile

    out = tmp_path / "wds"
    vision.export_webdataset_shards(fixture_dir / "images.parquet", out, n_shards=4)
    back = {r["image_id"]: r for r in vision.read_webdataset_shards(out).take_all()}
    src = {
        r["image_id"]: r
        for r in pq.read_table(
            fixture_dir / "images.parquet",
            columns=["image_id", "bytes", "fmt", "caption"],
        ).to_pylist()
    }
    survivors = {
        r["image_id"]
        for r in vision.curate_image_corpus(fixture_dir / "images.parquet").take_all()
    }
    assert set(back) == survivors
    for k, r in back.items():
        assert r["bytes"] == src[k]["bytes"]
        assert r["fmt"] == src[k]["fmt"]
        assert r["caption"] == src[k]["caption"]

    # torn shard: strip every .txt member from one tar
    victim = sorted(out.glob("shard-*.tar"))[0]
    kept = []
    with tarfile.open(victim) as tf:
        for mem in tf.getmembers():
            if not mem.name.endswith(".txt"):
                kept.append((mem, tf.extractfile(mem).read()))
    import io

    with tarfile.open(victim, "w", format=tarfile.USTAR_FORMAT) as tf:
        for mem, data in kept:
            tf.addfile(mem, io.BytesIO(data))
    import pytest as _pytest

    with _pytest.raises(Exception, match="torn webdataset shard"):
        vision.read_webdataset_shards(out).take_all()
