"""Video payload ops: rvid codec roundtrip/seek, frame sampling as an
actor-pool stage, and cross-video keyframe dedup against the planted
fixture structure (synth_video_table docstring)."""

import numpy as np
import pytest

from newscrawler_ray import codecs
from newscrawler_ray.pipelines.video import (
    FrameSampler,
    default_video_fixture,
    video_frame_sample,
    video_keyframe_dedup,
    video_scene_segments,
)


def _videos():
    return default_video_fixture()


def test_rvid_roundtrip_and_seek():
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(9, 24, 32, 3), dtype=np.uint8)
    blob = codecs.encode_rvid(frames, fps=24)
    assert codecs.rvid_info(blob) == (9, 24, 32, 24)
    dec, fps = codecs.decode_rvid(blob)
    assert fps == 24 and (dec == frames).all()
    # seek-decode returns exactly the requested frames
    idx = np.array([0, 3, 8])
    assert (codecs.decode_rvid_frames(blob, idx) == frames[idx]).all()
    with pytest.raises(IndexError):
        codecs.decode_rvid_frames(blob, np.array([9]))
    with pytest.raises(ValueError):
        codecs.rvid_info(b"nope" + blob)


def test_phash64_batch_matches_scalar():
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(6, 24, 32, 3), dtype=np.uint8)
    batch = codecs.phash64_batch(frames)
    assert batch.dtype == np.int64
    for k in range(6):
        assert int(batch[k]) == codecs.phash64(frames[k])


def test_sample_video_frames_real_for_rvid_stub_otherwise():
    from newscrawler_ray.pipelines.multimodal import sample_video_frames

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(12, 8, 8, 3), dtype=np.uint8)
    got = sample_video_frames(codecs.encode_rvid(frames, 30), every_n=5)
    assert len(got) == 3  # frames 0, 5, 10
    assert (got[1] == frames[5]).all()
    with pytest.raises(NotImplementedError):
        sample_video_frames(b"\x00\x00\x00\x20ftypisom", every_n=5)


def test_frame_sampler_stage_matches_direct_decode(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table(_videos())
    df = (
        video_frame_sample(str(_videos()), every_n=5)
        .to_pandas()
        .sort_values(["video_id", "frame_idx"], ignore_index=True)
    )
    # row count: sum over videos of ceil(n_frames / 5)
    nf = t.column("n_frames").to_numpy()
    assert len(df) == int(np.sum((nf + 4) // 5))
    # spot-check one video against a direct decode
    row = t.slice(3, 1)
    blob = row.column("bytes")[0].as_py()
    idx = np.arange(0, row.column("n_frames")[0].as_py(), 5)
    frames = codecs.decode_rvid_frames(blob, idx)
    sub = df[df.video_id == "vid-000003"]
    assert (sub["frame_idx"].values == idx).all()
    assert (sub["phash"].values == codecs.phash64_batch(frames)).all()
    means = frames.reshape(len(idx), -1, 3).mean(axis=1)
    assert np.allclose(sub["mean_r"].values, np.round(means[:, 0] + 1e-9, 4))
    # the planted within-video dup: frame 10 == frame 5
    ph = dict(zip(sub["frame_idx"], sub["phash"]))
    assert ph[5] == ph[10]


def test_keyframe_dedup_planted_groups(ray_session):
    df = (
        video_keyframe_dedup(str(_videos()), every_n=5)
        .to_pandas()
        .sort_values(["phash", "video_id"], ignore_index=True)
    )
    # the syndicated intro card: videos 0,7,14,...,238 share frame 0;
    # survivor is (vid-000000, 0) and it stands for all 35 copies
    intro = df[(df.video_id == "vid-000000") & (df.frame_idx == 0)]
    assert len(intro) == 1
    assert int(intro.n_frames.iloc[0]) == len(range(0, 240, 7))
    # no other survivor row references any i%7==0 video's frame 0
    dup_ids = {f"vid-{i:06d}" for i in range(7, 240, 7)}
    assert df[(df.video_id.isin(dup_ids)) & (df.frame_idx == 0)].empty
    # the within-video dup: video 3 keeps frame 5, drops frame 10
    v3 = df[df.video_id == "vid-000003"]
    assert 5 in set(v3.frame_idx) and 10 not in set(v3.frame_idx)
    assert int(v3[v3.frame_idx == 5].n_frames.iloc[0]) == 2
    # everything else is unique: survivors + extra copies == total rows
    total = video_frame_sample(str(_videos()), every_n=5).count()
    assert int(df.n_frames.sum()) == total
    # rerun determinism
    df2 = (
        video_keyframe_dedup(str(_videos()), every_n=5)
        .to_pandas()
        .sort_values(["phash", "video_id"], ignore_index=True)
    )
    assert df.equals(df2)


def test_frame_sampler_rejects_external_formats():
    import pyarrow as pa

    batch = pa.table(
        {
            "video_id": ["vid-000000"],
            "fmt": ["mp4"],
            "bytes": pa.array([b"\x00" * 64], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        FrameSampler(every_n=5)(batch)


def test_scene_segments_planted_runs(ray_session):
    """Still-scene videos (i % 5 == 2: runs of 4 identical frames) come
    back as exactly their planted runs; noise videos are one scene per
    frame; segments tile each video exactly."""
    import pyarrow.parquet as pq

    t = pq.read_table(_videos(), columns=["video_id", "n_frames"])
    nf = dict(
        zip(t.column("video_id").to_pylist(), t.column("n_frames").to_numpy())
    )
    df = (
        video_scene_segments(str(_videos()))
        .to_pandas()
        .sort_values(["video_id", "scene_idx"], ignore_index=True)
    )
    for vid, sub in df.groupby("video_id"):
        n = int(nf[vid])
        i = int(vid[4:])
        # segments tile [0, n) with no gaps or overlaps
        assert sub.start_frame.iloc[0] == 0 and sub.end_frame.iloc[-1] == n
        assert (sub.start_frame.values[1:] == sub.end_frame.values[:-1]).all()
        assert (sub.n_frames.values == sub.end_frame.values - sub.start_frame.values).all()
        if i % 5 == 2 and i % 7 != 0:
            # planted runs of 4 -> ceil(n/4) scenes, all len 4 but the tail
            assert len(sub) == -(-n // 4), vid
            assert (sub.n_frames.values[:-1] == 4).all()
        elif i % 5 != 2 and i != 0 and i % 7 == 0 and i != 3:
            # intro frame is a cut against noise; everything else noise
            assert len(sub) == n, vid
    # video 42 (still + intro): frame 0 is its own scene, runs shift by 1
    v42 = df[df.video_id == "vid-000042"]
    assert v42.n_frames.iloc[0] == 1


def test_video_near_dup_planted_pair(ray_session):
    """The truncated-copy plant (video 100 carries video 50's 29 frames
    plus extra footage: sampled-set Jaccard 6/10) is the ONLY pair at
    threshold 0.5; threshold 0.7 returns nothing; a brute-force driver
    recompute agrees pair-for-pair at a low threshold."""
    from newscrawler_ray.pipelines.video import video_near_dup, _sampled_phashes
    import pyarrow.parquet as pq
    import itertools

    df = video_near_dup(str(_videos()), threshold=0.5).to_pandas()
    assert len(df) == 1
    assert (df.video_a[0], df.video_b[0]) == ("vid-000050", "vid-000100")
    assert df.jaccard[0] == 0.6
    assert video_near_dup(str(_videos()), threshold=0.7).count() == 0
    # brute force at threshold 0.1 over a slice of the corpus
    t = pq.read_table(_videos()).slice(0, 60)
    sets = {}
    for vid, fmt, blob in zip(
        t.column("video_id").to_pylist(),
        t.column("fmt").to_pylist(),
        t.column("bytes").to_pylist(),
    ):
        sets[vid] = set(_sampled_phashes(blob, fmt, 5)[1].tolist())
    brute = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter and inter / len(sets[a] | sets[b]) >= 0.1:
            brute.add((a, b))
    got = {
        (r.video_a, r.video_b)
        for r in video_near_dup(str(_videos()), threshold=0.1)
        .to_pandas()
        .itertuples()
        if r.video_a in sets and r.video_b in sets
    }
    # restrict brute to pairs fully inside the slice (got already is)
    assert got == brute


def test_export_video_keyframes_bridges_to_image_ops(ray_session, tmp_path):
    """The exported keyframe table is a valid IMAGE table: bytes decode
    to the exact sampled frames, phash matches, and an unchanged image
    operator (phash_near_dup_groups) finds the planted syndicated-intro
    group across videos."""
    import pyarrow.parquet as pq

    from newscrawler_ray.pipelines.video import export_video_keyframes

    ds = export_video_keyframes(str(_videos()), every_n=5)
    out = tmp_path / "keyframes.parquet"
    t = ds.to_pandas()
    total = video_frame_sample(str(_videos()), every_n=5).count()
    assert len(t) == total
    # decode parity for video 3's frames
    src = pq.read_table(_videos())
    blob = src.slice(3, 1).column("bytes")[0].as_py()
    frames = codecs.decode_rvid_frames(blob, np.array([0, 5, 10]))
    for k, f in zip([0, 5, 10], frames):
        row = t[t.image_id == f"img-{(3 << 20) | k:08d}"].iloc[0]
        assert (codecs.decode_ppm(row["bytes"]) == f).all()
        assert row["phash"] == codecs.phash64(f)
        assert row["fmt"] == "ppm" and row["w"] == 32 and row["h"] == 24
    # an unchanged IMAGE op over the bridge output: the intro group
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(t[["image_id", "phash"]]), str(out))
    from newscrawler_ray.pipelines.multimodal import phash_near_dup_groups

    groups = phash_near_dup_groups(out).to_pandas()
    intro_ph = int(t[t.image_id == "img-00000000"].phash.iloc[0])
    assert int(groups[groups.phash == intro_ph].n_images.iloc[0]) == len(
        range(0, 240, 7)
    )


def test_curate_video_corpus_drops_copy_keeps_stats(ray_session):
    """The composition: the truncated-copy video 100 (near-dup of 50)
    is dropped first-wins; every other video survives with scene/
    keyframe stats matching the direct per-op recompute."""
    from newscrawler_ray.pipelines.video import curate_video_corpus

    df = (
        curate_video_corpus(str(_videos()), threshold=0.5)
        .to_pandas()
        .sort_values("video_id", ignore_index=True)
    )
    assert len(df) == 239 and "vid-000100" not in set(df.video_id)
    scenes = (
        video_scene_segments(str(_videos()))
        .to_pandas()
        .groupby("video_id")
        .agg(n=("scene_idx", "size"), total=("n_frames", "sum"))
    )
    for r in df.sample(20, random_state=7).itertuples():
        s = scenes.loc[r.video_id]
        assert r.n_scenes == s.n
        assert r.mean_scene_len == round(s.total / s.n + 1e-9, 4)
        assert r.n_keyframes == -(-s.total // 5)


def test_video_near_dup_hot_gram_cap_same_output(ray_session):
    """With the intro keyframe (df=35) excluded from candidate
    generation (hot_gram_cap=16), the output pair set is UNCHANGED:
    intro-only pairs were below threshold anyway, and the planted
    truncated-copy pair shares 6 non-hot grams. The scale mitigation
    costs no recall on this corpus."""
    from newscrawler_ray.pipelines.video import video_near_dup

    exact = (
        video_near_dup(str(_videos()), threshold=0.5)
        .to_pandas()
        .sort_values(["video_a", "video_b"], ignore_index=True)
    )
    capped = (
        video_near_dup(str(_videos()), threshold=0.5, hot_gram_cap=16)
        .to_pandas()
        .sort_values(["video_a", "video_b"], ignore_index=True)
    )
    assert exact.equals(capped)
    assert len(capped) == 1  # the planted pair, with its exact jaccard
    assert capped.jaccard[0] == 0.6
