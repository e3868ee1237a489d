"""Video payload operators: frame sampling, scene segmentation,
cross-video keyframe dedup and whole-video near-dup.

The reference treats video as URL metadata only (its extractor parses
watch-page IDs/titles — see ``utils/video_metadata.py``, mirrored by
``stages/metadata_extract.py``); a training-data pipeline also needs the
PAYLOAD side: sample frames out of binary video columns and dedup the
sampled keyframes across the corpus. Both are expressed Ray-Data-first:

  * sampling — an actor-pool ``map_batches`` stage (``FrameSampler``);
    each row is one video, the per-row unit a real decoder amortizes
    over. On the sandbox ``rvid`` container the sample is a SEEK read
    (``codecs.decode_rvid_frames``): cost proportional to frames kept,
    not video length — the property keyframe extraction relies on in
    real containers; compressed formats stay behind the documented
    ffmpeg stub (``multimodal.sample_video_frames``). Payload bytes
    never pass the stage boundary: only (video_id, frame_idx, phash,
    channel means) rows come out, so nothing heavy ever shuffles.
  * dedup — exact-phash grouping over the thin sampled-frame rows with
    a first-wins winner per group (min (video_id, frame_idx) — the
    ``state/seen.py`` upsert discipline lifted to frames), one hash
    aggregate end to end.

At 100 TB the sampling stage is embarrassingly parallel over videos
(batch_size small — rows are payload-heavy) and the dedup shuffle moves
~24 bytes per SAMPLED frame, i.e. 1/(every_n * frame_bytes) of the
corpus.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .. import codecs
from ..functions.hashing import popcount64, splitmix64
from ..stages import _pool_width

_I64 = pa.int64()

# bump when synth content changes: fixture files are cached by existence
# (CLAUDE.md: changing synth invalidates cached fixture dirs)
_SYNTH_VERSION = 3


def default_video_fixture(n_videos: int = 240, seed: int = 23) -> Path:
    """The one canonical cached synth-video table path (entry + tests)."""
    return synth_video_table(
        f"/tmp/newscrawler_ray_fixtures/videos_{n_videos}_v{_SYNTH_VERSION}.parquet",
        n_videos,
        seed,
    )


# ------------------------------------------------------------- synthesis


def synth_video_table(
    path: str | Path, n_videos: int = 240, seed: int = 23
) -> Path:
    """Deterministic (video_id, bytes, fmt, n_frames, fps, w, h) parquet
    table of ``rvid`` payloads. Pure function of (n_videos, seed), cached
    by existence (the ``synth_phash_table`` discipline).

    Planted structure the dedup + scene oracles pin:
      * frame content is splitmix64 noise keyed by (video, frame) — every
        un-planted frame's phash is unique with overwhelming probability,
        and consecutive frames are maximally dissimilar (each its own
        scene);
      * videos with ``i % 5 == 2`` are STILL-SCENE videos: content is
        keyed by (video, frame // 4), i.e. runs of 4 identical frames —
        known scene boundaries for ``video_scene_segments``;
      * every video with ``i % 7 == 0`` copies video 0's frame 0 exactly
        (a syndicated intro card): ONE cross-video keyframe group whose
        first-wins survivor is (video 0, frame 0);
      * video 3 copies its own frame 5 to frame 10 (both sampled at the
        default stride 5): a within-video duplicate;
      * video 100's first 29 frames are video 50's 29 frames verbatim (a
        re-upload with extra footage): sampled-phash-set Jaccard 0.6 —
        the one pair ``video_near_dup`` must flag at threshold 0.5.
    """
    path = Path(path)
    if path.exists():
        return path
    path.parent.mkdir(parents=True, exist_ok=True)
    h, w, fps = 24, 32, 30
    ids, blobs, nfs = [], [], []
    intro = None
    v50_frames = None
    for i in range(n_videos):
        n_frames = 12 + (i * 7) % 37
        frame_key = (
            np.arange(n_frames, dtype=np.uint64)
            if i % 5 != 2
            else np.arange(n_frames, dtype=np.uint64) // np.uint64(4)
        )
        counter = (
            (
                np.repeat(frame_key, h * w * 3) * np.uint64(h * w * 3)
                + np.tile(np.arange(h * w * 3, dtype=np.uint64), n_frames)
            )
            + np.uint64(i) * np.uint64(0x51_7CC1B7_2722_0A95)
            + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
        )
        frames = (
            (splitmix64(counter) & np.uint64(0xFF))
            .astype(np.uint8)
            .reshape(n_frames, h, w, 3)
        )
        if i == 0:
            intro = frames[0].copy()
        elif i % 7 == 0:
            frames[0] = intro
        if i == 3:
            frames[10] = frames[5]
        if i == 50:
            v50_frames = frames.copy()
        elif i == 100 and v50_frames is not None:
            frames[: len(v50_frames)] = v50_frames
        ids.append(f"vid-{i:06d}")
        blobs.append(codecs.encode_rvid(frames, fps))
        nfs.append(n_frames)
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "video_id": pa.array(ids),
                "bytes": pa.array(blobs, pa.binary()),
                "fmt": pa.array(["rvid"] * n_videos),
                "n_frames": pa.array(nfs, pa.int32()),
                "fps": pa.array([fps] * n_videos, pa.int32()),
                "w": pa.array([w] * n_videos, pa.int32()),
                "h": pa.array([h] * n_videos, pa.int32()),
            }
        ),
        str(path),
    )
    return path


# -------------------------------------------------------------- sampling


def _sampled_phashes(blob: bytes, fmt: str, every_n: int) -> tuple[np.ndarray, np.ndarray]:
    """(sample indices, phash per sampled frame) for one video payload —
    the seek-decode kernel FrameSampler and the near-dup gram stage share."""
    if fmt != "rvid":
        raise NotImplementedError(f"fmt={fmt!r} needs an external decoder (ffmpeg)")
    n, _, _, _ = codecs.rvid_info(blob)
    idx = np.arange(0, n, every_n, dtype=np.int64)
    return idx, codecs.phash64_batch(codecs.decode_rvid_frames(blob, idx))


class FrameSampler:
    """Actor-pool stage: binary video rows -> thin sampled-frame rows.

    A real deployment loads its decoder (ffmpeg context) once per actor
    here; the sandbox ``rvid`` path needs no state beyond the stride but
    keeps the class shape so swapping the codec does not touch the
    pipeline. Per-frame work (phash + channel means) is vectorized over
    each video's sampled stack (``codecs.phash64_batch``)."""

    def __init__(self, every_n: int = 5):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("video_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        out_vid: list[str] = []
        out_idx: list[np.ndarray] = []
        out_ph: list[np.ndarray] = []
        out_mean: list[np.ndarray] = []
        for vid, fmt, blob in zip(vids, fmts, blobs):
            if fmt != "rvid":
                # same stub boundary as multimodal.sample_video_frames
                raise NotImplementedError(
                    f"fmt={fmt!r} needs an external decoder (ffmpeg)"
                )
            n, _, _, _ = codecs.rvid_info(blob)
            idx = np.arange(0, n, self.every_n, dtype=np.int64)
            frames = codecs.decode_rvid_frames(blob, idx)
            out_vid.append(vid)
            out_idx.append(idx)
            out_ph.append(codecs.phash64_batch(frames))
            out_mean.append(
                frames.reshape(len(idx), -1, 3).mean(axis=1, dtype=np.float64)
            )
        if not out_vid:
            return pa.table(
                {
                    "video_id": pa.array([], pa.string()),
                    "frame_idx": pa.array([], _I64),
                    "phash": pa.array([], _I64),
                    "mean_r": pa.array([], pa.float64()),
                    "mean_g": pa.array([], pa.float64()),
                    "mean_b": pa.array([], pa.float64()),
                }
            )
        counts = [len(ix) for ix in out_idx]
        means = np.concatenate(out_mean, axis=0)
        return pa.table(
            {
                "video_id": pa.array(np.repeat(out_vid, counts)),
                "frame_idx": pa.array(np.concatenate(out_idx), _I64),
                "phash": pa.array(np.concatenate(out_ph), _I64),
                "mean_r": pa.array(np.round(means[:, 0] + 1e-9, 4)),
                "mean_g": pa.array(np.round(means[:, 1] + 1e-9, 4)),
                "mean_b": pa.array(np.round(means[:, 2] + 1e-9, 4)),
            }
        )


def video_frame_sample(
    videos_path: "str | Path | rd.Dataset",
    *,
    every_n: int = 5,
    concurrency: "int | tuple | None" = None,
    batch_size: int = 8,
) -> rd.Dataset:
    """Sample every ``every_n``-th frame of every video -> one thin row
    per sampled frame (video_id, frame_idx, phash, mean_r/g/b). Small
    batch_size: rows are payload-heavy (whole videos)."""
    ds = (
        videos_path
        if isinstance(videos_path, rd.Dataset)
        else rd.read_parquet(str(videos_path))
    )
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool_width(concurrency),
    )


# ----------------------------------------------------------------- scenes


class SceneSegmenter:
    """Actor-pool stage: binary video rows -> one row per detected scene.

    PySceneDetect-style cut detection re-expressed for the engine: a cut
    is a consecutive-frame phash hamming distance > ``tau`` (identical/
    near-still frames are hamming 0; unrelated content ~32 of 64 bits).
    The whole segmentation of a video is local to its row, so the stage
    is embarrassingly parallel and NOTHING shuffles — the output is
    already the answer."""

    def __init__(self, tau: int = 10):
        self.tau = tau

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("video_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        o_vid: list[str] = []
        o_scene: list[np.ndarray] = []
        o_start: list[np.ndarray] = []
        o_end: list[np.ndarray] = []
        for vid, fmt, blob in zip(vids, fmts, blobs):
            if fmt != "rvid":
                raise NotImplementedError(
                    f"fmt={fmt!r} needs an external decoder (ffmpeg)"
                )
            frames, _ = codecs.decode_rvid(blob)
            ph = codecs.phash64_batch(frames).view(np.uint64)
            x = ph[1:] ^ ph[:-1]
            ham = popcount64(x)
            cuts = np.flatnonzero(ham > self.tau) + 1  # frame idx starting a scene
            starts = np.concatenate(([0], cuts))
            ends = np.concatenate((cuts, [len(frames)]))
            o_vid.append(vid)
            o_scene.append(np.arange(len(starts), dtype=np.int64))
            o_start.append(starts.astype(np.int64))
            o_end.append(ends.astype(np.int64))
        if not o_vid:
            return pa.table(
                {
                    "video_id": pa.array([], pa.string()),
                    "scene_idx": pa.array([], _I64),
                    "start_frame": pa.array([], _I64),
                    "end_frame": pa.array([], _I64),
                    "n_frames": pa.array([], _I64),
                }
            )
        counts = [len(s) for s in o_scene]
        starts = np.concatenate(o_start)
        ends = np.concatenate(o_end)
        return pa.table(
            {
                "video_id": pa.array(np.repeat(o_vid, counts)),
                "scene_idx": pa.array(np.concatenate(o_scene), _I64),
                "start_frame": pa.array(starts, _I64),
                "end_frame": pa.array(ends, _I64),
                "n_frames": pa.array(ends - starts, _I64),
            }
        )


def video_scene_segments(
    videos_path: "str | Path | rd.Dataset",
    *,
    tau: int = 10,
    concurrency: "int | tuple | None" = None,
    batch_size: int = 8,
) -> rd.Dataset:
    """Scene segmentation of every video: (video_id, scene_idx,
    start_frame, end_frame, n_frames) with cuts where consecutive-frame
    phash hamming > ``tau``. Zero-shuffle: segmentation is row-local."""
    ds = (
        videos_path
        if isinstance(videos_path, rd.Dataset)
        else rd.read_parquet(str(videos_path))
    )
    return ds.map_batches(
        SceneSegmenter,
        fn_constructor_kwargs={"tau": tau},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool_width(concurrency),
    )


# ------------------------------------------------------- keyframe export


class KeyframeExporter:
    """Actor-pool stage: video rows -> IMAGE-table rows, one per sampled
    keyframe. The bridge that lets the whole image family (quality
    gates, phash dedup, channel stats, kNN, curation) run unchanged
    over video content: output schema is exactly the image input_hint
    (image_id, bytes, w, h, fmt, caption, phash), bytes re-encoded as
    lossless PPM. image_id packs (video, frame) into the fixture id
    format ``img-%d`` as ``vnum << 20 | frame_idx`` — the same packing
    ``video_keyframe_dedup`` uses — so the int-keyed image operators
    parse it natively and ids can never alias across videos (a
    vnum*1000 scheme would collide for any video with >=1000 frames).
    Out-of-range inputs (frame_idx >= 2^20, vnum >= 2^43) raise."""

    def __init__(self, every_n: int = 5):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("video_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        ids: list[str] = []
        outb: list[bytes] = []
        ws: list[int] = []
        hs: list[int] = []
        caps: list[str] = []
        phs: list[np.ndarray] = []
        for vid, fmt, blob in zip(vids, fmts, blobs):
            if fmt != "rvid":
                raise NotImplementedError(
                    f"fmt={fmt!r} needs an external decoder (ffmpeg)"
                )
            n, h, w, _ = codecs.rvid_info(blob)
            idx = np.arange(0, n, self.every_n, dtype=np.int64)
            frames = codecs.decode_rvid_frames(blob, idx)
            vnum = int(vid[4:])
            if vnum >= (1 << 43):
                raise ValueError(f"video number {vnum} overflows 43-bit pack")
            for k, f in zip(idx.tolist(), frames):
                if k >= (1 << 20):
                    raise ValueError(
                        f"frame_idx {k} >= 2^20 overflows keyframe id pack"
                    )
                ids.append(f"img-{(vnum << 20) | k:08d}")
                outb.append(codecs.encode_ppm(f))
                ws.append(w)
                hs.append(h)
                caps.append(f"keyframe {k} of {vid}")
            phs.append(codecs.phash64_batch(frames))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(outb, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(["ppm"] * len(ids), pa.string()),
                "caption": pa.array(caps, pa.string()),
                "phash": pa.array(
                    np.concatenate(phs) if phs else np.empty(0, np.int64), _I64
                ),
            }
        )


def export_video_keyframes(
    videos_path: "str | Path | rd.Dataset",
    *,
    every_n: int = 5,
    concurrency: "int | tuple | None" = None,
    batch_size: int = 8,
) -> rd.Dataset:
    """Sampled keyframes as image-table rows (see ``KeyframeExporter``).
    Payload-heavy output: keep batch_size small and write/consume it
    streaming — the downstream image ops pick winners on thin columns
    so the bytes never enter a shuffle there either."""
    ds = (
        videos_path
        if isinstance(videos_path, rd.Dataset)
        else rd.read_parquet(str(videos_path))
    )
    return ds.map_batches(
        KeyframeExporter,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool_width(concurrency),
    )


# --------------------------------------------------------- video near-dup


def video_near_dup(
    videos_path: "str | Path | rd.Dataset",
    *,
    threshold: float = 0.5,
    every_n: int = 5,
    num_partitions: int | None = None,
    hot_gram_cap: int | None = None,
) -> rd.Dataset:
    """Whole-video near-dup pairs: Jaccard over the SAMPLED frame-phash
    SETS >= threshold — re-uploads, truncated copies and
    extra-footage re-edits of the same content. Reuses the one exact
    set-similarity engine (``dedup.jaccard_verify_pairs``) with videos
    as "docs" and frame phashes as grams: a third payload type through
    the same join, after text n-grams and caption tokens.

    Shape: one gram-lists pass (per-video uint64-sorted distinct phash
    sets) into the generic ``dedup.gram_set_near_dup`` engine — shared
    candidate mining, verification and scale caveats live there.

    Output: (video_a, video_b, jaccard), video_a < video_b."""
    from .dedup import gram_set_near_dup

    ds = (
        videos_path
        if isinstance(videos_path, rd.Dataset)
        else rd.read_parquet(str(videos_path))
    )
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))

    def gram_lists(batch: pa.Table) -> pa.Table:
        vids = batch.column("video_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        parts, counts, vnums = [], [], []
        for vid, fmt, blob in zip(vids, fmts, blobs):
            _, ph = _sampled_phashes(blob, fmt, every_n)
            # UINT64-ascending distinct set: jaccard_verify_pairs
            # intersects by sorted-array merge in uint64 space
            u = np.unique(ph.view(np.uint64)).view(np.int64)
            parts.append(u)
            counts.append(len(u))
            vnums.append(int(vid[4:]))
        vals = np.concatenate(parts) if parts else np.empty(0, np.int64)
        offs = np.zeros(len(vnums) + 1, np.int32)
        np.cumsum(counts, out=offs[1:])
        return pa.table(
            {
                "doc_id": pa.array(vnums, _I64),
                "grams": pa.ListArray.from_arrays(
                    pa.array(offs), pa.array(vals, _I64)
                ),
                "n_grams": pa.array(counts, _I64),
            }
        )

    grams = ds.map_batches(gram_lists, batch_format="pyarrow", batch_size=8)
    verified = gram_set_near_dup(
        grams, threshold, num_partitions, hot_gram_cap=hot_gram_cap
    )

    def back(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"video_a": pa.array([], pa.string()),
                 "video_b": pa.array([], pa.string()),
                 "jaccard": pa.array([], pa.float64())}
            )
        a = batch.column("id_a").to_numpy()
        b = batch.column("id_b").to_numpy()
        return pa.table(
            {
                "video_a": pa.array([f"vid-{v:06d}" for v in a.tolist()]),
                "video_b": pa.array([f"vid-{v:06d}" for v in b.tolist()]),
                "jaccard": batch.column("jaccard"),
            }
        )

    return verified.map_batches(back, batch_format="pyarrow")


# ------------------------------------------------------------ curation


def curate_video_corpus(
    videos_path: "str | Path | rd.Dataset",
    *,
    threshold: float = 0.5,
    every_n: int = 5,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """The video-tier composition (the ``curate_image_corpus`` shape):
    whole-video near-dup pairs -> connected components -> first-wins
    survivors, then per-survivor content stats — scene count, mean
    scene length, sampled-keyframe count — in one row per kept video.

    Survivor selection reuses ``dedup._survivors`` on thin id rows
    (payload bytes never join or shuffle); stats come from the
    row-local scene segmentation, semi-joined down to survivors.

    Output: (video_id, n_scenes, mean_scene_len, n_keyframes)."""
    from ray.data.aggregate import Count, Sum

    from .dedup import _survivors

    ds = (
        videos_path
        if isinstance(videos_path, rd.Dataset)
        else rd.read_parquet(str(videos_path))
    )
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))

    pairs = video_near_dup(
        ds, threshold=threshold, every_n=every_n, num_partitions=num_partitions
    )

    def pair_ids(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], _I64), "id_b": pa.array([], _I64)}
            )
        return pa.table(
            {
                "id_a": pc.cast(
                    pc.utf8_slice_codeunits(batch.column("video_a"), 4, 99), _I64
                ),
                "id_b": pc.cast(
                    pc.utf8_slice_codeunits(batch.column("video_b"), 4, 99), _I64
                ),
            }
        )

    def vid_ids(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(
                    pc.utf8_slice_codeunits(batch.column("video_id"), 4, 99), _I64
                )
            }
        )

    keep = _survivors(
        ds.map_batches(vid_ids, batch_format="pyarrow"),
        pairs.map_batches(pair_ids, batch_format="pyarrow"),
        num_partitions,
    ).materialize()

    scenes = video_scene_segments(ds)

    def key_scenes(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(
                    pc.utf8_slice_codeunits(batch.column("video_id"), 4, 99), _I64
                ),
                "n_frames": batch.column("n_frames"),
            }
        )

    from .dedup import _clean_id_blocks

    kept_scenes = scenes.map_batches(key_scenes, batch_format="pyarrow").join(
        # keep is a join output: repartition splits it into 0-column
        # empty blocks at high CPU counts — normalize before joining
        keep.repartition(num_partitions).map_batches(
            _clean_id_blocks, batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
    )
    agg = kept_scenes.groupby("doc_id").aggregate(
        Count(alias_name="n_scenes"), Sum("n_frames", alias_name="total_frames")
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"video_id": pa.array([], pa.string()),
                 "n_scenes": pa.array([], _I64),
                 "mean_scene_len": pa.array([], pa.float64()),
                 "n_keyframes": pa.array([], _I64)}
            )
        did = batch.column("doc_id").to_numpy()
        ns = batch.column("n_scenes").to_numpy()
        total = batch.column("total_frames").to_numpy()
        return pa.table(
            {
                "video_id": pa.array([f"vid-{v:06d}" for v in did.tolist()]),
                "n_scenes": pa.array(ns, _I64),
                "mean_scene_len": pa.array(
                    np.round(total / ns + 1e-9, 4), pa.float64()
                ),
                "n_keyframes": pa.array(-(-total // every_n), _I64),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ----------------------------------------------------------------- dedup


def video_keyframe_dedup(
    videos_path: "str | Path | rd.Dataset",
    *,
    every_n: int = 5,
    concurrency: "int | tuple | None" = None,
) -> rd.Dataset:
    """First-wins exact-phash dedup of the sampled keyframes: one
    surviving (video_id, frame_idx) per distinct phash — the earliest
    frame of the lexicographically-first video — plus how many sampled
    frames it stands for. Survivor rows come out unordered (callers
    sort).

    Shape: sampling emits thin rows only, then ONE hash aggregate on a
    packed (vid_num << 20 | frame_idx) key — min of the packed key IS
    the lexicographic (video_id, frame_idx) minimum because the fixture
    id format is fixed-width (``vid-%06d``), so no sort and no second
    pass are needed."""
    from ray.data.aggregate import Count, Min

    frames = video_frame_sample(videos_path, every_n=every_n, concurrency=concurrency)

    def pack(batch: pa.Table) -> pa.Table:
        vnum = pc.cast(
            pc.utf8_slice_codeunits(batch.column("video_id"), 4, 99), _I64
        )
        fidx = batch.column("frame_idx")
        if len(fidx) and (
            pc.max(fidx).as_py() >= (1 << 20)
            or pc.max(vnum).as_py() >= (1 << 43)
        ):
            raise ValueError(
                "keyframe pack overflow: frame_idx >= 2^20 or vnum >= 2^43 "
                "would alias adjacent videos — widen the pack before dedup"
            )
        key = pc.add(pc.shift_left(vnum, pa.scalar(20, _I64)), fidx)
        return pa.table({"phash": batch.column("phash"), "packed": key})

    agg = (
        frames.map_batches(pack, batch_format="pyarrow")
        .groupby("phash")
        .aggregate(Min("packed", alias_name="win"), Count(alias_name="n_frames"))
    )

    def unpack(batch: pa.Table) -> pa.Table:
        win = batch.column("win").to_numpy()
        vnum = win >> 20
        return pa.table(
            {
                "video_id": pa.array([f"vid-{v:06d}" for v in vnum.tolist()]),
                "frame_idx": pa.array(win & ((1 << 20) - 1), _I64),
                "phash": batch.column("phash"),
                "n_frames": batch.column("n_frames"),
            }
        )

    return agg.map_batches(unpack, batch_format="pyarrow")
