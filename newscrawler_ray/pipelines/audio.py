"""Audio-modality operators: opaque binary column + typed metadata.

Same contract as the image stages (pipelines/multimodal.py): payloads are
``binary`` with a ``fmt`` tag; WAV (PCM 16-bit mono) is decoded for real
(pure numpy, codecs.decode_wav); compressed formats (mp3/flac/ogg) are
STUBBED behind NotImplementedError — the Ray-side plumbing (schema, actor
signature, batch sizing, error-as-record) is identical either way.

``synth_audio`` generates a deterministic audio table — seeded tone +
noise clips with a known dominant frequency, so the FFT feature can be
verified against ground truth in tests.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from .. import codecs
from ..stages import _pool_width

AUDIO_SCHEMA = pa.schema(
    [
        ("audio_id", pa.string()),
        ("bytes", pa.binary()),
        ("fmt", pa.string()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int32()),
        ("transcript", pa.string()),
        ("tone_hz", pa.float64()),  # ground truth for tests
    ]
)


# bump when synth content changes: fixture files are cached by existence
# (CLAUDE.md: changing synth invalidates cached fixture dirs)
_SYNTH_VERSION = 3


def default_audio_fixture(n_clips: int = 500, seed: int = 42) -> Path:
    """The one canonical cached synth-audio table path (entry + tests)."""
    return synth_audio(
        f"/tmp/newscrawler_ray_fixtures/audio_{n_clips}_v{_SYNTH_VERSION}.parquet",
        n_clips,
        seed,
    )


def synth_audio(out_path: str | Path, n_clips: int = 500, seed: int = 42) -> Path:
    """Deterministic WAV clips: a dominant tone plus two seeded
    overtones and noise per clip (three spectral landmarks per frame —
    single pure tones make every same-pitch clip legitimately identical
    to a peak fingerprint, which is degenerate as a near-dup fixture).

    Planted structure for the near-dup oracle: every clip with
    ``i % 10 == 6`` is clip ``i-3`` RE-RECORDED at 0.55x amplitude —
    different bytes, same spectral content. The amplitude-invariant
    peak fingerprint must pair them; byte-level exact dedup cannot."""
    out_path = Path(out_path)
    if out_path.exists():
        return out_path
    out_path.parent.mkdir(parents=True, exist_ok=True)
    rows = []
    kept: dict[int, tuple[np.ndarray, int, float]] = {}
    for i in range(n_clips):
        rng = np.random.default_rng([seed, 11, i])
        sr = (8000, 16000)[i % 2]
        dur = 0.25 + float(rng.integers(0, 4)) * 0.25
        n = int(sr * dur)
        freq = float(rng.integers(100, 2000))
        f2 = float(rng.integers(2000, 3200))
        f3 = float(rng.integers(320, 3900))
        t = np.arange(n) / sr
        wave = (
            0.6 * np.sin(2 * np.pi * freq * t)
            + 0.3 * np.sin(2 * np.pi * f2 * t)
            + 0.18 * np.sin(2 * np.pi * f3 * t)
            + 0.05 * rng.standard_normal(n)
        )
        samples = np.clip(wave * 32767 * 0.5, -32768, 32767).astype(np.int16)
        if i % 10 == 6 and (i - 3) in kept:
            src, sr, freq = kept[i - 3]
            samples = np.clip(src.astype(np.float64) * 0.55, -32768, 32767).astype(
                np.int16
            )
            n = len(samples)
        kept[i] = (samples, sr, freq)
        rows.append(
            {
                "audio_id": f"aud-{i:06d}",
                "bytes": codecs.encode_wav(samples, sr),
                "fmt": "wav",
                "sample_rate": sr,
                "n_samples": n,
                "transcript": f"clip {i} tone {int(freq)} hz",
                "tone_hz": freq,
            }
        )
    pq.write_table(pa.Table.from_pylist(rows, schema=AUDIO_SCHEMA), out_path)
    return out_path


def decode_audio(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    if fmt == "wav":
        return codecs.decode_wav(data)
    # STUB: compressed audio needs external codecs not in this sandbox.
    raise NotImplementedError(
        f"decode for fmt={fmt!r} requires an external codec (stubbed in sandbox)"
    )


class AudioFeatures:
    """Actor-pool stage: decode -> duration/RMS/zero-crossings/dominant
    frequency (rFFT). ``__init__`` is the model-load slot; per-batch work
    is numpy. Errors become ``feature_error`` values, never exceptions."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        dur = np.zeros(n)
        rms = np.zeros(n)
        zcr = np.zeros(n)
        domf = np.zeros(n)
        errs: list = [None] * n
        raw = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        for i in range(n):
            try:
                samples, sr = decode_audio(raw[i], fmts[i])
                x = samples.astype(np.float64) / 32768.0
                dur[i] = len(x) / sr
                rms[i] = float(np.sqrt(np.mean(x * x)))
                zcr[i] = float(np.mean(np.abs(np.diff(np.signbit(x)))))
                spec = np.abs(np.fft.rfft(x))
                spec[0] = 0.0  # ignore DC
                domf[i] = float(np.argmax(spec) * sr / len(x))
            except Exception as e:  # noqa: BLE001 — error-as-record
                errs[i] = str(e)
        out = batch.select(["audio_id", "fmt", "sample_rate", "n_samples"])
        out = out.append_column("duration_s", pa.array(np.round(dur, 4)))
        out = out.append_column("rms", pa.array(np.round(rms, 5)))
        out = out.append_column("zero_cross_rate", pa.array(np.round(zcr, 5)))
        out = out.append_column("dominant_hz", pa.array(np.round(domf, 2)))
        out = out.append_column("feature_error", pa.array(errs, pa.string()))
        return out


def audio_features(audio_path: str | Path, *, concurrency: "int | tuple | None" = None, batch_size: int = 64) -> rd.Dataset:
    ds = rd.read_parquet(str(audio_path))
    return ds.map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool_width(concurrency),
    )


# ----------------------------------------------------------- fingerprints


def audio_peak_shingles(
    samples: np.ndarray, win: int = 512, hop: int = 256, top: int = 3, k: int = 2
) -> np.ndarray:
    """Amplitude-invariant spectral fingerprint of one clip: per frame
    the ``top`` magnitude-ranked rFFT bins (the Shazam-family landmark
    idea, reduced to per-frame peaks) packed WITH the frame index into
    one uint64, then chained into k-shingle hashes — the audio analog
    of word k-grams. Scaling the waveform scales every bin equally, so
    a re-recorded/volume-normalized copy keeps its peak structure while
    its bytes change completely; the frame index in the pack
    time-aligns the sets, so a pure tone (every frame the same peaks)
    still yields one landmark PER FRAME rather than a degenerate
    single-element set that collides across unrelated same-pitch clips.
    Returns the UINT64-ASCENDING distinct shingle set (the
    ``jaccard_verify_pairs`` order contract)."""
    from ..functions.hashing import shingle_hashes

    x = samples.astype(np.float64)
    if len(x) < win:
        x = np.pad(x, (0, win - len(x)))
    n_frames = 1 + (len(x) - win) // hop
    frames = np.lib.stride_tricks.as_strided(
        x,
        shape=(n_frames, win),
        strides=(x.strides[0] * hop, x.strides[0]),
        writeable=False,
    )
    mag = np.abs(np.fft.rfft(frames, axis=1))
    mag[:, 0] = 0.0  # DC carries no content
    # top-k bins by magnitude, order-stable: argsort desc then take top
    idx = np.argsort(-mag, axis=1, kind="stable")[:, :top].astype(np.uint64)
    packed = np.arange(n_frames, dtype=np.uint64) << np.uint64(top * 16)
    for j in range(top):
        packed |= idx[:, j] << np.uint64((top - 1 - j) * 16)
    return np.unique(shingle_hashes(packed, k)).view(np.int64)


def audio_near_dup(
    audio_path: "str | Path | rd.Dataset",
    *,
    threshold: float = 0.6,
    num_partitions: int | None = None,
    hot_gram_cap: int | None = None,
) -> rd.Dataset:
    """Near-duplicate audio pairs: Jaccard over spectral-peak shingle
    sets >= threshold — volume-normalized re-uploads and re-encodes of
    the same recording, which byte-exact dedup misses by construction.
    FOURTH payload type through the one exact set-similarity engine
    (``dedup.gram_set_near_dup``), after text n-grams, caption tokens
    and video frame phashes.

    Output: (audio_a, audio_b, jaccard), audio_a < audio_b."""
    from .dedup import gram_set_near_dup

    ds = (
        audio_path
        if isinstance(audio_path, rd.Dataset)
        else rd.read_parquet(str(audio_path))
    )
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))

    def gram_lists(batch: pa.Table) -> pa.Table:
        ids = batch.column("audio_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        parts, counts, nums = [], [], []
        for aid, fmt, blob in zip(ids, fmts, blobs):
            samples, _ = decode_audio(blob, fmt)
            u = audio_peak_shingles(samples)
            parts.append(u)
            counts.append(len(u))
            nums.append(int(aid[4:]))
        vals = np.concatenate(parts) if parts else np.empty(0, np.int64)
        offs = np.zeros(len(nums) + 1, np.int32)
        np.cumsum(counts, out=offs[1:])
        return pa.table(
            {
                "doc_id": pa.array(nums, pa.int64()),
                "grams": pa.ListArray.from_arrays(
                    pa.array(offs), pa.array(vals, pa.int64())
                ),
                "n_grams": pa.array(counts, pa.int64()),
            }
        )

    # stateless decode: task pool (concurrency tuples are actor-pool
    # only; a real compressed-codec deployment would turn this into a
    # decoder-holding class like AudioFeatures)
    grams = ds.map_batches(gram_lists, batch_format="pyarrow", batch_size=32)
    verified = gram_set_near_dup(
        grams, threshold, num_partitions, hot_gram_cap=hot_gram_cap
    )

    def back(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"audio_a": pa.array([], pa.string()),
                 "audio_b": pa.array([], pa.string()),
                 "jaccard": pa.array([], pa.float64())}
            )
        a = batch.column("id_a").to_numpy()
        b = batch.column("id_b").to_numpy()
        return pa.table(
            {
                "audio_a": pa.array([f"aud-{v:06d}" for v in a.tolist()]),
                "audio_b": pa.array([f"aud-{v:06d}" for v in b.tolist()]),
                "jaccard": batch.column("jaccard"),
            }
        )

    return verified.map_batches(back, batch_format="pyarrow")


def audio_dedup_clips(
    audio_path: "str | Path | rd.Dataset",
    *,
    threshold: float = 0.6,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Corpus-level audio dedup: near-dup pairs -> connected components
    -> keep each cluster's min audio_id plus every unpaired clip (the
    ``jaccard_dedup_docs`` / ``curate_video_corpus`` survivor shape on
    the audio tower). Output: one (audio_id) row per kept clip."""
    import pyarrow.compute as pc

    from .dedup import _survivors

    ds = (
        audio_path
        if isinstance(audio_path, rd.Dataset)
        else rd.read_parquet(str(audio_path))
    )
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))
    pairs = audio_near_dup(ds, threshold=threshold, num_partitions=num_partitions)

    def pair_ids(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "id_a": pc.cast(
                    pc.utf8_slice_codeunits(batch.column("audio_a"), 4, 99), pa.int64()
                ),
                "id_b": pc.cast(
                    pc.utf8_slice_codeunits(batch.column("audio_b"), 4, 99), pa.int64()
                ),
            }
        )

    def clip_ids(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(
                    pc.utf8_slice_codeunits(batch.column("audio_id"), 4, 99), pa.int64()
                )
            }
        )

    keep = _survivors(
        ds.map_batches(clip_ids, batch_format="pyarrow"),
        pairs.map_batches(pair_ids, batch_format="pyarrow"),
        num_partitions,
    )

    def back2(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"audio_id": pa.array([], pa.string())})
        ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {"audio_id": pa.array([f"aud-{v:06d}" for v in ids.tolist()])}
        )

    return keep.map_batches(back2, batch_format="pyarrow")
