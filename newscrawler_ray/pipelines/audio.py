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


def synth_audio(out_path: str | Path, n_clips: int = 500, seed: int = 42) -> Path:
    """Deterministic WAV clips: one dominant tone + noise per clip."""
    out_path = Path(out_path)
    if out_path.exists():
        return out_path
    out_path.parent.mkdir(parents=True, exist_ok=True)
    rows = []
    for i in range(n_clips):
        rng = np.random.default_rng([seed, 11, i])
        sr = (8000, 16000)[i % 2]
        dur = 0.25 + float(rng.integers(0, 4)) * 0.25
        n = int(sr * dur)
        freq = float(rng.integers(100, 2000))
        t = np.arange(n) / sr
        wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
        samples = np.clip(wave * 32767 * 0.5, -32768, 32767).astype(np.int16)
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
