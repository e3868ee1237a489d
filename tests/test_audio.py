import numpy as np
import pytest

from newscrawler_ray import codecs
from newscrawler_ray.pipelines import audio


def test_wav_roundtrip():
    samples = (np.sin(np.linspace(0, 50, 4000)) * 20000).astype(np.int16)
    data = codecs.encode_wav(samples, 16000)
    out, sr = codecs.decode_wav(data)
    assert sr == 16000
    np.testing.assert_array_equal(out, samples)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_wav(b"not a wav at all")


@pytest.fixture(scope="module")
def audio_table(tmp_path_factory):
    return audio.synth_audio(tmp_path_factory.mktemp("audio") / "audio.parquet", n_clips=80)


def test_audio_features_dominant_freq(ray_session, audio_table):
    import pyarrow.parquet as pq

    truth = {
        r["audio_id"]: r["tone_hz"] for r in pq.read_table(audio_table).to_pylist()
    }
    rows = audio.audio_features(audio_table).take_all()
    assert len(rows) == 80
    for r in rows:
        assert r["feature_error"] is None
        assert r["duration_s"] > 0 and 0 < r["rms"] < 1
        # FFT bin resolution: 1/duration Hz
        assert abs(r["dominant_hz"] - truth[r["audio_id"]]) <= 1.0 / r["duration_s"] + 0.01


def test_audio_stub_for_compressed(ray_session):
    import pyarrow as pa
    import ray.data as rd

    samples = np.zeros(100, np.int16)
    tbl = pa.table(
        {
            "audio_id": ["a", "b"],
            "bytes": pa.array([codecs.encode_wav(samples, 8000), b"\xffMP3FAKE"], pa.binary()),
            "fmt": ["wav", "mp3"],
            "sample_rate": pa.array([8000, 44100], pa.int32()),
            "n_samples": pa.array([100, 0], pa.int32()),
        }
    )
    out = rd.from_arrow(tbl).map_batches(
        audio.AudioFeatures, batch_format="pyarrow", concurrency=1
    ).take_all()
    by_id = {r["audio_id"]: r for r in out}
    assert by_id["a"]["feature_error"] is None
    assert "external codec" in by_id["b"]["feature_error"]


def test_audio_near_dup_planted_rerecordings(ray_session):
    """Every planted 0.55x re-recording (i % 10 == 6 copies i-3:
    different BYTES, same spectra) is paired at threshold 0.6, nothing
    else is, and the pipeline agrees with a brute-force driver
    recompute of the shingle Jaccard."""
    import itertools

    import pyarrow.parquet as pq

    from newscrawler_ray.pipelines.audio import (
        audio_near_dup,
        audio_peak_shingles,
        decode_audio,
        default_audio_fixture,
    )

    p = default_audio_fixture(200, 42)
    df = audio_near_dup(p, threshold=0.6).to_pandas()
    got = {(r.audio_a, r.audio_b) for r in df.itertuples()}
    want = {
        (f"aud-{i-3:06d}", f"aud-{i:06d}") for i in range(6, 200, 10)
    } | {
        # natural near-dup: clips 165/193 drew the same three tone
        # frequencies (seeded coincidence) — the same signal at
        # different durations, correctly flagged (plus 193's planted
        # re-recording 196, transitively)
        ("aud-000165", "aud-000193"),
        ("aud-000165", "aud-000196"),
    }
    assert got == want
    assert (df.jaccard >= 0.6).all()
    # bytes really differ on every planted pair (the exact-dedup miss)
    t = pq.read_table(p)
    blobs = dict(zip(t.column("audio_id").to_pylist(), t.column("bytes").to_pylist()))
    for a, b in want:
        assert blobs[a] != blobs[b]
    # brute-force parity at a low threshold over a corpus slice
    fmts = dict(zip(t.column("audio_id").to_pylist(), t.column("fmt").to_pylist()))
    ids = [f"aud-{i:06d}" for i in range(80)]
    sets = {
        a: set(audio_peak_shingles(decode_audio(blobs[a], fmts[a])[0]).tolist())
        for a in ids
    }
    brute = {
        (a, b)
        for a, b in itertools.combinations(ids, 2)
        if len(sets[a] & sets[b]) / max(1, len(sets[a] | sets[b])) >= 0.3
    }
    got_low = {
        (r.audio_a, r.audio_b)
        for r in audio_near_dup(p, threshold=0.3).to_pandas().itertuples()
        if r.audio_a in sets and r.audio_b in sets
    }
    assert got_low == brute


def test_audio_dedup_clips_first_wins(ray_session):
    """Survivors = corpus minus each planted pair's later member and
    the natural cluster {165,193,196}'s non-min members."""
    from newscrawler_ray.pipelines.audio import audio_dedup_clips, default_audio_fixture

    p = default_audio_fixture(200, 42)
    kept = set(
        audio_dedup_clips(p, threshold=0.6).to_pandas()["audio_id"]
    )
    dropped = {f"aud-{i:06d}" for i in range(6, 200, 10)} | {
        "aud-000193", "aud-000196",
    }
    assert kept == {f"aud-{i:06d}" for i in range(200)} - dropped
