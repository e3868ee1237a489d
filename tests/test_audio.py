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
