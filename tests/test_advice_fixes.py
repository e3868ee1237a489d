"""Regression tests for the round-1 review findings (ADVICE.md):

  * checkpoint manifest validation on resume (shard-count / fixture drift)
  * value_quantiles on an empty events table
  * pipeline_waves>1 + checkpoint warns instead of silently serializing
  * robots disallow-prefix matching on URLs with a non-default port
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from newscrawler_ray.oracle import _allowed
from newscrawler_ray.pipelines.crawl import run_crawl
from newscrawler_ray.synth import gen_fixtures


@pytest.fixture(scope="module")
def small_fixture(tmp_path_factory):
    out = tmp_path_factory.mktemp("fx_small") / "n300"
    return gen_fixtures(out, n_urls=300, seed=42)


def test_resume_shard_mismatch_raises(ray_session, small_fixture, tmp_path_factory):
    out = tmp_path_factory.mktemp("mismatch") / "out"
    partial = run_crawl(
        small_fixture, out, n_seen_shards=2, n_frontier_shards=2, stop_after_wave=0
    )
    assert partial["partial"]
    with pytest.raises(ValueError, match="manifest does not match"):
        run_crawl(
            small_fixture, out, n_seen_shards=3, n_frontier_shards=2, resume=True
        )


def test_resume_fixture_mismatch_raises(
    ray_session, small_fixture, tmp_path_factory
):
    out = tmp_path_factory.mktemp("mismatch_fx") / "out"
    run_crawl(
        small_fixture, out, n_seen_shards=2, n_frontier_shards=2, stop_after_wave=0
    )
    other = gen_fixtures(tmp_path_factory.mktemp("fx_other") / "n300b", 300, seed=7)
    with pytest.raises(ValueError, match="manifest does not match"):
        run_crawl(other, out, n_seen_shards=2, n_frontier_shards=2, resume=True)


def test_pipeline_waves_with_checkpoint_warns(
    ray_session, small_fixture, tmp_path_factory
):
    out = tmp_path_factory.mktemp("warn") / "out"
    with pytest.warns(UserWarning, match="pipeline_waves"):
        run_crawl(
            small_fixture, out, n_seen_shards=2, n_frontier_shards=2,
            checkpoint=True, pipeline_waves=2,
        )


def test_value_quantiles_empty_events(ray_session, tmp_path):
    from newscrawler_ray.pipelines.queries import value_quantiles

    pq.write_table(
        pa.table({"value": pa.array([], pa.float64())}), tmp_path / "events.parquet"
    )
    out = value_quantiles(str(tmp_path))
    assert out.num_rows == 5
    assert out.column("value").null_count == 5


def test_robots_prefix_matches_with_port():
    politeness = {"h.example.com": {"robots_disallow": ["/private"]}}
    # non-default port keeps ':8080' in the netloc; the path must still be
    # sliced from the first '/' after the authority
    assert not _allowed(
        "http://h.example.com:8080/private/x", "h.example.com", politeness, frozenset()
    )
    assert _allowed(
        "http://h.example.com:8080/public/x", "h.example.com", politeness, frozenset()
    )
    assert not _allowed(
        "http://h.example.com/private/x", "h.example.com", politeness, frozenset()
    )


# ------------------------------------------ round-4 ADVICE regression pins


SF001 = "/root/testdata/sf0.001"


def test_shard_layout_marker_pins_resume(ray_session, tmp_path):
    """ADVICE r4: resuming a sharded export with a different n_shards
    must fail loud (mixing two hash layouts would dup/drop rows)."""
    from newscrawler_ray.pipelines.corpusstats import export_training_shards

    out = tmp_path / "shards"
    export_training_shards(SF001, out, n_shards=4)
    assert (out / "_SHARD_LAYOUT.json").exists()
    with pytest.raises(ValueError, match="layout mismatch"):
        export_training_shards(SF001, out, n_shards=8)
    # same n_shards resumes fine (all shards skipped)
    man = export_training_shards(SF001, out, n_shards=4).to_pylist()
    assert all(r["skipped"] for r in man)


def test_webdataset_layout_marker_pins_resume(ray_session, fixture_dir, tmp_path):
    from newscrawler_ray.pipelines import vision

    out = tmp_path / "wds"
    vision.export_webdataset_shards(fixture_dir / "images.parquet", out, n_shards=4)
    with pytest.raises(ValueError, match="layout mismatch"):
        vision.export_webdataset_shards(fixture_dir / "images.parquet", out, n_shards=6)


def test_curated_memo_accepts_dataset_input(ray_session, fixture_dir):
    """ADVICE r4: _curated_kept_rows must not stat() a Dataset input —
    the crawl-wave-output path takes a Dataset, which bypasses the memo."""
    import ray.data as rd

    from newscrawler_ray.pipelines.vision import _curated_kept_rows

    ds = rd.read_parquet(str(fixture_dir / "images.parquet"))
    kept = _curated_kept_rows(
        ds, ["image_id", "caption"]
    )
    assert kept.count() > 0


def test_crawl_order_guard(ray_session, tmp_path, monkeypatch):
    """verdict r4 #7: the full-materialization helpers refuse oversized
    corpora unless unsafe=True."""
    from newscrawler_ray.pipelines import crawl as C
    from newscrawler_ray.synth import gen_fixtures

    fx = gen_fixtures(tmp_path / "fx", n_urls=120, seed=11)
    out = tmp_path / "out"
    C.run_crawl(fx, out)
    assert len(C.crawl_order(out)) > 0  # under the cap: fine
    monkeypatch.setattr(C, "_HELPER_ROW_CAP", 1)
    with pytest.raises(ValueError, match="crawl_order materializes"):
        C.crawl_order(out)
    with pytest.raises(ValueError, match="crawl_error_rows materializes"):
        C.crawl_error_rows(out)
    assert len(C.crawl_order(out, unsafe=True)) > 0
    # the bounded driver contract stays un-gated
    assert C.crawl_order_topk(out, k=5).num_rows == 5


def test_table_checksum_fast_invariance(ray_session, tmp_path):
    """Order/partition-independent fold + single-row sensitivity for the
    vectorized checksum twin."""
    import numpy as np

    from newscrawler_ray.pipelines.corpusstats import table_checksum_fast

    docs = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "text": pa.array([f"doc {i} body" for i in range(100)]),
            "n_chars": pa.array([len(f"doc {i} body") for i in range(100)], pa.int64()),
        }
    )
    d1 = tmp_path / "a"
    d1.mkdir()
    pq.write_table(docs, d1 / "documents.parquet")
    base = table_checksum_fast(str(d1)).to_pylist()[0]
    # reversed row order, different row-group split -> identical fold
    d2 = tmp_path / "b"
    d2.mkdir()
    rev = docs.take(pa.array(list(reversed(range(100)))))
    pq.write_table(rev, d2 / "documents.parquet", row_group_size=7)
    assert table_checksum_fast(str(d2)).to_pylist()[0] == base
    # one changed row flips both lanes
    d3 = tmp_path / "c"
    d3.mkdir()
    texts = docs.column("text").to_pylist()
    texts[50] = "doc 50 bodY"
    mut = docs.set_column(1, "text", pa.array(texts))
    pq.write_table(mut, d3 / "documents.parquet")
    got = table_checksum_fast(str(d3)).to_pylist()[0]
    assert got["xor_a"] != base["xor_a"] and got["xor_b"] != base["xor_b"]
    assert got["n_rows"] == base["n_rows"]
