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
