"""Crawl -> article-extraction composition (reference inline-extract path:
services/news_service.py:95-108 -> utils/article_extractor.py:412-479).

Oracles: golden parity (expected records computed FROM the generator's
input strings, independently of the extractor) and extraction-cache
semantics (second run extracts nothing; an interrupted-crawl cache is
topped up incrementally, never recomputed)."""

import pytest

from newscrawler_ray.pipelines.crawl import run_crawl
from newscrawler_ray.pipelines.webextract import (
    ARTICLE_ID_MASK,
    extract_crawl_output,
    extracted_articles_dataset,
)
from newscrawler_ray.synth_html import expected_record, page_spec


@pytest.fixture(scope="module")
def crawl_out(ray_session, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("xcomp") / "crawl"
    res = run_crawl(fixture_dir, out, checkpoint=False, collect_seen=False)
    return out, res


def _golden_check(rows):
    for row in rows:
        exp = expected_record(page_spec(int(row["url_hash"]) & ARTICLE_ID_MASK, 42))
        assert row["title"] == exp["title"], row["url"]
        assert row["content"] == exp["content"], row["url"]
        assert row["summary"] == exp["summary"], row["url"]
        assert row["author"] == exp["author"], row["url"]
        assert row["extraction_error"] == exp["error"], row["url"]


def test_extract_crawl_output_golden_and_cache(crawl_out, tmp_path):
    out, res = crawl_out
    cache = tmp_path / "cache"
    r1 = extract_crawl_output(out, cache)
    # one extraction per stored crawl row
    stored = (
        extracted_articles_dataset(cache).count()
    )
    assert r1["n_new"] == stored > 0 and r1["n_cached"] == 0
    # second run: everything is a cache hit, nothing is recomputed
    r2 = extract_crawl_output(out, cache)
    assert r2["n_new"] == 0 and r2["n_cached"] == r1["n_new"]
    _golden_check(extracted_articles_dataset(cache).take_all())


def test_extract_cache_tops_up_after_resume(ray_session, fixture_dir, tmp_path):
    """Extract over a partial crawl, finish the crawl, extract again:
    the second pass only extracts the newly stored rows and the final
    cache equals a single-shot extraction of the full output."""
    out = tmp_path / "crawl"
    cache = tmp_path / "cache"
    run_crawl(fixture_dir, out, stop_after_wave=2, checkpoint=True,
              collect_seen=False)
    r1 = extract_crawl_output(out, cache)
    assert r1["n_new"] > 0
    run_crawl(fixture_dir, out, resume=True, checkpoint=True,
              collect_seen=False)
    r2 = extract_crawl_output(out, cache)
    assert r2["n_cached"] == r1["n_new"] and r2["n_new"] > 0
    rows = extracted_articles_dataset(cache).take_all()
    # cache keys are exactly the stored rows of the finished crawl
    from newscrawler_ray.pipelines.crawl import crawl_output_dataset

    stored_hashes = sorted(
        r["url_hash"]
        for r in crawl_output_dataset(out)
        .map_batches(
            lambda t: t.filter(t.column("stored")).select(["url_hash"]),
            batch_format="pyarrow",
        )
        .take_all()
    )
    assert sorted(r["url_hash"] for r in rows) == stored_hashes
    _golden_check(rows)
