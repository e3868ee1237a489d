"""M9 analog: structured video-metadata extractor — unit behavior per
cascade tier, URL-validation negatives (the reference's own negative-test
contract), and golden parity over the synthetic video pages."""

from datetime import datetime

import pyarrow.parquet as pq
import pytest

from newscrawler_ray.stages.metadata_extract import (
    extract_video_metadata,
    is_valid_video_url,
)
from newscrawler_ray.synth_html import gen_video_fixtures

_FB = datetime(2025, 7, 1)
_OK = "http://videos.example.com/watch?v=abc"


def test_url_validation():
    assert is_valid_video_url(_OK)
    assert is_valid_video_url("http://m.videos.example.com/watch?v=x")
    assert not is_valid_video_url("http://videos.example.com/clip/9")
    assert not is_valid_video_url("http://other.example.com/watch?v=x")
    assert not is_valid_video_url("not a url")


def test_invalid_url_error_record():
    rec = extract_video_metadata(
        "http://videos.example.com/clip/9", "<h1>never parsed</h1>", date_fallback=_FB
    )
    assert rec["error"] == "Invalid video URL"
    assert rec["title"] == "" and rec["view_count"] is None


def test_element_tier_with_descendants():
    html = (
        "<vid-meta><h1><vid-str>Deep Title</vid-str></h1>"
        '<vid-channel><a href="/c">Chan</a></vid-channel></vid-meta>'
    )
    rec = extract_video_metadata(_OK, html, date_fallback=_FB)
    assert rec["title"] == "Deep Title"
    assert rec["author"] == "Chan"
    assert rec["published_at"] == _FB  # no date -> injected fallback


def test_title_tag_suffix_strip():
    rec = extract_video_metadata(
        _OK, "<title>My Clip - VideoSite</title>", date_fallback=_FB
    )
    assert rec["title"] == "My Clip"


def test_regex_tier_and_json_unescape():
    html = '<p>"title":"A \\u0026 B" "channelName":"C\\/D" "viewCount":"42"</p>'
    rec = extract_video_metadata(_OK, html, date_fallback=_FB)
    assert rec["title"] == "A & B"
    assert rec["author"] == "C/D"
    assert rec["view_count"] == 42


def test_textual_counts_with_commas():
    html = "<span>1,234,567 views</span><span>8,901 likes</span>"
    rec = extract_video_metadata(_OK, html, date_fallback=_FB)
    assert rec["view_count"] == 1234567
    assert rec["like_count"] == 8901


def test_date_parsing_time_element():
    html = '<time datetime="2025-06-05T12:30:00Z">jun</time>'
    rec = extract_video_metadata(_OK, html, date_fallback=_FB)
    assert rec["published_at"] == datetime(2025, 6, 5, 12, 30)


@pytest.fixture(scope="module")
def video_fixture(tmp_path_factory):
    return gen_video_fixtures(tmp_path_factory.mktemp("video") / "fx", 300, 42)


def test_pipeline_matches_goldens(ray_session, video_fixture):
    from newscrawler_ray.pipelines.webextract import extract_video_metadata_pages

    got = {
        r["doc_id"]: r
        for r in extract_video_metadata_pages(
            video_fixture / "video_pages.parquet", date_fallback=_FB
        ).take_all()
    }
    gold = pq.read_table(video_fixture / "video_goldens.parquet").to_pylist()
    assert len(got) == len(gold)
    mismatches = []
    for g in gold:
        r = got[g["doc_id"]]
        want_dt = (
            datetime.fromisoformat(g["published_at"]) if g["published_at"] else None
        )
        for key, want in (
            ("title", g["title"]),
            ("author", g["author"]),
            ("description", g["description"]),
            ("published_at", want_dt),
            ("view_count", g["view_count"]),
            ("like_count", g["like_count"]),
            ("extraction_error", g["error"]),
        ):
            if r[key] != want:
                mismatches.append((g["doc_id"], key, r[key], want))
    assert not mismatches, mismatches[:5]
