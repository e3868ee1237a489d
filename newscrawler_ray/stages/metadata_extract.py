"""Structured video-metadata extractor — the M9 analog of the
reference's YouTube extractor (``utils/youtube_extractor.py:90-207``),
rebuilt over the in-repo DOM/selector engine with TYPED outputs.

Faithful operator structure, neutral site vocabulary:
  * URL validation first (reference ``_is_valid_youtube_url`` :209-218):
    host must be a video host and the path must contain ``/watch``;
    invalid URLs yield ``error='Invalid video URL'`` and no fetch/parse
    (the negative-test contract of the reference's own test file).
  * Every field runs a three-tier cascade exactly like the reference:
    element selectors (incl. descendant combinators) -> meta-tag
    fallback -> regex-on-page-source fallback (:220-477), with the
    ``\\u0026`` / ``\\/`` JSON unescapes.
  * ``<title>`` text drops the `` - VideoSite`` suffix (:264).
  * view/like counts parse to int64 (null when absent) — the reference
    keeps them as strings; typing them is the data-engine upgrade.
  * published date runs through functions/dates.parse_datetime with an
    INJECTED fallback so runs are deterministic (SURVEY §7.5).

Stateless ``map_batches`` operator like html_extract; cascades are data.
"""

from __future__ import annotations

import re
from datetime import datetime
from urllib.parse import urlsplit

import pyarrow as pa

from ..functions.dates import parse_datetime
from .html_extract import clean_text, compile_selector, parse_html, select_one

VIDEO_HOSTS = frozenset(
    {"videos.example.com", "www.videos.example.com", "m.videos.example.com"}
)
TITLE_SUFFIX = " - VideoSite"

TITLE_SELECTORS = (
    "vid-meta h1 vid-str",
    "vid-meta #title",
    "vid-meta h1",
    'vid-str[class*="title"]',
    "h1 vid-str",
    "h1.video-title",
)
TITLE_META = (
    'meta[property="og:title"]',
    'meta[name="title"]',
    'meta[property="twitter:title"]',
)
TITLE_PATTERNS = (r'"title":"([^"]+)"', r'"videoTitle":"([^"]+)"')

AUTHOR_SELECTORS = (
    "vid-meta vid-channel a",
    "vid-meta #channel-name a",
    "vid-channel a",
    "vid-channel vid-str",
    "a.vid-channel",
    'vid-str[class*="channel"]',
    'vid-str[class*="owner"]',
)
AUTHOR_META = ('meta[name="author"]', 'meta[property="og:site_name"]')
AUTHOR_PATTERNS = (
    r'"author":"([^"]+)"',
    r'"channelName":"([^"]+)"',
    r'"ownerChannelName":"([^"]+)"',
)

DATE_SELECTORS = (
    'meta[property="article:published_time"]',
    'meta[name="date"]',
    'meta[itemprop="datePublished"]',
    "time[datetime]",
)
DATE_PATTERNS = (r'"uploadDate":"([^"]+)"',)

DESC_META = (
    'meta[property="og:description"]',
    'meta[name="description"]',
    'meta[property="twitter:description"]',
)
DESC_PATTERNS = (r'"description":"([^"]+)"',)

VIEW_PATTERNS = (
    r'"viewCount":"(\d+)"',
    r'"view_count":"(\d+)"',
    r"(\d+(?:,\d+)*)\s+views",
)
LIKE_PATTERNS = (
    r'"likeCount":"(\d+)"',
    r'"like_count":"(\d+)"',
    r"(\d+(?:,\d+)*)\s+likes",
)

_TITLE_M = [compile_selector(s) for s in TITLE_SELECTORS]
_TITLE_META_M = [compile_selector(s) for s in TITLE_META]
_AUTHOR_M = [compile_selector(s) for s in AUTHOR_SELECTORS]
_AUTHOR_META_M = [compile_selector(s) for s in AUTHOR_META]
_DATE_M = [compile_selector(s) for s in DATE_SELECTORS]
_DESC_META_M = [compile_selector(s) for s in DESC_META]
_TITLE_TAG_M = compile_selector("title")


def is_valid_video_url(url: str) -> bool:
    try:
        parts = urlsplit(url)
        return parts.netloc in VIDEO_HOSTS and "/watch" in parts.path
    except Exception:
        return False


def _json_unescape(s: str) -> str:
    return s.replace("\\u0026", "&").replace("\\/", "/")


def _regex_first(patterns, text: str) -> str:
    for p in patterns:
        m = re.search(p, text)
        if m:
            return _json_unescape(m.group(1))
    return ""


def _element_cascade(root, matchers_list) -> str:
    for matchers in matchers_list:
        el = select_one(root, matchers)
        if el is not None:
            text = el.get_text().strip()
            if text:
                return text
    return ""


def _meta_cascade(root, matchers_list) -> str:
    for matchers in matchers_list:
        el = select_one(root, matchers)
        if el is not None:
            val = el.attrs.get("content", "").strip()
            if val:
                return val
    return ""


def _parse_count(s: str) -> int | None:
    s = s.replace(",", "")
    return int(s) if s.isdigit() else None


_EMPTY = {
    "title": "",
    "author": "",
    "description": "",
    "published_at": None,
    "view_count": None,
    "like_count": None,
}


def extract_video_metadata(
    url: str, html: str | bytes | None, *, date_fallback: datetime | None = None
) -> dict:
    """One page -> typed metadata record (error-as-record)."""
    if not is_valid_video_url(url):
        return dict(_EMPTY, error="Invalid video URL")
    if html is None:
        return dict(_EMPTY, error="Empty document")
    try:
        if isinstance(html, bytes):
            html = html.decode("utf-8", errors="replace")
        root = parse_html(html)

        title = _element_cascade(root, _TITLE_M)
        if not title:
            title = _meta_cascade(root, _TITLE_META_M)
        if not title:
            el = select_one(root, _TITLE_TAG_M)
            if el is not None:
                title = el.get_text().strip().replace(TITLE_SUFFIX, "")
        if not title:
            title = _regex_first(TITLE_PATTERNS, html)

        author = _element_cascade(root, _AUTHOR_M)
        if not author:
            author = _meta_cascade(root, _AUTHOR_META_M)
        if not author:
            author = _regex_first(AUTHOR_PATTERNS, html)

        date_str = ""
        for matchers in _DATE_M:
            el = select_one(root, matchers)
            if el is not None:
                date_str = el.attrs.get("content") or el.attrs.get("datetime") or ""
                if date_str:
                    break
        if not date_str:
            date_str = _regex_first(DATE_PATTERNS, html)
        published = parse_datetime(date_str, date_fallback) if date_str else date_fallback

        description = _meta_cascade(root, _DESC_META_M)
        if not description:
            description = _regex_first(DESC_PATTERNS, html)

        return {
            "title": clean_text(title),
            "author": clean_text(author),
            "description": clean_text(description),
            "published_at": published,
            "view_count": _parse_count(_regex_first(VIEW_PATTERNS, html)),
            "like_count": _parse_count(_regex_first(LIKE_PATTERNS, html)),
            "error": None,
        }
    except Exception as e:
        return dict(_EMPTY, error=f"Parse error: {e}")


def extract_metadata_batch(
    batch: pa.Table,
    *,
    url_col: str = "url",
    html_col: str = "html",
    date_fallback: datetime | None = None,
) -> pa.Table:
    """Stateless map_batches operator: (url, html) -> typed metadata."""
    urls = batch.column(url_col).to_pylist()
    htmls = batch.column(html_col).to_pylist()
    recs = [
        extract_video_metadata(u, h, date_fallback=date_fallback)
        for u, h in zip(urls, htmls)
    ]
    res = batch.drop_columns([html_col])
    res = res.append_column(
        "title", pa.array([r["title"] for r in recs], pa.string())
    )
    res = res.append_column(
        "author", pa.array([r["author"] for r in recs], pa.string())
    )
    res = res.append_column(
        "description", pa.array([r["description"] for r in recs], pa.string())
    )
    res = res.append_column(
        "published_at",
        pa.array([r["published_at"] for r in recs], pa.timestamp("us")),
    )
    res = res.append_column(
        "view_count", pa.array([r["view_count"] for r in recs], pa.int64())
    )
    res = res.append_column(
        "like_count", pa.array([r["like_count"] for r in recs], pa.int64())
    )
    return res.append_column(
        "extraction_error", pa.array([r["error"] for r in recs], pa.string())
    )
