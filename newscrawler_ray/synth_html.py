"""Deterministic synthetic HTML pages + extraction goldens.

Pure function of (seed, i) like synth.py. Each page is built from known
title / author / paragraph strings arranged in one of five layouts that
exercise a different branch of the extraction cascades
(stages/html_extract.py; reference utils/article_extractor.py:247-350):

  layout 0  <article> container, h1 title, .byline author; script/style
            and .ad junk planted INSIDE the container (must be stripped)
  layout 1  .post-content container, <title>-only title, [rel=author]
  layout 2  meta-only title ([property="og:title"]), .entry-content
            container, author via the [class*="author"] substring match
  layout 3  NO content container -> whole-document paragraph fallback,
            with short (<50 char) paragraphs that must be excluded and
            nav/footer junk that must be removed first
  layout 4  container exists but under the 200-char gate -> cascade
            falls through to the paragraph fallback; no author present

The expected record for every page is computed FROM THE INPUT STRINGS,
never by running the extractor — so the golden test is real parity, not
a self-fulfilling snapshot. Junk text carries sentinel tokens (JUNKAD,
JUNKNAV, JUNKSCRIPT) that must never appear in any extracted field.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .stages.html_extract import MIN_PARAGRAPH_CHARS, SUMMARY_CHARS

_VOCAB = None


def _vocab(seed: int) -> list[str]:
    global _VOCAB
    if _VOCAB is None:
        r = np.random.default_rng([seed, 77])
        _VOCAB = [
            "h" + "".join(chr(97 + c) for c in r.integers(0, 26, 5))
            for _ in range(400)
        ]
    return _VOCAB


def _rng(seed: int, *stream: int) -> np.random.Generator:
    return np.random.default_rng([seed, *stream])


def _sentence(r: np.random.Generator, vocab: list[str], n_words: int) -> str:
    return " ".join(vocab[int(k)] for k in r.integers(0, len(vocab), n_words))


def page_spec(i: int, seed: int = 42) -> dict:
    """The ground-truth ingredients of page i (layout, strings)."""
    r = _rng(seed, 21, i)
    vocab = _vocab(seed)
    layout = i % 5
    title = f"Headline {i}: {_sentence(r, vocab, 6)}"
    author = f"Reporter {_sentence(r, vocab, 2).title()}"
    paras = [_sentence(r, vocab, int(r.integers(15, 40))) for _ in range(int(r.integers(3, 7)))]
    short_paras = [_sentence(r, vocab, 3) for _ in range(2)]  # < 50 chars
    return {
        "layout": layout,
        "title": title,
        "author": author,
        "paras": paras,
        "short_paras": short_paras,
        "empty": i % 41 == 13,
    }


def render_html(spec: dict) -> str | None:
    if spec["empty"]:
        return None
    t, a, paras = spec["title"], spec["author"], spec["paras"]
    shorts = spec["short_paras"]
    ps = "\n".join(f"<p>{p}</p>" for p in paras)
    short_ps = "\n".join(f"<p>{p}</p>" for p in shorts)
    junk = (
        '<script>var JUNKSCRIPT = 1;</script><style>.x{color:red}</style>'
        '<div class="ad">JUNKAD buy things</div>'
    )
    nav = '<nav>JUNKNAV home | about</nav><footer>JUNKNAV footer</footer>'
    layout = spec["layout"]
    if layout == 0:
        return (
            f"<html><head><meta property=\"og:title\" content=\"WRONG {t}\">"
            f"</head><body>{nav}<h1>{t}</h1>"
            f'<div class="byline">{a}</div>'
            f"<article>{junk}{ps}</article></body></html>"
        )
    if layout == 1:
        return (
            f"<html><head><title>{t}</title></head><body>{nav}"
            f'<a rel="author" href="/x">{a}</a>'
            f'<div class="post-content">{junk}{ps}</div></body></html>'
        )
    if layout == 2:
        return (
            f"<html><head><meta property=\"og:title\" content=\"{t}\"></head>"
            f"<body>{nav}"
            f'<span class="story-author-name">{a}</span>'
            f'<div class="entry-content">{ps}</div></body></html>'
        )
    if layout == 3:
        return (
            f"<html><body>{nav}"
            f'<div class="headline">{t}</div>'
            f'<span class="writer">{a}</span>'
            f"{short_ps}{ps}</body></html>"
        )
    # layout 4: container under the 200-char gate -> paragraph fallback
    return (
        f"<html><body><h1>{t}</h1>{nav}"
        f'<div class="content"><p>{shorts[0]}</p></div>'
        f"{ps}</body></html>"
    )


def expected_record(spec: dict) -> dict:
    """Golden extraction output, computed from the input strings."""
    if spec["empty"]:
        return {"title": "", "content": "", "summary": "", "author": "",
                "error": "Empty document"}
    layout = spec["layout"]
    content = " ".join(spec["paras"])
    if layout == 4:
        # fallback joins long paragraphs only; the short container para is
        # excluded by the >50-char gate (shorts are < 50 by construction)
        assert all(len(p) <= MIN_PARAGRAPH_CHARS for p in spec["short_paras"])
    summary = (
        content[:SUMMARY_CHARS] + "..." if len(content) > SUMMARY_CHARS else content
    )
    author = "" if layout == 4 else spec["author"]
    return {
        "title": spec["title"],
        "content": content,
        "summary": summary,
        "author": author,
        "error": None,
    }


# ---------------------------------------------------------- video pages

_VIDEO_DATE_FALLBACK = "2025-07-01T00:00:00"


def video_spec(i: int, seed: int = 42) -> dict:
    """Ground truth for video page i. Layouts exercise each tier of the
    metadata cascades (stages/metadata_extract.py):

      0 element selectors throughout + JSON counts
      1 meta-tag tier (og:title, name=author, time[datetime]) + textual
        counts with thousands separators
      2 <title> suffix strip + regex tier for author/date/description
      3 regex-only title with JSON escapes; [class*="owner"] author;
        missing date (injected fallback) and missing views (null)
      4 invalid URL -> 'Invalid video URL', nothing parsed
      5 empty html -> 'Empty document'
    """
    r = _rng(seed, 22, i)
    vocab = _vocab(seed)
    layout = i % 6
    title = f"Video {i}: {_sentence(r, vocab, 5)}"
    author = f"Channel {_sentence(r, vocab, 2).title()}"
    desc = _sentence(r, vocab, 18)
    views = int(r.integers(100, 5_000_000))
    likes = int(r.integers(1, 50_000))
    day = int(r.integers(1, 28))
    date_iso = f"2025-06-{day:02d}T12:30:00"
    url = (
        f"http://videos.example.com/clip/{i}"  # no /watch -> invalid
        if layout == 4
        else f"http://videos.example.com/watch?v=vid{i:06d}"
    )
    return {
        "layout": layout,
        "url": url,
        "title": title,
        "author": author,
        "desc": desc,
        "views": views,
        "likes": likes,
        "date_iso": date_iso,
    }


def render_video_html(spec: dict) -> str | None:
    lay = spec["layout"]
    if lay == 5:
        return None
    t, a, d = spec["title"], spec["author"], spec["desc"]
    v, lk, dt = spec["views"], spec["likes"], spec["date_iso"]
    if lay == 0:
        return (
            f"<html><head><meta property=\"article:published_time\" content=\"{dt}\">"
            f"<meta property=\"og:description\" content=\"{d}\"></head><body>"
            f"<vid-meta><h1><vid-str>{t}</vid-str></h1>"
            f"<vid-channel><a href=\"/c\">{a}</a></vid-channel></vid-meta>"
            f"<script>var x = {{\"viewCount\":\"{v}\",\"likeCount\":\"{lk}\"}};</script>"
            f"</body></html>"
        )
    if lay == 1:
        return (
            f"<html><head><meta property=\"og:title\" content=\"{t}\">"
            f"<meta name=\"author\" content=\"{a}\">"
            f"<meta name=\"description\" content=\"{d}\"></head><body>"
            f"<time datetime=\"{dt}\">june</time>"
            f"<span>{v:,} views</span><span>{lk:,} likes</span></body></html>"
        )
    if lay == 2:
        return (
            f"<html><head><title>{t} - VideoSite</title></head><body>"
            f"<p>meta blob: \"channelName\":\"{a}\" \"uploadDate\":\"{dt}\" "
            f"\"description\":\"{d}\" \"viewCount\":\"{v}\" \"likeCount\":\"{lk}\"</p>"
            f"</body></html>"
        )
    if lay == 3:
        return (
            f"<html><body><vid-str class=\"x-owner-badge\">{a}</vid-str>"
            f"<p>\"title\":\"{t} \\u0026 more\" \"likeCount\":\"{lk}\"</p>"
            f"</body></html>"
        )
    # layout 4: invalid URL — content present but must never be parsed
    return f"<html><body><h1><vid-str>SHOULD NOT PARSE</vid-str></h1></body></html>"


def expected_video_record(spec: dict) -> dict:
    lay = spec["layout"]
    empty = {
        "title": "", "author": "", "description": "", "published_at": None,
        "view_count": None, "like_count": None,
    }
    if lay == 4:
        return dict(empty, error="Invalid video URL")
    if lay == 5:
        return dict(empty, error="Empty document")
    rec = {
        "title": spec["title"],
        "author": spec["author"],
        "description": spec["desc"],
        "published_at": spec["date_iso"],
        "view_count": spec["views"],
        "like_count": spec["likes"],
        "error": None,
    }
    if lay == 3:
        rec["title"] = f"{spec['title']} & more"
        rec["description"] = ""
        rec["published_at"] = _VIDEO_DATE_FALLBACK
        rec["view_count"] = None
    return rec


def gen_video_fixtures(out_dir: str | Path, n_pages: int = 300, seed: int = 42) -> Path:
    out = Path(out_dir)
    manifest = out / "video_manifest.json"
    if manifest.exists():
        cfg = json.loads(manifest.read_text())
        if cfg.get("n_pages") == n_pages and cfg.get("seed") == seed:
            return out
    out.mkdir(parents=True, exist_ok=True)
    specs = [video_spec(i, seed) for i in range(n_pages)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_pages), pa.int64()),
                "url": pa.array([s["url"] for s in specs]),
                "html": pa.array(
                    [
                        (h.encode() if (h := render_video_html(s)) is not None else None)
                        for s in specs
                    ],
                    pa.binary(),
                ),
            }
        ),
        out / "video_pages.parquet",
    )
    exp = [expected_video_record(s) for s in specs]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_pages), pa.int64()),
                "title": pa.array([e["title"] for e in exp], pa.string()),
                "author": pa.array([e["author"] for e in exp], pa.string()),
                "description": pa.array([e["description"] for e in exp], pa.string()),
                "published_at": pa.array(
                    [e["published_at"] for e in exp], pa.string()
                ),
                "view_count": pa.array([e["view_count"] for e in exp], pa.int64()),
                "like_count": pa.array([e["like_count"] for e in exp], pa.int64()),
                "error": pa.array([e["error"] for e in exp], pa.string()),
            }
        ),
        out / "video_goldens.parquet",
    )
    manifest.write_text(json.dumps({"n_pages": n_pages, "seed": seed}))
    return out


def gen_html_fixtures(out_dir: str | Path, n_pages: int = 500, seed: int = 42) -> Path:
    """Write pages.parquet (doc_id, url, html) + goldens.parquet."""
    out = Path(out_dir)
    manifest = out / "html_manifest.json"
    if manifest.exists():
        cfg = json.loads(manifest.read_text())
        if cfg.get("n_pages") == n_pages and cfg.get("seed") == seed:
            return out
    out.mkdir(parents=True, exist_ok=True)
    specs = [page_spec(i, seed) for i in range(n_pages)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_pages), pa.int64()),
                "url": pa.array(
                    [f"http://synth.example.com/a/{i}" for i in range(n_pages)]
                ),
                "html": pa.array(
                    [
                        (h.encode("utf-8") if (h := render_html(s)) is not None else None)
                        for s in specs
                    ],
                    pa.binary(),
                ),
            }
        ),
        out / "html_pages.parquet",
    )
    exp = [expected_record(s) for s in specs]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_pages), pa.int64()),
                "title": pa.array([e["title"] for e in exp], pa.string()),
                "content": pa.array([e["content"] for e in exp], pa.string()),
                "summary": pa.array([e["summary"] for e in exp], pa.string()),
                "author": pa.array([e["author"] for e in exp], pa.string()),
                "error": pa.array([e["error"] for e in exp], pa.string()),
            }
        ),
        out / "html_goldens.parquet",
    )
    manifest.write_text(json.dumps({"n_pages": n_pages, "seed": seed}))
    return out
