"""Single-threaded, reference-faithful oracle crawler (golden producer).

Implements the reference's crawl semantics (SURVEY.md §3.1) over the
synthetic web fixtures, with the determinism fixes SURVEY §7.5 calls out:

  * canonicalize + first-wins exact URL dedup (reference D2/D3:
    ``google_news_crawler.py:269,306-313``; unique index ``database.py:28``)
  * excluded-domain anti-filter (J2, ``utils/url_utils.py:18-34``) and
    robots disallow-prefix filtering applied at DISCOVERY time — a blocked
    URL is never enqueued and never in the seen-set
  * error-as-record fetch taxonomy (M6, ``article_extractor.py:361-410``):
    non-200 statuses become rows with ``extraction_error``, links are only
    discovered from 200 pages
  * >=1000-char content ingest filter (M3, ``main.py:184``) applied to the
    STORED output only; short pages still count as fetched and still
    contribute out-links
  * final crawl ordering = recency sort ``priority DESC`` with the
    deterministic tiebreak ``canonical_url ASC`` (O1,
    ``google_news_crawler.py:518-519`` made parallel-safe — the reference's
    stable-sort discovery-order tiebreak is execution-order-dependent, so
    the rebuild pins a data-derived tiebreak; the oracle defines the golden)
  * per-host politeness budget on a VIRTUAL clock (T1,
    ``scraping_config.py:8`` 2.0 s/domain): fetches never sleep, but each
    host's virtual timeline advances ``min_interval_ms`` per fetch and the
    crawl makespan is the max host timeline — identical accounting in the
    Ray pipeline, so budgets compare exactly.

The Ray pipeline must reproduce ``seen`` and ``order`` byte-for-byte.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from pathlib import Path

_EPOCH = datetime(1970, 1, 1)
_US = timedelta(microseconds=1)


def ts_us(dt: datetime) -> int:
    """tz-naive datetime -> epoch microseconds (no local-tz dependence)."""
    return (dt - _EPOCH) // _US

import pyarrow.parquet as pq

from .functions.retry import penalty_ms, retry_plan
from .functions.urls import canonicalize_url, host_of, is_blocked, url_hash64

ERROR_MESSAGES = {
    403: "HTTP 403 Forbidden",
    429: "HTTP 429 Too Many Requests",
    500: "HTTP 500 Internal Server Error",
    502: "HTTP 502 Bad Gateway",
    503: "HTTP 503 Server Error",
    504: "HTTP 504 Gateway Timeout",
    -1: "Request timeout",
}


@dataclass
class OracleResult:
    seen: list[str]  # sorted canonical URLs ever enqueued
    order: list[str]  # stored output URLs in final crawl order
    records: dict[str, dict]  # canonical url -> output record
    metrics: dict[str, int]
    makespan_ms: int = 0
    host_clock_ms: dict[str, int] = field(default_factory=dict)


def load_world_tables(fixture_dir: str | Path):
    d = Path(fixture_dir)
    pages = pq.read_table(d / "pages.parquet").to_pylist()
    pages = {r["url"]: r for r in pages}
    links_t = pq.read_table(d / "links.parquet")
    links: dict[str, list[str]] = {}
    for src, dst in zip(
        links_t["src_url"].to_pylist(), links_t["dst_url"].to_pylist()
    ):
        links.setdefault(src, []).append(dst)
    pol = pq.read_table(d / "politeness.parquet").to_pylist()
    politeness = {
        r["host"]: {
            "min_interval_ms": r["min_interval_ms"],
            "robots_disallow": list(r["robots_disallow"]),
        }
        for r in pol
    }
    import json

    cfg = json.loads((d / "config.json").read_text())
    blocklist = frozenset(cfg["blocklist"])
    seeds = pq.read_table(d / "seeds.parquet").to_pylist()
    return pages, links, politeness, blocklist, seeds


def _allowed(canon: str, host: str, politeness: dict, blocklist: frozenset) -> bool:
    if is_blocked(host, blocklist):
        return False
    dis = politeness.get(host, {}).get("robots_disallow", [])
    if dis:
        # path starts at the first '/' after the authority — slicing at
        # 7+len(host) would start at ':port/...' for non-default ports and
        # '/private'-style prefixes would never match (route.py identical)
        slash = canon.find("/", 7)
        path = canon[slash:] if slash != -1 else ""
        for prefix in dis:
            if path.startswith(prefix):
                return False
    return True


def run_oracle(
    fixture_dir: str | Path,
    min_content_len: int = 1000,
    trap_policy: dict | None = None,
) -> OracleResult:
    """``trap_policy`` (functions/traps.py): per-(host, template) hash
    damping applied at discovery time — order-independent, so the BFS
    closure here still equals the wave crawl's seen-set exactly."""
    from .functions.traps import trap_keep

    pages, links, politeness, blocklist, seeds = load_world_tables(fixture_dir)

    seen: set[str] = set()
    frontier: deque[tuple[str, int]] = deque()  # (canonical, depth)
    m = {
        "enqueued": 0,
        "dedup_hits": 0,
        "blocked": 0,
        "trap_skipped": 0,
        "fetched": 0,
        "errors": 0,
        "short_content": 0,
        "stored": 0,
        "missing_page": 0,
        "retries": 0,
        "penalties": 0,
    }

    def try_enqueue(raw_url: str, depth: int) -> None:
        canon = canonicalize_url(raw_url)
        host = host_of(canon)
        if not _allowed(canon, host, politeness, blocklist):
            m["blocked"] += 1
            return
        if not trap_keep(canon, host, trap_policy):
            m["trap_skipped"] += 1
            return
        if canon in seen:
            m["dedup_hits"] += 1
            return
        seen.add(canon)
        m["enqueued"] += 1
        frontier.append((canon, depth))

    for row in seeds:
        try_enqueue(row["url"], 0)

    records: dict[str, dict] = {}
    host_clock: dict[str, int] = {}

    while frontier:
        canon, depth = frontier.popleft()
        host = host_of(canon)
        page = pages.get(canon)
        interval = politeness.get(host, {}).get("min_interval_ms", 2000)
        host_clock[host] = host_clock.get(host, 0) + interval
        # 'fetched' = fetch attempted (every dequeued URL), matching the
        # pipeline's popped count; missing pages also count as errors
        m["fetched"] += 1
        if page is None:
            m["missing_page"] += 1
            records[canon] = {
                "url": canon,
                "depth": depth,
                "status": 404,
                "n_attempts": 1,
                "extraction_error": "HTTP 404 Not Found",
                "image_id": None,
                "priority": None,
                "content_len": 0,
            }
            m["errors"] += 1
            continue
        # retry/backoff on the virtual clock (functions/retry.py — shared
        # with the fetch stage): transient failures precede the base
        # status; the penalty window follows a final 403/429
        status, attempts, backoff = retry_plan(
            int(page.get("n_transient", 0) or 0),
            int(page.get("transient_status", 0) or 0),
            int(page["fetch_status"]),
        )
        pen = penalty_ms(url_hash64(canon), status)
        host_clock[host] += backoff + pen
        m["retries"] += attempts - 1
        if pen:
            m["penalties"] += 1
        rec = {
            "url": canon,
            "depth": depth,
            "status": int(status),
            "n_attempts": attempts,
            "image_id": page["image_id"],
            "priority": page["priority"],
            "content_len": int(page["content_len"]),
            "extraction_error": None,
        }
        if status != 200:
            rec["extraction_error"] = ERROR_MESSAGES.get(int(status), f"HTTP {status}")
            m["errors"] += 1
            records[canon] = rec
            continue
        if rec["content_len"] < min_content_len:
            m["short_content"] += 1
        else:
            m["stored"] += 1
        records[canon] = rec
        for dst in links.get(canon, []):
            try_enqueue(dst, depth + 1)

    stored = [
        r
        for r in records.values()
        if r["status"] == 200 and r["content_len"] >= min_content_len
    ]
    # final crawl ordering: recency desc, deterministic tiebreak url asc
    stored.sort(key=lambda r: (-ts_us(r["priority"]), r["url"]))
    return OracleResult(  # noqa: keep construction in one place
        seen=sorted(seen),
        order=[r["url"] for r in stored],
        records=records,
        metrics=m,
        makespan_ms=max(host_clock.values(), default=0),
        host_clock_ms=host_clock,
    )


def write_goldens(fixture_dir: str | Path, out_dir: str | Path) -> Path:
    """Materialize the golden tables per FIXTURES.md §5:
    golden_order (rank, url), golden_seen (url_canonical),
    golden_metrics (one row per counter). Produced by the oracle, never
    hand-written."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    res = run_oracle(fixture_dir)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "rank": pa.array(range(len(res.order)), pa.int64()),
                "url": pa.array(res.order, pa.string()),
            }
        ),
        out / "golden_order.parquet",
    )
    pq.write_table(
        pa.table({"url_canonical": pa.array(res.seen, pa.string())}),
        out / "golden_seen.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "metric": pa.array(list(res.metrics) + ["makespan_ms"], pa.string()),
                "value": pa.array(
                    [int(v) for v in res.metrics.values()] + [res.makespan_ms],
                    pa.int64(),
                ),
            }
        ),
        out / "golden_metrics.parquet",
    )
    return out
