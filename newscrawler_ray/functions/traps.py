"""Crawler-trap guard: order-independent URL-space admission damping.

``mine_url_templates`` (pipelines/crawl.py) finds (host, path-template)
URL spaces with runaway URL counts — calendars, session ids, faceted
search. This module turns those mined counts into a POLICY the next
crawl pass enforces at discovery time, the same filter site as the
blocklist / robots rules (a damped URL never reaches the seen-set). The
reference crawls a fixed seed list and never meets traps
(``google_news_crawler.py`` walks curated category pages); an open
frontier at 10^10 URLs must cap per-space admission or one host eats
the crawl budget.

The rule must be ORDER-INDEPENDENT: the distributed crawl discovers
URLs in wave/priority order while the oracle walks BFS, and the e2e
contract is byte-equality of the seen-set closure. Any "first K
admitted" cap depends on traversal order, so the guard is a pure
per-URL predicate instead:

    keep(url)  <=>  (url_hash64(canonical) & 0xFFFF) < keep_per_64k

per (host, template). The surviving set is a deterministic hash sample
of the template's URL space — the same closure from ANY traversal
order — whose EXPECTED size is the cap (a hard cap cannot be
order-independent). Policies are tiny (the Heaps-law-bounded template
vocabulary) and ship to workers as plain broadcast config, like the
blocklist.
"""

from __future__ import annotations

import re
from pathlib import Path

from .urls import url_hash64

_DIGITS = re.compile(r"[0-9]+")

# dict[host, dict[template, keep_per_64k]]
TrapPolicy = dict[str, dict[str, int]]


def url_template(canon: str) -> str:
    """Digit-collapsed path template of a canonical URL. Must stay
    identical to the vectorized normalization in ``mine_url_templates``
    (scheme/authority strip + ``[0-9]+`` -> ``N``)."""
    slash = canon.find("/", 7)  # first '/' after 'http://' + authority
    path = canon[slash:] if slash != -1 else ""
    return _DIGITS.sub("N", path)


def build_trap_policy(
    rows: list[dict], max_urls: int
) -> TrapPolicy:
    """Mined (host, template, n_urls) rows -> admission policy: every
    template whose URL count exceeds ``max_urls`` gets a keep rate of
    ``max_urls / n_urls`` (quantized to 16 bits, floor 1 so a space is
    damped, never erased)."""
    policy: TrapPolicy = {}
    for r in rows:
        n = int(r["n_urls"])
        if n <= max_urls:
            continue
        rate = max(1, round(65536 * max_urls / n))
        policy.setdefault(r["host"], {})[r["template"]] = rate
    return policy


def trap_policy_from_snapshot(
    out_dir: str | Path, *, max_urls: int
) -> TrapPolicy:
    """Mine a previous crawl snapshot and build the next pass's policy —
    the trap half of the recrawl feedback loop (``schedule_recrawl`` is
    the priority half). The driver holds one row per over-cap (host,
    template): the template vocabulary, not the URL space."""
    from ..pipelines.crawl import mine_url_templates

    rows = mine_url_templates(out_dir, min_urls=max_urls + 1).take_all()
    return build_trap_policy(rows, max_urls)


def trap_keep(canon: str, host: str, policy: TrapPolicy | None) -> bool:
    """The per-URL admission predicate (oracle / per-row form; the route
    stage inlines the same rule against its precomputed hash array)."""
    if not policy:
        return True
    rates = policy.get(host)
    if not rates:
        return True
    rate = rates.get(url_template(canon))
    if rate is None:
        return True
    return (url_hash64(canon) & 0xFFFF) < rate
