"""Timestamp normalization (reference M4 analog).

The reference parses upstream timestamps with an ISO-``Z`` fixup, a chain
of ``strptime`` fallbacks, UTC conversion and tzinfo strip
(``google_news_crawler.py:31-51``, ``news_sources.py:64-69,100-105,144-150``),
falling back to *now* — which SURVEY §7.5 flags as nondeterminism. The
rebuild keeps the exact parse chain but takes the fallback instant as an
argument so runs are reproducible.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa

_FORMATS = [
    "%Y-%m-%dT%H:%M:%S.%f%z",
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%a, %d %b %Y %H:%M:%S %Z",
    "%a, %d %b %Y %H:%M:%S %z",
]


def parse_datetime(value: str | None, fallback: datetime) -> datetime:
    """Parse -> UTC -> drop tzinfo; ``fallback`` on any failure.

    Mirrors the reference's ``Z``-suffix fixup and multi-format chain, but
    the fallback is injected (never wall-clock) for determinism.
    """
    if not value:
        return fallback
    text = value.strip()
    if text.endswith("Z"):
        text = text[:-1] + "+00:00"
    try:
        dt = datetime.fromisoformat(text)
    except ValueError:
        dt = None
        for fmt in _FORMATS:
            try:
                dt = datetime.strptime(text, fmt)
                break
            except ValueError:
                continue
        if dt is None:
            return fallback
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def parse_datetime_array(
    values: pa.Array | pa.ChunkedArray, fallback: datetime
) -> pa.Array:
    """Batch form -> ``timestamp('us')`` array."""
    out = [parse_datetime(v, fallback) for v in values.to_pylist()]
    return pa.array(out, pa.timestamp("us"))
