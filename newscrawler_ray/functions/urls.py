"""URL canonicalization, host extraction, hashing.

Semantics derive from the reference's URL handling (SURVEY.md M1/M2/M8,
§2.8): ``urlparse().netloc`` host extraction with ``www.`` strip
(reference ``utils/url_utils.py:26-29``), plus the canonical-form rules the
rebuild needs so trivially-variant URLs (http/https, trailing slash,
fragment, www.) dedup to one frontier entry (FIXTURES.md §2).

Canonical form:
  * scheme unified to ``http`` (http/https treated as the same resource)
  * host lowercased, leading ``www.`` stripped, default :80/:443 dropped
  * fragment dropped, query kept
  * trailing slash stripped (so ``/a/`` == ``/a``; bare root == empty path)

Both the single-threaded oracle and the Ray pipeline use EXACTLY these
functions, so the final URL-seen set matches by construction of shared
semantics (not shared execution).
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa


def canonicalize_url(url: str) -> str:
    parts = urlsplit(url.strip())
    host = parts.hostname or ""
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    port = parts.port
    netloc = host if port in (None, 80, 443) else f"{host}:{port}"
    path = parts.path.rstrip("/")
    out = f"http://{netloc}{path}"
    if parts.query:
        out += f"?{parts.query}"
    return out


def host_of(url: str) -> str:
    """Canonical host (lowercased, www-stripped) — the politeness key."""
    host = (urlsplit(url).hostname or "").lower()
    return host[4:] if host.startswith("www.") else host


def url_hash64(url: str) -> int:
    """Stable 64-bit hash of a canonical URL (seen-filter / partition key).

    blake2b(8 bytes) — stable across processes (unlike Python ``hash``).
    """
    return int.from_bytes(
        hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "big", signed=True
    )


# ------------------------------------------------------------- batch kernels


def canonicalize_batch(urls: pa.Array | list[str]) -> tuple[list[str], list[str], np.ndarray]:
    """Vector form: returns (canonical urls, hosts, hash64 array).

    Python-loop over strings is unavoidable for urlsplit; batched here so
    the per-call overhead is amortized and the result is Arrow-ready.
    """
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = urls.to_pylist()
    canon = [canonicalize_url(u) for u in urls]
    hosts = [c[7 : c.find("/", 7)] if c.find("/", 7) != -1 else c[7:] for c in canon]
    hosts = [h.split("?", 1)[0].split(":", 1)[0] for h in hosts]
    hashes = np.fromiter((url_hash64(c) for c in canon), dtype=np.int64, count=len(canon))
    return canon, hosts, hashes


def is_blocked(host: str, blocklist: frozenset[str]) -> bool:
    """Excluded-domain predicate (reference ``utils/url_utils.py:18-34``):
    exact match or subdomain-suffix match against the blocklist."""
    if host in blocklist:
        return True
    for i, ch in enumerate(host):
        if ch == "." and host[i + 1 :] in blocklist:
            return True
    return False
