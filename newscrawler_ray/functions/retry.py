"""Retry / backoff / penalty semantics on the VIRTUAL clock (T2/T3).

Rebuild of the reference's HTTP resilience behavior
(``utils/network_utils.py:39-60``: ``Retry(total=3, backoff_factor=1,
status_forcelist=[429,500,502,503,504])``; ``utils/article_extractor.py:
361-369``: 403 penalty sleep 5-10 s, 429 penalty sleep 10-20 s), made
deterministic and distributed-correct:

  * a URL's transient-failure count and status are DATA (fixture
    columns), so an attempt sequence is a pure function of the URL;
  * retry k (1-based) costs ``1000 * 2^(k-1)`` ms of virtual backoff
    (exponential, base 1 s — the backoff_factor=1 schedule);
  * a URL whose transients exceed the 3-retry budget fails with the
    transient status (error-as-record);
  * the penalty "sleep" after a final 403/429 is drawn uniformly from
    the reference's window via a splitmix hash of the URL hash — the
    deterministic stand-in for the reference's ``random.uniform`` (a
    per-actor RNG would make makespans depend on scheduling).

Both the single-threaded oracle and the Ray fetch stage import EXACTLY
these functions, so virtual-clock accounting matches byte-for-byte.
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

RETRY_TOTAL = 3  # reference network_utils.py:50
RETRY_STATUSES = frozenset({429, 500, 502, 503, 504})  # :53
PENALTY_403_MS = (5_000, 10_000)  # article_extractor.py:365 (5-10 s)
PENALTY_429_MS = (10_000, 20_000)  # article_extractor.py:369 (10-20 s)
_PENALTY_SALT = np.uint64(0x5EED5EED5EED5EED)

_U64 = np.uint64


def backoff_ms(n_retries: int) -> int:
    """Total virtual backoff for n_retries retries: sum 1000 * 2^(k-1)."""
    return 1000 * ((1 << n_retries) - 1)


def retry_plan(n_transient: int, transient_status: int, base_status: int):
    """-> (final_status, n_attempts, backoff_ms_total).

    ``n_transient`` failures with ``transient_status`` precede the base
    outcome; the retry budget allows RETRY_TOTAL retries (so
    RETRY_TOTAL+1 attempts)."""
    if n_transient <= 0:
        return base_status, 1, 0
    retries = min(n_transient, RETRY_TOTAL)
    if n_transient > RETRY_TOTAL:
        return transient_status, RETRY_TOTAL + 1, backoff_ms(RETRY_TOTAL)
    return base_status, n_transient + 1, backoff_ms(retries)


def penalty_ms(url_hash: int, final_status: int) -> int:
    """Deterministic penalty window after a final 403/429 (0 otherwise)."""
    if final_status == 403:
        lo, hi = PENALTY_403_MS
    elif final_status == 429:
        lo, hi = PENALTY_429_MS
    else:
        return 0
    h = int(splitmix64(np.array([url_hash], dtype=np.int64).view(_U64) ^ _PENALTY_SALT)[0])
    return lo + h % (hi - lo)


# ------------------------------------------------------------ vector forms


def retry_plan_batch(
    n_transient: np.ndarray, transient_status: np.ndarray, base_status: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized ``retry_plan`` -> (final_status, n_attempts, backoff)."""
    nt = np.clip(n_transient, 0, None)
    exhausted = nt > RETRY_TOTAL
    retries = np.minimum(nt, RETRY_TOTAL)
    final = np.where(exhausted, transient_status, base_status).astype(np.int32)
    attempts = (retries + 1).astype(np.int32)
    backoff = (1000 * ((1 << retries.astype(np.int64)) - 1)).astype(np.int64)
    return final, attempts, backoff


def penalty_ms_batch(url_hash: np.ndarray, final_status: np.ndarray) -> np.ndarray:
    """Vectorized ``penalty_ms``."""
    h = splitmix64(url_hash.astype(np.int64).view(_U64) ^ _PENALTY_SALT)
    out = np.zeros(len(url_hash), dtype=np.int64)
    for status, (lo, hi) in ((403, PENALTY_403_MS), (429, PENALTY_429_MS)):
        m = final_status == status
        out[m] = lo + (h[m] % _U64(hi - lo)).astype(np.int64)
    return out
