"""Shared integer mix hashing (single source of truth).

splitmix64 is used both for bloom-filter probe derivation
(state/seen.py) and MinHash permutations / band folding
(pipelines/dedup.py) — the two MUST stay bit-identical, so the mix
lives here once.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
    x ^= x >> _U64(30)
    x *= _U64(0xBF58476D1CE4E5B9)
    x ^= x >> _U64(27)
    x *= _U64(0x94D049BB133111EB)
    x ^= x >> _U64(31)
    return x
