"""Text scalar/batch kernels.

Vectorized (pyarrow.compute) analogs of the reference's text handling:
  * ``clean_text``   — NUL/control-char strip + whitespace collapse
                       (reference ``utils/article_extractor.py:166-203``)
  * ``summarize``    — ``content[:200] + '...'`` truncation
                       (reference ``utils/article_extractor.py:349-350``)
  * ``keyword_search_mask`` — whole-word, case-insensitive, multi-keyword
                       AND search across columns (reference
                       ``main.py:271-294``: PG ``~* '\\y kw \\y'`` per
                       keyword, AND-combined, + min content length)
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_WS_RE = r"\s+"


def clean_text_array(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Strip control chars, collapse whitespace runs to one space, trim."""
    out = pc.replace_substring_regex(arr, _CONTROL_RE, "")
    out = pc.replace_substring_regex(out, _WS_RE, " ")
    return pc.utf8_trim_whitespace(out)


def clean_text(s: str) -> str:
    s = re.sub(_CONTROL_RE, "", s)
    return re.sub(_WS_RE, " ", s).strip()


def summarize_array(arr: pa.ChunkedArray | pa.Array, n: int = 200) -> pa.Array:
    """First ``n`` chars + '...' (applied to every value, like the ref)."""
    head = pc.utf8_slice_codeunits(arr, 0, n)
    return pc.binary_join_element_wise(head, pa.scalar("..."), "")


def strip_publisher_suffix(title: str) -> str:
    """Headline cleaner (reference M11, ``google_news_crawler.py:433-437``):
    drop a trailing ``' - Publisher'`` segment if present."""
    head, sep, _ = title.rpartition(" - ")
    return head if sep else title


def whole_word_pattern(keyword: str) -> str:
    """RE2-compatible equivalent of PostgreSQL ``\\y kw \\y`` word bounds."""
    return r"\b" + re.escape(keyword.strip()) + r"\b"


def keyword_search_mask(
    table: pa.Table,
    keywords: list[str],
    columns: list[str],
    min_content_len: int = 0,
    content_col: str | None = None,
) -> pa.Array:
    """AND over keywords of (OR over columns of whole-word ci match)."""
    mask = None
    for kw in keywords:
        pat = "(?i)" + whole_word_pattern(kw)
        kw_mask = None
        for col in columns:
            m = pc.match_substring_regex(table[col], pat)
            m = pc.fill_null(m, False)
            kw_mask = m if kw_mask is None else pc.or_(kw_mask, m)
        mask = kw_mask if mask is None else pc.and_(mask, kw_mask)
    if min_content_len and content_col:
        lm = pc.greater_equal(
            pc.fill_null(pc.utf8_length(table[content_col]), 0), min_content_len
        )
        mask = lm if mask is None else pc.and_(mask, lm)
    if mask is None:
        mask = pa.array([True] * table.num_rows)
    return mask
