"""Extract/validate stage: stateless ``map_batches`` over fetched rows.

Analog of the reference's parse/extract step (SURVEY.md M6 content
extraction + M3 content-length filter ``main.py:184`` + summary truncation
``article_extractor.py:349-350``), specialized to image payloads per the
graft: decode the encoded bytes, verify dims, recompute the perceptual
hash from decoded pixels, and mark which rows pass the >=1000-char ingest
gate (``stored``). Decode failures become ``decode_error`` values, never
exceptions — error-as-record semantics throughout.

Pure function of the batch -> runs as elastic stateless tasks; the
per-image numpy decode IS the useful compute of this stage (the 'image
rows/s' half of the BASELINE metric).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import codecs
from ..functions.text import summarize_array

EXTRACT_EXTRA_FIELDS = [
    ("phash_decoded", pa.int64()),
    ("decode_error", pa.string()),
    ("summary", pa.string()),
    ("stored", pa.bool_()),
]


def make_extract_stage(min_content_len: int = 1000):
    def extract_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        raw = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        phash_dec: list = [None] * n
        derr: list = [None] * n
        for i in range(n):
            if raw[i] is None:
                continue
            try:
                img = codecs.decode(raw[i], fmts[i])
                if img.shape != (hs[i], ws[i], 3):
                    derr[i] = f"dims mismatch {img.shape} vs ({hs[i]},{ws[i]},3)"
                else:
                    phash_dec[i] = codecs.phash64(img)
            except Exception as e:  # noqa: BLE001 — error-as-record
                derr[i] = f"decode failed: {e}"

        summary = summarize_array(batch.column("caption"))
        # same definition as the oracle: status==200 and content-length gate
        # (decode failures are surfaced via decode_error, not by dropping rows)
        stored = pc.and_(
            pc.equal(batch.column("status"), 200),
            pc.greater_equal(batch.column("content_len"), min_content_len),
        )
        out = batch
        for name, arr, typ in [
            ("phash_decoded", phash_dec, pa.int64()),
            ("decode_error", derr, pa.string()),
        ]:
            out = out.append_column(name, pa.array(arr, typ))
        out = out.append_column("summary", summary)
        out = out.append_column("stored", stored)
        return out

    return extract_batch


