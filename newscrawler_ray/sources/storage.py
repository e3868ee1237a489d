"""Storage shim: Lance when available, identical-schema Parquet otherwise.

BASELINE.json specifies Lance tables of image+caption pairs; ``pylance``
is not installable in this sandbox (SURVEY.md §7.0), so every table is
written through this narrow interface with a Lance-ready Arrow schema.
When ``lance`` is importable the same calls produce/read real Lance
datasets — nothing else in the engine changes.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import ray.data as rd

try:  # pragma: no cover - not installable in sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def write_table(table: pa.Table, path: str | Path) -> str:
    """Write one logical table; returns the path actually written."""
    path = str(path)
    if HAVE_LANCE:  # pragma: no cover
        lance.write_dataset(table, path)
        return path
    import pyarrow.parquet as pq

    if not path.endswith(".parquet"):
        path = path + ".parquet"
    pq.write_table(table, path)
    return path


def read_table_dataset(path: str | Path, columns: list[str] | None = None) -> rd.Dataset:
    """Read a logical table as a ray.data.Dataset (streaming blocks)."""
    path = str(path)
    if HAVE_LANCE and Path(path).suffix == ".lance":  # pragma: no cover
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)
