"""Sources/sinks: storage shim (Lance if importable, else Parquet)."""

from .storage import read_table_dataset, write_table

__all__ = ["read_table_dataset", "write_table"]
