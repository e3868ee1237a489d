"""DuckDB-oracle parity for every SQL-paired query (mimics the driver:
row count + sorted-column, order-insensitive value comparison at sf0.01).
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonical row order for comparison only
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df


SQL_PAIRED = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", SQL_PAIRED)
def test_query_matches_oracle(ray_session, con, name):
    ray_df = _normalize(_to_pandas(entrymod.queries()[name](SF_DIR)))
    sql_df = _normalize(con.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, atol=1e-9)


def test_every_query_has_oracle_or_is_marked():
    qs = set(entrymod.queries())
    missing = qs - set(entrymod.oracle_sql())
    # non-SQL-expressible ops only (driver records rows-only checks)
    assert missing <= {"crawl_e2e"} | {
        n for n in qs if n.startswith(("minhash", "simhash", "knn",
                                       "embedding", "lang_id", "quality",
                                       "fingerprint", "phash", "image", "crawl",
                                       "sample", "audio", "approx", "extract",
                                       "headline", "clip", "curate", "pack",
                                       "kmeans", "bloom", "pq", "export",
                                       "semdedup", "recrawl",
                                       # image-table ops: the images
                                       # table isn't a registered DuckDB
                                       # view (rows-only by necessity)
                                       "aspect", "bucketed", "caption",
                                       "leakage", "augment",
                                       # iterative BPE / composed tiers /
                                       # model-based mining: no SQL analog
                                       "train_bpe", "bpe_encode",
                                       # byte-level BPE: iterative + the
                                       # lookahead split regex has no
                                       # RE2/SQL twin
                                       "byte_bpe",
                                       # xxhash fold has no SQL twin (md5
                                       # table_checksum is the SQL-paired
                                       # sibling)
                                       "table_checksum_fast",
                                       "prepare_training", "mine_hard",
                                       # image-table / tar-side ops (the
                                       # images table isn't a DuckDB view)
                                       "mixup", "export_webdataset",
                                       "read_webdataset",
                                       "strip_image", "video",
                                       # filesystem-mutating migration
                                       # (manifest output; no SQL analog)
                                       "migrate",
                                       # zlib is not SQL-expressible
                                       "compression"))
    }


def test_unpivot_and_delta_zero_cells(ray_session, tmp_path):
    """Planted sparse events: a (day, type) cell with no events must
    appear as an explicit n=0 row in the melt, and the lag delta must
    treat it as a real 0 (drop then recovery), not a gap."""
    import numpy as np
    import pyarrow.parquet as pq

    from newscrawler_ray.pipelines.queries import (
        events_daily_delta,
        events_unpivot_daily,
    )

    ts = pa.array(
        np.array(
            ["2024-01-01T10:00", "2024-01-01T11:00",  # day1: 2 clicks
             "2024-01-02T09:00",                      # day2: 1 view (no click!)
             "2024-01-03T08:00"],                     # day3: 1 click again
            dtype="datetime64[us]",
        )
    )
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["click", "click", "view", "click"]),
            "ts": ts,
            "value": pa.array([1.0, 2.0, 3.0, 4.0]),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    long = {
        (str(r["day"])[:10], r["event_type"]): r["n"]
        for r in events_unpivot_daily(str(tmp_path)).take_all()
    }
    assert long[("2024-01-02", "click")] == 0  # explicit zero cell
    assert long[("2024-01-01", "click")] == 2
    assert len(long) == 3 * 5  # dense grid: 3 days x 5 types
    delta = {
        (str(r["day"])[:10], r["event_type"]): (r["n"], r["n_prev"], r["delta"])
        for r in events_daily_delta(str(tmp_path)).take_all()
    }
    assert delta[("2024-01-02", "click")] == (0, 2, -2)  # drop to zero
    assert delta[("2024-01-03", "click")] == (1, 0, 1)   # recovery FROM zero
    assert delta[("2024-01-01", "click")] == (2, 0, 2)   # first day lag=0
