from datetime import datetime

import pytest

from newscrawler_ray.functions.dates import parse_datetime

FB = datetime(2025, 7, 1)


def test_iso_z_fixup():
    assert parse_datetime("2025-07-02T10:00:00Z", FB) == datetime(2025, 7, 2, 10)


def test_tz_offset_converted_to_utc_naive():
    assert parse_datetime("2025-07-02T12:00:00+02:00", FB) == datetime(2025, 7, 2, 10)


def test_fallback_formats():
    assert parse_datetime("2025-07-02 08:30:00", FB) == datetime(2025, 7, 2, 8, 30)
    assert parse_datetime("2025-07-02", FB) == datetime(2025, 7, 2)
    assert parse_datetime("Wed, 02 Jul 2025 08:30:00 +0000", FB) == datetime(2025, 7, 2, 8, 30)


def test_fallback_on_garbage_and_empty():
    assert parse_datetime("not a date", FB) == FB
    assert parse_datetime("", FB) == FB
    assert parse_datetime(None, FB) == FB


def test_multi_source_union_parity(ray_session):
    import duckdb

    import __ray_entry__ as m

    sf = "/root/testdata/sf0.01"
    got = m.queries()["multi_source_union"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    want = con.execute(m.oracle_sql()["multi_source_union"]).fetchdf()
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols, ignore_index=True)
    want = want[cols].sort_values(cols, ignore_index=True)
    assert got.equals(want)
    # overlap between alpha and gamma collapsed to one row per doc
    assert got["doc_id"].is_unique


def test_user_event_sequence_parity(ray_session):
    import duckdb

    import __ray_entry__ as m

    sf = "/root/testdata/sf0.01"
    got = m.queries()["user_event_sequence"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    want = con.execute(m.oracle_sql()["user_event_sequence"]).fetchdf()
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols, ignore_index=True).reset_index(drop=True)
    want = want[cols].sort_values(cols, ignore_index=True).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)
