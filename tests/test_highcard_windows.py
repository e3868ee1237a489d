"""High-cardinality bound for the rewritten window/sequence family
(VERDICT r3 #1): 1M distinct user keys must run in bounded wall time —
the shape a 100x user table actually has. The old one-pandas-call-per-
user implementations would spend hours here; the coarse-bucket lexsort
kernels do a handful of vectorized calls. Correctness is checked
row-for-row against DuckDB on the full 1M-key table."""

import time

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

N_USERS = 1_000_000
N_ROWS = 2_000_000

# generous bound per query at the 4-CPU test session; the point is the
# asymptotic shape (vectorized kernels), not the constant
WALL_BOUND_S = 150.0


@pytest.fixture(scope="module")
def highcard_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("highcard")
    rng = np.random.default_rng(7)
    user = rng.integers(0, N_USERS, N_ROWS, dtype=np.int64)
    # guarantee full key cardinality: first N_USERS rows hit every user
    user[:N_USERS] = np.arange(N_USERS, dtype=np.int64)
    ts = np.datetime64("2024-01-01", "us") + rng.integers(
        0, 30 * 86400 * 1_000_000, N_ROWS, dtype=np.int64
    ).astype("timedelta64[us]")
    etype = np.array(["click", "purchase", "view"])[
        rng.integers(0, 3, N_ROWS)
    ]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(N_ROWS, dtype=np.int64)),
            "user_id": pa.array(user),
            "event_type": pa.array(etype, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(
                np.round(rng.random(N_ROWS) * 100, 2), pa.float64()
            ),
        }
    )
    pq.write_table(t, root / "events.parquet")
    return str(root)


def _oracle(highcard_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{highcard_dir}/events.parquet')"
    )
    return con.execute(sql).df()


def _run(q, highcard_dir: str) -> tuple[pd.DataFrame, float]:
    t0 = time.monotonic()
    got = q(highcard_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    wall = time.monotonic() - t0
    return got, wall


def _compare(got: pd.DataFrame, want: pd.DataFrame):
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols, ignore_index=True)
    want = want[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_user_sessions_1m_keys(ray_session, highcard_dir):
    import __ray_entry__ as E

    got, wall = _run(E.queries()["user_sessions"], highcard_dir)
    assert wall < WALL_BOUND_S, f"user_sessions took {wall:.1f}s"
    assert got["user_id"].nunique() == N_USERS
    _compare(got, _oracle(highcard_dir, E.oracle_sql()["user_sessions"]))


def test_user_event_sequence_1m_keys(ray_session, highcard_dir):
    import __ray_entry__ as E

    got, wall = _run(E.queries()["user_event_sequence"], highcard_dir)
    assert wall < WALL_BOUND_S, f"user_event_sequence took {wall:.1f}s"
    assert len(got) == N_USERS
    _compare(got, _oracle(highcard_dir, E.oracle_sql()["user_event_sequence"]))


def test_purchase_click_asof_1m_keys(ray_session, highcard_dir):
    import __ray_entry__ as E

    got, wall = _run(E.queries()["purchase_click_asof"], highcard_dir)
    assert wall < WALL_BOUND_S, f"purchase_click_asof took {wall:.1f}s"
    _compare(got, _oracle(highcard_dir, E.oracle_sql()["purchase_click_asof"]))


def test_user_session_rows_1m_keys(ray_session, highcard_dir):
    import __ray_entry__ as E

    got, wall = _run(E.queries()["user_session_rows"], highcard_dir)
    assert wall < WALL_BOUND_S, f"user_session_rows took {wall:.1f}s"
    assert got["user_id"].nunique() == N_USERS
    _compare(got, _oracle(highcard_dir, E.oracle_sql()["user_session_rows"]))


def test_user_value_median_1m_keys(ray_session, highcard_dir):
    import __ray_entry__ as E

    got, wall = _run(E.queries()["user_value_median"], highcard_dir)
    assert wall < WALL_BOUND_S, f"user_value_median took {wall:.1f}s"
    assert len(got) == N_USERS
    _compare(got, _oracle(highcard_dir, E.oracle_sql()["user_value_median"]))


def test_purchase_click_window_1m_keys(ray_session, highcard_dir):
    import __ray_entry__ as E

    got, wall = _run(E.queries()["purchase_click_window"], highcard_dir)
    assert wall < WALL_BOUND_S, f"purchase_click_window took {wall:.1f}s"
    _compare(
        got, _oracle(highcard_dir, E.oracle_sql()["purchase_click_window"])
    )
