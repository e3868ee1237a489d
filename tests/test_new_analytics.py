"""Planted-truth tests for the late-round-3 analytics operators
(basket co-occurrence, ROWS-frame moving average, weighted sampling,
Markov transitions). The DuckDB parity suite checks them against SQL at
sf0.01; these pin the math on hand-computed inputs and determinism."""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from newscrawler_ray.pipelines.queries import (
    basket_cooccurrence,
    event_transitions,
    user_value_ma3,
    weighted_sample_orders,
)


def _ts(day: int, sec: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day) + dt.timedelta(seconds=sec)


def _write_events(tmp_path, rows):
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[0]) for r in rows], pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_basket_cooccurrence_planted(ray_session, tmp_path):
    # baskets: u1d1={click,error} (click repeats), u1d2={click},
    # u2d1={error,view}, u2d2={click,error}  -> nb=4
    rows = [
        (1, _ts(1, 0), 1, "click"),
        (2, _ts(1, 1), 1, "error"),
        (3, _ts(1, 2), 1, "click"),
        (4, _ts(2, 0), 1, "click"),
        (5, _ts(1, 0), 2, "error"),
        (6, _ts(1, 1), 2, "view"),
        (7, _ts(2, 0), 2, "click"),
        (8, _ts(2, 1), 2, "error"),
    ]
    sf = _write_events(tmp_path, rows)
    out = basket_cooccurrence(sf).to_pandas().set_index(["type_a", "type_b"])
    # supp: click=3, error=3, view=1
    ce = out.loc[("click", "error")]
    assert ce["n_both"] == 2
    assert ce["confidence"] == pytest.approx(round(2 / 3 + 1e-9, 4))
    assert ce["lift"] == pytest.approx(round(4 * 2 / 9 + 1e-9, 4))
    ev = out.loc[("error", "view")]
    assert ev["n_both"] == 1
    assert ev["lift"] == pytest.approx(round(4 / 3 + 1e-9, 4))
    # zero-support pair never materializes (FULL OUTER of nothing)
    assert ("click", "view") not in out.index


def test_user_value_ma3_matches_pandas_rolling(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n = 400
    rows = [
        (
            i,
            _ts(1 + int(rng.integers(0, 20)), int(rng.integers(0, 50000))),
            int(rng.integers(0, 7)),
            "click",
        )
        for i in range(n)
    ]
    sf = _write_events(tmp_path, rows)
    got = (
        user_value_ma3(sf)
        .to_pandas()
        .sort_values(["user_id", "event_id"], ignore_index=True)
    )
    df = pd.DataFrame(
        {
            "user_id": [r[2] for r in rows],
            "ts": [r[1] for r in rows],
            "event_id": [r[0] for r in rows],
            "value": [float(r[0]) for r in rows],
        }
    ).sort_values(["user_id", "ts", "event_id"])
    df["ma3"] = (
        df.groupby("user_id")["value"]
        .rolling(3, min_periods=1)
        .mean()
        .reset_index(level=0, drop=True)
    )
    want = df.sort_values(["user_id", "event_id"], ignore_index=True)
    assert len(got) == n
    np.testing.assert_allclose(
        got["ma3"].to_numpy(),
        np.round(want["ma3"].to_numpy() + 1e-9, 4),
        atol=1e-9,
    )


def test_event_transitions_planted(ray_session, tmp_path):
    rows = [
        (1, _ts(1, 0), 1, "click"),
        (2, _ts(1, 1), 1, "view"),
        (3, _ts(1, 2), 1, "click"),
        (4, _ts(1, 0), 2, "error"),
        (5, _ts(1, 1), 2, "error"),
    ]
    sf = _write_events(tmp_path, rows)
    out = (
        event_transitions(sf)
        .to_pandas()
        .set_index(["from_type", "to_type"])["n"]
        .to_dict()
    )
    assert out == {
        ("click", "view"): 1,
        ("view", "click"): 1,
        ("error", "error"): 1,
    }


def test_weighted_sample_orders_deterministic(ray_session):
    sf = "/root/testdata/sf0.001"
    a = weighted_sample_orders(sf).to_pandas()
    b = weighted_sample_orders(sf).to_pandas()
    assert len(a) == 50
    assert set(a["o_orderkey"]) == set(b["o_orderkey"])
    # sample is a subset of the table, no repeats
    assert a["o_orderkey"].nunique() == 50


def test_leakage_safe_split_images(ray_session):
    from newscrawler_ray.pipelines.multimodal import (
        leakage_safe_split_images,
        synth_phash_table,
    )

    p = synth_phash_table(
        "/tmp/newscrawler_ray_fixtures/phash_radius_2000.parquet", 2000, 5
    )
    out = leakage_safe_split_images(p).to_pandas()
    # every image assigned exactly once
    assert len(out) == 2000 and out["image_id"].nunique() == 2000
    m = dict(zip(out["image_id"], out["split"]))
    # planted near-dup pairs (i, 1000+i at hamming <= 3) never split
    half = 1000
    for i in range(0, half, 50):
        assert m[f"img-{i:08d}"] == m[f"img-{half + i:08d}"], i
    # the zero-hash star bucket is one cluster too
    assert m["img-00000003"] == m["img-00000007"]
    # split fractions near 80/10/10 and deterministic across runs
    frac = out["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9 and frac["val"] < 0.2 and frac["test"] < 0.2
    again = leakage_safe_split_images(p).to_pandas()
    assert dict(zip(again["image_id"], again["split"])) == m


def test_fair_share_quota_planted(ray_session, tmp_path):
    from newscrawler_ray.pipelines.queries import fair_share_quota

    # demands: u1=1, u2=2, u3=10, u4=10
    rows, eid = [], 0
    for uid, dem in [(1, 1), (2, 2), (3, 10), (4, 10)]:
        for j in range(dem):
            rows.append((eid, _ts(1, eid), uid, "click"))
            eid += 1
    sf = _write_events(tmp_path, rows)
    # budget 10: u1/u2 fully satisfied, level (10-3)/2 = 3.5 caps u3/u4
    out = (
        fair_share_quota(sf, budget=10.0)
        .to_pandas()
        .set_index("user_id")["quota"]
        .to_dict()
    )
    assert out == {1: 1.0, 2: 2.0, 3: 3.5, 4: 3.5}
    # budget >= total demand (23): everyone gets their demand
    out2 = (
        fair_share_quota(sf, budget=100.0)
        .to_pandas()
        .set_index("user_id")["quota"]
        .to_dict()
    )
    assert out2 == {1: 1.0, 2: 2.0, 3: 10.0, 4: 10.0}


def test_cohort_retention_planted(ray_session, tmp_path):
    from newscrawler_ray.pipelines.queries import cohort_retention

    # weeks W1=Jan1 W2=Jan8 W3=Jan15 (Mondays). u1: W1,W2,W3; u2: W1,W3;
    # u3: W2 only -> cohort W1 has 2 users, cohort W2 has 1.
    rows = [
        (1, dt.datetime(2024, 1, 2), 1, "click"),
        (2, dt.datetime(2024, 1, 9), 1, "click"),
        (3, dt.datetime(2024, 1, 16), 1, "click"),
        (4, dt.datetime(2024, 1, 3), 2, "click"),
        (5, dt.datetime(2024, 1, 17), 2, "click"),
        (6, dt.datetime(2024, 1, 10), 3, "click"),
    ]
    sf = _write_events(tmp_path, rows)
    out = cohort_retention(sf).to_pandas()
    key = out.set_index(["cohort", "week_offset"])
    w1, w2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8)
    assert key.loc[(w1, 0)]["n_active"] == 2
    assert key.loc[(w1, 1)]["n_active"] == 1
    assert key.loc[(w1, 1)]["retention"] == pytest.approx(0.5)
    assert key.loc[(w1, 2)]["n_active"] == 2
    assert key.loc[(w2, 0)]["n_active"] == 1
    assert key.loc[(w2, 0)]["retention"] == pytest.approx(1.0)
    assert len(out) == 4


def test_props_json_stats_null_k_matches_sql(ray_session, tmp_path):
    """Rows whose props lack the field: avg divides by the NON-NULL
    count (SQL avg semantics), n still counts all rows."""
    import duckdb

    from newscrawler_ray.pipelines.queries import props_json_stats

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([_ts(1)] * 4, pa.timestamp("us")),
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["click", "click", "view", "view"]),
            "value": pa.array([0.0] * 4, pa.float64()),
            "props": pa.array(
                ['{"k": 10}', '{"other": 1}', '{"k": 7}', '{"k": 8}']
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = (
        props_json_stats(str(tmp_path))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    # click: n=2 but only one k -> avg over 1 value
    assert got.loc["click"]["n"] == 2
    assert got.loc["click"]["sum_k"] == 10
    assert got.loc["click"]["avg_k"] == pytest.approx(10.0)
    assert got.loc["view"]["avg_k"] == pytest.approx(7.5)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    import __ray_entry__ as entrymod

    sql = entrymod.oracle_sql()["props_json_stats"]
    want = con.execute(sql).fetchdf().set_index("event_type").sort_index()
    pd.testing.assert_frame_equal(
        got.astype("float64"), want.astype("float64"), atol=1e-9
    )


def test_leakage_safe_split_no_near_dups(ray_session, tmp_path):
    """A corpus with ZERO near-dup pairs must split every image as its
    own singleton cluster, not crash the cluster-assignment join."""
    from newscrawler_ray.pipelines.multimodal import leakage_safe_split_images

    n = 40
    hashes = np.arange(1, n + 1, dtype=np.uint64) * np.uint64(
        0x0F0F0F0F0F0F0F0F
    )
    p = tmp_path / "phash_nodups.parquet"
    pq.write_table(
        pa.table(
            {
                "image_id": pa.array([f"img-{i:08d}" for i in range(n)]),
                "phash": pa.array(hashes.view(np.int64), pa.int64()),
            }
        ),
        str(p),
    )
    out = leakage_safe_split_images(str(p)).to_pandas()
    assert len(out) == n and out["image_id"].nunique() == n
    assert set(out["split"]) <= {"train", "val", "test"}


def test_approx_type_overlap_planted_and_vs_exact(ray_session, tmp_path):
    from newscrawler_ray.pipelines.queries import approx_type_overlap

    # users 0..99 click, users 50..149 view -> true overlap 50
    rows = []
    eid = 0
    for u in range(100):
        rows.append((eid, _ts(1, eid), u, "click")); eid += 1
    for u in range(50, 150):
        rows.append((eid, _ts(1, eid), u, "view")); eid += 1
    sf = _write_events(tmp_path, rows)
    out = approx_type_overlap(sf)
    d = {
        (a, b): n
        for a, b, n in zip(
            out.column("type_a").to_pylist(),
            out.column("type_b").to_pylist(),
            out.column("approx_both").to_pylist(),
        )
    }
    # linear-counting regime at this scale: tight bound
    assert abs(d[("click", "view")] - 50) <= 5

    # sf0.01: every pair within 10% of the exact overlap
    import duckdb

    sf01 = "/root/testdata/sf0.01"
    got = approx_type_overlap(sf01)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf01}/events.parquet')"
    )
    exact = con.execute("""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n
        FROM ut a JOIN ut b USING (user_id)
        WHERE a.event_type < b.event_type GROUP BY 1, 2
    """).fetchall()
    want = {(a, b): n for a, b, n in exact}
    for a, b, n in zip(
        got.column("type_a").to_pylist(),
        got.column("type_b").to_pylist(),
        got.column("approx_both").to_pylist(),
    ):
        assert abs(n - want[(a, b)]) <= max(5, 0.1 * want[(a, b)]), (a, b)


def test_new_join_ops_at_high_partition_counts(ray_session):
    """Regression guard (join-quirk pattern): run the two new
    join-bearing ops at 8 partitions (2x the 4-CPU test session — the
    documented join-actor ceiling) on tiny inputs where most partitions
    are empty, so the empty-block/join-schema class can't hide behind
    small partition counts."""
    from newscrawler_ray.pipelines.multimodal import (
        leakage_safe_split_images,
        synth_phash_table,
    )
    from newscrawler_ray.pipelines.queries import cohort_retention

    out = cohort_retention("/root/testdata/sf0.001", nparts=8).to_pandas()
    assert len(out) >= 1 and (out["n_active"] > 0).all()

    p = synth_phash_table(
        "/tmp/newscrawler_ray_fixtures/phash_radius_2000.parquet", 2000, 5
    )
    split = leakage_safe_split_images(p, nparts=8).to_pandas()
    assert len(split) == 2000 and split["image_id"].nunique() == 2000


def test_value_trend_by_type_planted_line(ray_session, tmp_path):
    """Events whose value is exactly 2*hour + 5 must regress to
    slope=2, intercept=5 (value == event_id in the fixture helper, so
    plant via event_id)."""
    rows = []
    for h in range(6):
        rows.append((2 * h + 5, _ts(1, sec=h * 3600), 1, "lin"))
    # a constant-value type: slope 0, intercept == the value
    for i, h in enumerate(range(3)):
        rows.append((7, _ts(2, sec=h * 3600), 2, "flat"))
    from newscrawler_ray.pipelines.queries import value_trend_by_type

    out = (
        value_trend_by_type(_write_events(tmp_path, rows))
        .to_pandas()
        .set_index("event_type")
    )
    assert out.loc["lin", "slope"] == pytest.approx(2.0, abs=1e-9)
    assert out.loc["lin", "intercept"] == pytest.approx(5.0, abs=1e-9)
    assert out.loc["flat", "slope"] == pytest.approx(0.0, abs=1e-9)
    assert out.loc["flat", "intercept"] == pytest.approx(7.0, abs=1e-9)


def test_type_user_hhi_planted(ray_session, tmp_path):
    """One-user type -> HHI 1.0; four equal users -> 0.25; a 3:1 split
    -> (9+1)/16 = 0.625."""
    rows = []
    eid = 1
    for _ in range(5):
        rows.append((eid, _ts(1, sec=eid), 10, "solo")); eid += 1
    for u in range(4):
        rows.append((eid, _ts(1, sec=eid), 20 + u, "even")); eid += 1
    for _ in range(3):
        rows.append((eid, _ts(1, sec=eid), 30, "skew")); eid += 1
    rows.append((eid, _ts(1, sec=eid), 31, "skew")); eid += 1
    from newscrawler_ray.pipelines.queries import type_user_hhi

    out = type_user_hhi(_write_events(tmp_path, rows)).to_pandas().set_index(
        "event_type"
    )
    assert out.loc["solo", "hhi"] == pytest.approx(1.0)
    assert out.loc["solo", "n_users"] == 1 and out.loc["solo", "n_events"] == 5
    assert out.loc["even", "hhi"] == pytest.approx(0.25)
    assert out.loc["skew", "hhi"] == pytest.approx(0.625)


def _write_docs(tmp_path, rows):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_lang_entropy_by_source_planted(ray_session, tmp_path):
    """Uniform 4-language source -> 2 bits; monolingual source -> 0."""
    rows = [(i, "x", lang, "multi") for i, lang in enumerate(["en", "de", "fr", "es"])]
    rows += [(10 + i, "x", "en", "mono") for i in range(3)]
    from newscrawler_ray.pipelines.queries import lang_entropy_by_source

    out = (
        lang_entropy_by_source(_write_docs(tmp_path, rows))
        .to_pandas()
        .set_index("source")
    )
    assert out.loc["multi", "lang_entropy"] == pytest.approx(2.0)
    assert out.loc["multi", "n_docs"] == 4
    assert out.loc["mono", "lang_entropy"] == pytest.approx(0.0)


def test_rrf_keyword_search_planted(ray_session, tmp_path):
    """Hand-checkable fusion: doc 1 is rank-1 on both keywords
    (score 2/61), doc 2 rank-2 on kw1 only (1/62), doc 3 rank-2 on kw2
    only (1/62, doc-id tiebreak after doc 2); doc 4 matches nothing."""
    rows = [
        (1, "aa bb aa bb aa bb", "en", "s"),
        (2, "aa bb aa", "en", "s"),   # tf(aa)=2, tf(bb)=1 -> kw ranks 2/3
        (3, "bb aa bb", "en", "s"),
        (4, "cc cc cc", "en", "s"),
    ]
    from newscrawler_ray.pipelines.queries import rrf_keyword_search

    out = rrf_keyword_search(
        _write_docs(tmp_path, rows), keywords=("aa", "bb"), top_n=10
    ).to_pandas()
    assert list(out["doc_id"]) == [1, 2, 3]
    assert out["rrf"].iloc[0] == pytest.approx(round(2 / 61 + 1e-9, 4))
    # docs 2 and 3 are each rank 2 on one list and rank 3 on the other
    assert out["rrf"].iloc[1] == pytest.approx(round(1 / 62 + 1 / 63 + 1e-9, 4))
    assert out["rrf"].iloc[2] == pytest.approx(round(1 / 62 + 1 / 63 + 1e-9, 4))


def test_mad_anomaly_events_planted(ray_session, tmp_path):
    """Values 1..9 plus a 1000 outlier: med=5.5, MAD=2.5 -> only the
    outlier exceeds |0.6745 (v - med) / MAD| > 3.5 (the plain z-score
    would drag the mean/sd toward the outlier and shrink its score)."""
    rows = [(v, _ts(1, sec=v), 1, "t") for v in range(1, 10)]
    rows.append((1000, _ts(1, sec=100), 2, "t"))
    from newscrawler_ray.pipelines.queries import mad_anomaly_events

    out = mad_anomaly_events(_write_events(tmp_path, rows)).to_pandas()
    assert list(out["event_id"]) == [1000]
    assert out["rz"].iloc[0] == pytest.approx(
        round(0.6745 * (1000 - 5.5) / 2.5 + 1e-9, 4)
    )


def test_time_decay_user_value_planted(ray_session, tmp_path):
    """An event exactly one half-life before the corpus max timestamp
    contributes exactly half its value (value == event_id in the
    fixture helper)."""
    rows = [
        (10, _ts(8), 1, "a"),          # at the anchor: weight 1
        (20, _ts(1), 1, "a"),          # 7 days earlier: weight 0.5
        (8, _ts(8), 2, "b"),
    ]
    from newscrawler_ray.pipelines.queries import time_decay_user_value

    out = (
        time_decay_user_value(_write_events(tmp_path, rows))
        .to_pandas()
        .set_index("user_id")
    )
    assert out.loc[1, "decayed_value"] == pytest.approx(20.0)
    assert out.loc[1, "n_events"] == 2
    assert out.loc[2, "decayed_value"] == pytest.approx(8.0)


def test_inter_arrival_gaps_planted(ray_session, tmp_path):
    # u1 click at t=0s,10s,40s -> gaps 10,30; u1 view at 5s (no gap);
    # u2 click at 0s,7s -> gap 7
    rows = [
        (1, _ts(1, 0), 1, "click"),
        (2, _ts(1, 10), 1, "click"),
        (3, _ts(1, 40), 1, "click"),
        (4, _ts(1, 5), 1, "view"),
        (5, _ts(1, 0), 2, "click"),
        (6, _ts(1, 7), 2, "click"),
    ]
    sf = _write_events(tmp_path, rows)
    from newscrawler_ray.pipelines.queries import inter_arrival_gaps

    out = inter_arrival_gaps(sf).to_pandas().set_index("event_type")
    assert "view" not in out.index  # a single event has no gap
    c = out.loc["click"]
    assert c["n_gaps"] == 3
    assert c["mean_gap_s"] == pytest.approx(round((10 + 30 + 7) / 3 / 1.0 + 1e-9, 4))
    assert c["min_gap_s"] == 7.0 and c["max_gap_s"] == 30.0


def test_autocorr_daily_value_planted(ray_session, tmp_path):
    # type "click" daily sums: day1=1+2=3, day2=7, day3=11 (values are
    # event_id floats per _write_events) -> perfectly linear series,
    # lag-1 autocorr == 1.0
    rows = [
        (1, _ts(1, 0), 1, "click"),
        (2, _ts(1, 1), 2, "click"),
        (7, _ts(2, 0), 1, "click"),
        (11, _ts(3, 0), 2, "click"),
        (5, _ts(1, 0), 1, "view"),  # single day: no lag pair, no row
    ]
    sf = _write_events(tmp_path, rows)
    from newscrawler_ray.pipelines.queries import autocorr_daily_value

    out = autocorr_daily_value(sf).to_pandas().set_index("event_type")
    assert "view" not in out.index
    assert out.loc["click", "n_pairs"] == 2
    assert out.loc["click", "autocorr"] == pytest.approx(1.0)


def test_kcore_planted_and_fixed_point(ray_session):
    import ray.data as rd

    from newscrawler_ray.pipelines.graph import kcore_nodes

    # planted: a K4 clique (0-3) plus a pendant path 3-4-5.  2-core =
    # the clique; the path peels off in two rounds.
    e = pa.table(
        {
            "src": pa.array([0, 0, 0, 1, 1, 2, 3, 4], pa.int64()),
            "dst": pa.array([1, 2, 3, 2, 3, 3, 4, 5], pa.int64()),
        }
    )
    out = (
        kcore_nodes("", k=2, rounds=12, edges=rd.from_arrow(e))
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    assert out["node"].tolist() == [0, 1, 2, 3]
    assert out["deg"].tolist() == [3, 3, 3, 3]

    # shipped defaults on the real link graph: every surviving degree
    # >= k (fixed point actually reached, so the 12-round SQL unroll
    # and the early-stopping Ray peel agree by construction)
    full = kcore_nodes("/root/testdata/sf0.001", k=4, rounds=12).to_pandas()
    assert len(full) > 0
    assert (full["deg"] >= 4).all()
    again = kcore_nodes("/root/testdata/sf0.001", k=4, rounds=13).to_pandas()
    pd.testing.assert_frame_equal(
        full.sort_values("node", ignore_index=True),
        again.sort_values("node", ignore_index=True),
    )


def test_cusum_changepoint_planted(ray_session, tmp_path):
    # "click" daily sums: 1,1,1,9,9 (value == event_id float). Mean is
    # 4.2; |cusum| peaks at day 3 (|1+1+1 - 3*4.2| = 9.6) right before
    # the level shift — the textbook CUSUM answer.
    rows = [
        (1, _ts(1, 0), 1, "click"),
        (1, _ts(2, 0), 1, "click"),
        (1, _ts(3, 0), 1, "click"),
        (9, _ts(4, 0), 1, "click"),
        (9, _ts(5, 0), 1, "click"),
    ]
    sf = _write_events(tmp_path, rows)
    from newscrawler_ray.pipelines.queries import cusum_changepoint

    out = cusum_changepoint(sf).to_pandas().set_index("event_type")
    assert out.loc["click", "change_day"] == _ts(3)
    assert out.loc["click", "cusum_stat"] == pytest.approx(9.6)


def test_hot_key_audit_planted(ray_session, tmp_path):
    # click: u1 x3, u2 x1 -> top share 0.75; view: u1 x1, u2 x1 -> 0.5
    rows = [
        (1, _ts(1, 0), 1, "click"),
        (2, _ts(1, 1), 1, "click"),
        (3, _ts(1, 2), 1, "click"),
        (4, _ts(1, 3), 2, "click"),
        (5, _ts(1, 0), 1, "view"),
        (6, _ts(1, 1), 2, "view"),
    ]
    sf = _write_events(tmp_path, rows)
    from newscrawler_ray.pipelines.queries import hot_key_audit

    out = hot_key_audit(sf).to_pandas().set_index("event_type")
    c = out.loc["click"]
    assert (c["n_events"], c["n_keys"], c["top_key_rows"]) == (4, 2, 3)
    assert c["top_share"] == pytest.approx(0.75)
    assert out.loc["view", "top_share"] == pytest.approx(0.5)


def test_peak_concurrency_planted(ray_session, tmp_path):
    """Hand-built sessions: half-open [ts, ts+30m) intervals — an end
    meeting a start exactly must NOT overlap it; nesting across a
    midnight boundary credits the peak to the day of the START."""
    from newscrawler_ray.pipelines.queries import peak_concurrency_daily

    rows = [
        # day 1: three nested starts inside 30 min -> peak 3
        (1, _ts(1, 0), 1, "click"),
        (2, _ts(1, 600), 1, "click"),
        (3, _ts(1, 1200), 1, "click"),
        # exactly at the first session's end (t0 + 30 min): no overlap
        # with it (half-open), still overlaps sessions 2 and 3 -> 3
        (4, _ts(1, 1800), 2, "view"),
        # day 2, far away: two simultaneous starts (equal-ts tie) -> 2
        (5, _ts(2, 7200), 3, "click"),
        (6, _ts(2, 7200), 4, "click"),
        # day 3: a start 10 min before midnight whose interval crosses
        # into day 4, plus one on day 4 at 00:05 overlapping it; day 4's
        # peak sees BOTH (the running sum carries over the cut)
        (7, dt.datetime(2024, 1, 3, 23, 50), 5, "click"),
        (8, dt.datetime(2024, 1, 4, 0, 5), 6, "click"),
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        str(r["day"])[:10]: r["peak"]
        for r in peak_concurrency_daily(sf).take_all()
    }
    assert out == {
        "2024-01-01": 3,
        "2024-01-02": 2,
        "2024-01-03": 1,
        "2024-01-04": 2,
    }


def test_profile_events_nulls_planted(ray_session, tmp_path):
    """Null handling is the whole point of a profiler: nulls count in n
    and n_null but never in distinct/min/max."""
    from newscrawler_ray.pipelines.queries import profile_events

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([_ts(1)] * 4, pa.timestamp("us")),
            "user_id": pa.array([7, None, 7, 9], pa.int64()),
            "event_type": pa.array(["click"] * 4, pa.string()),
            "value": pa.array([2.5, 2.5, None, -1.0], pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = {r["col"]: r for r in profile_events(str(tmp_path)).to_pylist()}
    assert out["user_id"] == {
        "col": "user_id", "n": 4, "n_null": 1, "n_distinct": 2,
        "min_v": 7.0, "max_v": 9.0,
    }
    assert out["value"] == {
        "col": "value", "n": 4, "n_null": 1, "n_distinct": 2,
        "min_v": -1.0, "max_v": 2.5,
    }
    assert out["event_id"]["n_distinct"] == 4


def test_fk_integrity_audit_planted(ray_session, tmp_path):
    """Planted orphans on every FK edge, including the big-big
    lineitem->orders edge that goes through the union-aggregate
    anti-join (duplicate child keys must count once per ROW)."""
    from newscrawler_ray.pipelines.queries import fk_integrity_audit

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2], pa.int64())}),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table({"s_suppkey": pa.array([10], pa.int64())}),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.table({"p_partkey": pa.array([100, 101], pa.int64())}),
        tmp_path / "part.parquet",
    )
    pq.write_table(
        pa.table(
            {"o_orderkey": pa.array([1000, 1001], pa.int64()),
             "o_custkey": pa.array([1, 3], pa.int64())}  # 3 is an orphan
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                # 1002 has no order: BOTH its rows are orphans
                "l_orderkey": pa.array([1000, 1002, 1002], pa.int64()),
                "l_suppkey": pa.array([10, 10, 99], pa.int64()),   # 99 orphan
                "l_partkey": pa.array([100, 7, 7], pa.int64()),    # 7 twice
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    out = {r["relation"]: r for r in fk_integrity_audit(str(tmp_path)).to_pylist()}
    assert out["orders.custkey"] == {
        "relation": "orders.custkey", "n_rows": 2, "n_orphans": 1}
    assert out["lineitem.suppkey"]["n_orphans"] == 1
    assert out["lineitem.partkey"]["n_orphans"] == 2
    assert out["lineitem.orderkey"] == {
        "relation": "lineitem.orderkey", "n_rows": 3, "n_orphans": 2}


def test_peak_concurrency_empty_events(ray_session, tmp_path):
    """Empty events table returns an empty (day, peak) result, not a
    crash in the min/max fold (review finding)."""
    from newscrawler_ray.pipelines.queries import peak_concurrency_daily

    sf = _write_events(tmp_path, [])
    assert peak_concurrency_daily(sf).take_all() == []


def test_profile_events_all_null_column(ray_session, tmp_path):
    """An all-NULL column profiles to NULL min/max (SQL semantics), not
    the +-inf fold sentinels (review finding)."""
    from newscrawler_ray.pipelines.queries import profile_events

    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([_ts(1)] * 2, pa.timestamp("us")),
            "user_id": pa.array([1, 2], pa.int64()),
            "event_type": pa.array(["click"] * 2, pa.string()),
            "value": pa.array([None, None], pa.float64()),
            "props": pa.array(["{}"] * 2, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = {r["col"]: r for r in profile_events(str(tmp_path)).to_pylist()}
    assert out["value"] == {
        "col": "value", "n": 2, "n_null": 2, "n_distinct": 0,
        "min_v": None, "max_v": None,
    }


def test_apply_changes_docs_planted(ray_session, tmp_path):
    """CDC precedence on a hand table: update wins over base, delete
    removes, insert lands at the offset key, untouched rows pass."""
    from newscrawler_ray.pipelines.queries import apply_changes_docs

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 3, 7, 5], pa.int64()),
            "text": pa.array(["keep", "old", "gone", "insert-source"]),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = {r["doc_id"]: r["text"]
           for r in apply_changes_docs(str(tmp_path)).take_all()}
    assert out == {
        1: "keep",                       # untouched
        3: "updated 3",                  # update wins over base
        5: "insert-source",              # base row of the insert SOURCE stays
        1000005: "inserted 5",           # the insert itself
        # 7 deleted
    }


def test_late_event_audit_recompute(ray_session, tmp_path):
    """Brute-force per-user recompute of the watermark audit (same
    synthetic arrival clock) matches the distributed segmented
    prefix-max kernel; disorder must be nonzero under the 2h jitter."""
    from newscrawler_ray.pipelines.queries import late_event_audit

    rows = []
    eid = 0
    for u in (1, 2, 3):
        for k in range(40):
            rows.append((eid, _ts(1 + k // 8, (k % 8) * 1200), u, "view"))
            eid += 1
    sf = _write_events(tmp_path, rows)
    lateness = 600_000_000  # 10 min
    got = (
        late_event_audit(sf, lateness_us=lateness)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )

    import collections

    by_user = collections.defaultdict(list)
    for e, ts, u, _ in rows:
        delay = ((e * 2654435761) % 4294967296) % 7_200_000 * 1000
        ts_us = int((ts - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
        by_user[u].append((ts_us + delay, e, ts_us))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        wm, n_late, worst = None, 0, 0
        for _, _, ts_us in evs:
            if wm is not None and wm > ts_us:
                worst = max(worst, wm - ts_us)
                if wm - ts_us > lateness:
                    n_late += 1
            wm = ts_us if wm is None else max(wm, ts_us)
        want[u] = (len(evs), n_late, worst)

    assert sum(w[2] for w in want.values()) > 0, "jitter must disorder"
    for _, r in got.iterrows():
        n, late, worst = want[int(r["user_id"])]
        assert (int(r["n_events"]), int(r["n_late"]), int(r["max_disorder_us"])) == (
            n, late, worst,
        )
