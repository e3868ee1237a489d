"""End-to-end: Ray crawl pipeline vs single-threaded oracle (goldens).

Correctness gate from BASELINE.md: crawl ordering + final URL-seen set
under the same seed list + politeness budget; per-row decoded-pixel
allclose (PSNR>=40dB for lossy) + caption equality; resume == uninterrupted.
"""

import numpy as np
import pytest

from newscrawler_ray import codecs
from newscrawler_ray.oracle import run_oracle
from newscrawler_ray.pipelines.crawl import (
    crawl_order,
    crawl_output_dataset,
    run_crawl,
)
from newscrawler_ray.synth import SynthWorld


@pytest.fixture(scope="module")
def crawl_run(ray_session, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("crawl") / "out"
    res = run_crawl(fixture_dir, out, n_seen_shards=3, n_frontier_shards=3)
    return res, out, run_oracle(fixture_dir)


def test_seen_set_matches_oracle(crawl_run):
    res, _, oracle = crawl_run
    assert res["seen"] == oracle.seen


def test_crawl_order_matches_oracle(crawl_run):
    _, out, oracle = crawl_run
    assert crawl_order(out) == oracle.order


def test_crawl_order_topk_is_bounded_prefix(crawl_run):
    """The driver contract's top-k probe equals the first k of the full
    ordering while materializing only k rows (verdict r3 #7)."""
    from newscrawler_ray.pipelines.crawl import crawl_order_topk

    _, out, oracle = crawl_run
    t = crawl_order_topk(out, k=50)
    assert t.num_rows == min(50, len(oracle.order))
    assert t.column("url").to_pylist() == oracle.order[: t.num_rows]
    assert t.column("rank").to_pylist() == list(range(t.num_rows))


def test_metrics_match_oracle(crawl_run):
    res, _, oracle = crawl_run
    assert res["enqueued"] == oracle.metrics["enqueued"]
    assert res["dedup_hits"] == oracle.metrics["dedup_hits"]
    assert res["blocked"] == oracle.metrics["blocked"]
    assert res["fetched"] == oracle.metrics["fetched"]
    assert res["makespan_ms"] == oracle.makespan_ms


def test_payload_invariants(crawl_run, fixture_dir):
    """Per-row: decoded pixels match the world's (exact for lossless,
    PSNR>=40dB for qnt), captions equal, phash recomputed == stored."""
    _, out, oracle = crawl_run
    world = SynthWorld(2000, 42)
    ds = crawl_output_dataset(out)
    rows = ds.filter(lambda r: r["stored"]).take(80)
    assert len(rows) == 80
    for r in rows:
        i = int(r["image_id"].split("-")[1])
        expected = world.pixels(i)
        decoded = codecs.decode(r["bytes"], r["fmt"])
        if r["fmt"] in codecs.LOSSLESS_FMTS:
            np.testing.assert_array_equal(decoded, expected)
        else:
            assert codecs.psnr(expected, decoded) >= 40.0
        assert r["caption"] == world.caption(i)
        assert r["phash_decoded"] == r["phash"] or r["fmt"] == "qnt"
        assert r["decode_error"] is None
        assert r["summary"] == r["caption"][:200] + "..."


def test_error_rows_present(crawl_run):
    _, out, oracle = crawl_run
    ds = crawl_output_dataset(out)
    errs = ds.filter(lambda r: r["extraction_error"] is not None)
    err_map = {r["url"]: r["extraction_error"] for r in errs.take_all()}
    oracle_errs = {
        u: rec["extraction_error"]
        for u, rec in oracle.records.items()
        if rec["extraction_error"]
    }
    assert err_map == oracle_errs


def test_resume_with_checkpoint_interval(ray_session, fixture_dir, tmp_path_factory, crawl_run):
    """Interval checkpoints: the kill lands AFTER an uncheckpointed wave,
    so resume redoes it from the last consistent cut — outputs equal."""
    _, _, oracle = crawl_run
    out = tmp_path_factory.mktemp("crawl_interval") / "out"
    partial = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3,
        checkpoint_interval=3, stop_after_wave=4,
    )
    assert partial["partial"]
    res = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3,
        checkpoint_interval=3, resume=True,
    )
    assert res["seen"] == oracle.seen
    assert crawl_order(out) == oracle.order
    assert res["makespan_ms"] == oracle.makespan_ms


def test_pipelined_waves_match_oracle(ray_session, fixture_dir, tmp_path_factory, crawl_run):
    """Overlapped wave execution is wave-composition-invariant: same
    seen-set, ordering, dedup counts and makespan as sequential/oracle."""
    _, _, oracle = crawl_run
    out = tmp_path_factory.mktemp("crawl_pipe") / "out"
    res = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3,
        checkpoint=False, pipeline_waves=3,
    )
    assert res["seen"] == oracle.seen
    assert crawl_order(out) == oracle.order
    assert res["makespan_ms"] == oracle.makespan_ms
    assert res["dedup_hits"] == oracle.metrics["dedup_hits"]


def test_cuckoo_seen_filter_matches_oracle(
    ray_session, fixture_dir, tmp_path_factory, crawl_run
):
    """The cuckoo fast-reject tier (north_rule "bloom/cuckoo URL-seen")
    is decision-identical to bloom: same seen-set, ordering and dedup
    counts — the exact set stays the authority under either filter."""
    _, _, oracle = crawl_run
    out = tmp_path_factory.mktemp("crawl_ck") / "out"
    res = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3,
        checkpoint=False, seen_filter="cuckoo",
    )
    assert res["seen"] == oracle.seen
    assert crawl_order(out) == oracle.order
    assert res["dedup_hits"] == oracle.metrics["dedup_hits"]


def test_per_partition_metrics_written(crawl_run):
    import pyarrow.parquet as pq

    res, out, oracle = crawl_run
    t = pq.read_table(res["metrics_path"])
    rows = t.to_pylist()
    seen_rows = [r for r in rows if r["kind"] == "seen"]
    frontier_rows = [r for r in rows if r["kind"] == "frontier"]
    assert len(seen_rows) == 3 and len(frontier_rows) == 3
    assert sum(r["added"] for r in seen_rows) == oracle.metrics["enqueued"]
    assert sum(r["dup_hits"] for r in seen_rows) == oracle.metrics["dedup_hits"]
    assert sum(r["popped"] for r in frontier_rows) == oracle.metrics["fetched"]
    assert max(r["makespan_ms"] for r in frontier_rows) == oracle.makespan_ms


def test_resume_equals_uninterrupted(ray_session, fixture_dir, tmp_path_factory, crawl_run):
    _, full_out, oracle = crawl_run
    out = tmp_path_factory.mktemp("crawl_resume") / "out"
    partial = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3, stop_after_wave=2
    )
    assert partial["partial"]
    res = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3, resume=True
    )
    assert not res["partial"]
    assert res["seen"] == oracle.seen
    assert crawl_order(out) == oracle.order
    assert res["makespan_ms"] == oracle.makespan_ms


def test_crawl_snapshot_diff_classification(ray_session, tmp_path):
    """All four categories on hand-built snapshots: added / removed /
    changed classified exactly; unchanged and unstored rows emit
    nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from newscrawler_ray.pipelines.crawl import crawl_snapshot_diff

    def write(root, rows):
        d = root / "waves" / "wave=0000"
        d.mkdir(parents=True)
        pq.write_table(
            pa.table(
                {
                    "url_hash": pa.array([r[0] for r in rows], pa.int64()),
                    "url": pa.array([r[1] for r in rows]),
                    "phash": pa.array([r[2] for r in rows], pa.int64()),
                    "stored": pa.array([r[3] for r in rows]),
                }
            ),
            d / "part.parquet",
        )

    old = tmp_path / "old"
    new = tmp_path / "new"
    write(old, [
        (1, "u1", 100, True),   # unchanged
        (2, "u2", 200, True),   # removed
        (3, "u3", 300, True),   # changed (phash differs in new)
        (5, "u5", 500, False),  # unstored in old -> counts as absent
    ])
    write(new, [
        (1, "u1", 100, True),
        (3, "u3", 333, True),
        (4, "u4", 400, True),   # added
        (5, "u5", 500, True),   # stored only in new -> added
    ])
    got = {
        r["url"]: r["change"]
        for r in crawl_snapshot_diff(old, new).take_all()
    }
    assert got == {"u2": "removed", "u3": "changed", "u4": "added", "u5": "added"}


def test_crawl_snapshot_diff_between_worlds(ray_session, tmp_path):
    """600-world vs 1200-world crawls: distributed diff equals a driver
    set computation over the same wave parquet (shared pages are pure
    functions of (seed, i), so 'changed' is empty by construction)."""
    import glob

    import pyarrow.parquet as pq

    from newscrawler_ray.pipelines.crawl import crawl_snapshot_diff, run_crawl
    from newscrawler_ray.synth import gen_fixtures

    dirs = {}
    for n in (600, 1200):
        out = tmp_path / f"c{n}"
        run_crawl(gen_fixtures(tmp_path / f"fx{n}", n_urls=n, seed=42), out,
                  n_seen_shards=2, n_frontier_shards=2,
                  checkpoint=False, collect_seen=False)
        dirs[n] = out

    def stored_map(out):
        m = {}
        for f in glob.glob(str(out / "waves" / "**" / "*.parquet"), recursive=True):
            t = pq.read_table(f, columns=["url", "phash", "stored"])
            for r in t.to_pylist():
                if r["stored"]:
                    m[r["url"]] = r["phash"]
        return m

    mo, mn = stored_map(dirs[600]), stored_map(dirs[1200])
    want = {u: "added" for u in mn.keys() - mo.keys()}
    want |= {u: "removed" for u in mo.keys() - mn.keys()}
    want |= {u: "changed" for u in mo.keys() & mn.keys() if mo[u] != mn[u]}
    got = {
        r["url"]: r["change"]
        for r in crawl_snapshot_diff(dirs[600], dirs[1200]).take_all()
    }
    assert got == want
    assert len(got) > 0


def test_schedule_recrawl_per_host(ray_session, tmp_path):
    """All categories across three hosts: per-host counts, change rate,
    and the integer priority mapping (hot hosts high, vanished hosts 0)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from newscrawler_ray.pipelines.crawl import (
        recrawl_seed_urls,
        schedule_recrawl,
    )

    def write(root, rows):
        d = root / "waves" / "wave=0000"
        d.mkdir(parents=True)
        pq.write_table(
            pa.table(
                {
                    "url_hash": pa.array([r[0] for r in rows], pa.int64()),
                    "url": pa.array([r[1] for r in rows]),
                    "host": pa.array([r[2] for r in rows]),
                    "phash": pa.array([r[3] for r in rows], pa.int64()),
                    "stored": pa.array([r[4] for r in rows]),
                }
            ),
            d / "part.parquet",
        )

    old = tmp_path / "old"
    new = tmp_path / "new"
    write(old, [
        (1, "u1", "a.com", 100, True),   # unchanged
        (2, "u2", "a.com", 200, True),   # removed
        (3, "u3", "b.com", 300, True),   # changed in new
        (6, "u6", "c.com", 600, True),   # host vanishes entirely
    ])
    write(new, [
        (1, "u1", "a.com", 100, True),
        (5, "u5", "a.com", 500, True),   # added
        (3, "u3", "b.com", 333, True),   # changed
        (4, "u4", "b.com", 400, True),   # added
    ])
    got = {
        r["host"]: r for r in schedule_recrawl(old, new).take_all()
    }
    assert got["a.com"]["n_pages"] == 2
    assert got["a.com"]["n_added"] == 1
    assert got["a.com"]["n_changed"] == 0
    assert got["a.com"]["n_removed"] == 1
    assert got["a.com"]["change_rate"] == 0.5
    assert got["a.com"]["recrawl_priority"] == 5  # 1 + floor(0.5 * 8)
    assert got["b.com"]["n_pages"] == 2
    assert got["b.com"]["n_added"] == 1
    assert got["b.com"]["n_changed"] == 1
    assert got["b.com"]["n_removed"] == 0
    assert got["b.com"]["change_rate"] == 1.0
    assert got["b.com"]["recrawl_priority"] == 9
    assert got["c.com"]["n_pages"] == 0
    assert got["c.com"]["n_removed"] == 1
    assert got["c.com"]["recrawl_priority"] == 0  # nothing left to recrawl

    seeds = recrawl_seed_urls(old, new, k_top=10).take_all()
    # hot host first (priority DESC), url ASC inside a host tier
    assert [(r["url"], r["recrawl_priority"]) for r in seeds] == [
        ("u3", 9), ("u4", 9), ("u1", 5), ("u5", 5),
    ]


def test_schedule_recrawl_between_worlds(ray_session, tmp_path):
    """600-world vs 1200-world crawls: the distributed per-host schedule
    equals a driver recompute from the raw wave parquet."""
    import collections
    import glob

    import pyarrow.parquet as pq

    from newscrawler_ray.pipelines.crawl import run_crawl, schedule_recrawl
    from newscrawler_ray.synth import gen_fixtures

    dirs = {}
    for n in (600, 1200):
        out = tmp_path / f"c{n}"
        run_crawl(gen_fixtures(tmp_path / f"fx{n}", n_urls=n, seed=42), out,
                  n_seen_shards=2, n_frontier_shards=2,
                  checkpoint=False, collect_seen=False)
        dirs[n] = out

    def stored_map(out):
        m = {}
        for f in glob.glob(str(out / "waves" / "**" / "*.parquet"), recursive=True):
            t = pq.read_table(f, columns=["url", "host", "phash", "stored"])
            for r in t.to_pylist():
                if r["stored"]:
                    m[r["url"]] = (r["host"], r["phash"])
        return m

    mo, mn = stored_map(dirs[600]), stored_map(dirs[1200])
    want = collections.defaultdict(lambda: [0, 0, 0, 0])  # pages, add, chg, rm
    for u, (h, _) in mn.items():
        want[h][0] += 1
        if u not in mo:
            want[h][1] += 1
        elif mo[u][1] != mn[u][1]:
            want[h][2] += 1
    for u, (h, _) in mo.items():
        if u not in mn:
            want[h][3] += 1
    got = {r["host"]: r for r in schedule_recrawl(dirs[600], dirs[1200]).take_all()}
    assert set(got) == set(want)
    for h, (pages, add, chg, rm) in want.items():
        r = got[h]
        assert (r["n_pages"], r["n_added"], r["n_changed"], r["n_removed"]) == (
            pages, add, chg, rm
        ), h
        rate = (add + chg) / max(pages, 1)
        assert r["change_rate"] == pytest.approx(round(rate + 1e-9, 4))
        assert r["recrawl_priority"] == (
            1 + int(rate * 8 + 1e-9) if pages > 0 else 0
        )


def test_snapshot_diff_handles_extreme_phashes(ray_session, tmp_path):
    """Regression (round-3 review): a phash below the old masked-Max
    sentinel -(1<<62) — ~25% of the signed-int64 range — must still
    classify as changed/unchanged correctly in BOTH snapshot ops."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from newscrawler_ray.pipelines.crawl import (
        crawl_snapshot_diff,
        schedule_recrawl,
    )

    lo = -(1 << 62)

    def write(root, rows):
        d = root / "waves" / "wave=0000"
        d.mkdir(parents=True)
        pq.write_table(
            pa.table(
                {
                    "url_hash": pa.array([r[0] for r in rows], pa.int64()),
                    "url": pa.array([r[1] for r in rows]),
                    "host": pa.array([r[2] for r in rows]),
                    "phash": pa.array([r[3] for r in rows], pa.int64()),
                    "stored": pa.array([r[4] for r in rows]),
                }
            ),
            d / "part.parquet",
        )

    old = tmp_path / "old"
    new = tmp_path / "new"
    write(old, [
        (1, "u1", "a.com", lo - 5, True),   # changes below the sentinel
        (2, "u2", "a.com", lo - 9, True),   # unchanged below the sentinel
        (3, "u3", "a.com", 300, True),      # changes across the sentinel
    ])
    write(new, [
        (1, "u1", "a.com", lo - 7, True),
        (2, "u2", "a.com", lo - 9, True),
        (3, "u3", "a.com", lo - 3, True),
    ])
    got = {r["url"]: r["change"] for r in crawl_snapshot_diff(old, new).take_all()}
    assert got == {"u1": "changed", "u3": "changed"}

    (sched,) = schedule_recrawl(old, new).take_all()
    assert sched["host"] == "a.com"
    assert sched["n_pages"] == 3
    assert sched["n_changed"] == 2
    assert sched["n_added"] == 0 and sched["n_removed"] == 0


@pytest.mark.parametrize("kill_wave", [1, 5])
def test_resume_any_kill_point(
    ray_session, fixture_dir, tmp_path_factory, crawl_run, kill_wave
):
    """North-rule 'resumes exactly': the kill point must not matter.
    (The single-point test above pins wave 2; this sweeps an early and
    a late cut.)"""
    _, _, oracle = crawl_run
    out = tmp_path_factory.mktemp(f"crawl_kill{kill_wave}") / "out"
    partial = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3,
        stop_after_wave=kill_wave,
    )
    assert partial["partial"]
    res = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3, resume=True
    )
    assert not res["partial"]
    assert res["seen"] == oracle.seen
    assert crawl_order(out) == oracle.order
    assert res["makespan_ms"] == oracle.makespan_ms


def test_resume_double_kill(ray_session, fixture_dir, tmp_path_factory, crawl_run):
    """Two successive kills (kill -> partial resume -> kill -> full
    resume) still converge to the uninterrupted run — checkpoints of a
    resumed job are as consistent as first-run checkpoints."""
    _, _, oracle = crawl_run
    out = tmp_path_factory.mktemp("crawl_double_kill") / "out"
    p1 = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3,
        stop_after_wave=2,
    )
    assert p1["partial"]
    p2 = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3,
        resume=True, stop_after_wave=6,
    )
    assert p2["partial"]
    res = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3, resume=True
    )
    assert not res["partial"]
    assert res["seen"] == oracle.seen
    assert crawl_order(out) == oracle.order
    assert res["makespan_ms"] == oracle.makespan_ms


def test_mine_url_templates(crawl_run):
    """Trap mining == DuckDB regexp_replace + GROUP BY over the same
    snapshot, row-for-row; and the synthetic world's URL space collapses
    to exactly its two known path templates."""
    import duckdb
    import pandas as pd

    from newscrawler_ray.pipelines.crawl import mine_url_templates

    _, out, _ = crawl_run
    got = mine_url_templates(out, min_urls=5).to_pandas()
    files = str(out / "waves" / "*" / "*.parquet")
    want = duckdb.sql(
        f"""
        SELECT host,
               regexp_replace(
                   regexp_replace(url, '^[a-z]+://[^/]*', ''),
                   '[0-9]+', 'N', 'g') AS template,
               count(*) AS n_urls
        FROM read_parquet('{files}')
        GROUP BY 1, 2
        HAVING count(*) >= 5
        ORDER BY n_urls DESC, host, template
        """
    ).fetchdf()
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
    assert set(got["template"]) <= {"/p/N", "/private/N"}


def test_trap_guard_matches_oracle(
    ray_session, fixture_dir, tmp_path_factory, crawl_run
):
    """Crawl pass 2 under a trap policy mined from pass 1: the guarded
    distributed crawl must stay byte-equal to the guarded oracle (the
    damping rule is a pure per-URL hash predicate, so the closure is
    traversal-order-independent), skip a nonzero count, and every
    admitted URL on a damped template must satisfy the hash rule."""
    from newscrawler_ray.functions.traps import (
        trap_policy_from_snapshot,
        url_template,
    )
    from newscrawler_ray.functions.urls import host_of, url_hash64

    _, base_out, base_oracle = crawl_run
    policy = trap_policy_from_snapshot(base_out, max_urls=40)
    assert policy, "the 2000-URL Zipf world must have over-cap hosts"

    out = tmp_path_factory.mktemp("crawl_trap") / "out"
    res = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3,
        trap_policy=policy, checkpoint=False,
    )
    o = run_oracle(fixture_dir, trap_policy=policy)
    assert res["seen"] == o.seen
    assert crawl_order(out) == o.order
    assert res["trap_skipped"] == o.metrics["trap_skipped"] > 0
    assert res["makespan_ms"] == o.makespan_ms
    assert res["fetched"] < base_oracle.metrics["fetched"]

    # hash-rule recompute: admission is a pure function of the URL
    for u in res["seen"]:
        rates = policy.get(host_of(u))
        if rates:
            rate = rates.get(url_template(u))
            if rate is not None:
                assert (url_hash64(u) & 0xFFFF) < rate


def test_trap_guard_resume(ray_session, fixture_dir, tmp_path_factory, crawl_run):
    """Kill + resume under a trap policy (re-passing the same policy —
    it is run config, not checkpointed state) converges to the
    uninterrupted guarded run."""
    from newscrawler_ray.functions.traps import trap_policy_from_snapshot

    _, base_out, _ = crawl_run
    policy = trap_policy_from_snapshot(base_out, max_urls=40)
    o = run_oracle(fixture_dir, trap_policy=policy)

    out = tmp_path_factory.mktemp("crawl_trap_resume") / "out"
    partial = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3,
        trap_policy=policy, stop_after_wave=2,
    )
    assert partial["partial"]
    res = run_crawl(
        fixture_dir, out, n_seen_shards=3, n_frontier_shards=3,
        trap_policy=policy, resume=True,
    )
    assert res["seen"] == o.seen
    assert crawl_order(out) == o.order
    assert res["trap_skipped"] == o.metrics["trap_skipped"]
    assert res["makespan_ms"] == o.makespan_ms
