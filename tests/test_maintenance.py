"""Shard-wise schema migration (reference scripts/add_domain_column.py +
populate_domains.py analog): migrate-then-skip idempotence, value parity,
and resume-after-partial-migration."""

import pyarrow as pa
import pyarrow.parquet as pq

from newscrawler_ray.pipelines.maintenance import (
    backfill_domain,
    migrate_add_column,
    registrable_domain,
)


def _mk_corpus(root, n_shards=4, rows_per=50):
    for s in range(n_shards):
        d = root / f"shard={s}"
        d.mkdir(parents=True)
        ids = [s * rows_per + i for i in range(rows_per)]
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(
                        [f"http://sub{i % 3}.site{i % 7:04d}.example.com/p/{i}" for i in ids]
                    ),
                    "host": pa.array(
                        [
                            f"sub{i % 3}.site{i % 7:04d}.example.com"
                            if i % 11 != 10
                            else None
                            for i in ids
                        ]
                    ),
                    "n": pa.array(ids, pa.int64()),
                }
            ),
            str(d / "part-0.parquet"),
        )
    return root


def test_registrable_domain_rule():
    got = registrable_domain(
        pa.array(
            [
                "a.b.example.com",
                "example.com",
                "localhost",
                "",
                None,
                "news.bbc.co.uk",
                "bbc.co.uk",
                "co.uk",
                "shop.example.com.au",
            ]
        )
    )
    assert got.to_pylist() == [
        "example.com",
        "example.com",
        "localhost",
        None,
        None,
        "bbc.co.uk",
        "bbc.co.uk",
        "co.uk",
        "example.com.au",
    ]


def test_backfill_migrates_then_skips(ray_session, tmp_path):
    root = _mk_corpus(tmp_path / "corpus")
    m1 = backfill_domain(root).to_pandas().sort_values("shard", ignore_index=True)
    assert list(m1.action) == ["migrated"] * 4
    assert int(m1.n_rows.sum()) == 200
    # every shard now has the column with the derived values
    for p in sorted(root.glob("**/*.parquet")):
        t = pq.read_table(p)
        assert "domain" in t.schema.names
        assert t.column("domain").to_pylist() == registrable_domain(
            t.column("host")
        ).to_pylist()
        # null host -> null domain (the reference's skip rule)
        hosts = t.column("host").to_pylist()
        doms = t.column("domain").to_pylist()
        assert all((h is None) == (d is None) for h, d in zip(hosts, doms))
    # second run: pure footer reads, nothing rewritten
    mtimes = {p: p.stat().st_mtime_ns for p in root.glob("**/*.parquet")}
    m2 = backfill_domain(root).to_pandas()
    assert list(m2.action) == ["skip"] * 4
    assert {p: p.stat().st_mtime_ns for p in root.glob("**/*.parquet")} == mtimes


def test_backfill_resumes_partial_migration(ray_session, tmp_path):
    """A corpus where some shards were already migrated (the killed-run
    state): only the unmigrated shards are rewritten."""
    root = _mk_corpus(tmp_path / "corpus")
    # pre-migrate shards 0 and 2 by hand
    for s in (0, 2):
        p = root / f"shard={s}" / "part-0.parquet"
        t = pq.read_table(p)
        pq.write_table(
            t.append_column("domain", registrable_domain(t.column("host"))), str(p)
        )
    m = backfill_domain(root).to_pandas().sort_values("shard", ignore_index=True)
    by_shard = {s: a for s, a in zip(m.shard, m.action)}
    assert [by_shard[str(root / f"shard={s}" / "part-0.parquet")] for s in range(4)] == [
        "skip", "migrated", "skip", "migrated",
    ]


def test_migrate_add_column_generic_and_empty(ray_session, tmp_path):
    root = _mk_corpus(tmp_path / "corpus", n_shards=2)
    m = migrate_add_column(
        root,
        column="n_sq",
        derive=lambda t: pa.compute.multiply(t.column("n"), t.column("n")),
    ).to_pandas()
    assert list(m.action) == ["migrated"] * 2
    t = pq.read_table(str(root / "shard=1" / "part-0.parquet"))
    assert t.column("n_sq").to_pylist() == [n * n for n in t.column("n").to_pylist()]
    # empty corpus -> empty manifest, no error
    empty = migrate_add_column(tmp_path / "nothing", column="x", derive=lambda t: None)
    assert empty.count() == 0
