"""Deterministic synthetic web + image-table fixtures (FIXTURES.md).

Everything is a pure function of ``(seed, i)`` — no wall clock, no global
RNG — so the oracle, the Ray pipeline, tests and the bench all see the
identical world. Default ``seed=42``.

Tables written to ``out_dir`` (parquet; Lance-ready Arrow schemas — see
``sources/storage.py`` shim):

  images.parquet     (image_id, bytes, w, h, fmt, caption, phash)    — the
                     authoritative payload shape from BASELINE.json input_hint
  seeds.parquet      (url, host, priority, depth)  — crawl seed list, with
                     ~3% trivial-variant duplicates (http/https, www.,
                     trailing /, fragment) to exercise canonicalization
  links.parquet      (src_url, dst_url)            — synthetic web graph
  pages.parquet      (url, image_id, content_len, fetch_status, priority)
                     — what a fetch of each URL returns; fetch_status in
                     {200, 403, 429, 503, -1(timeout)} drives the
                     error-as-record path
  politeness.parquet (host, min_interval_ms, robots_disallow)
  config.json        (blocklist, seed, n_urls, counts)

Host distribution is Zipf(a=1.3) over ~min(1000, n/20) hosts so a few hosts
are hot (skew / salting tests). Hosts with index %23==3 are blocklisted
(EXCLUDED_DOMAINS analog, reference ``config_template.py:29-35``); hosts
with index %17==0 carry ``robots_disallow=['/private']`` and ~1/7 of their
URLs live under ``/private/``.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import codecs

BASE_EPOCH_US = 1_751_328_000_000_000  # 2025-07-01T00:00:00Z in microseconds
_VOCAB_SIZE = 1000
_FMTS = ("ppm", "png", "qnt")


def _rng(seed: int, *stream: int) -> np.random.Generator:
    return np.random.default_rng([seed, *stream])


# ------------------------------------------------------------------ topology


class SynthWorld:
    """Derived, vectorized view of the synthetic world for a (seed, n_urls)."""

    def __init__(self, n_urls: int = 2000, seed: int = 42):
        self.n_urls = n_urls
        self.seed = seed
        self.n_hosts = max(10, min(1000, n_urls // 20))
        r = _rng(seed, 1)
        self.host_idx = (r.zipf(1.3, n_urls) - 1) % self.n_hosts
        self.host_names = [f"site{j:04d}.example.com" for j in range(self.n_hosts)]
        self.blocked_hosts = frozenset(
            self.host_names[j] for j in range(self.n_hosts) if j % 23 == 3
        )
        self.robots_hosts = frozenset(
            self.host_names[j] for j in range(self.n_hosts) if j % 17 == 0
        )
        # priorities: seeded offsets within 30 days; ~2% exact ties with i-1
        r2 = _rng(seed, 2)
        offs = r2.integers(0, 30 * 86400, n_urls) * 1_000_000
        tie = r2.random(n_urls) < 0.02
        for i in range(1, n_urls):
            if tie[i]:
                offs[i] = offs[i - 1]
        self.priority_us = BASE_EPOCH_US + offs
        # fetch status: 90% 200, rest split over error codes
        r3 = _rng(seed, 3)
        u = r3.random(n_urls)
        status = np.full(n_urls, 200, dtype=np.int32)
        status[u >= 0.90] = 403
        status[u >= 0.93] = 429
        status[u >= 0.96] = 503
        status[u >= 0.98] = -1  # timeout sentinel
        self.fetch_status = status
        # transient failures before the base status (retry semantics,
        # functions/retry.py): ~6% recover within the 3-retry budget,
        # ~1.5% exhaust it (the transient status becomes final)
        r4 = _rng(seed, 9)
        u2 = r4.random(n_urls)
        n_tr = np.zeros(n_urls, dtype=np.int32)
        light = u2 < 0.06
        n_tr[light] = r4.integers(1, 4, int(light.sum()))
        heavy = (u2 >= 0.06) & (u2 < 0.075)
        n_tr[heavy] = r4.integers(4, 7, int(heavy.sum()))
        self.n_transient = n_tr
        tr_choices = np.array([429, 500, 502, 503, 504], dtype=np.int32)
        self.transient_status = tr_choices[r4.integers(0, 5, n_urls)]
        # content length: 200..5000, ~15% under the 1000-char ingest filter
        clen = r3.integers(1000, 5000, n_urls).astype(np.int32)
        short = r3.random(n_urls) < 0.15
        clen[short] = r3.integers(200, 1000, int(short.sum())).astype(np.int32)
        self.content_len = clen
        self.vocab = [
            "w" + "".join(chr(97 + c) for c in _rng(seed, 4, k).integers(0, 26, 6))
            for k in range(_VOCAB_SIZE)
        ]

    # -- per-URL accessors ---------------------------------------------------

    def host(self, i: int) -> str:
        return self.host_names[self.host_idx[i]]

    def path(self, i: int) -> str:
        if self.host(i) in self.robots_hosts and i % 7 == 0:
            return f"/private/{i}"
        return f"/p/{i}"

    def canonical_url(self, i: int) -> str:
        return f"http://{self.host(i)}{self.path(i)}"

    def variant_url(self, i: int, v: int) -> str:
        """A trivially-different spelling of URL i (canonicalizes back)."""
        host, path = self.host(i), self.path(i)
        v = v % 5
        if v == 0:
            return f"https://{host}{path}"
        if v == 1:
            return f"http://www.{host}{path}"
        if v == 2:
            return f"http://{host}{path}/"
        if v == 3:
            return f"http://{host}{path}#frag"
        return f"http://{host}{path}"

    def out_links(self, i: int) -> list[str]:
        """0-5 out-links of URL i, as possibly-variant spellings."""
        r = _rng(self.seed, 5, i)
        k = int(r.integers(0, 6))
        if k == 0:
            return []
        targets = r.integers(0, self.n_urls, k)
        variants = r.integers(0, 10, k)  # 50% canonical, 50% a variant form
        return [
            self.variant_url(int(t), int(v)) if v < 5 else self.canonical_url(int(t))
            for t, v in zip(targets, variants)
        ]

    def _dup_base(self, i: int) -> int:
        """~1% of rows (i%97==0) are pixel-identical near-dups of row i-1."""
        return i - 1 if (i % 97 == 0 and i > 0) else i

    def image_meta(self, i: int) -> tuple[int, int, str]:
        b = self._dup_base(i)  # dup rows inherit base dims so pixels match
        w = (16, 32, 64)[b % 3]
        h = (16, 32, 48)[(b // 3) % 3]
        fmt = "png" if i % 4 == 0 else ("qnt" if i % 16 == 3 else "ppm")
        return w, h, fmt

    def pixels(self, i: int) -> np.ndarray:
        """Deterministic RGB gradient+noise image for URL i.

        Near-dup rows reuse the previous row's pixels (and dims, via
        ``image_meta``) -> identical phash under a different image_id.
        """
        j = self._dup_base(i)
        w, h, _ = self.image_meta(i)
        r = _rng(self.seed, 6, j)
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack(
            [
                (xx * 255 // max(1, w - 1)),
                (yy * 255 // max(1, h - 1)),
                ((xx + yy) * 255 // max(1, w + h - 2)),
            ],
            axis=2,
        ).astype(np.int32)
        noise = r.integers(-20, 21, (h, w, 3))
        return np.clip(base + (int(r.integers(0, 64)) - 32) + noise, 0, 255).astype(
            np.uint8
        )

    def caption(self, i: int) -> str:
        r = _rng(self.seed, 7, i)
        n_words = int(r.integers(10, 41))
        words = [self.vocab[int(k)] for k in r.integers(0, _VOCAB_SIZE, n_words)]
        return f"caption {i}: " + " ".join(words)

    def image_row(self, i: int) -> dict:
        w, h, fmt = self.image_meta(i)
        px = self.pixels(i)
        return {
            "image_id": f"img-{i:08d}",
            "bytes": codecs.encode(px, fmt),
            "w": w,
            "h": h,
            "fmt": fmt,
            "caption": self.caption(i),
            "phash": codecs.phash64(px),
        }

    def seed_indices(self) -> list[int]:
        return list(range(min(self.n_urls, max(20, self.n_urls // 20))))


IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


# bump when fixture content/schema changes: cached dirs regenerate
FIXTURE_VERSION = 2  # v2: n_transient / transient_status (retry semantics)


def gen_fixtures(out_dir: str | Path, n_urls: int = 2000, seed: int = 42, force: bool = False) -> Path:
    """Write all fixture tables; idempotent (skips if manifest matches)."""
    out = Path(out_dir)
    manifest = out / "config.json"
    if manifest.exists() and not force:
        cfg = json.loads(manifest.read_text())
        if (
            cfg.get("n_urls") == n_urls
            and cfg.get("seed") == seed
            and cfg.get("version") == FIXTURE_VERSION
        ):
            return out
    out.mkdir(parents=True, exist_ok=True)
    world = SynthWorld(n_urls, seed)

    # images — chunked writer so bench-scale fixtures don't hold all bytes
    writer = pq.ParquetWriter(out / "images.parquet", IMAGES_SCHEMA)
    chunk = 4096
    for lo in range(0, n_urls, chunk):
        rows = [world.image_row(i) for i in range(lo, min(lo + chunk, n_urls))]
        writer.write_table(pa.Table.from_pylist(rows, schema=IMAGES_SCHEMA))
    writer.close()

    # seeds (with ~3% variant duplicates appended)
    sidx = world.seed_indices()
    r = _rng(seed, 8)
    seed_rows = []
    for i in sidx:
        seed_rows.append((world.canonical_url(i), world.host(i), int(world.priority_us[i])))
    for i in sidx:
        if r.random() < 0.03:
            v = int(r.integers(0, 4))
            seed_rows.append((world.variant_url(i, v), world.host(i), int(world.priority_us[i])))
    pq.write_table(
        pa.table(
            {
                "url": [x[0] for x in seed_rows],
                "host": [x[1] for x in seed_rows],
                "priority": pa.array([x[2] for x in seed_rows], pa.timestamp("us")),
                "depth": pa.array([0] * len(seed_rows), pa.int32()),
            }
        ),
        out / "seeds.parquet",
    )

    # links
    srcs, dsts = [], []
    for i in range(n_urls):
        src = world.canonical_url(i)
        for d in world.out_links(i):
            srcs.append(src)
            dsts.append(d)
    pq.write_table(pa.table({"src_url": srcs, "dst_url": dsts}), out / "links.parquet")

    # pages
    pq.write_table(
        pa.table(
            {
                "url": [world.canonical_url(i) for i in range(n_urls)],
                "image_id": [f"img-{i:08d}" for i in range(n_urls)],
                "content_len": pa.array(world.content_len, pa.int32()),
                "fetch_status": pa.array(world.fetch_status, pa.int32()),
                "priority": pa.array(world.priority_us, pa.timestamp("us")),
                "n_transient": pa.array(world.n_transient, pa.int32()),
                "transient_status": pa.array(world.transient_status, pa.int32()),
            }
        ),
        out / "pages.parquet",
    )

    # politeness
    hosts = world.host_names
    intervals = [2000 if j % 5 else 500 for j in range(len(hosts))]
    for j in range(0, len(hosts), 31):
        intervals[j] = 5000
    pq.write_table(
        pa.table(
            {
                "host": hosts,
                "min_interval_ms": pa.array(intervals, pa.int64()),
                "robots_disallow": pa.array(
                    [["/private"] if h in world.robots_hosts else [] for h in hosts],
                    pa.list_(pa.string()),
                ),
            }
        ),
        out / "politeness.parquet",
    )

    manifest.write_text(
        json.dumps(
            {
                "n_urls": n_urls,
                "seed": seed,
                "version": FIXTURE_VERSION,
                "n_hosts": world.n_hosts,
                "blocklist": sorted(world.blocked_hosts),
                "n_seeds": len(sidx),
            }
        )
    )
    return out


def default_fixture_dir(n_urls: int, seed: int = 42) -> Path:
    root = os.environ.get("NEWSCRAWLER_RAY_FIXTURES", "/tmp/newscrawler_ray_fixtures")
    return Path(root) / f"n{n_urls}_s{seed}"
