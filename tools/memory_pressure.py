"""Memory-pressure evidence (verdict r4 #2, SURVEY §7.5 wide-binary-row
hazard): run the payload replay and the checkpointed crawl under a
deliberately starved object store so Ray's plasma spilling engages, and
prove the pipelines stay green AND oracle-equal while spilling.

Fresh process (owns its Ray session — runnable while a pytest session's
Ray instance is alive; a second local cluster gets its own ports/plasma):

    python tools/memory_pressure.py --n-urls 8000 --object-store-mb 100 \
        --num-cpus 4 [--mode both|payload|crawl]

Prints ONE JSON line:
    {"n_urls": ..., "object_store_mb": ..., "num_cpus": ...,
     "payload_rows": ..., "payload_sec": ..., "crawl_ok": true,
     "crawl_sec": ..., "spilled_mb": ..., "ok": true}

``spilled_mb`` is parsed from Ray's memory summary — >0 proves the run
actually spilled rather than fitting in the starved store.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def spilled_mb() -> float:
    """Plasma bytes spilled to disk so far: total size of this session's
    spill files (the gRPC memory-summary API is unavailable in this
    container, but the spill directory is ground truth anyway)."""
    import ray

    session = Path(ray._private.worker.global_worker.node.get_session_dir_path())
    total = 0
    for d in session.glob("ray_spilled_objects*"):
        for f in d.rglob("*"):
            if f.is_file():
                total += f.stat().st_size
    return round(total / 1e6, 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-urls", type=int, default=8000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--object-store-mb", type=int, default=100)
    ap.add_argument("--num-cpus", type=int, default=4)
    ap.add_argument(
        "--mode", choices=["both", "payload", "crawl", "shuffle"], default="both"
    )
    ap.add_argument(
        "--expect-rows", type=int, default=None,
        help="assert payload_replay returns exactly this many rows",
    )
    ap.add_argument(
        "--fixtures", default=None,
        help="fixture dir (default: /tmp/newscrawler_ray_fixtures/n{n_urls}_s{seed})",
    )
    ap.add_argument(
        "--block-mb", type=int, default=32,
        help="DataContext.target_max_block_size (MB). The store must hold "
        "~2 blocks per concurrent task; Ray Data's default 128 MB block "
        "EQUALS a starved store and the executor stalls with every worker "
        "idle (measured at 128 MB store / 32 CPUs) — sizing blocks so "
        "block*2*cpus fits is the production rule this flag encodes.",
    )
    args = ap.parse_args()

    import ray
    import ray.data as _rd

    _rd.DataContext.get_current().target_max_block_size = (
        args.block_mb * 1024 * 1024
    )

    ray.init(
        address="local",
        num_cpus=args.num_cpus,
        include_dashboard=False,
        object_store_memory=args.object_store_mb * 1024 * 1024,
        logging_level="ERROR",
    )
    try:
        from newscrawler_ray.oracle import run_oracle
        from newscrawler_ray.pipelines.crawl import (
            crawl_order,
            payload_replay,
            run_crawl,
        )
        from newscrawler_ray.synth import gen_fixtures

        fx_dir = args.fixtures or (
            f"/tmp/newscrawler_ray_fixtures/n{args.n_urls}_s{args.seed}"
        )
        fx = gen_fixtures(fx_dir, n_urls=args.n_urls, seed=args.seed)

        out: dict = {
            "n_urls": args.n_urls,
            "object_store_mb": args.object_store_mb,
            "num_cpus": args.num_cpus,
        }
        ok = True

        if args.mode in ("both", "payload"):
            t0 = time.time()
            n_rows = payload_replay(fx)
            out["payload_sec"] = round(time.time() - t0, 2)
            out["payload_rows"] = n_rows
            ok = ok and n_rows > 0 and (
                args.expect_rows is None or n_rows == args.expect_rows
            )

        if args.mode in ("both", "crawl"):
            oracle = run_oracle(fx)
            crawl_out = "/tmp/newscrawler_ray_mempress_crawl"
            t0 = time.time()
            res = run_crawl(fx, crawl_out, checkpoint=True)
            out["crawl_sec"] = round(time.time() - t0, 2)
            crawl_ok = (
                sorted(res["seen"]) == sorted(oracle.seen)
                and res["makespan_ms"] == oracle.makespan_ms
                and res["enqueued"] == oracle.metrics["enqueued"]
                and res["fetched"] == oracle.metrics["fetched"]
                and crawl_order(crawl_out) == oracle.order
            )
            out["crawl_ok"] = crawl_ok
            ok = ok and crawl_ok

        if args.mode in ("both", "shuffle"):
            # guaranteed-pressure probe: an all-to-all over the payload
            # bytes (sort by phash) materializes the whole table in the
            # object store, which MUST spill when it exceeds the starved
            # store. This is the SURVEY §7.5 wide-binary-row hazard run
            # on purpose — production pipelines never shuffle payload
            # bytes; the probe proves the engine survives it anyway.
            import pyarrow.compute as pc
            import ray.data as rd

            t0 = time.time()
            ds = rd.read_parquet(
                str(Path(fx) / "images.parquet"),
                columns=["image_id", "bytes", "phash"],
            )
            shuffled = ds.sort("phash")
            n = 0
            csum = 0
            for b in shuffled.iter_batches(batch_format="pyarrow"):
                n += b.num_rows
                csum += int(
                    pc.sum(pc.binary_length(b.column("bytes"))).as_py() or 0
                )
            out["shuffle_sec"] = round(time.time() - t0, 2)
            out["shuffle_rows"] = n
            out["shuffle_payload_bytes"] = csum
            ok = ok and n == args.n_urls

        out["spilled_mb"] = spilled_mb()
        out["ok"] = ok
        print(json.dumps(out))
        return 0 if ok else 1
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
