"""CLI entry point for the LLM-data tier — `ray job submit`-able.

The second front door next to the crawl runner (``__main__.py``): runs
the full curate -> train-BPE -> encode -> pack -> shard pipeline
(``corpusstats.prepare_training_data``) over a parquet corpus directory
and prints one JSON summary line. On a real cluster:

    ray job submit --working-dir . -- python -m newscrawler_ray.train \
        --sf-dir /path/to/corpus --out /path/to/shards --resume

``--resume`` reuses the shard writer's ``_DONE``-marker discipline: a
killed job skips every finished shard on the next run (without the
flag the output dir must be fresh, mirroring the tier's test contract).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="newscrawler_ray.train")
    p.add_argument("--sf-dir", required=True,
                   help="corpus directory holding documents.parquet")
    p.add_argument("--out", required=True, help="shard output directory")
    p.add_argument("--n-merges", type=int, default=64)
    p.add_argument("--capacity", type=int, default=256,
                   help="max tokens per packed training bin")
    p.add_argument("--n-shards", type=int, default=8)
    p.add_argument("--resume", action="store_true",
                   help="skip shards already marked _DONE (default: "
                        "require a fresh output dir)")
    p.add_argument("--force", action="store_true",
                   help="delete any existing output dir first")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only for standalone runs; ignored under ray job submit")
    args = p.parse_args(argv)

    out = Path(args.out)
    if args.force and out.exists():
        shutil.rmtree(out)
    if out.exists() and any(out.iterdir()) and not args.resume:
        p.error(f"{out} is non-empty; pass --resume to continue it or "
                "--force to start over")

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from .pipelines.corpusstats import prepare_training_data

    manifest = prepare_training_data(
        args.sf_dir, out,
        n_merges=args.n_merges,
        capacity=args.capacity,
        n_shards=args.n_shards,
    )
    skipped = manifest.column("skipped").to_pylist()
    nrows = manifest.column("n_rows").to_pylist()
    summary = {
        "out_dir": str(out),
        "n_shards": manifest.num_rows,
        # skipped shards record n_rows = -1 (unknown without re-reading)
        "n_rows_written": int(sum(n for n, s in zip(nrows, skipped) if not s)),
        "shards_written": int(sum(1 for s in skipped if not s)),
        "shards_skipped": int(sum(1 for s in skipped if s)),
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
