"""CLI entry point — `ray job submit`-able crawl runner.

On a real cluster (north_rule launch contract):

    ray job submit --working-dir . -- python -m newscrawler_ray \
        --fixtures /path/to/world --out /path/to/output --resume

Locally it runs against `ray.init(address="local")`. The driver-side
`__ray_entry__` contract never goes through here; this is the operator's
front door.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="newscrawler_ray")
    p.add_argument("--fixtures", required=True, help="fixture/world directory")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--n-seen-shards", type=int, default=4)
    p.add_argument("--n-frontier-shards", type=int, default=4)
    p.add_argument("--wave-window-ms", type=int, default=600_000)
    p.add_argument("--no-checkpoint", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--pipeline-waves", type=int, default=1,
                   help=">1 overlaps wave executions (throughput mode; "
                        "requires --no-checkpoint)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only for standalone runs; ignored under ray job submit")
    p.add_argument("--seen-filter", choices=("bloom", "cuckoo"), default="bloom",
                   help="fast-reject tier of the URL-seen shards (cuckoo "
                        "supports deletion for recrawl churn)")
    p.add_argument("--trap-from", default=None, metavar="SNAPSHOT_DIR",
                   help="previous crawl output to mine a trap policy from "
                        "(functions/traps.py); damps over-cap URL spaces")
    p.add_argument("--trap-max-urls", type=int, default=1000,
                   help="expected per-(host, template) URL cap under "
                        "--trap-from")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from .pipelines.crawl import run_crawl

    trap_policy = None
    if args.trap_from:
        from .functions.traps import trap_policy_from_snapshot

        trap_policy = trap_policy_from_snapshot(
            args.trap_from, max_urls=args.trap_max_urls
        )

    res = run_crawl(
        args.fixtures,
        args.out,
        n_seen_shards=args.n_seen_shards,
        n_frontier_shards=args.n_frontier_shards,
        wave_window_ms=args.wave_window_ms,
        checkpoint=not args.no_checkpoint,
        resume=args.resume,
        pipeline_waves=args.pipeline_waves,
        seen_filter=args.seen_filter,
        trap_policy=trap_policy,
        collect_seen=False,  # the seen-set lives in the shards/output table
    )
    res.pop("seen", None)
    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
