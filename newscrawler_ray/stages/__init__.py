"""map_batches stage callables for the crawl pipeline."""

_PINNED = False


def _pool_width(concurrency=None):
    """Default actor-pool sizing for stateful ``map_batches`` stages:
    autoscale from 1 up to the cluster's CPU width. A fixed small pool
    (the old ``concurrency=2`` default) silently caps the stage while
    every other operator scales with the cluster; an explicit int/tuple
    passes through untouched for callers that size pools deliberately."""
    if concurrency is not None:
        return concurrency
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(2, ncpu))


def pin_worker_threads() -> None:
    """Pin pyarrow's internal thread pool to 1 inside Ray workers.

    Each Ray task reserves exactly one CPU slot, but pyarrow sizes its CPU
    pool from hardware concurrency — so an un-pinned ``take``/decode can
    silently fan out over every core on the node, oversubscribing the
    machine and corrupting any scaling measurement (an 'N-CPU' run is no
    longer N CPUs). Called once per worker from the stage entry points.
    """
    global _PINNED
    if _PINNED:
        return
    import os

    import pyarrow as pa

    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    # polars (the content-hash kernel) sizes its rayon pool from hardware
    # concurrency the same way; pin before first polars import
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    _PINNED = True
