"""map_batches stage callables for the crawl pipeline."""

_PINNED = False


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
    import pyarrow as pa

    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    _PINNED = True
