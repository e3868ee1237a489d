"""newscrawler_ray — a Ray-Data-native crawl/data-processing engine.

From-scratch rebuild of the capabilities of the reference crawler
(``shiningsun/newscrawler``, surveyed in SURVEY.md) as idiomatic Ray Data:
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages (fetch politeness, frontier
shards, URL-seen filter), and explicit partitioning for the wide steps.

Layout:
  codecs      — pure-numpy image codecs (ppm/png/qnt) + PSNR + phash
  functions/  — stateless scalar/batch kernels (urls, text, hashing)
  synth       — deterministic synthetic web fixtures (seed=42)
  oracle      — single-threaded reference-faithful crawler (golden producer)
  state/      — bloom/exact seen filter, frontier shards, politeness buckets
  stages/     — map_batches stage callables (fetch, extract, filters)
  pipelines/  — crawl loop, query layer, dedup, similarity, text analysis
  sources/    — storage shim (lance-if-available else parquet)
"""

__version__ = "0.1.0"

import logging as _logging


class _EmptySchemaDivergenceFilter(_logging.Filter):
    """Drop ONLY the divergence-to-EMPTY-schema warning from Ray Data's
    streaming executor.

    Ray's hash-shuffle aggregate/join operators emit a 0-column block
    for every output partition that received no groups (unavoidable from
    user code when key cardinality < partition count), and the executor
    then warns "Operator produced a RefBundle with a different schema
    ... new schema: ." once per operator. Every consumer in this repo
    normalizes 0-column blocks explicitly (see pipelines/graph.py,
    pipelines/dedup.py), so this specific warning is known-cosmetic
    noise; genuine divergences between two NON-empty schemas still warn.
    """

    def filter(self, record: _logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        return not (
            "different schema" in msg and "new schema: . This may lead" in msg
        )


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptySchemaDivergenceFilter())
