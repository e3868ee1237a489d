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
