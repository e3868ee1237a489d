"""End-to-end pipelines: crawl loop, query layer, dedup, similarity, text."""
