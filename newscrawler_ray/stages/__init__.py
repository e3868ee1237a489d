"""map_batches stage callables for the crawl pipeline."""
