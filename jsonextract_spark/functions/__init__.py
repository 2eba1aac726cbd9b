"""Vectorized UDFs + scalar helpers for the crawl/extraction pipeline."""
