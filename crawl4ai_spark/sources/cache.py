"""Page-cache semantics (S5/S6, SURVEY §2.1) — CacheMode + cached fetch.

Reference: ``CacheMode`` enum and CacheContext decision table
(crawl4ai/cache_context.py:4-87) over the sqlite ``crawled_data`` table
keyed by url (async_database.py:226-241,287-378); arun consults the cache
before fetching and upserts after (async_webcrawler.py:311-332,434-436).

Set-oriented translation: the cache IS a results table keyed by the
canonical fetch key.  ``cached_fetch`` left-joins the batch against the
cache, fetches only the misses, and returns (results, cache_delta) so the
caller appends the delta (MERGE INTO in an Iceberg deployment).  The
read/write decision bits replicate ``CacheMode.should_read/should_write``
exactly.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CacheMode(Enum):
    """cache_context.py:4-20."""

    ENABLED = "enabled"
    DISABLED = "disabled"
    READ_ONLY = "read_only"
    WRITE_ONLY = "write_only"
    BYPASS = "bypass"

    def should_read(self) -> bool:
        # cache_context.py:59-72
        return self in (CacheMode.ENABLED, CacheMode.READ_ONLY)

    def should_write(self) -> bool:
        # cache_context.py:74-87
        return self in (CacheMode.ENABLED, CacheMode.WRITE_ONLY)


def cached_fetch(
    frontier: DataFrame,
    cache: DataFrame | None,
    fetch_fn,
    mode: CacheMode = CacheMode.ENABLED,
    key_col: str = "fetch_key",
) -> tuple[DataFrame, DataFrame]:
    """Split the batch into cache hits and misses; fetch only misses.

    ``cache`` is a results table containing ``key_col`` plus the result
    columns; ``fetch_fn(frontier_subset) -> results`` is the real fetch
    stage.  Returns (results_for_all_rows, cache_delta_to_append); with
    should_write() False the delta is empty, with should_read() False every
    row refetches (reference: aprocess_html recomputed, cache row ignored).
    """
    if cache is None or not mode.should_read():
        fetched = fetch_fn(frontier)
        delta = fetched if mode.should_write() else fetched.limit(0)
        return fetched, delta

    hit_keys = cache.select(key_col).distinct()
    misses = frontier.join(hit_keys, key_col, "left_anti")
    # hits keep every frontier column and per-request multiplicity: a key
    # requested twice yields two result rows, symmetric with the miss path
    # (the reference serves each arun() call its own cached CrawlResult,
    # async_webcrawler.py:311-332).  The cache contributes only the result
    # columns the frontier lacks — shared non-key columns (e.g. url) would
    # otherwise come out duplicate-named and break the unionByName.
    overlap = [
        c for c in cache.columns if c != key_col and c in frontier.columns
    ]
    hits = frontier.join(
        cache.drop(*overlap) if overlap else cache, key_col, "inner"
    )
    fetched = fetch_fn(misses)
    results = hits.unionByName(fetched, allowMissingColumns=True)
    delta = fetched if mode.should_write() else fetched.limit(0)
    return results, delta
