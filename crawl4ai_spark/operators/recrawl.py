"""Adaptive recrawl scheduling — freshness-driven revisit policy.

The reference caches pages with a fixed 7-day TTL (utils.py:227-229: the
sqlite cache's freshness window).  A production crawler re-visits
adaptively instead: pages whose content changes between fetches earn a
short TTL, static pages a long one.  This module derives that policy from
the fetch HISTORY table (url, fetch_ts, content_hash):

  change_rate = (# consecutive fetches whose hash changed) / (fetches - 1)
  ttl_s       = clamp(base_ttl / (1 + ttl_gain * change_rate),
                      min_ttl, max_ttl)
  due         = age(now, last_fetch) >= ttl

Shape: ONE shuffle on the url key — the change-detection lag window and
the per-url rollup share the same hashpartitioning, so Catalyst reuses
the exchange.  All time arithmetic is ``timestampdiff(MICROSECOND, ...)``
on the naive timestamps (wall-clock; see operators/sessions.py for the
DST verification) and the TTL expression is a single division + clamp —
bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["recrawl_schedule", "revalidation_plan"]


def recrawl_schedule(
    history: DataFrame,
    now: str,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    hash_col: str = "content_hash",
    base_ttl_s: float = 604_800.0,  # the reference's 7-day window
    min_ttl_s: float = 3_600.0,
    max_ttl_s: float = 2_592_000.0,
    ttl_gain: float = 16.0,
) -> DataFrame:
    """Per-url revisit schedule from fetch history.

    ``now`` is a timestamp literal string (e.g. '2024-01-08 00:00:00') —
    passed explicitly so the schedule is deterministic and testable.

    Returns (url, n_fetches, n_changes, change_rate, ttl_s, age_us, due):
    ``age_us`` is wall-clock microseconds since the last fetch; ``due``
    marks urls whose age has reached their adaptive TTL.
    """
    w = Window.partitionBy(url_col).orderBy(ts_col, hash_col)
    prev_hash = F.lag(F.col(hash_col)).over(w)
    changed = (
        prev_hash.isNotNull() & (F.col(hash_col) != prev_hash)
    ).cast("long")
    per_url = (
        history.withColumn("__chg", changed)
        .groupBy(url_col)
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum("__chg").alias("n_changes"),
            F.max(ts_col).alias("last_ts"),
        )
    )
    rate = F.col("n_changes").cast("double") / F.greatest(
        F.col("n_fetches") - 1, F.lit(1)
    ).cast("double")
    ttl = F.least(
        F.greatest(
            F.lit(float(base_ttl_s)) / (F.lit(1.0) + F.lit(float(ttl_gain)) * rate),
            F.lit(float(min_ttl_s)),
        ),
        F.lit(float(max_ttl_s)),
    )
    age_us = F.expr(
        f"timestampdiff(MICROSECOND, last_ts, TIMESTAMP_NTZ '{now}')"
    ).cast("long")
    return per_url.select(
        F.col(url_col),
        F.col("n_fetches"),
        F.col("n_changes"),
        rate.alias("change_rate"),
        ttl.alias("ttl_s"),
        age_us.alias("age_us"),
        (age_us.cast("double") >= ttl * F.lit(1_000_000.0)).alias("due"),
    )


def revalidation_plan(
    cache: DataFrame,
    now: str,
    url_col: str = "url",
    ts_col: str = "fetched_at",
    ttl_col: str = "ttl_s",
    etag_col: str = "etag",
    lastmod_col: str = "last_modified",
    size_col: str = "page_bytes",
) -> DataFrame:
    """Conditional-fetch planning over the page cache — the validator
    dimension ``recrawl_schedule`` leaves on the table: a page whose TTL
    has lapsed does NOT need a full refetch if the origin gave us an
    ETag or Last-Modified (a conditional GET answering 304 costs headers,
    not the payload — at 10^10 cached pages the difference is the
    egress bill).  Reference cache semantics are a fixed-TTL serve/skip
    (cache_context.py CacheMode + utils.py's 7-day window); the
    revalidation tier is engine-native.

    Per cached row:
      - ``age_s``  — whole seconds since the fetch (integer),
      - ``action`` — 'serve_cache' (age < ttl) | 'revalidate' (stale but
        a validator exists) | 'refetch' (stale, no validator),
      - ``cond_header`` — 'if-none-match' (ETag wins, per RFC 9110
        §13.1.2's precedence) else 'if-modified-since', NULL unless
        revalidating,
      - ``reval_bytes`` — payload bytes a 304 would save (0 otherwise).

    Pure codegen, zero shuffle, all-integer; ``now`` is an explicit
    timestamp literal so plans are deterministic and testable.
    """
    age_s = F.expr(
        f"timestampdiff(SECOND, {ts_col}, TIMESTAMP_NTZ '{now}')"
    ).cast("long")
    has_etag = F.col(etag_col).isNotNull() & (F.col(etag_col) != "")
    has_lm = F.col(lastmod_col).isNotNull() & (F.col(lastmod_col) != "")
    stale = age_s >= F.col(ttl_col).cast("long")
    action = (
        F.when(~stale, F.lit("serve_cache"))
        .when(has_etag | has_lm, F.lit("revalidate"))
        .otherwise(F.lit("refetch"))
    )
    cond = F.when(
        stale & has_etag, F.lit("if-none-match")
    ).when(stale & has_lm, F.lit("if-modified-since"))
    saved = F.when(action == "revalidate",
                   F.col(size_col).cast("long")).otherwise(F.lit(0))
    return (cache
            .withColumn("age_s", age_s)
            .withColumn("action", action)
            .withColumn("cond_header", cond)
            .withColumn("reval_bytes", saved.cast("long")))
