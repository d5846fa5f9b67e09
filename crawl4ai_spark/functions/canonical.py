"""URL canonicalization — semantics of crawl4ai's normalizers, vectorized.

Reference semantics (cited for parity checking):
  - ``normalize_url``                     crawl4ai/utils.py:2148-2159
  - ``normalize_url_for_deep_crawl``      crawl4ai/utils.py:2162-2207
  - ``efficient_normalize_url_for_deep_crawl`` crawl4ai/utils.py:2209-2235

The deep-crawl canonicalizer is THE URL-seen key function (north_rule:
bloom/cuckoo URL-seen keyed by canonicalized-URL xxhash64), so the Spark
pipeline and the driver-side oracle must agree byte-for-byte.  One shared
pure-Python implementation is used by both; Spark runs it inside Arrow
pandas UDFs (batched, no per-row Python crossing per north_rule — each
Arrow batch is one Python call over thousands of rows).

At 100 TB scale this stage runs *after* ``dropDuplicates`` on the raw href
within a superstep (the set-oriented analog of the reference's
``lru_cache(10000)``) so each distinct href is canonicalized once.
"""

from __future__ import annotations

from urllib.parse import parse_qs, urlencode, urljoin, urlparse, urlunparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "ref", "fbclid")


def normalize_url(href: str, base_url: str) -> str:
    """Plain join-normalize (utils.py:2148-2159): urljoin(base, href.strip())."""
    parsed_base = urlparse(base_url)
    if not parsed_base.scheme or not parsed_base.netloc:
        raise ValueError(f"Invalid base URL format: {base_url}")
    return urljoin(base_url, href.strip())


def normalize_url_for_deep_crawl(href: str | None, base_url: str) -> str | None:
    """Canonicalizer for URL-seen keys (utils.py:2162-2207), step-for-step:

    urljoin → lowercase netloc → drop fragment → strip tracking params
    (parse_qs/urlencode round-trip) → path.rstrip('/') or '/'.
    """
    if not href:
        return None
    full_url = urljoin(base_url, href.strip())
    parsed = urlparse(full_url)
    netloc = parsed.netloc.lower()
    query = parsed.query
    if query:
        params = parse_qs(query)
        for param in TRACKING_PARAMS:
            if param in params:
                del params[param]
        query = urlencode(params, doseq=True) if params else ""
    return urlunparse(
        (
            parsed.scheme,
            netloc,
            parsed.path.rstrip("/") or "/",
            parsed.params,
            query,
            "",
        )
    )


def efficient_normalize_url_for_deep_crawl(href: str | None, base_url: str) -> str | None:
    """Fast-mode canonicalizer (utils.py:2209-2235): join + lower netloc + defrag."""
    if not href:
        return None
    full_url = urljoin(base_url, href.strip())
    parsed = urlparse(full_url)
    return urlunparse(
        (parsed.scheme, parsed.netloc.lower(), parsed.path, parsed.params, parsed.query, "")
    )


def _canon_series(hrefs: pd.Series, bases: pd.Series, fast: bool) -> pd.Series:
    fn = efficient_normalize_url_for_deep_crawl if fast else normalize_url_for_deep_crawl
    # Per-batch memo: link batches repeat hrefs heavily (nav links), the
    # set-oriented stand-in for the reference's lru_cache.
    memo: dict[tuple[str, str], str | None] = {}
    out = []
    for href, base in zip(hrefs.tolist(), bases.tolist()):
        key = (href, base)
        got = memo.get(key)
        if got is None and key not in memo:
            got = fn(href, base if base is not None else "")
            memo[key] = got
        out.append(got)
    return pd.Series(out, dtype="object")


@pandas_udf(StringType())
def canonicalize_udf(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    """Arrow-batched ``normalize_url_for_deep_crawl`` (utils.py:2162-2207)."""
    return _canon_series(hrefs, bases, fast=False)


@pandas_udf(StringType())
def canonicalize_fast_udf(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    """Arrow-batched ``efficient_normalize_url_for_deep_crawl`` (utils.py:2209-2235)."""
    return _canon_series(hrefs, bases, fast=True)


@pandas_udf(StringType())
def join_url_udf(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    """Arrow-batched plain ``normalize_url`` (utils.py:2148-2159)."""
    out = []
    for href, base in zip(hrefs.tolist(), bases.tolist()):
        try:
            out.append(normalize_url(href or "", base or ""))
        except ValueError:
            out.append(None)
    return pd.Series(out, dtype="object")


def canonical_col(href: Column, base: Column, fast: bool = False) -> Column:
    """Canonical-URL column; pair with ``url_hash_col`` for the seen key."""
    return (canonicalize_fast_udf if fast else canonicalize_udf)(href, base)


@pandas_udf(StructType([
    StructField("abs", StringType()),
    StructField("canon", StringType()),
]))
def join_and_canonicalize_udf(hrefs: pd.Series, bases: pd.Series) -> pd.DataFrame:
    """One-pass fusion of ``normalize_url`` (utils.py:2148-2159) and
    ``normalize_url_for_deep_crawl`` (utils.py:2162-2207) for the BFS
    discovery hot path: the canonicalizer's first step is the same
    urljoin, so computing both in one Arrow batch halves the Python
    round trips (and the href/base column transfer) versus chaining
    ``join_url_udf`` → ``canonicalize_udf``.

    ``abs`` is NULL where normalize_url raises (invalid base); ``canon``
    is byte-identical to ``canonicalize_udf(abs, base)`` — the canonical
    is derived from the computed absolute href (NOT the raw href), so an
    empty raw href still canonicalizes to the base URL exactly as the
    old two-UDF chain did.
    """
    abs_out: list = []
    canon_out: list = []
    for href, base in zip(hrefs.tolist(), bases.tolist()):
        try:
            a = normalize_url(href or "", base or "")
        except ValueError:
            a = None
        abs_out.append(a)
        canon_out.append(
            normalize_url_for_deep_crawl(a, base or "") if a is not None else None
        )
    return pd.DataFrame({"abs": abs_out, "canon": canon_out})


def url_hash_col(url: Column) -> Column:
    """URL-seen key: signed xxhash64 of the canonical URL (JVM-side, seed 42).

    Matches driver-side crawl4ai_spark.hashing.xxh64_signed exactly
    (verified in tests/test_hashing.py).
    """
    return F.xxhash64(url)
