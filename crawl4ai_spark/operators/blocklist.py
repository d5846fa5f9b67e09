"""URL category-blocklist gating (UT1 / RefinedWeb-style).

RefinedWeb (Penedo et al. 2023 §3.1) and most production crawls screen
URLs against a category blocklist — the Université Toulouse 1 list is the
canonical public one: ~4.6 M entries mapping a host or a registrable
domain to a category (adult, ads, malware, phishing, ...).  The reference
has per-crawl DomainFilter allow/deny sets (`deep_crawling/filters.py:
418-474`) but no corpus-scale categorized blocklist join; this operator
adds that screen as a first-class curation stage.

Semantics
---------
An entry is either kind='host' (matches the URL's netloc exactly) or
kind='domain' (matches the URL's registrable base domain — so every
subdomain of a blocked domain is blocked).  An exact-host entry takes
precedence over a domain entry; when one key somehow carries several
categories the lexicographically smallest wins, so the output is a pure
function of (urls, blocklist) regardless of partitioning.

Scale shape
-----------
The blocklist is the SMALL side (UT1 is ~100 MB as two-column parquet)
and is explicitly ``F.broadcast`` — the 10^10-row URL side never
shuffles: host/base-domain extraction is whole-stage-codegen regex
(functions/urlparts.py), and both lookups are broadcast-hash joins.  If a
blocklist ever outgrew the broadcast threshold the same plan degrades to
two shuffled hash joins keyed on host/base — still one shuffle of the big
side each, no skew (hosts are the join key, and a hot HOST is exactly one
probe row here, unlike the frontier case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urlparts import base_domain, host_of

__all__ = ["blocklist_gate"]


def blocklist_gate(urls: DataFrame, blocklist: DataFrame,
                   url_col: str = "url") -> DataFrame:
    """Annotate ``urls`` with (host, base_dom, category, blocked).

    ``blocklist`` columns: pattern (host or base domain, lowercase),
    kind ('host' | 'domain'), category.  Unmatched URLs get NULL
    category and blocked=false.
    """
    clash = {"host", "base_dom", "category", "blocked"} & set(urls.columns)
    if clash:
        raise ValueError(
            f"urls already carries output column(s) {sorted(clash)}; "
            "rename them before gating (silent duplicates would make the "
            "frame ambiguous downstream)")
    pat = F.lower(F.trim(F.col("pattern")))
    host_entries = (
        blocklist.where(F.col("kind") == "host")
        .groupBy(pat.alias("__h"))
        .agg(F.min("category").alias("__host_cat"))
    )
    dom_entries = (
        blocklist.where(F.col("kind") == "domain")
        .groupBy(pat.alias("__d"))
        .agg(F.min("category").alias("__dom_cat"))
    )
    u = urls.withColumn("host", host_of(F.col(url_col))).withColumn(
        "base_dom", base_domain(F.col(url_col)))
    out = (
        u.join(F.broadcast(host_entries), u["host"] == F.col("__h"), "left")
        .join(F.broadcast(dom_entries), u["base_dom"] == F.col("__d"), "left")
    )
    cat = F.coalesce(F.col("__host_cat"), F.col("__dom_cat"))
    return out.select(
        *[F.col(c) for c in urls.columns], "host", "base_dom",
        cat.alias("category"), cat.isNotNull().alias("blocked"),
    )
