"""Bulk redirect-chain resolution — pointer-doubling transitive walk.

The reference follows HTTP 3xx chains one hop at a time inside the
fetcher (async_crawler_strategy.py: aiohttp's ``allow_redirects`` with a
max-redirect bound; models.py carries ``redirected_url`` on the crawl
result).  At 10^10-URL frontier scale a crawler instead RESOLVES the
accumulated redirect map in bulk between supersteps: every frontier URL
is rewritten to its final destination BEFORE scheduling, so politeness
budgets, the URL-seen filter, and dedup all key on the canonical target
rather than on 301 aliases.

``resolve_redirects`` takes the redirect-edge table (src_url, dst_url —
one outgoing edge per source; duplicate observations are deduped to the
lexicographically smallest dst for determinism) and returns, for every
distinct source, its final URL, the exact hop count, and a status:

  - ``resolved``   — the walk reached a URL with no outgoing redirect
                     within ``max_hops`` hops;
  - ``unresolved`` — the walk was still on a redirecting URL after
                     ``max_hops`` hops: a redirect cycle (self-loops
                     included) or a chain longer than the bound.  Final
                     URL and hop count are NULL — a partially-walked
                     pointer is not a meaningful destination.

Scale shape: the naive per-hop join is O(max_hops) sequential shuffles
over the FULL edge set.  This implementation pointer-doubles instead — a
jump table J_k maps every source to the node 2^k hops away (or its
terminal, whichever comes first), and J_{k+1} is J_k self-joined on the
moved pointer — so the whole resolution costs ceil(log2(max_hops))
self-joins (5 rounds for max_hops=32, 34 for a 2^34-hop bound).  Each
round is ONE hash-shuffle join on the pointer key; ``max_hops`` must be
a power of two so the doubled walk and the hop bound coincide exactly.
The composed steps counter is exact: a resolved row's ``hops`` is the
true chain length, bit-identical to a sequential walk (and to the
DuckDB recursive-CTE oracle in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_redirects"]


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_hops: int = 32,
) -> DataFrame:
    """Resolve every source URL in the redirect map to its final target.

    Returns (url, final_url, hops, status) — see module docstring for
    the status contract.  ``max_hops`` must be a power of two ≥ 1.
    """
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError(f"max_hops must be a power of two >= 1, got {max_hops}")

    # Deterministic functional graph: one outgoing edge per source.
    e = (
        edges.groupBy(F.col(src_col).alias("node"))
        .agg(F.min(dst_col).alias("ptr"))
    )

    # done(node) := ptr has no outgoing edge (ptr is a terminal URL).
    srcs = e.select(F.col("node").alias("__s"))
    j = (
        e.join(srcs, e["ptr"] == srcs["__s"], "left")
        .select(
            "node",
            "ptr",
            F.lit(1).cast("long").alias("steps"),
            F.col("__s").isNull().alias("done"),
        )
    )

    rounds = max_hops.bit_length() - 1  # log2(max_hops); J0 already walks 1 hop
    for _ in range(rounds):
        hop = j.select(
            F.col("node").alias("ptr"),
            F.col("ptr").alias("ptr2"),
            F.col("steps").alias("steps2"),
            F.col("done").alias("done2"),
        )
        # Rows already done keep their row; live rows compose with the
        # jump table at their pointer (the pointer of a live row is a
        # source, so the inner lookup always hits).
        j = (
            j.join(hop, "ptr", "left")
            .select(
                "node",
                F.when(F.col("done"), F.col("ptr"))
                .otherwise(F.col("ptr2"))
                .alias("ptr"),
                F.when(F.col("done"), F.col("steps"))
                .otherwise(F.col("steps") + F.col("steps2"))
                .alias("steps"),
                F.when(F.col("done"), F.lit(True))
                .otherwise(F.col("done2"))
                .alias("done"),
            )
        )

    return j.select(
        F.col("node").alias("url"),
        F.when(F.col("done"), F.col("ptr")).alias("final_url"),
        F.when(F.col("done"), F.col("steps")).cast("long").alias("hops"),
        F.when(F.col("done"), F.lit("resolved"))
        .otherwise(F.lit("unresolved"))
        .alias("status"),
    )
