"""Crawl-trap detection: per-host structural diagnostics of a frontier.

At 10^10-URL scale the frontier's worst enemy is not volume but
*generated* volume — calendar pages, session-id permutations and
self-linking path loops mint unbounded URL spaces under a single host
(classic spider traps; see Heydon & Najork, "Mercator: A scalable,
extensible Web crawler", WWW 1999 §4.3).  The reference has no trap
surface (its crawls are depth-capped per run); a web-scale frontier
needs the diagnostic BEFORE the budget is spent, so this operator scores
every host from URL structure alone — no fetches.

Signals per URL (pure Catalyst array/string expressions, no regex beyond
a digit-class match that Java regex and RE2 agree on):

  - ``has_query``    — a ``?`` follows the path (session-id/facet mints),
  - ``seg_repeat``   — some path segment occurs ≥ ``repeat_k`` times
                       (``/a/b/a/b/a`` link loops),
  - ``calendar_like``— ≥ 2 all-digit path segments (``/2024/11/3/``),
  - ``deep``         — path depth ≥ ``deep_depth``.

Per host the shares are exact integer basis points
(``10000·n DIV n_urls``); ``trap_score_bp`` is the MAX share (a trap is
a trap through whichever signal fires) and ``is_trap`` compares it to
``trap_bp``.  Everything is engine-exact at any parallelism.

Scale shape: ONE partial-agg groupBy on host — the per-URL signals are
zero-shuffle codegen; output is host-dimension sized.  Feed ``is_trap``
hosts back as a ``DomainFilter`` deny-list or a budget multiplier in
``politeness.split_per_host_budget``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_trap_signals(frontier: DataFrame, url_col: str = "url",
                     repeat_k: int = 3, deep_depth: int = 6) -> DataFrame:
    """Per-URL structural signals (adds path/depth/flag columns)."""
    after = F.substring_index(F.col(url_col), "://", -1)
    qpos_a = F.instr(after, "?")
    slash = F.instr(after, "/")
    # the path starts at the first '/' only if that slash precedes any
    # '?' — 'h.test?next=/login' has NO path, and its query must not be
    # mistaken for one (session-id mints on the root are a trap signal)
    has_path = (slash > 0) & ((qpos_a == 0) | (slash < qpos_a))
    path_q = F.when(has_path,
                    after.substr(slash, F.length(after))).otherwise(F.lit("/"))
    qpos = F.instr(path_q, "?")
    path = F.when(qpos > 0,
                  path_q.substr(F.lit(1), qpos - 1)).otherwise(path_q)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    n_numeric = F.size(F.filter(segs, lambda s: s.rlike("^[0-9]+$")))
    seg_repeat = F.exists(
        F.array_distinct(segs),
        lambda d: F.size(F.filter(segs, lambda x: x == d)) >= repeat_k)
    return (
        frontier
        .withColumn("path", path)
        .withColumn("depth", F.size(segs).cast("long"))
        .withColumn("has_query", qpos_a > 0)
        .withColumn("seg_repeat", seg_repeat)
        .withColumn("calendar_like", n_numeric >= 2)
        .withColumn("deep", F.size(segs) >= deep_depth)
    )


def trap_report(frontier: DataFrame, url_col: str = "url",
                host_col: str = "host", repeat_k: int = 3,
                deep_depth: int = 6, trap_bp: int = 2500) -> DataFrame:
    """Per-host trap scorecard — see module docstring.  Returns one row
    per host: ``n_urls``, signal counts, basis-point shares,
    ``trap_score_bp`` (max share) and ``is_trap``."""
    sig = url_trap_signals(frontier, url_col, repeat_k, deep_depth)
    agg = (sig.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").cast("long").alias("n_urls"),
        F.max("depth").alias("max_depth"),
        F.sum(F.col("has_query").cast("long")).alias("n_param"),
        F.sum(F.col("seg_repeat").cast("long")).alias("n_repeat"),
        F.sum(F.col("calendar_like").cast("long")).alias("n_calendar"),
        F.sum(F.col("deep").cast("long")).alias("n_deep"),
    ))
    share = lambda c: F.expr(f"10000 * {c} DIV n_urls")  # noqa: E731
    agg = (agg
           .withColumn("param_share_bp", share("n_param"))
           .withColumn("repeat_share_bp", share("n_repeat"))
           .withColumn("calendar_share_bp", share("n_calendar"))
           .withColumn("deep_share_bp", share("n_deep")))
    score = F.greatest("param_share_bp", "repeat_share_bp",
                       "calendar_share_bp", "deep_share_bp")
    return (agg.withColumn("trap_score_bp", score)
               .withColumn("is_trap", score >= F.lit(int(trap_bp))))
