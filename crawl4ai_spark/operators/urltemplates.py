"""URL template mining — collapse a frontier into path patterns.

A 10^10-URL frontier is dominated by a few THOUSAND url *shapes*:
``/product/{id}/view``, ``/blog/2024/{m}/{d}``, ``?sid={...}``.  Mining
those templates turns per-URL decisions into per-template ones — crawl
budgeting ("this template already has 2M captures"), trap triage (a
template whose variable segment explodes combinatorially), and seed-list
compression all key on the template, not the URL.  The reference walks
the other direction: URLPatternFilter (deep_crawling/filters.py:
110-180) matches URLs against hand-written patterns; mining LEARNS the
patterns from the frontier itself.

Algorithm: group URLs by (host, path depth); at each segment position,
a position whose distinct-value count is 1 keeps its literal, any other
becomes ``*``.  That is the classic prefix-tree collapse (cf. the DUST
"different URLs, similar text" line of work) restricted to exact
positional generalization — deterministic, no scoring knobs, and every
decision is an exact integer comparison.

Scale shape: one ``posexplode`` (no shuffle) → groupBy
(host, depth, pos) with partial aggregation — the ONE corpus-sized
shuffle → groupBy (host, depth) over the position-level frame (tiny;
AQE coalesces) where ``sort_array(collect_list(...))`` reassembles the
template from at most ``depth`` rows per group.  No window over the
corpus, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.functions.urlparts import host_of, path_of

__all__ = ["mine_url_templates"]


def mine_url_templates(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, …) → one row per (host, n_seg) template:

    ``host, n_seg, template, n_urls, n_var`` — template is the path with
    multi-valued positions starred (``/product/*/view``), ``n_urls`` the
    URL count it covers, ``n_var`` its starred-position count.  Root
    URLs (no path segments) report template ``/``.
    """
    u = F.col(url_col)
    parsed = urls.select(
        host_of(u).alias("host"),
        F.filter(F.split(path_of(u), "/"), lambda s: s != "").alias("segs"),
    ).withColumn("n_seg", F.size("segs"))

    ex = parsed.where(F.col("n_seg") > 0).select(
        "host", "n_seg", F.posexplode("segs").alias("pos", "seg"))
    pos_stats = ex.groupBy("host", "n_seg", "pos").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("seg").alias("nd"),
        F.min("seg").alias("mn"),
    ).withColumn(
        "piece", F.when(F.col("nd") > 1, F.lit("*")).otherwise(F.col("mn")))

    tpl = pos_stats.groupBy("host", "n_seg").agg(
        F.concat(
            F.lit("/"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "piece"))),
                    lambda x: x["piece"]),
                "/"),
        ).alias("template"),
        F.max("cnt").cast("long").alias("n_urls"),
        F.sum((F.col("piece") == "*").cast("long")).cast("long")
        .alias("n_var"),
    )
    roots = parsed.where(F.col("n_seg") == 0).groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"))
    return tpl.select(
        "host", F.col("n_seg").cast("long").alias("n_seg"), "template",
        "n_urls", "n_var",
    ).unionByName(roots.select(
        "host", F.lit(0).cast("long").alias("n_seg"),
        F.lit("/").alias("template"), "n_urls",
        F.lit(0).cast("long").alias("n_var")))
