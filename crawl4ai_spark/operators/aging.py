"""Frontier priority aging — the starvation guard a best-first crawl
needs at 10^10 URLs.

The reference's best-first loop (deep_crawling/bff_strategy.py) pops the
lowest-score URLs every round; a URL enqueued with a mediocre score
behind a hot host's stream of better-scored discoveries can wait
unboundedly.  The classic fix (Mercator's aging, also CLOCK-style
schedulers) boosts priority linearly with queue age so every URL's
effective priority eventually beats any fixed score and it drains.

``age_priorities`` is a pure column transform over the frontier table —
it composes with the existing pop machinery (plans/frontier.py pops by
ascending priority) by simply substituting ``aged_priority`` for
``priority`` in the pop's order key.

Semantics (all integer, engine-exact):
  age            = max(current_superstep - enq_superstep, 0)
  aged_priority  = priority - age * boost_per_step   (ascending pop:
                   smaller = sooner, so aging SUBTRACTS)
  starved        = age >= starve_after               (diagnostic flag;
                   NULL threshold → false)
  host_rank      = rank within host by (aged_priority, url)

Scale shape: zero-shuffle codegen for the aging columns; ONE window
partitioned by host for ``host_rank`` — identical partitioning to the
frontier pop itself (plans/frontier.py), so at scale the exchange is
shared/reused with the pop that consumes the rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def age_priorities(frontier: DataFrame, current_superstep: int,
                   boost_per_step: int = 1,
                   starve_after: int | None = None,
                   priority_col: str = "priority",
                   enq_col: str = "enq_superstep",
                   host_col: str = "host",
                   url_col: str = "url") -> DataFrame:
    if boost_per_step < 0:
        raise ValueError("boost_per_step must be >= 0")
    age = F.greatest(
        F.lit(int(current_superstep)).cast("long")
        - F.col(enq_col).cast("long"),
        F.lit(0).cast("long"))
    aged = F.col(priority_col).cast("long") - age * F.lit(
        int(boost_per_step)).cast("long")
    out = (frontier
           .withColumn("age", age)
           .withColumn("aged_priority", aged))
    if starve_after is not None:
        out = out.withColumn(
            "starved", F.col("age") >= F.lit(int(starve_after)))
    else:
        out = out.withColumn("starved", F.lit(False))
    w = Window.partitionBy(host_col).orderBy("aged_priority", url_col)
    return out.withColumn("host_rank", F.row_number().over(w).cast("long"))


def starvation_report(aged: DataFrame,
                      host_col: str = "host") -> DataFrame:
    """Per-host starvation rollup over an ``age_priorities`` frame:
    queue depth, starved count, oldest age, and the basis-point starved
    share — the dashboard row that tells an operator which hosts need a
    budget bump before URLs time out.  ONE partial-agg groupBy."""
    return (aged.groupBy(host_col)
            .agg(F.count("*").cast("long").alias("n_urls"),
                 F.sum(F.col("starved").cast("long")).cast("long")
                 .alias("n_starved"),
                 F.max("age").cast("long").alias("max_age"))
            # integer DIV: engine-exact basis points (CAST(double) would
            # truncate in Spark but round in DuckDB)
            .withColumn("starved_bp", F.expr(
                "CAST((10000 * n_starved) DIV n_urls AS BIGINT)")))
