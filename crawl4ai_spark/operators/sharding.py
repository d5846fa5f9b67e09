"""Crawler shard assignment — rendezvous (highest-random-weight) hashing.

A distributed crawl partitions the URL space by HOST across crawler
shards so politeness state (robots cache, per-host budgets, connection
pools) lives on exactly one shard — Mercator's "host assignment" and
Heritrix's crawler-instance mapping.  Plain ``hash(host) % n`` moves
almost every host when n changes; rendezvous hashing moves only
~1/(n+1) of hosts when a shard is added: each host goes to the shard
with the highest score ``h(host, shard)``, and adding shard n+1 only
claims the hosts whose new score beats their old winner.

``assign_shards`` derives the winner WITHOUT exploding hosts × shards:
the per-shard scores are an in-row array of (score, shard) structs and
``array_max`` picks the lexicographic maximum — pure codegen, zero
shuffle, O(n_shards) work per row inside the projection.  The score is
the md5 hex digest of ``host|shard`` (a JVM intrinsic, stable across
engines and releases — a reshard must reproduce old assignments
bit-for-bit or the migration diff is garbage).

``reassignment_stats`` summarizes an n_old → n_new rescale: per-shard
load before/after plus the moved-host count (expected ≈ hosts/(n_new)
when growing by one).

Reference anchor: crawl4ai is single-process (async_dispatcher.py
schedules tasks, not shards); shard assignment is the piece a
1000-executor crawl needs that the reference never models.  Public
algorithm: Thaler & Ravishankar's HRW hashing (the cache-array paper).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["shard_of", "assign_shards", "reassignment_stats"]


def shard_of(host: Column, n_shards: int) -> Column:
    """Rendezvous winner for one host: argmax over shards of
    md5(host|shard), as a pure column expression."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    scored = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.struct(
            F.md5(F.concat(host, F.lit("|"), s.cast("string"))).alias("m"),
            s.alias("s"),
        ),
    )
    return F.array_max(scored)["s"].cast("int")


def assign_shards(
    hosts: DataFrame, n_shards: int, host_col: str = "host"
) -> DataFrame:
    """(host, …) → (host, shard) — one codegen projection, no shuffle."""
    return hosts.withColumn("shard", shard_of(F.col(host_col), n_shards))


def reassignment_stats(
    hosts: DataFrame, n_old: int, n_new: int, host_col: str = "host"
) -> DataFrame:
    """Rescale migration summary: one row per shard id with load under
    the old and new layouts and how many hosts move in/out.  ONE
    aggregation shuffle over shard-id-sized groups; the moved flag is
    derived in-row (both winners are codegen projections).
    """
    h = F.col(host_col)
    flagged = hosts.select(
        h.alias("host"),
        shard_of(h, n_old).alias("old_shard"),
        shard_of(h, n_new).alias("new_shard"),
    ).withColumn("moved", F.col("old_shard") != F.col("new_shard"))
    old_load = flagged.groupBy(F.col("old_shard").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("old_hosts"),
        F.sum(F.when(F.col("moved"), 1).otherwise(0)).cast("long")
        .alias("moved_out"),
    )
    new_load = flagged.groupBy(F.col("new_shard").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("new_hosts"),
        F.sum(F.when(F.col("moved"), 1).otherwise(0)).cast("long")
        .alias("moved_in"),
    )
    return (
        old_load.join(new_load, "shard", "full")
        .select(
            "shard",
            F.coalesce("old_hosts", F.lit(0)).alias("old_hosts"),
            F.coalesce("new_hosts", F.lit(0)).alias("new_hosts"),
            F.coalesce("moved_out", F.lit(0)).alias("moved_out"),
            F.coalesce("moved_in", F.lit(0)).alias("moved_in"),
        )
    )
