"""Rendezvous shard assignment: determinism, balance, minimal movement."""

import hashlib

import pytest

from pyspark.sql import functions as F

from crawl4ai_spark.operators.sharding import (
    assign_shards, reassignment_stats, shard_of)


def _hosts(spark, n):
    return spark.range(n).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".test"))
        .alias("host"))


def _py_shard(host: str, n: int) -> int:
    return max(range(n),
               key=lambda s: hashlib.md5(f"{host}|{s}".encode()).hexdigest())


def test_matches_python_reference(spark):
    rows = assign_shards(_hosts(spark, 200), 16).collect()
    for r in rows:
        assert r["shard"] == _py_shard(r["host"], 16), r["host"]


def test_single_shard_and_validation(spark):
    rows = assign_shards(_hosts(spark, 10), 1).collect()
    assert {r["shard"] for r in rows} == {0}
    with pytest.raises(ValueError):
        shard_of(F.col("host"), 0)


def test_balance_roughly_uniform(spark):
    # md5 scores ⇒ near-uniform loads; with 2000 hosts over 8 shards no
    # shard should be empty or hold more than 2x the mean
    rows = assign_shards(_hosts(spark, 2000), 8).groupBy("shard").count() \
        .collect()
    loads = {r["shard"]: r["count"] for r in rows}
    assert set(loads) == set(range(8))
    assert max(loads.values()) < 2 * (2000 / 8)


def test_minimal_movement_on_grow(spark):
    # rendezvous property: growing n -> n+1 moves ONLY hosts whose new
    # shard is the added one, ~1/(n+1) of all hosts
    n = 2000
    flagged = _hosts(spark, n).select(
        "host",
        shard_of(F.col("host"), 8).alias("s8"),
        shard_of(F.col("host"), 9).alias("s9")).collect()
    moved = [r for r in flagged if r["s8"] != r["s9"]]
    assert all(r["s9"] == 8 for r in moved)  # movers only go to the new shard
    assert n / 9 * 0.5 < len(moved) < n / 9 * 1.6


def test_reassignment_stats_consistency(spark):
    out = reassignment_stats(_hosts(spark, 500), 4, 5).collect()
    by_shard = {r["shard"]: r for r in out}
    assert sum(r["old_hosts"] for r in out) == 500
    assert sum(r["new_hosts"] for r in out) == 500
    assert sum(r["moved_out"] for r in out) == sum(r["moved_in"] for r in out)
    # every mover lands on the added shard 4
    assert by_shard[4]["old_hosts"] == 0
    assert by_shard[4]["moved_in"] == by_shard[4]["new_hosts"]
