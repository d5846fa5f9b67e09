"""Fixed-point PageRank: exactness vs an independent sequential twin.

The twin below re-derives the integer recurrence from scratch (plain
dicts, no engine imports) so a bug in the operator's join/agg plumbing —
or in the recurrence itself — cannot self-verify.
"""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.linkgraph import SCALE, host_authority, pagerank


def seq_pagerank(edges, n_iter=8, damping=850_000):
    """Independent sequential twin: integer micro-unit PageRank."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: SCALE for v in nodes}
    for _ in range(n_iter):
        in_mass = {v: 0 for v in nodes}
        for s, d in edges:
            in_mass[d] += rank[s] // out[s]
        rank = {v: (SCALE - damping) + (damping * in_mass[v]) // SCALE
                for v in nodes}
    return rank


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "a"), ("e", "d"),  # e is dangling-source only
    ("a", "b"),  # duplicate edge: must count once
]


def test_pagerank_matches_independent_twin(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank_micro"] for r in pagerank(df, n_iter=8).collect()}
    assert got == seq_pagerank(EDGES, n_iter=8)
    # e never receives mass -> floor value after damping
    assert got["e"] == SCALE - 850_000


def test_pagerank_partitioning_invariant(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    one = {r["node"]: r["rank_micro"]
           for r in pagerank(df.coalesce(1), n_iter=5).collect()}
    many = {r["node"]: r["rank_micro"]
            for r in pagerank(df.repartition(7), n_iter=5).collect()}
    assert one == many


def test_pagerank_hand_case_two_nodes(spark):
    # a <-> b: symmetric, every iteration keeps rank at SCALE exactly
    df = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    got = {r["node"]: r["rank_micro"] for r in pagerank(df, n_iter=3).collect()}
    assert got == {"a": SCALE, "b": SCALE}


def test_host_authority_collapses_to_hosts(spark):
    links = spark.createDataFrame(
        [
            ("http://a.com/1", "http://b.com/x"),
            ("http://a.com/2", "http://b.com/y"),   # same host edge -> once
            ("http://b.com/1", "http://a.com/z"),
            ("http://a.com/3", "http://a.com/self"),  # self-loop dropped
        ],
        ["url", "href"],
    )
    got = {r["host"]: r["rank_micro"]
           for r in host_authority(links, n_iter=3).collect()}
    assert got == {"a.com": SCALE, "b.com": SCALE}  # symmetric 2-cycle
