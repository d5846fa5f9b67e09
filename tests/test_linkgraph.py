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


def test_domain_authority_df_matches_dict_scorer(spark):
    # the DataFrame join path must reproduce the create_map scorer exactly
    from crawl4ai_spark.functions.scorers import domain_authority_score
    from crawl4ai_spark.operators.linkgraph import domain_authority_score_df

    urls = [
        "https://EX0.test/page", "https://ex1.test:8080/x",
        "https://unknown.test/y", "https://ex5.test/z",
    ]
    frontier = spark.createDataFrame([(u,) for u in urls], ["url"])
    wmap = {"ex0.test": 0.9, "EX1.test": 0.8, "ex5.test": 0.3}
    via_dict = {
        r["url"]: r["s"] for r in frontier.select(
            "url", domain_authority_score(
                F.col("url"), wmap, default_weight=0.5, weight=0.7).alias("s")
        ).collect()
    }
    weights = spark.createDataFrame(list(wmap.items()), ["host", "weight"])
    # duplicate dim row must NOT inflate frontier multiplicity
    weights = weights.union(spark.createDataFrame(
        [("ex0.test", 0.9)], ["host", "weight"]))
    out = domain_authority_score_df(
        frontier, weights, default_weight=0.5, weight=0.7)
    rows = out.collect()
    assert len(rows) == 4
    assert {r["url"]: r["da_score"] for r in rows} == via_dict


def test_anchor_texts_topk(spark):
    links = spark.createDataFrame(
        [("t1", "click here"), ("t1", "click here"), ("t1", "docs"),
         ("t1", "blog"), ("t1", "api"),        # tie at 1: lexicographic
         ("t2", "  "), ("t2", "only")],
        ["href", "text"],
    )
    from crawl4ai_spark.operators.linkgraph import anchor_texts

    got = sorted(
        (r["target"], r["anchor_rank"], r["anchor_text"], r["n_inlinks"])
        for r in anchor_texts(links, k=3).collect()
    )
    assert got == [
        ("t1", 1, "click here", 2), ("t1", 2, "api", 1), ("t1", 3, "blog", 1),
        ("t2", 1, "only", 1),
    ]


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
