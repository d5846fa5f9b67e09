"""resolve_redirects: pointer-doubling vs a sequential reference walk."""

import pytest

from crawl4ai_spark.operators.redirects import resolve_redirects


def _resolve(spark, edges, max_hops=8):
    df = spark.createDataFrame(edges, "src_url string, dst_url string")
    rows = resolve_redirects(df, max_hops=max_hops).collect()
    return {r["url"]: (r["final_url"], r["hops"], r["status"]) for r in rows}


def _seq_walk(edge_map, start, max_hops):
    cur, hops = start, 0
    while cur in edge_map:
        if hops >= max_hops:
            return (None, None, "unresolved")
        cur = edge_map[cur]
        hops += 1
    return (cur, hops, "resolved")


def test_simple_chain(spark):
    out = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert out["a"] == ("d", 3, "resolved")
    assert out["b"] == ("d", 2, "resolved")
    assert out["c"] == ("d", 1, "resolved")


def test_self_loop_and_cycle(spark):
    out = _resolve(spark, [("s", "s"), ("x", "y"), ("y", "x"), ("in", "x")])
    assert out["s"] == (None, None, "unresolved")
    assert out["x"] == (None, None, "unresolved")
    assert out["in"] == (None, None, "unresolved")  # tail into a cycle


def test_hop_bound_exact(spark):
    # chain of exactly max_hops resolves; one longer does not
    chain = [(f"n{i}", f"n{i+1}") for i in range(5)]  # n0..n5, 5 hops
    out4 = _resolve(spark, chain, max_hops=4)
    assert out4["n1"] == ("n5", 4, "resolved")
    assert out4["n0"] == (None, None, "unresolved")
    out8 = _resolve(spark, chain, max_hops=8)
    assert out8["n0"] == ("n5", 5, "resolved")


def test_duplicate_src_dedup_min(spark):
    # duplicate observations for one source: smallest dst wins
    out = _resolve(spark, [("a", "z"), ("a", "b"), ("b", "c")])
    assert out["a"] == ("c", 2, "resolved")


def test_max_hops_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src_url string, dst_url string")
    with pytest.raises(ValueError):
        resolve_redirects(df, max_hops=3)
    with pytest.raises(ValueError):
        resolve_redirects(df, max_hops=0)


def test_matches_sequential_walk_on_random_functional_graph(spark):
    # deterministic pseudo-random functional graph: node i -> (i*7+3) % 97
    # for i in a subset; includes cycles and converging tails
    edges = [(f"u{i}", f"u{(i * 7 + 3) % 97}") for i in range(0, 97, 2)]
    edge_map = dict(edges)
    for mh in (1, 2, 8, 32):
        out = _resolve(spark, edges, max_hops=mh)
        assert set(out) == set(edge_map)
        for start in edge_map:
            assert out[start] == _seq_walk(edge_map, start, mh), (start, mh)
