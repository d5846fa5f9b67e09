"""URL template mining: positional generalization per (host, depth)."""

from crawl4ai_spark.operators.urltemplates import mine_url_templates


def _mine(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {(r["host"], r["n_seg"]): r
            for r in mine_url_templates(df).collect()}


def test_basic_templates(spark):
    urls = [f"https://a.test/product/{i}/view" for i in range(20)] + \
           [f"https://a.test/blog/2024/{1 + i % 12}/{1 + i % 28}"
            for i in range(30)] + \
           ["https://a.test/about"] * 5 + \
           ["https://a.test"] * 3
    out = _mine(spark, urls)
    assert out[("a.test", 3)]["template"] == "/product/*/view"
    assert out[("a.test", 3)]["n_urls"] == 20
    assert out[("a.test", 3)]["n_var"] == 1
    assert out[("a.test", 4)]["template"] == "/blog/2024/*/*"
    assert out[("a.test", 4)]["n_var"] == 2
    assert out[("a.test", 1)]["template"] == "/about"
    assert out[("a.test", 1)]["n_var"] == 0
    assert out[("a.test", 0)]["template"] == "/"
    assert out[("a.test", 0)]["n_urls"] == 3


def test_hosts_do_not_mix(spark):
    out = _mine(spark, ["https://a.test/x/1", "https://a.test/x/2",
                        "https://b.test/y/1"])
    assert out[("a.test", 2)]["template"] == "/x/*"
    assert out[("b.test", 2)]["template"] == "/y/1"  # single URL: literal


def test_same_depth_shapes_merge(spark):
    # two 2-seg shapes under one host merge into the starred union —
    # the documented (host, depth) granularity
    out = _mine(spark, ["https://a.test/p/1", "https://a.test/q/2"])
    assert out[("a.test", 2)]["template"] == "/*/*"
    assert out[("a.test", 2)]["n_urls"] == 2


def test_single_url_is_fully_literal(spark):
    out = _mine(spark, ["https://a.test/one/two/three"])
    assert out[("a.test", 3)]["template"] == "/one/two/three"
    assert out[("a.test", 3)]["n_var"] == 0
