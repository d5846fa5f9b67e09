"""Canonicalizer parity: the shared pure-Python implementation is validated
against hand-derived goldens from utils.py:2162-2207, and the Spark pandas
UDF must agree with the driver-side function on every case (they share one
implementation, so this guards the UDF plumbing)."""

from pyspark.sql import functions as F

from crawl4ai_spark.functions.canonical import (
    canonical_col,
    efficient_normalize_url_for_deep_crawl,
    normalize_url_for_deep_crawl,
)

BASE = "https://Example.COM/dir/page.html"

CASES = {
    # (href, base) -> canonical per utils.py:2162-2207
    ("other.html", BASE): "https://example.com/dir/other.html",
    ("/abs/path/", BASE): "https://example.com/abs/path",
    ("#frag", BASE): "https://example.com/dir/page.html",
    ("?utm_source=x&q=1", BASE): "https://example.com/dir/page.html?q=1",
    ("?utm_source=x&utm_medium=y&ref=z&fbclid=1", BASE): "https://example.com/dir/page.html",
    ("https://HOST.Example.com/A/B/", BASE): "https://host.example.com/A/B",
    ("https://example.com", BASE): "https://example.com/",
    ("  spaced.html  ", BASE): "https://example.com/dir/spaced.html",
    ("https://example.com/p?b=2&a=1", BASE): "https://example.com/p?b=2&a=1",
    ("https://example.com/p?a=1&a=2", BASE): "https://example.com/p?a=1&a=2",
}


def test_canonicalizer_goldens():
    for (href, base), expected in CASES.items():
        assert normalize_url_for_deep_crawl(href, base) == expected, (href, base)


def test_canonicalizer_none_and_empty():
    assert normalize_url_for_deep_crawl(None, BASE) is None
    assert normalize_url_for_deep_crawl("", BASE) is None


def test_efficient_variant_keeps_path_and_query():
    got = efficient_normalize_url_for_deep_crawl("https://A.com/P/?utm_source=x#f", BASE)
    assert got == "https://a.com/P/?utm_source=x"


def test_spark_udf_matches_python(spark):
    rows = [(href, base) for (href, base) in CASES]
    df = spark.createDataFrame(rows, ["href", "base"])
    got = df.select(
        "href", "base", canonical_col(F.col("href"), F.col("base")).alias("canon")
    ).collect()
    for r in got:
        assert r["canon"] == normalize_url_for_deep_crawl(r["href"], r["base"])
