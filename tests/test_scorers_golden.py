"""Golden scorer values ported verbatim from the reference suite
(tests/20241401/test_deep_crawl_scorers.py:5-138). Both the Spark columns
and the driver-side py_score must reproduce them to 1e-5."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.scorers import ScorerSpec, composite_score

KEYWORD = ScorerSpec(kind="keyword", keywords=["python", "blog"], weight=1.0)
PATH_DEPTH = ScorerSpec(kind="path_depth", optimal_depth=2, weight=1.0)
CONTENT_TYPE = ScorerSpec(
    kind="content_type", type_weights={".html$": 1.0, ".pdf$": 0.8, ".jpg$": 0.6}, weight=1.0
)
FRESHNESS = ScorerSpec(kind="freshness", current_year=2024, weight=1.0)
DOMAIN = ScorerSpec(
    kind="domain",
    domain_weights={"python.org": 1.0, "github.com": 0.8, "medium.com": 0.6},
    default_weight=0.3,
    weight=1.0,
)

GOLDEN = [
    (KEYWORD, "https://example.com/python-blog", 1.0),
    (KEYWORD, "https://example.com/PYTHON-BLOG", 1.0),
    (KEYWORD, "https://example.com/python-only", 0.5),
    (KEYWORD, "https://example.com/other", 0.0),
    (PATH_DEPTH, "https://example.com/a/b", 1.0),
    (PATH_DEPTH, "https://example.com/a", 0.5),
    (PATH_DEPTH, "https://example.com/a/b/c", 0.5),
    (PATH_DEPTH, "https://example.com", 0.33333333),
    (CONTENT_TYPE, "https://example.com/doc.html", 1.0),
    (CONTENT_TYPE, "https://example.com/doc.pdf", 0.8),
    (CONTENT_TYPE, "https://example.com/img.jpg", 0.6),
    (CONTENT_TYPE, "https://example.com/other.txt", 0.0),
    (FRESHNESS, "https://example.com/2024/01/post", 1.0),
    (FRESHNESS, "https://example.com/2023/12/post", 0.9),
    (FRESHNESS, "https://example.com/2022/post", 0.8),
    (FRESHNESS, "https://example.com/no-date", 0.5),
    (DOMAIN, "https://python.org/about", 1.0),
    (DOMAIN, "https://github.com/repo", 0.8),
    (DOMAIN, "https://medium.com/post", 0.6),
    (DOMAIN, "https://unknown.com", 0.3),
]

COMPOSITE_GOLDEN = {
    "https://python.org/blog/2024/01/new-release.html": 0.86666667,
    "https://github.com/repo/old-code.pdf": 0.62,
    "https://unknown.com/random": 0.26,
}

ALL_SCORERS = [KEYWORD, PATH_DEPTH, CONTENT_TYPE, FRESHNESS, DOMAIN]


def test_py_scores_golden():
    for spec, url, expected in GOLDEN:
        assert round(spec.py_score(url), 8) == pytest.approx(expected, abs=1e-5), (
            spec.kind, url)


def test_spark_scores_golden(spark):
    urls = sorted({u for _, u, _ in GOLDEN})
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    cols = [spec.column(F.col("url")).alias(f"s{i}") for i, spec in enumerate(ALL_SCORERS)]
    rows = {r["url"]: r for r in df.select("url", *cols).collect()}
    for spec, url, expected in GOLDEN:
        idx = ALL_SCORERS.index(spec)
        assert rows[url][f"s{idx}"] == pytest.approx(expected, abs=1e-5), (spec.kind, url)


def test_composite_golden_py():
    comp = ScorerSpec(kind="composite", children=ALL_SCORERS, normalize=True)
    for url, expected in COMPOSITE_GOLDEN.items():
        assert round(comp.py_score(url), 8) == pytest.approx(expected, abs=1e-5), url


def test_composite_golden_spark(spark):
    df = spark.createDataFrame([(u,) for u in COMPOSITE_GOLDEN], ["url"])
    col = composite_score([s.column(F.col("url")) for s in ALL_SCORERS], normalize=True)
    rows = {r["url"]: r["score"] for r in df.select("url", col.alias("score")).collect()}
    for url, expected in COMPOSITE_GOLDEN.items():
        assert rows[url] == pytest.approx(expected, abs=1e-5), url


def test_weight_float32_semantics(spark):
    # URLScorer stores weight via ctypes.c_float (scorers.py:67-70): 0.1 → float32.
    spec = ScorerSpec(kind="keyword", keywords=["a"], weight=0.1)
    import numpy as np

    expected = 1.0 * float(np.float32(0.1))
    assert spec.py_score("https://a.com/a") == expected
    df = spark.createDataFrame([("https://a.com/a",)], ["url"])
    got = df.select(spec.column(F.col("url")).alias("s")).collect()[0]["s"]
    assert got == pytest.approx(expected, abs=1e-12)
