"""Filter truth tables from the reference suite
(tests/20241401/test_deep_crawl_filters.py:4-51,86-120,186-214), verified
against the *implementation* (filters.py) — note the reference's print-style
test expects allowed='example.com' to reject 'sub.example.com', but
DomainFilter._is_subdomain (filters.py:431-434) accepts subdomains; we
executed the reference class directly and follow the implementation."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.filters import FilterSpec

PATTERN_CASES = [
    (["*.html"], {
        "https://example.com/page.html": True,
        "https://example.com/path/doc.html": True,
        "https://example.com/page.htm": False,
        "https://example.com/page.html?param=1": True,
    }),
    (["*/article/*"], {
        "https://example.com/article/123": True,
        "https://example.com/blog/article/456": True,
        "https://example.com/articles/789": False,
        "https://example.com/article": False,
    }),
    (["blog-*-[0-9]"], {
        "https://example.com/blog-post-1": True,
        "https://example.com/blog-test-9": True,
        "https://example.com/blog-post": False,
        "https://example.com/blog-post-x": False,
    }),
    (["*.pdf", "*/download/*"], {
        "https://example.com/doc.pdf": True,
        "https://example.com/download/file.txt": True,
        "https://example.com/path/download/doc": True,
        "https://example.com/uploads/file.txt": False,
    }),
    (["*"], {
        "https://example.com": True,
        "": True,
        "http://test.com/path": True,
    }),
    ([r"^https?://.*\.example\.com/\d+"], {
        "https://sub.example.com/123": True,
        "http://test.example.com/456": True,
        "https://example.com/789": False,
        "https://sub.example.com/abc": False,
    }),
]

DOMAIN_CASES = [
    ({"allowed": ["example.com"]}, {
        "https://example.com/page": True,
        "http://example.com": True,
        "https://sub.example.com": True,  # impl truth: subdomain of allowed
        "https://other.com": False,
    }),
    ({"allowed": ["example.com", "test.com"]}, {
        "https://example.com/page": True,
        "https://test.com/home": True,
        "https://other.com": False,
    }),
    ({"blocked": ["malicious.com"]}, {
        "https://malicious.com": False,
        "https://safe.com": True,
        "http://malicious.com/login": False,
    }),
    ({"blocked": ["spam.com", "ads.com"]}, {
        "https://spam.com": False,
        "https://ads.com/banner": False,
        "https://example.com": True,
    }),
    ({"allowed": ["example.com"], "blocked": ["sub.example.com"]}, {
        "https://example.com": True,
        "https://sub.example.com": False,
        "https://other.com": False,
    }),
]

CONTENT_TYPE_CASES = [
    (["image/png"], {
        "https://example.com/image.png": True,
        "https://example.com/photo.jpg": False,
        "https://example.com/document.pdf": False,
    }),
    (["image/jpeg", "application/pdf"], {
        "https://example.com/photo.jpg": True,
        "https://example.com/document.pdf": True,
        "https://example.com/script.js": False,
    }),
    (["application/json"], {
        "https://example.com/api/data": True,
        "https://example.com/data.json": True,
        "https://example.com/page.html": False,
    }),
    (["application/octet-stream"], {
        "https://example.com/file.unknown": True,
        "https://example.com/archive.zip": False,
        "https://example.com/software.exe": False,
    }),
]


def _specs():
    for patterns, table in PATTERN_CASES:
        yield FilterSpec(kind="pattern", patterns=patterns), table
    for params, table in DOMAIN_CASES:
        yield (
            FilterSpec(kind="domain", allowed_domains=params.get("allowed"),
                       blocked_domains=params.get("blocked")),
            table,
        )
    for allowed, table in CONTENT_TYPE_CASES:
        yield FilterSpec(kind="content_type", allowed_types=allowed), table


def test_filters_py_golden():
    for spec, table in _specs():
        for url, expected in table.items():
            assert spec.py_apply(url) == expected, (spec, url)


def test_filters_spark_golden(spark):
    for spec, table in _specs():
        df = spark.createDataFrame([(u,) for u in table], ["url"])
        got = {
            r["url"]: r["ok"]
            for r in df.select("url", spec.column(F.col("url")).alias("ok")).collect()
        }
        for url, expected in table.items():
            assert got[url] == expected, (spec, url)
