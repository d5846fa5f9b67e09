"""Crawler hub packs (reference crawlers/ + hub.py as data): registry,
URL-construction parity, schema truth tables, and the Spark pass."""

import json

from crawl4ai_spark.crawlers import (
    CRAWLER_HUB,
    get_crawler,
    google_search_url,
    product_fields_of,
    product_html,
    run_pack,
    serp_fields_of,
    serp_html,
)
from crawl4ai_spark.operators.extraction import JsonCssExtractor


def test_hub_registry():
    """hub.py:64-68 get() surface + the packs' __meta__ contents."""
    g = get_crawler("google_search")
    assert g.meta["version"] == "1.0.0"
    assert g.meta["rate_limit"] == "10 RPM"
    assert set(g.schemas) == {"organic_schema", "top_stories_schema",
                              "suggested_query_schema"}
    a = get_crawler("amazon_product")
    assert a.meta["version"] == "1.2.0"
    assert a.meta["schema"] == {"product": ["name", "price"]}
    assert get_crawler("nope") is None
    assert set(CRAWLER_HUB) == {"google_search", "amazon_product"}


def test_google_search_url_parity():
    """Exact truth table of GoogleSearchCrawler.run's URL building
    (crawler.py:25-30)."""
    assert (google_search_url("pizza")
            == "https://www.google.com/search?q=pizza&gl=sg&hl=en")
    assert (google_search_url("pizza", "image")
            == "https://www.google.com/search?q=pizza&gl=sg&hl=en"
               "&tbs=qdr:d&udm=2")
    assert (google_search_url("a b", page_start=3)
            == "https://www.google.com/search?q=a b&gl=sg&hl=en&start=30")
    assert (google_search_url("x", page_length=20)
            == "https://www.google.com/search?q=x&gl=sg&hl=en&num=20")
    assert google_search_url("x", "image", 2, 5).endswith("&start=20&num=5")


def test_serp_schemas_truth_table():
    for d in (0, 1, 2, 7, 11):
        f = serp_fields_of(d)
        html = serp_html(f)
        g = get_crawler("google_search")
        assert JsonCssExtractor(
            g.schemas["organic_schema"]).extract(html) == f["organic"]
        assert JsonCssExtractor(
            g.schemas["top_stories_schema"]).extract(html) == f["top_stories"]
        assert JsonCssExtractor(
            g.schemas["suggested_query_schema"]).extract(html) == f["suggested"]


def test_serp_empty_sections():
    """doc_id % 3 == 0 -> zero top stories; schema yields no items (not
    empty dicts)."""
    f = serp_fields_of(3)
    assert f["top_stories"] == []
    html = serp_html(f)
    g = get_crawler("google_search")
    assert JsonCssExtractor(g.schemas["top_stories_schema"]).extract(html) == []


def test_amazon_schema_truth_table():
    for d in (0, 5, 42, 123):
        p = product_fields_of(d)
        items = JsonCssExtractor(
            get_crawler("amazon_product").schemas["product_schema"]
        ).extract(product_html(p))
        assert items == [p]


def test_run_pack_spark(spark):
    rows = [(f"q{d}", serp_html(serp_fields_of(d))) for d in range(6)]
    df = spark.createDataFrame(rows, ["url", "html"])
    got = run_pack(df, "google_search", "organic_schema").collect()
    by_url: dict[str, list] = {}
    for r in sorted(got, key=lambda r: (r["url"], r["item_idx"])):
        by_url.setdefault(r["url"], []).append(json.loads(r["item_json"]))
    for d in range(6):
        assert by_url[f"q{d}"] == serp_fields_of(d)["organic"]
