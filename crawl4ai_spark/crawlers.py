"""Prebuilt crawler packs: the reference's ``crawlers/`` + ``hub.py``
surface re-expressed as DATA over the extraction engine.

Reference: ``CrawlerHub`` discovers per-site crawler classes and exposes
``get(name)`` (crawl4ai/hub.py:37-68); the shipped packs are
``google_search`` (crawlers/google_search/crawler.py:11-130 — builds the
search URL, fetches, then runs three JsonCss schemas: organic results,
top stories, suggested queries) and ``amazon_product``
(crawlers/amazon_product/crawler.py:10-17 — product name/price schema
per its ``__meta__``).  The reference generates its schemas with an LLM
on first run and caches them as JSON (crawler.py:69-115); the pack here
ships the cached form directly — schemas are plain dicts, the engine
that runs them is operators/extraction.py, and a "crawler" is just
(meta, url builder, schema set).

Scale shape: schemas are driver-side constants broadcast into the one
``mapInPandas`` extraction pass (extract_stage) — running a pack over
10^9 SERP/product pages is the same single Arrow stage as any other
schema; the hub adds zero execution surface.

The fixture side mirrors warcsynth/sslsynth: ``serp_fields_of`` /
``product_fields_of`` give every extractable field as a pure function of
(doc_id), ``serp_html`` / ``product_html`` render them into the markup
the schemas target, so oracle SQL can reconstruct the expected items
from doc_ids alone — fields in == fields out, the extractor is never
consulted by the oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from .operators.extraction import extract_stage

__all__ = [
    "CrawlerPack", "CRAWLER_HUB", "get_crawler", "google_search_url",
    "serp_fields_of", "serp_html", "product_fields_of", "product_html",
    "run_pack",
]


# -------------------------------------------------------------- schemas
# The cached-JSON form the reference's _build_schemas would persist
# (crawler.py:76-115): organic {title, link, snippet, date}, top stories
# {title, link, source, date}, suggested {query}; amazon {name, price}
# per its __meta__ plus the fields a product page exposes.

ORGANIC_SCHEMA: dict[str, Any] = {
    "name": "organic",
    "baseSelector": "div#search div.g",
    "fields": [
        {"name": "title", "selector": "h3", "type": "text"},
        {"name": "link", "selector": "a.result", "type": "attribute",
         "attribute": "href"},
        {"name": "snippet", "selector": "div.snippet", "type": "text"},
        {"name": "date", "selector": "span.date", "type": "text"},
    ],
}

TOP_STORIES_SCHEMA: dict[str, Any] = {
    "name": "top_stories",
    "baseSelector": "div#top-stories div.story",
    "fields": [
        {"name": "title", "selector": "div.title", "type": "text"},
        {"name": "link", "selector": "a", "type": "attribute",
         "attribute": "href"},
        {"name": "source", "selector": "span.source", "type": "text"},
        {"name": "date", "selector": "span.when", "type": "text"},
    ],
}

SUGGESTED_QUERY_SCHEMA: dict[str, Any] = {
    "name": "suggested_queries",
    "baseSelector": "div#botstuff li.suggested",
    "fields": [
        {"name": "query", "type": "text"},
    ],
}

AMAZON_PRODUCT_SCHEMA: dict[str, Any] = {
    "name": "product",
    "baseSelector": "div#dp-container",
    "baseFields": [
        {"name": "asin", "type": "attribute", "attribute": "data-asin"},
    ],
    "fields": [
        {"name": "name", "selector": "span#productTitle", "type": "text"},
        {"name": "price",
         "selector": "span.a-price span.a-offscreen", "type": "text"},
        {"name": "rating", "selector": "span.a-icon-alt", "type": "text"},
        {"name": "review_count",
         "selector": "span#acrCustomerReviewText", "type": "text"},
    ],
}


# ------------------------------------------------------------------ hub

@dataclass(frozen=True)
class CrawlerPack:
    """hub.py's (crawler class, __meta__) pair as data."""
    name: str
    meta: dict[str, Any]
    schemas: dict[str, dict[str, Any]] = field(default_factory=dict)


CRAWLER_HUB: dict[str, CrawlerPack] = {
    "google_search": CrawlerPack(
        name="google_search",
        meta={  # crawlers/google_search/crawler.py:12-17
            "version": "1.0.0",
            "tested_on": ["google.com/search*"],
            "rate_limit": "10 RPM",
            "description": "Crawls Google Search results (text + images)",
        },
        schemas={
            "organic_schema": ORGANIC_SCHEMA,
            "top_stories_schema": TOP_STORIES_SCHEMA,
            "suggested_query_schema": SUGGESTED_QUERY_SCHEMA,
        },
    ),
    "amazon_product": CrawlerPack(
        name="amazon_product",
        meta={  # crawlers/amazon_product/crawler.py:3-8
            "version": "1.2.0",
            "tested_on": ["amazon.com"],
            "rate_limit": "50 RPM",
            "schema": {"product": ["name", "price"]},
        },
        schemas={"product_schema": AMAZON_PRODUCT_SCHEMA},
    ),
}


def get_crawler(name: str) -> CrawlerPack | None:
    """hub.py:64-68 ``CrawlerHub.get`` (registry is static data here)."""
    return CRAWLER_HUB.get(name)


def google_search_url(query: str, search_type: str = "text",
                      page_start: int = 1, page_length: int = 1) -> str:
    """The exact URL construction of GoogleSearchCrawler.run
    (crawler.py:25-30): text vs image search params, &start for later
    pages, &num for longer pages."""
    if search_type == "text":
        url = f"https://www.google.com/search?q={query}&gl=sg&hl=en"
    else:
        url = (f"https://www.google.com/search?q={query}&gl=sg&hl=en"
               "&tbs=qdr:d&udm=2")
    if page_start > 1:
        url = f"{url}&start={page_start * 10}"
    if page_length > 1:
        url = f"{url}&num={page_length}"
    return url


# ------------------------------------------------------------- fixtures

def serp_fields_of(doc_id: int) -> dict:
    """Every SERP item field as a pure function of doc_id (the recipe
    shared by the HTML builder, the engine probe and the oracle SQL)."""
    d = int(doc_id)
    q = f"q{d}"
    organic = [
        {"title": f"Result {i} for {q}",
         "link": f"https://r{i}.example.test/{q}",
         "snippet": f"Snippet {i} about {q}",
         "date": f"{i + 1} hours ago"}
        for i in range(3 + d % 3)
    ]
    stories = [
        {"title": f"Story {i}: {q}",
         "link": f"https://news{i}.example.test/{q}",
         "source": f"Newsroom {i % 4}",
         "date": f"{i + 1} days ago"}
        for i in range(d % 3)
    ]
    suggested = [{"query": f"{q} variant {i}"} for i in range(2 + d % 2)]
    return {"query": q, "organic": organic, "top_stories": stories,
            "suggested": suggested}


def serp_html(fields: dict) -> str:
    """Render the recipe into the markup the pack schemas target."""
    organic = "".join(
        f'<div class="g"><h3>{o["title"]}</h3>'
        f'<a class="result" href="{o["link"]}">{o["title"]}</a>'
        f'<div class="snippet">{o["snippet"]}</div>'
        f'<span class="date">{o["date"]}</span></div>'
        for o in fields["organic"]
    )
    stories = "".join(
        f'<div class="story"><a href="{s["link"]}">'
        f'<div class="title">{s["title"]}</div></a>'
        f'<span class="source">{s["source"]}</span>'
        f'<span class="when">{s["date"]}</span></div>'
        for s in fields["top_stories"]
    )
    suggested = "".join(
        f'<li class="suggested">{s["query"]}</li>'
        for s in fields["suggested"]
    )
    return (
        "<html><body>"
        f'<div id="search">{organic}</div>'
        f'<div id="top-stories">{stories}</div>'
        f'<div id="botstuff"><ul>{suggested}</ul></div>'
        "</body></html>"
    )


def product_fields_of(doc_id: int) -> dict:
    d = int(doc_id)
    return {
        "asin": f"B{d:09d}",
        "name": f"Product {d} Deluxe",
        "price": f"${d % 90 + 10}.99",
        "rating": f"{(d % 40 + 10) / 10:.1f} out of 5 stars",
        "review_count": f"{d % 1000 + 1} ratings",
    }


def product_html(fields: dict) -> str:
    return (
        "<html><body>"
        f'<div id="dp-container" data-asin="{fields["asin"]}">'
        f'<span id="productTitle">{fields["name"]}</span>'
        f'<div class="a-price"><span class="a-price">'
        f'<span class="a-offscreen">{fields["price"]}</span></span></div>'
        f'<span class="a-icon-alt">{fields["rating"]}</span>'
        f'<span id="acrCustomerReviewText">{fields["review_count"]}</span>'
        "</div></body></html>"
    )


# ----------------------------------------------------------- Spark-side

def run_pack(pages: DataFrame, pack_name: str, schema_key: str,
             html_col: str = "html", url_col: str = "url") -> DataFrame:
    """Run one schema of a hub pack over (url, html) rows — the batch
    analog of ``JsonCssExtractionStrategy(schema=schemas[key]).run``
    (crawler.py:60-64): one Arrow pass, items as (url, item_idx,
    item_json)."""
    pack = CRAWLER_HUB[pack_name]
    return extract_stage(pages, pack.schemas[schema_key], kind="css",
                         html_col=html_col, url_col=url_col)
