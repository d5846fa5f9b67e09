"""Scrape stage (G1/G3/G7) golden tests on raw-HTML fixtures.

Expectations derived from the reference semantics
(content_scraping_strategy.py:459-536, utils.py:1465-1583): removed tags,
comment handling, link normalization (C1 urljoin), internal/external
classification (C4/C5 base domains), first-wins dedup, exclusion flags,
word-count threshold, head metadata extraction.
"""

from __future__ import annotations

import pytest

from crawl4ai_spark.operators.scrape import (
    get_base_domain_py,
    scrape_html,
    scrape_stage,
)

PAGE_URL = "https://www.example.com/dir/page.html"

HTML = """<html><head>
<title> My  Page </title>
<meta name="description" content="A test page">
<meta property="og:image" content="https://img.example.com/x.png">
<meta name="description" content="duplicate ignored">
<script>var x = "ignore me";</script>
<style>.c { color: red }</style>
</head><body>
<!-- a comment -->
<p>Hello world this is content</p>
<noscript>no js</noscript>
<a href="/about">About us</a>
<a href="about">Relative sibling</a>
<a href="https://other.org/page">External <b>link</b></a>
<a href="/about">Duplicate first wins</a>
<a href="https://sub.example.com/deep" title="Sub">Subdomain</a>
<a href="">empty</a>
<p>tiny</p>
</body></html>"""


def test_base_domain():
    # utils.py:2274-2322 truth table
    assert get_base_domain_py("https://www.example.com/x") == "example.com"
    assert get_base_domain_py("https://a.b.co.uk/x") == "b.co.uk"
    assert get_base_domain_py("http://sub.example.com:8080/") == "example.com"
    assert get_base_domain_py("not a url") == ""


def test_scrape_links_and_meta():
    res = scrape_html(HTML, PAGE_URL)
    assert res["title"] == "My  Page"
    # first meta wins (setdefault)
    assert res["meta"]["description"] == "A test page"
    assert res["meta"]["og:image"] == "https://img.example.com/x.png"
    # script/style/noscript/comment content removed from text
    assert "ignore me" not in res["cleaned_text"]
    assert "color: red" not in res["cleaned_text"]
    assert "no js" not in res["cleaned_text"]
    assert "a comment" not in res["cleaned_text"]
    assert "Hello world this is content" in res["cleaned_text"]

    links = {l["href"]: l for l in res["links"]}
    # C1 urljoin semantics
    assert "https://www.example.com/about" in links
    assert "https://www.example.com/dir/about" in links
    assert "https://other.org/page" in links
    # subdomain of same base domain → internal
    sub = links["https://sub.example.com/deep"]
    assert sub["is_internal"] and sub["title"] == "Sub"
    ext = links["https://other.org/page"]
    assert not ext["is_internal"]
    assert ext["base_domain"] == "other.org"
    assert ext["text"] == "External link"
    # first-wins dedup: text of /about is from the FIRST anchor
    assert links["https://www.example.com/about"]["text"] == "About us"
    # empty href skipped
    assert len(links) == 4


def test_exclusion_flags():
    res = scrape_html(HTML, PAGE_URL, exclude_external_links=True)
    assert all(l["is_internal"] for l in res["links"])
    res = scrape_html(HTML, PAGE_URL, exclude_internal_links=True)
    assert all(not l["is_internal"] for l in res["links"])
    res = scrape_html(HTML, PAGE_URL, exclude_domains=["other.org"])
    assert "https://other.org/page" not in {l["href"] for l in res["links"]}


def test_social_media_exclusion():
    html = '<a href="https://twitter.com/x">t</a><a href="/in">i</a>'
    res = scrape_html(html, PAGE_URL, exclude_social_media_links=True)
    hrefs = {l["href"] for l in res["links"]}
    assert "https://twitter.com/x" not in hrefs
    assert "https://www.example.com/in" in hrefs


def test_word_count_threshold():
    res = scrape_html(HTML, PAGE_URL, word_count_threshold=3)
    assert "tiny" not in res["cleaned_text"]  # 1 word < 3
    assert "Hello world this is content" in res["cleaned_text"]


def test_excluded_tags():
    html = "<div><nav>menu stuff</nav><p>real body text</p></div>"
    res = scrape_html(html, PAGE_URL, excluded_tags=["nav"])
    assert "menu stuff" not in res["cleaned_text"]
    assert "real body text" in res["cleaned_text"]


def test_scrape_stage_distributed(spark):
    pages = spark.createDataFrame(
        [(PAGE_URL, HTML), ("https://b.test/", "<title>B</title><a href='/x'>x</a>")],
        "url string, html string",
    )
    rows = {r["url"]: r for r in scrape_stage(pages).collect()}
    assert rows[PAGE_URL]["title"] == "My  Page"
    assert len(rows[PAGE_URL]["links"]) == 4
    assert rows["https://b.test/"]["links"][0]["href"] == "https://b.test/x"
    # schema stability: map + array<struct> columns round-trip through Arrow
    assert rows[PAGE_URL]["meta"]["description"] == "A test page"


def test_body_meta_not_collected():
    # reference extract_metadata reads soup.head only (utils.py:1465-1583)
    html = (
        "<html><head><meta name='description' content='head-desc'></head>"
        "<body><meta name='injected' content='nope'>"
        "<p>body text here</p></body></html>"
    )
    res = scrape_html(html, PAGE_URL)
    assert res["meta"] == {"description": "head-desc"}


def test_unclosed_excluded_tag_recovers():
    # an unclosed excluded <aside> must not swallow the rest of the page:
    # the closing ancestor </div> pops the dangling skip-stack entry
    html = (
        "<html><body><div><aside class='sidebar'>junk <p>more junk"
        "</div><p>kept text after</p></body></html>"
    )
    res = scrape_html(html, PAGE_URL, excluded_tags=["aside"])
    assert "junk" not in res["cleaned_text"]
    assert "kept text after" in res["cleaned_text"]


def test_unclosed_excluded_tag_resets_at_body_end():
    html = "<html><body><nav>menu stuff <p>x</body></html>"
    res = scrape_html(html, PAGE_URL, excluded_tags=["nav"])
    assert "menu" not in res["cleaned_text"]
