"""JsonCss/JsonXPath extraction (G10) golden tests.

Expectations follow the reference extraction flow
(extraction_strategy.py:808-1001): base selector iteration, field types
text/attribute/html/regex/nested/list/nested_list/computed, transforms,
defaults, first-match single-field selection."""

import json

import pytest

from crawl4ai_spark.operators.extraction import (
    JsonCssExtractor,
    JsonXPathExtractor,
    css_select,
    extract_stage,
    parse_html,
    xpath_select,
)

HTML = """
<html><body>
<div id="catalog">
  <div class="product featured" data-sku="A-1">
    <h2 class="name"> Widget <b>Pro</b> </h2>
    <span class="price">$19.99</span>
    <a href="/p/a1" title="go">details</a>
    <ul class="tags"><li>new</li><li>sale</li></ul>
    <div class="meta"><span class="brand">Acme</span></div>
  </div>
  <div class="product" data-sku="B-2">
    <h2 class="name">Gadget</h2>
    <span class="price">$5.00</span>
    <a href="/p/b2">details</a>
    <ul class="tags"><li>used</li></ul>
  </div>
  <div class="not-a-product">skip me</div>
</div>
</body></html>
"""

SCHEMA = {
    "name": "products",
    "baseSelector": "div.product",
    "baseFields": [
        {"name": "sku", "type": "attribute", "attribute": "data-sku"},
    ],
    "fields": [
        {"name": "title", "selector": "h2.name", "type": "text"},
        {"name": "price", "selector": "span.price", "type": "regex",
         "pattern": r"\$([\d.]+)"},
        {"name": "link", "selector": "a", "type": "attribute",
         "attribute": "href"},
        {"name": "link_title", "selector": "a", "type": "attribute",
         "attribute": "title", "default": "none"},
        {"name": "tags", "selector": "ul.tags li", "type": "list",
         "fields": [{"name": "tag", "type": "text", "transform": "uppercase"}]},
        {"name": "brand", "selector": "div.meta", "type": "nested",
         "fields": [{"name": "name", "selector": "span.brand", "type": "text"}]},
        {"name": "price_float", "type": "computed",
         "expression": "float(price)"},
    ],
}


def test_css_select_engine():
    root = parse_html(HTML)
    assert len(css_select(root, "div.product")) == 2
    assert len(css_select(root, "div.product.featured")) == 1
    assert len(css_select(root, "#catalog > div.product")) == 2
    assert len(css_select(root, "div.product li")) == 3
    assert len(css_select(root, "[data-sku]")) == 2
    assert len(css_select(root, '[data-sku="B-2"]')) == 1
    assert len(css_select(root, "h2, span.price")) == 4
    # child combinator does not match grandchildren
    assert len(css_select(root, "#catalog > li")) == 0


def test_xpath_select_engine():
    root = parse_html(HTML)
    assert len(xpath_select(root, "//div[@class='product']")) == 1  # exact attr match
    assert len(xpath_select(root, "//span")) == 3
    assert len(xpath_select(root, "//ul/li")) == 3
    assert xpath_select(root, "//a/@href") == ["/p/a1", "/p/b2"]
    # positional predicates are per parent context (lxml: every h2 that is
    # its parent's first h2), not a global index into the flattened list
    assert xpath_select(root, "//h2[1]/text()") == ["Widget", "Gadget"]
    assert xpath_select(root, "//ul/li[1]/text()") == ["new", "used"]
    assert xpath_select(root, "//li[2]/text()") == ["sale"]
    assert len(xpath_select(root, "//div[@data-sku]")) == 2


def _check_items(items):
    assert len(items) == 2
    a, b = items
    assert a["sku"] == "A-1"
    assert a["title"] == "WidgetPro"  # get_text(strip=True) concatenation
    assert a["price"] == "19.99"
    assert a["link"] == "/p/a1" and a["link_title"] == "go"
    assert a["tags"] == [{"tag": "NEW"}, {"tag": "SALE"}]
    assert a["brand"] == {"name": "Acme"}
    assert a["price_float"] == pytest.approx(19.99)
    assert b["sku"] == "B-2"
    assert b["link_title"] == "none"  # default applied
    assert b["tags"] == [{"tag": "USED"}]
    assert b["brand"] == {}  # nested with no match → {} (reference :876)


def test_json_css_extractor():
    _check_items(JsonCssExtractor(SCHEMA).extract(HTML))


def test_json_xpath_extractor():
    schema = dict(SCHEMA)
    schema["baseSelector"] = "//div[@data-sku]"
    schema["fields"] = [
        {"name": "title", "selector": "//h2", "type": "text"},
        {"name": "link", "selector": "//a", "type": "attribute",
         "attribute": "href"},
    ]
    items = JsonXPathExtractor(schema).extract(HTML)
    assert [i["link"] for i in items] == ["/p/a1", "/p/b2"]
    assert items[0]["title"] == "WidgetPro"


def test_html_field_roundtrip():
    items = JsonCssExtractor(
        {"baseSelector": "div.meta", "fields": [
            {"name": "raw", "type": "html"}]}
    ).extract(HTML)
    assert items == [{"raw": '<div class="meta"><span class="brand">Acme</span></div>'}]


def test_extract_stage_distributed(spark):
    df = spark.createDataFrame(
        [(f"https://x.test/{i}", HTML) for i in range(6)],
        "url string, html string",
    )
    out = extract_stage(df, SCHEMA, kind="css")
    rows = out.collect()
    assert len(rows) == 12  # 2 items × 6 pages
    item = json.loads(
        next(r["item_json"] for r in rows if r["item_idx"] == 0)
    )
    assert item["sku"] == "A-1" and item["price_float"] == pytest.approx(19.99)


def test_optimize_html_truncation():
    # reference utils.py:2759-2781 semantics, hand-derived expectations
    from crawl4ai_spark.operators.extraction import optimize_html, truncate_str

    assert truncate_str("abcdef", 4) == "abcd..."
    assert truncate_str("abcd", 4) == "abcd"
    long = "x" * 250
    h = (f'<html><body><div data-x="{long}" id="k">{long}<p>short</p>'
         f'tail {long}</div></body></html>')
    out = optimize_html(h, threshold=200)
    assert f'data-x="{"x" * 200}..."' in out         # attr truncated
    assert 'id="k"' in out                            # short attr kept
    assert f'>{"x" * 200}...<p>' in out               # .text truncated
    assert "tail " + "x" * 195 + "..." in out         # tail segment too
    assert out.startswith("<html><body><div")
    # top-level text outside any tag survives (and truncates)
    assert optimize_html("plain text only", 5) == "plain..."
    assert optimize_html("", 5) == ""


def test_to_html_reescapes_entities():
    """Entity-bearing markup round-trips to VALID markup: the parser
    decodes &quot;/&amp;, the serializer re-escapes like lxml tostring
    (round-3 advice: data-x="a&quot;b" used to come back as the invalid
    data-x="a"b")."""
    from crawl4ai_spark.operators.extraction import optimize_html, parse_html

    h = '<div data-x="a&quot;b" data-y="x&amp;y">T&amp;C &lt;sale&gt;</div>'
    out = parse_html(h).children[0].to_html()
    assert 'data-x="a&quot;b"' in out
    assert 'data-y="x&amp;y"' in out
    assert "T&amp;C &lt;sale&gt;" in out
    # re-parsing the serialization yields the same decoded values (stable)
    again = parse_html(out).children[0]
    assert again.attrs["data-x"] == 'a"b'
    assert again.get_text() == "T&C <sale>"
    assert again.to_html() == out
    # optimize_html inherits the escaping
    assert 'a&quot;b' in optimize_html(h, threshold=200)
