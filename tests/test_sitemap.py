"""Sitemap ingestion: urlset/sitemapindex parsing, error isolation,
robots Sitemap-directive discovery.  Expectations hand-derived."""

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.test/p1</loc><lastmod>2024-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://a.test/p2</loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.test/sm1.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>https://a.test/sm2.xml</loc></sitemap>
</sitemapindex>"""

BARE = "<urlset><url><loc>https://b.test/x</loc></url></urlset>"


def test_parse_sitemap_pure():
    from crawl4ai_spark.sources.sitemap import parse_sitemap

    got = parse_sitemap(URLSET)
    assert len(got) == 2  # loc-less entry dropped
    assert got[0] == {"kind": "url", "loc": "https://a.test/p1",
                      "lastmod": "2024-01-02", "changefreq": "daily",
                      "priority": "0.8", "caption": None, "title": None,
                      "parent_loc": None, "error": None}
    assert got[1]["loc"] == "https://a.test/p2" and got[1]["lastmod"] is None

    idx = parse_sitemap(INDEX)
    assert [e["kind"] for e in idx] == ["sitemap", "sitemap"]
    assert idx[0]["lastmod"] == "2024-02-01"

    # namespace-less documents parse too
    assert parse_sitemap(BARE)[0]["loc"] == "https://b.test/x"


def test_parse_sitemap_image_extension():
    from crawl4ai_spark.sources.sitemap import parse_sitemap

    xml = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
        xmlns:image="http://www.google.com/schemas/sitemap-image/1.1">
      <url><loc>https://a.test/p1</loc>
        <image:image><image:loc>https://a.test/i1.jpg</image:loc>
          <image:caption>first cap</image:caption>
          <image:title>t1</image:title></image:image>
        <image:image><image:loc>https://a.test/i2.jpg</image:loc></image:image>
        <image:image><image:caption>loc-less, dropped</image:caption></image:image>
      </url>
      <url><loc>https://a.test/p2</loc></url>
    </urlset>"""
    got = parse_sitemap(xml)
    kinds = [e["kind"] for e in got]
    assert kinds == ["url", "image", "image", "url"]
    assert got[1]["loc"] == "https://a.test/i1.jpg"
    assert got[1]["caption"] == "first cap" and got[1]["title"] == "t1"
    assert got[1]["parent_loc"] == "https://a.test/p1"
    assert got[2]["loc"] == "https://a.test/i2.jpg"
    assert got[2]["caption"] is None
    # image blocks never attach to index children
    from crawl4ai_spark.sources.sitemap import parse_sitemap as _p
    assert all(e["kind"] != "image" for e in _p(INDEX))


def test_sitemap_entries_stage_error_isolation(spark):
    from crawl4ai_spark.sources.sitemap import sitemap_entries_stage

    docs = spark.createDataFrame(
        [("https://a.test/sitemap.xml", URLSET),
         ("https://a.test/index.xml", INDEX),
         ("https://bad.test/sitemap.xml", "<<<not xml")],
        ["sitemap_url", "xml"],
    )
    rows = sitemap_entries_stage(docs).collect()
    ok = [r for r in rows if r["error"] is None]
    bad = [r for r in rows if r["error"] is not None]
    assert len(ok) == 4 and len(bad) == 1
    assert bad[0]["sitemap_url"] == "https://bad.test/sitemap.xml"
    assert {r["kind"] for r in ok} == {"url", "sitemap"}


def test_robots_sitemaps_stage(spark):
    from crawl4ai_spark.sources.sitemap import robots_sitemaps_stage

    rules = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /x/\n"
                    "Sitemap: https://a.test/sitemap.xml\n"
                    "Sitemap: https://a.test/news.xml\n"),
         ("b.test", "User-agent: *\nAllow: /\n"),   # no directive
         ("c.test", None)],                          # missing rules
        ["host", "rules"],
    )
    got = sorted((r["host"], r["sitemap_url"])
                 for r in robots_sitemaps_stage(rules).collect())
    assert got == [("a.test", "https://a.test/news.xml"),
                   ("a.test", "https://a.test/sitemap.xml")]
