"""Markdown generation (G8) golden tests.

Citation semantics follow the reference exactly
(markdown_generation_strategy.py:79-142): first-seen numbering, ⟨n⟩
markers, title+text descriptions, base-url joining via fast_urljoin."""

import pytest

from crawl4ai_spark.operators.markdown import (
    convert_links_to_citations,
    fast_urljoin,
    generate_markdown,
    html_to_markdown,
    markdown_stage,
)

HTML = """
<html><body>
<h1>Title Here</h1>
<p>Intro with a <a href="/rel" title="Rel">relative link</a> and
<a href="https://abs.test/x">absolute</a>.</p>
<h2>Section</h2>
<ul><li>one</li><li><b>two</b> bold</li></ul>
<ol><li>first</li><li>second</li></ol>
<pre>code block
  indented</pre>
<blockquote><p>quoted text</p></blockquote>
<p>Repeat <a href="/rel" title="Rel">relative link</a> again.</p>
<img src="/img.png" alt="pic">
<hr>
</body></html>
"""


def test_fast_urljoin():
    # markdown_generation_strategy.py:14-23
    assert fast_urljoin("https://a.test/d/", "https://b.test/x") == "https://b.test/x"
    assert fast_urljoin("https://a.test/d", "/abs") == "https://a.test/d/abs"
    assert fast_urljoin("https://a.test/d/", "/abs") == "https://a.test/d/abs"
    assert fast_urljoin("https://a.test/d/", "rel") == "https://a.test/d/rel"


def test_html_to_markdown_blocks():
    md = html_to_markdown(HTML)
    assert "# Title Here" in md
    assert "## Section" in md
    assert "[relative link](/rel \"Rel\")" in md
    assert "[absolute](https://abs.test/x)" in md
    assert "* one" in md and "* **two** bold" in md
    assert "1. first" in md and "2. second" in md
    assert "```\ncode block\n  indented\n```" in md
    assert "> quoted text" in md
    assert "![pic](/img.png)" in md
    assert "* * *" in md


def test_citations_reference_semantics():
    md = "See [A](/a \"TitleA\") and [B](https://x.test/b) and [A2](/a \"TitleA\")."
    converted, refs = convert_links_to_citations(md, base_url="https://base.test")
    # first-seen numbering; same URL reuses its number
    assert "A⟨1⟩" in converted and "B⟨2⟩" in converted and "A2⟨1⟩" in converted
    assert "## References" in refs
    assert "⟨1⟩ https://base.test/a: TitleA - A\n" in refs
    assert "⟨2⟩ https://x.test/b: B\n" in refs


def test_image_citation_marker():
    md = "pic ![alt text](/i.png) end"
    converted, refs = convert_links_to_citations(md, "https://b.test")
    assert "![alt text⟨1⟩]" in converted
    assert "⟨1⟩ https://b.test/i.png: alt text\n" in refs


def test_generate_markdown_result():
    res = generate_markdown(HTML, base_url="https://page.test/dir/")
    assert res.raw_markdown.count("[relative link]") == 2
    assert "relative link⟨1⟩" in res.markdown_with_citations
    assert "⟨1⟩ https://page.test/dir/rel" in res.references_markdown
    # empty html → empty markdown, bare References header (the reference
    # emits the header unconditionally, :135-141), no crash
    empty = generate_markdown("", "https://x.test")
    assert empty.raw_markdown == ""
    assert empty.references_markdown == "\n\n## References\n\n"


def test_markdown_stage_distributed(spark):
    df = spark.createDataFrame(
        [(f"https://p.test/{i}/", HTML) for i in range(4)],
        "url string, html string",
    )
    rows = markdown_stage(df).collect()
    assert len(rows) == 4
    for r in rows:
        want = generate_markdown(HTML, r["url"])
        assert r["raw_markdown"] == want.raw_markdown
        assert r["markdown_with_citations"] == want.markdown_with_citations
        assert r["references_markdown"] == want.references_markdown
