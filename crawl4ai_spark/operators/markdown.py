"""Markdown generation (G8, SURVEY §2.7): cleaned HTML → markdown with
link citations, as an Arrow stage.

Reference: ``DefaultMarkdownGenerator``
(crawl4ai/markdown_generation_strategy.py:54-256) — html2text conversion
(body_width=0, single_line_break, mark_code) followed by
``convert_links_to_citations`` (:79-142): links become ``text⟨n⟩`` markers
with a ``## References`` block, URLs joined against the page base via
``fast_urljoin`` (:14-23).

The html2text dependency is unavailable offline, so the converter here is a
compact stdlib generator over the same element tree the extraction module
builds (operators/extraction.py): headings, paragraphs, emphasis, inline
code and fenced pre blocks, links, images, ordered/unordered lists,
blockquotes and rules — the subset html2text emits for cleaned crawl HTML.
``convert_links_to_citations`` itself is a faithful semantic port of the
reference function (it operates on markdown text, not on HTML, so its
behavior is library-independent).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame

from .extraction import Node, parse_html

# markdown_generation_strategy.py:12
LINK_PATTERN = re.compile(r'!?\[([^\]]+)\]\(([^)]+?)(?:\s+"([^"]*)")?\)')

_SKIP = {"script", "style", "noscript", "template", "head"}
_INLINE_WRAP = {"strong": "**", "b": "**", "em": "*", "i": "*", "code": "`"}
_HEADINGS = {f"h{i}": "#" * i for i in range(1, 7)}


def fast_urljoin(base: str, url: str) -> str:
    """markdown_generation_strategy.py:14-23 verbatim."""
    if url.startswith(("http://", "https://", "mailto:", "//")):
        return url
    if url.startswith("/"):
        if base.endswith("/"):
            return base[:-1] + url
        return base + url
    return urljoin(base, url)


def _inline(n: Node) -> str:
    """Render a node's content as inline markdown."""
    slots: dict[int, list[str]] = {}
    for slot, t in n.texts:
        slots.setdefault(slot, []).append(t)
    parts: list[str] = []
    for i in range(len(n.children) + 1):
        for t in slots.get(i, []):
            parts.append(re.sub(r"\s+", " ", t))
        if i < len(n.children):
            c = n.children[i]
            if c.tag in _SKIP:
                continue
            if c.tag in _INLINE_WRAP:
                inner = _inline(c).strip()
                w = _INLINE_WRAP[c.tag]
                parts.append(f"{w}{inner}{w}" if inner else "")
            elif c.tag == "a":
                inner = _inline(c).strip()
                href = c.attrs.get("href", "")
                title = c.attrs.get("title")
                if href:
                    t = f' "{title}"' if title else ""
                    parts.append(f"[{inner}]({href}{t})")
                else:
                    parts.append(inner)
            elif c.tag == "img":
                alt = c.attrs.get("alt", "") or "image"
                src = c.attrs.get("src", "")
                parts.append(f"![{alt}]({src})" if src else "")
            elif c.tag == "br":
                parts.append("\n")
            else:
                parts.append(_inline(c))
    return "".join(parts)


_INLINEISH = set(_INLINE_WRAP) | {"a", "img", "br", "span", "small", "sup",
                                  "sub", "u", "abbr", "time", "mark"}


def _blocks(n: Node, out: list[str]) -> None:
    """Walk a container's children in document order, accumulating loose
    text + inline elements into implicit paragraphs, flushing at every
    block child."""
    slots: dict[int, list[str]] = {}
    for slot, t in n.texts:
        slots.setdefault(slot, []).append(t)
    pending: list[str] = []

    def flush() -> None:
        txt = "".join(pending).strip()
        pending.clear()
        if txt:
            out.append(txt)

    for i in range(len(n.children) + 1):
        for t in slots.get(i, []):
            pending.append(re.sub(r"\s+", " ", t))
        if i >= len(n.children):
            continue
        c = n.children[i]
        tag = c.tag
        if tag in _SKIP:
            continue
        if tag in _INLINEISH:
            wrap = Node("w", {}, None)
            wrap.children = [c]
            pending.append(_inline(wrap))
            continue
        flush()
        if tag in _HEADINGS:
            out.append(f"{_HEADINGS[tag]} {_inline(c).strip()}")
        elif tag == "p":
            txt = _inline(c).strip()
            if txt:
                out.append(txt)
        elif tag == "pre":
            out.append("```\n" + c.get_text(strip=False).strip("\n") + "\n```")
        elif tag == "blockquote":
            sub: list[str] = []
            _blocks(c, sub)
            body = "\n\n".join(x for x in sub if x)
            if body:
                out.append("\n".join("> " + ln for ln in body.splitlines()))
        elif tag in ("ul", "ol"):
            items: list[str] = []
            idx = 1
            for li in c.children:
                if li.tag != "li":
                    continue
                marker = "* " if tag == "ul" else f"{idx}. "
                items.append(marker + _inline(li).strip())
                idx += 1
            if items:
                out.append("\n".join(items))
        elif tag == "hr":
            out.append("* * *")
        else:
            # generic container (div/section/article/table/…): recurse
            _blocks(c, out)
    flush()


def html_to_markdown(html: str, base_url: str = "") -> str:
    root = parse_html(html)
    out: list[str] = []
    _blocks(root, out)
    md = "\n\n".join(x for x in out if x.strip())
    return md + "\n" if md else ""


def convert_links_to_citations(markdown: str, base_url: str = "") -> tuple[str, str]:
    """Semantic port of markdown_generation_strategy.py:79-142: links →
    ``text⟨n⟩`` markers + a ``## References`` block, first-seen numbering,
    relative URLs joined against base_url."""
    link_map: dict[str, tuple[int, str]] = {}
    url_cache: dict[str, str] = {}
    parts: list[str] = []
    last_end = 0
    counter = 1
    for match in LINK_PATTERN.finditer(markdown):
        parts.append(markdown[last_end: match.start()])
        text, url, title = match.groups()
        if base_url and not url.startswith(("http://", "https://", "mailto:")):
            if url not in url_cache:
                url_cache[url] = fast_urljoin(base_url, url)
            url = url_cache[url]
        if url not in link_map:
            desc = []
            if title:
                desc.append(title)
            if text and text != title:
                desc.append(text)
            link_map[url] = (counter, ": " + " - ".join(desc) if desc else "")
            counter += 1
        num = link_map[url][0]
        parts.append(
            f"{text}⟨{num}⟩"
            if not match.group(0).startswith("!")
            else f"![{text}⟨{num}⟩]"
        )
        last_end = match.end()
    parts.append(markdown[last_end:])
    converted = "".join(parts)
    references = ["\n\n## References\n\n"]
    references.extend(
        f"⟨{num}⟩ {url}{desc}\n"
        for url, (num, desc) in sorted(link_map.items(), key=lambda x: x[1][0])
    )
    return converted, "".join(references)


@dataclass
class MarkdownResult:
    """models.MarkdownGenerationResult twin."""

    raw_markdown: str
    markdown_with_citations: str
    references_markdown: str
    fit_markdown: str = ""
    fit_html: str = ""


def generate_markdown(cleaned_html: str, base_url: str = "",
                      citations: bool = True) -> MarkdownResult:
    """DefaultMarkdownGenerator.generate_markdown (:144-233), sans the
    html2text knobs (fixed sane defaults) and the optional fit filter
    (compose with operators/content_filter externally)."""
    raw = html_to_markdown(cleaned_html or "", base_url)
    with_cit, refs = (raw, "")
    if citations:
        with_cit, refs = convert_links_to_citations(raw, base_url)
    return MarkdownResult(raw, with_cit, refs)


MARKDOWN_SCHEMA = (
    "url string, raw_markdown string, markdown_with_citations string, "
    "references_markdown string"
)


def markdown_stage(pages: DataFrame, html_col: str = "html",
                   url_col: str = "url", citations: bool = True) -> DataFrame:
    """Arrow pass: (url, html) → markdown columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                res = generate_markdown(
                    getattr(r, html_col), getattr(r, url_col), citations
                )
                rows.append(
                    {"url": getattr(r, url_col),
                     "raw_markdown": res.raw_markdown,
                     "markdown_with_citations": res.markdown_with_citations,
                     "references_markdown": res.references_markdown}
                )
            yield pd.DataFrame(
                rows, columns=["url", "raw_markdown",
                               "markdown_with_citations",
                               "references_markdown"],
            )

    return pages.select(url_col, html_col).mapInPandas(run, MARKDOWN_SCHEMA)
