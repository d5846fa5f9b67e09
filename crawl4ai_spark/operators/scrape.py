"""Scrape stage (G1/G3/G7, SURVEY §2.7): HTML → cleaned text + links + head
metadata, as one Arrow ``mapInPandas`` pass.

Reference: WebScrapingStrategy (crawl4ai/content_scraping_strategy.py):
  - G1 clean: script/style/link/meta/noscript decomposed (:469-471),
    comments dropped (:459-462), caller-supplied ``excluded_tags``
    (:726-743), ``word_count_threshold`` gate on text blocks (:663-669);
  - G3 links: every ``<a href>`` → ``normalize_url(href, page_url)`` (C1,
    utils.py:2148-2159), classified internal/external by base-domain
    inequality (C5), fields (href, text, title, base_domain), FIRST
    occurrence per normalized href wins (:528-536), exclusion flags
    ``exclude_external_links`` / ``exclude_internal_links`` /
    ``exclude_domains`` (:506-536);
  - G7 metadata: <title> and <meta name=/property= content> pairs from the
    head (utils.py:1465-1583 extract_metadata).

The reference parses with BeautifulSoup/lxml; this sandbox has neither, so
the parser is the stdlib ``html.parser`` state machine — same observable
semantics on well-formed HTML, exercised by golden tests.  At scale each
Arrow batch parses ~10k pages per task with zero per-row Python crossings.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.canonical import normalize_url

REMOVED_TAGS = {"script", "style", "link", "meta", "noscript"}  # :469-471
VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}

# config.py:66-76 — social-media domain exclusion list (P9)
SOCIAL_MEDIA_DOMAINS = [
    "facebook.com", "twitter.com", "x.com", "linkedin.com", "instagram.com",
    "pinterest.com", "tiktok.com", "snapchat.com", "reddit.com",
]


def get_base_domain_py(url: str) -> str:
    """utils.py:2274-2322 (C4), driver/UDF-side twin of urlparts.base_domain."""
    try:
        netloc = url.split("://", 1)[1].split("/", 1)[0].split("?", 1)[0]
    except IndexError:
        return ""
    d = netloc.lower().rsplit(":", 1)[0] if ":" in netloc else netloc.lower()
    if d.startswith("www."):
        d = d[4:]
    if not d:
        return ""
    parts = d.split(".")
    second_level = {"co", "com", "org", "gov", "edu", "net", "mil", "int",
                    "ac", "ad", "ae", "af", "ag"}
    if len(parts) > 2 and parts[-2] in second_level:
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


@dataclass
class _Page:
    title: str = ""
    meta: dict = field(default_factory=dict)
    text_parts: list = field(default_factory=list)
    internal: dict = field(default_factory=dict)
    external: dict = field(default_factory=dict)


class _Scraper(HTMLParser):
    def __init__(self, page_url: str, excluded_tags: set[str],
                 exclude_external_links: bool, exclude_internal_links: bool,
                 exclude_domains: set[str]):
        super().__init__(convert_charrefs=True)
        self.page_url = page_url
        self.base_domain = get_base_domain_py(page_url)
        self.excluded_tags = excluded_tags
        self.excl_ext = exclude_external_links
        self.excl_int = exclude_internal_links
        self.excl_domains = exclude_domains
        self.page = _Page()
        self._skip_depth = 0          # inside removed/excluded subtree
        # full open-element stack of (tag, is_removed) — an endtag closes
        # the nearest matching open tag, implicitly closing everything
        # above it (BeautifulSoup's tree-builder recovery), so an unclosed
        # removed/excluded tag cannot swallow the rest of the page.
        self._open: list[tuple[str, bool]] = []
        self._in_title = False
        self._head_done = False       # head metadata scope closed
        self._anchor: dict | None = None
        self._anchor_text: list[str] = []

    # ------------------------------------------------------------- tags
    def handle_starttag(self, tag, attrs):
        # duplicate attributes: FIRST occurrence wins (HTML5 tree builder
        # semantics, what bs4/lxml recovery yields; dict(attrs) kept last)
        a: dict = {}
        for k, v in attrs:
            a.setdefault(k, v)
        if tag == "body":
            self._head_done = True
        if tag == "meta":
            # G7: <meta name=... content=...> / property= (og:/twitter:) —
            # HEAD scope only: the reference's extract_metadata reads
            # soup.head (utils.py:1465-1583); body-embedded meta tags in
            # scraped fragments must not add keys.
            if not self._head_done and not self._skip_depth:
                key = a.get("name") or a.get("property")
                if key and "content" in a:
                    self.page.meta.setdefault(key, a["content"] or "")
            return
        removed = tag in REMOVED_TAGS or tag in self.excluded_tags
        if tag not in VOID_TAGS:
            self._open.append((tag, removed))
            if removed:
                self._skip_depth += 1
        if removed or self._skip_depth:
            return
        if tag == "title":
            self._in_title = True
        elif tag == "a":
            # a new <a> implicitly closes an unclosed previous one (HTML5
            # "in body" insertion mode; bs4/lxml recovery keeps BOTH links,
            # the old state machine silently dropped the first)
            if self._anchor is not None:
                self._emit_link()
            href = (a.get("href") or "").strip()
            if href:
                self._anchor = {"href": href, "title": (a.get("title") or "").strip()}
                self._anchor_text = []

    def handle_endtag(self, tag):
        if tag == "head":
            self._head_done = True
        # find the nearest matching open element; pop it and everything
        # opened after it (implicit closes), unwinding skip state as the
        # removed entries pop.
        for i in range(len(self._open) - 1, -1, -1):
            if self._open[i][0] == tag:
                closed_removed = self._open[i][1]
                for t, removed in reversed(self._open[i:]):
                    if removed:
                        self._skip_depth -= 1
                    elif t == "a" and not self._skip_depth and self._anchor is not None:
                        self._emit_link()
                    elif t == "title":
                        self._in_title = False
                del self._open[i:]
                if closed_removed or self._skip_depth:
                    return
                if tag == "title":
                    self._in_title = False
                return
        # stray endtag with no matching open element
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = False
        elif tag == "a" and self._anchor is not None:
            self._emit_link()

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.page.title += data
            return
        if data.strip():
            self.page.text_parts.append(data.strip())
            if self._anchor is not None:
                self._anchor_text.append(data.strip())

    # ------------------------------------------------------------ links
    def _emit_link(self):
        a, self._anchor = self._anchor, None
        try:
            normalized = normalize_url(a["href"], self.page_url)
        except ValueError:
            return  # :488-492 invalid URL → drop
        link_base = get_base_domain_py(normalized)
        is_external = link_base != self.base_domain  # C5
        if is_external:
            if self.excl_ext:
                return
            if self.excl_domains and link_base in self.excl_domains:
                return
            bucket = self.page.external
            base = link_base
        else:
            if self.excl_int:
                return
            bucket = self.page.internal
            base = self.base_domain
        if normalized not in bucket:  # first wins (:528-536)
            bucket[normalized] = {
                "href": normalized,
                "text": " ".join(self._anchor_text).strip(),
                "title": a["title"],
                "base_domain": base,
                "is_internal": not is_external,
            }


def scrape_html(html: str, page_url: str, excluded_tags: list[str] | None = None,
                word_count_threshold: int = 1,
                exclude_external_links: bool = False,
                exclude_internal_links: bool = False,
                exclude_domains: list[str] | None = None,
                exclude_social_media_links: bool = False) -> dict:
    """Parse one page; returns title/meta/cleaned_text/links."""
    excl = set(exclude_domains or [])
    if exclude_social_media_links:
        excl |= set(SOCIAL_MEDIA_DOMAINS)
    s = _Scraper(
        page_url, set(excluded_tags or []), exclude_external_links,
        exclude_internal_links, excl,
    )
    try:
        s.feed(html or "")
        s.close()
    except Exception:
        pass
    # word_count_threshold gate on text blocks (:663-669)
    parts = [
        p for p in s.page.text_parts
        if len(p.split()) >= word_count_threshold
    ]
    return {
        "title": s.page.title.strip(),
        "meta": s.page.meta,
        "cleaned_text": " ".join(parts),
        "links": list(s.page.internal.values()) + list(s.page.external.values()),
    }


SCRAPE_SCHEMA = (
    "url string, title string, meta map<string,string>, cleaned_text string, "
    "links array<struct<href:string,text:string,title:string,"
    "base_domain:string,is_internal:boolean>>"
)


def scrape_stage(pages: DataFrame, html_col: str = "html", url_col: str = "url",
                 **scrape_kwargs) -> DataFrame:
    """Arrow scrape pass over (url, html) rows → SCRAPE_SCHEMA rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for r in b.itertuples():
                res = scrape_html(getattr(r, html_col), getattr(r, url_col),
                                  **scrape_kwargs)
                out.append(
                    {
                        "url": getattr(r, url_col),
                        "title": res["title"],
                        "meta": res["meta"],
                        "cleaned_text": res["cleaned_text"],
                        "links": [
                            (l["href"], l["text"], l["title"], l["base_domain"],
                             l["is_internal"])
                            for l in res["links"]
                        ],
                    }
                )
            yield pd.DataFrame(out, columns=["url", "title", "meta",
                                             "cleaned_text", "links"])

    return pages.select(url_col, html_col).mapInPandas(run, SCRAPE_SCHEMA)
