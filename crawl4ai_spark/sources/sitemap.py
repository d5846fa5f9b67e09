"""Sitemap ingestion: seed the frontier from sitemap.xml documents.

Production crawls seed from sitemaps, not hand lists: robots.txt advertises
them (``Sitemap:`` directives — RobotFileParser.site_maps()), a sitemap
index fans out to child sitemaps, and urlset leaves carry
(loc, lastmod, changefreq, priority) per URL (sitemaps.org protocol 0.9).
The reference crawls only explicit seed lists; this module adds the
discovery path as engine sources:

* ``robots_sitemaps_stage`` — extract the Sitemap directives from a
  per-host robots rules dimension (same stdlib parser as the P8 gate, so
  directive semantics can't diverge), one Arrow pass, zero shuffle.
* ``sitemap_entries_stage`` — parse sitemap XML documents (urlset AND
  sitemapindex) into one row per <url>/<sitemap> entry with per-document
  error isolation: a malformed document yields a single error row instead
  of failing the stage (the WARC-reader contract, sources/warc.py).

Scale shape: both stages are ``mapInPandas`` over already-distributed
rows (per-host rules / per-fetched-sitemap bodies) — per-document
parallelism, no shuffle introduced.  Entries feed ``plans/frontier.py``
as seeds: canonicalize → validity → seen anti-join, the normal path.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator
from urllib.robotparser import RobotFileParser

import pandas as pd
from pyspark.sql import DataFrame

SITEMAP_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"

ENTRY_FIELDS = ("kind", "loc", "lastmod", "changefreq", "priority",
                "caption", "title", "parent_loc", "error")


def parse_sitemap(xml_text: str) -> list[dict]:
    """One sitemap document → entry dicts.  ``kind`` is 'url' for urlset
    leaves, 'sitemap' for index children (callers enqueue those for
    another fetch round), and 'image' for Google image-sitemap extension
    blocks (``<image:image>`` with loc/caption/title — the sitemap
    surface an image crawl seeds from; Google's sitemap-image/1.1
    schema).  Image rows follow their parent url row in document order
    and carry ``parent_loc``; namespaced and namespace-less documents
    both parse (real-world sitemaps frequently omit the xmlns)."""
    root = ET.fromstring(xml_text)

    def strip(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def blank(kind: str) -> dict:
        return {"kind": kind, "loc": None, "lastmod": None,
                "changefreq": None, "priority": None, "caption": None,
                "title": None, "parent_loc": None, "error": None}

    kind = "url" if strip(root.tag) == "urlset" else "sitemap"
    out: list[dict] = []
    for child in root:
        if strip(child.tag) not in ("url", "sitemap"):
            continue
        row = blank(kind)
        images: list[dict] = []
        for f in child:
            name = strip(f.tag)
            if name in ("loc", "lastmod", "changefreq", "priority"):
                row[name] = (f.text or "").strip() or None
            elif name == "image" and kind == "url":
                img = blank("image")
                for g in f:
                    gname = strip(g.tag)
                    if gname in ("loc", "caption", "title"):
                        img[gname] = (g.text or "").strip() or None
                if img["loc"]:
                    images.append(img)
        if row["loc"]:
            out.append(row)
            for img in images:
                img["parent_loc"] = row["loc"]
                out.append(img)
    return out


def sitemap_entries_stage(docs: DataFrame, xml_col: str = "xml",
                          url_col: str = "sitemap_url") -> DataFrame:
    """(sitemap_url, xml) rows → one row per sitemap entry:
    ``(sitemap_url, kind, loc, lastmod, changefreq, priority, error)``.
    Malformed XML yields one error row for that document (never fails the
    stage); priority stays a string — the protocol allows junk there and
    the frontier scorer decides how to coerce it."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                src = getattr(r, url_col)
                try:
                    for e in parse_sitemap(getattr(r, xml_col) or ""):
                        rows.append({"sitemap_url": src, **e})
                except Exception as ex:
                    rows.append({
                        "sitemap_url": src, "kind": None, "loc": None,
                        "lastmod": None, "changefreq": None,
                        "priority": None, "caption": None, "title": None,
                        "parent_loc": None, "error": str(ex)[:200],
                    })
            yield pd.DataFrame(
                rows, columns=["sitemap_url", *ENTRY_FIELDS])

    return docs.select(url_col, xml_col).mapInPandas(
        run,
        "sitemap_url string, kind string, loc string, lastmod string, "
        "changefreq string, priority string, caption string, title string, "
        "parent_loc string, error string",
    )


def robots_sitemaps_stage(rules_df: DataFrame, rules_col: str = "rules",
                          host_col: str = "host") -> DataFrame:
    """Per-host robots rules → one row per advertised sitemap URL
    (``Sitemap:`` directives via RobotFileParser.site_maps(); hosts with
    no directive, missing rules, or unparseable rules emit nothing —
    sitemap discovery is best-effort, unlike the allow-on-error gate)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                rules = getattr(r, rules_col)
                if not rules:
                    continue
                rp = RobotFileParser()
                try:
                    rp.parse(rules.splitlines())
                    for sm in (rp.site_maps() or []):
                        rows.append({"host": getattr(r, host_col),
                                     "sitemap_url": sm})
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=["host", "sitemap_url"])

    return rules_df.select(host_col, rules_col).mapInPandas(
        run, "host string, sitemap_url string")
