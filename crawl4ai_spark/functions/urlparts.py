"""URL-part extraction as pure Catalyst column expressions (no Python).

Reproduces the reference's assorted hand-rolled extractors:
  - ``get_base_domain``          crawl4ai/utils.py:2274-2322  (C4)
  - ``is_external_url``          crawl4ai/utils.py:2325+      (C5)
  - DomainFilter._extract_domain crawl4ai/deep_crawling/filters.py:437-441
  - DomainAuthorityScorer._extract_domain scorers.py:455-494 (strips port)
  - ContentTypeFilter._extract_extension filters.py:335-354
  - ContentTypeScorer._quick_extension   scorers.py:272-301
  - PathDepthScorer._quick_depth         scorers.py:196-245

All stay inside whole-stage codegen (string/regex intrinsics), so the
100 TB hot path never leaves the JVM for these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Second-level labels that force keeping 3 labels (utils.py:2300-2316).
_SECOND_LEVEL = ["co", "com", "org", "gov", "edu", "net", "mil", "int", "ac", "ad", "ae", "af", "ag"]


def host_of(url: Column) -> Column:
    """netloc (host[:port]) lowercased — DomainFilter._extract_domain
    (filters.py:437-441: regex ``://([^/]+)`` then .lower())."""
    return F.lower(F.regexp_extract(url, r"://([^/]+)", 1))


def domain_no_port(url: Column) -> Column:
    """Scorer-style domain: netloc minus port (scorers.py:455-494)."""
    h = F.regexp_extract(url, r"^(?:[^:]+://)?([^/?#]+)", 1)
    return F.lower(F.regexp_replace(h, r":[0-9]*$", ""))


def base_domain(url: Column) -> Column:
    """utils.py:2274-2322: lower, strip port + www., keep last 2 labels
    (3 when the 2nd-to-last is a known second-level label like 'co')."""
    d = F.lower(F.regexp_extract(url, r"^[^:]+://([^/?#]+)", 1))
    d = F.regexp_replace(F.regexp_replace(d, r":\d+$", ""), r"^www\.", "")
    parts = F.split(d, r"\.")
    n = F.size(parts)
    second = F.element_at(parts, -2)
    keep3 = (n > 2) & second.isin(_SECOND_LEVEL)
    last3 = F.concat_ws(".", F.slice(parts, n - 2, 3))
    last2 = F.concat_ws(".", F.slice(parts, F.greatest(n - 1, F.lit(1)), 2))
    return F.when(d == "", "").when(keep3, last3).otherwise(last2)


def is_external(url: Column, page_base_domain: Column) -> Column:
    """C5: differing base domains ⇒ external (utils.py:2325+)."""
    return base_domain(url) != page_base_domain


def path_of(url: Column) -> Column:
    """Path component (no query/fragment); '' when absent."""
    return F.regexp_extract(url, r"^[^:]+://[^/?#]+([^?#]*)", 1)


def path_depth(url: Column) -> Column:
    """PathDepthScorer._quick_depth (scorers.py:196-245): count of
    non-empty '/'-separated path segments; no path → 0."""
    p = path_of(url)
    cleaned = F.regexp_replace(F.regexp_replace(p, r"/+", "/"), r"^/|/$", "")
    return F.when((p == "") | (cleaned == ""), F.lit(0)).otherwise(
        F.size(F.split(cleaned, "/"))
    )


def quick_extension(url: Column) -> Column:
    """ContentTypeScorer._quick_extension (scorers.py:272-301): text after
    the LAST dot anywhere in the URL up to the first non-alphanumeric,
    lowercased; '' if no dot."""
    return F.lower(F.regexp_extract(url, r"\.([A-Za-z0-9]*)[^A-Za-z0-9.]*[^.]*$", 1))


def filename_extension(url: Column) -> Column:
    """ContentTypeFilter._extract_extension (filters.py:335-354): extension
    of the last path *filename* only; '' when the filename has no dot.

    Mirrors: strip scheme, take path from first '/', last '/'-segment,
    rpartition('.')[-1].lower().  Note the reference keeps query/fragment
    text inside `filename` (it never strips them), so `page.php?id=1`
    yields 'php?id=1'... actually rpartition takes after the last dot:
    'php?id=1'. We replicate faithfully including that quirk.
    """
    after_scheme = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    slash = F.instr(after_scheme, "/")
    path = F.when(slash > 0, F.substring_index(after_scheme, "/", -1)).otherwise(F.lit(""))
    # path here is the final '/'-segment == reference's `filename` when the
    # path contains '/', else '' (reference: filename = '' if no '/')
    has_dot = F.instr(path, ".") > 0
    return F.when(has_dot, F.lower(F.substring_index(path, ".", -1))).otherwise(F.lit(""))
