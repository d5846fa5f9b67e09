"""URL scorers as pure Catalyst column expressions (K1-K6, SURVEY §2.4).

Reference: crawl4ai/deep_crawling/scorers.py. Every scorer there is
``score(url) = _calculate_score(url) * float32(weight)`` (scorers.py:63-89,
weight stored via ctypes.c_float). We reproduce the float32 rounding of the
weight and of composite child scores (scorers.py:114-117 stores child scores
in an array('f')) so the golden values in
tests/20241401/test_deep_crawl_scorers.py:5-138 match to 1e-8.

All scorers are JVM-side column arithmetic → whole-stage codegen on the
100 TB path; the score column is the frontier's ORDER BY key.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from .urlparts import domain_no_port, path_depth, quick_extension

# scorers.py:14 — distance→score lookup for PathDepthScorer
_SCORE_LOOKUP = [1.0, 0.5, 0.3333333333333333, 0.25]
# scorers.py:17-24 — freshness by year distance
_FRESHNESS_SCORES = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]


def _f32(x: float) -> float:
    """Python float holding the float32 rounding of x (c_float semantics)."""
    return float(np.float32(x))


def keyword_relevance(url: Column, keywords: list[str], weight: float = 1.0,
                      case_sensitive: bool = False) -> Column:
    """KeywordRelevanceScorer (scorers.py:160-188): fraction of keywords
    substring-present in the URL."""
    kws = [k if case_sensitive else k.lower() for k in keywords]
    u = url if case_sensitive else F.lower(url)
    hits = None
    for k in kws:
        h = F.when(F.instr(u, k) > 0, F.lit(1)).otherwise(F.lit(0))
        hits = h if hits is None else hits + h
    if hits is None:
        return F.lit(0.0)
    return (hits.cast("double") / F.lit(float(len(kws)))) * F.lit(_f32(weight))


def path_depth_score(url: Column, optimal_depth: int = 3, weight: float = 1.0) -> Column:
    """PathDepthScorer (scorers.py:190-245): lookup[|depth−optimal|] for
    distance 0-3, else 1/(1+distance)."""
    dist = F.abs(path_depth(url) - F.lit(optimal_depth))
    expr = (
        F.when(dist == 0, _SCORE_LOOKUP[0])
        .when(dist == 1, _SCORE_LOOKUP[1])
        .when(dist == 2, _SCORE_LOOKUP[2])
        .when(dist == 3, _SCORE_LOOKUP[3])
        .otherwise(F.lit(1.0) / (F.lit(1.0) + dist.cast("double")))
    )
    return expr * F.lit(_f32(weight))


def content_type_score(url: Column, type_weights: dict[str, float], weight: float = 1.0) -> Column:
    """ContentTypeScorer (scorers.py:247-330): exact-extension map for
    '.ext$' patterns (via the last-dot quick extension), then regex
    fallbacks sorted by descending score, else 0."""
    exact: dict[str, float] = {}
    regexes: list[tuple[str, float]] = []
    for pattern, score in type_weights.items():
        if pattern.startswith(".") and pattern.endswith("$"):
            exact[pattern[1:-1]] = score
        else:
            regexes.append((pattern, score))
    regexes.sort(key=lambda x: -x[1])

    ext = quick_extension(url)
    expr = F.lit(None).cast("double")
    # exact map first (fast path, scorers.py:304-310)
    mapping = F.create_map(*[F.lit(v) for kv in exact.items() for v in kv]) if exact else None
    if mapping is not None:
        expr = F.when(ext != "", mapping[ext]).otherwise(F.lit(None))
    for pattern, score in regexes:
        expr = F.coalesce(expr, F.when(url.rlike(pattern), F.lit(score)))
    return F.coalesce(expr, F.lit(0.0)) * F.lit(_f32(weight))


# Non-capturing month/day tail must be consumed exactly like the reference
# regex (scorers.py:352-364) so overlapping years resolve identically.
FRESHNESS_PATTERN = r"(?:/|[-_])((?:19|20)\d{2})(?:(?:/|[-_])(?:\d{2})(?:(?:/|[-_])(?:\d{2}))?)?"


def freshness_score(url: Column, current_year: int = 2024, weight: float = 1.0) -> Column:
    """FreshnessScorer (scorers.py:332-412): latest sane year in the URL →
    lookup by (current_year − year); none → 0.5; old → max(0.1, 1−0.1Δ)."""
    years = F.transform(
        F.regexp_extract_all(url, F.lit(FRESHNESS_PATTERN), 1), lambda s: s.cast("int")
    )
    year = F.array_max(F.filter(years, lambda y: y <= F.lit(current_year)))
    diff = F.lit(current_year) - year
    ladder = F.when(diff == 0, 1.0)
    for d, s in enumerate(_FRESHNESS_SCORES[1:], start=1):
        ladder = ladder.when(diff == d, s)
    ladder = ladder.otherwise(
        F.greatest(F.lit(0.1), F.lit(1.0) - diff.cast("double") * F.lit(0.1))
    )
    return F.coalesce(F.when(year.isNotNull(), ladder), F.lit(0.5)) * F.lit(_f32(weight))


def domain_authority_score(url: Column, domain_weights: dict[str, float],
                           default_weight: float = 0.5, weight: float = 1.0) -> Column:
    """DomainAuthorityScorer (scorers.py:414-519): domain→weight broadcast
    map lookup with default; domain extraction strips port."""
    weights = {d.lower(): s for d, s in domain_weights.items()}
    dom = domain_no_port(url)
    mapping = F.create_map(*[F.lit(v) for kv in weights.items() for v in kv]) if weights else None
    looked = mapping[dom] if mapping is not None else F.lit(None).cast("double")
    return F.coalesce(looked, F.lit(float(default_weight))) * F.lit(_f32(weight))


def composite_score(child_scores: list[Column], normalize: bool = True) -> Column:
    """CompositeScorer (scorers.py:91-158): sum of already-weighted child
    scores (each rounded through float32 — the array('f') store at
    scorers.py:114-117,134-136), ÷ count when normalize."""
    total = None
    for c in child_scores:
        c32 = c.cast("float").cast("double")
        total = c32 if total is None else total + c32
    if total is None:
        return F.lit(0.0)
    if normalize and child_scores:
        return total / F.lit(float(len(child_scores)))
    return total


# ---------------------------------------------------------------------------
# Config-driven scorer specs: lets CrawlConfig carry a serializable scorer
# description and lets the oracle build the same scorer in plain Python.
# ---------------------------------------------------------------------------

@dataclass
class ScorerSpec:
    kind: str  # keyword | path_depth | content_type | freshness | domain | composite
    weight: float = 1.0
    keywords: list[str] = field(default_factory=list)
    case_sensitive: bool = False
    optimal_depth: int = 3
    type_weights: dict[str, float] = field(default_factory=dict)
    current_year: int = 2024
    domain_weights: dict[str, float] = field(default_factory=dict)
    default_weight: float = 0.5
    children: list["ScorerSpec"] = field(default_factory=list)
    normalize: bool = True

    def column(self, url: Column) -> Column:
        if self.kind == "keyword":
            return keyword_relevance(url, self.keywords, self.weight, self.case_sensitive)
        if self.kind == "path_depth":
            return path_depth_score(url, self.optimal_depth, self.weight)
        if self.kind == "content_type":
            return content_type_score(url, self.type_weights, self.weight)
        if self.kind == "freshness":
            return freshness_score(url, self.current_year, self.weight)
        if self.kind == "domain":
            return domain_authority_score(url, self.domain_weights, self.default_weight, self.weight)
        if self.kind == "composite":
            return composite_score([c.column(url) for c in self.children], self.normalize)
        raise ValueError(f"unknown scorer kind {self.kind!r}")

    # ---- driver-side evaluation (oracle parity; mirrors reference math) ----
    def py_score(self, url: str) -> float:
        w = _f32(self.weight)
        if self.kind == "keyword":
            kws = [k if self.case_sensitive else k.lower() for k in self.keywords]
            u = url if self.case_sensitive else url.lower()
            m = sum(1 for k in kws if k in u)
            raw = 0.0 if not m else (1.0 if m == len(kws) else m / len(kws))
            return raw * w
        if self.kind == "path_depth":
            pos = url.find("/", url.find("://") + 3)
            if pos == -1:
                depth = 0
            else:
                segs = [s for s in url[pos:].split("/") if s]
                depth = len(segs)
            dist = abs(depth - self.optimal_depth)
            raw = _SCORE_LOOKUP[dist] if dist < 4 else 1.0 / (1.0 + dist)
            return raw * w
        if self.kind == "content_type":
            exact, regexes = {}, []
            for p, s in self.type_weights.items():
                if p.startswith(".") and p.endswith("$"):
                    exact[p[1:-1]] = s
                else:
                    regexes.append((_re.compile(p), s))
            regexes.sort(key=lambda x: -x[1])
            pos = url.rfind(".")
            ext = ""
            if pos != -1:
                end = len(url)
                for i in range(pos + 1, len(url)):
                    c = url[i]
                    if c in "?#;" or not c.isalnum():
                        end = i
                        break
                ext = url[pos + 1 : end].lower()
            raw = None
            if ext and ext in exact:
                raw = exact[ext]
            if raw is None:
                for rx, s in regexes:
                    if rx.search(url):
                        raw = s
                        break
            return (raw if raw is not None else 0.0) * w
        if self.kind == "freshness":
            latest = None
            for m in _re.finditer(FRESHNESS_PATTERN, url):
                y = int(m.group(1))
                if y <= self.current_year and (latest is None or y > latest):
                    latest = y
            if latest is None:
                raw = 0.5
            else:
                d = self.current_year - latest
                raw = _FRESHNESS_SCORES[d] if d < len(_FRESHNESS_SCORES) else max(0.1, 1.0 - d * 0.1)
            return raw * w
        if self.kind == "domain":
            weights = {d.lower(): s for d, s in self.domain_weights.items()}
            start = url.find("://")
            start = 0 if start == -1 else start + 3
            end = len(url)
            for ch in "/?#":
                p = url.find(ch, start)
                if p != -1:
                    end = min(end, p)
            dom = url[start:end]
            pi = dom.rfind(":")
            if pi != -1:
                dom = dom[:pi]
            return weights.get(dom.lower(), self.default_weight) * w
        if self.kind == "composite":
            total = 0.0
            for c in self.children:
                total += _f32(c.py_score(url))
            return total / len(self.children) if (self.normalize and self.children) else total
        raise ValueError(f"unknown scorer kind {self.kind!r}")
