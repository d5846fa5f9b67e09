"""Rule-based extraction (G10 adjunct) — reference
rule_based_extraction.py:30-511 (RuleBasedExtractionStrategy), the
deterministic no-LLM/no-spaCy subset:

  1. sanitize_html (utils.py:716-739: escape quotes → ``\\"`` / ``\\'``)
     then plain-text extraction ``soup.get_text(separator=" ",
     strip=True)`` (:100-116) — bs4>=4.9 excludes script/style/comment
     strings from get_text, replicated here with the stdlib tokenizer;
  2. normalize_text (utils.py:2641-2659): whitespace-collapse, lower,
     strip ``[^\\w\\s]``;
  3. custom patterns (:189-253): ``regex`` rules via finditer (value =
     group(0), named groups kept, confidence from _calculate_confidence
     :467-484) and ``keyword`` rules via case-insensitive non-overlapping
     scan (:329-344); context = ``before [EXTRACTION] after`` with a
     ``context_window``-char window (:452-465);
  4. default regulatory patterns when no custom rules (:269-327):
     ce_hours (conf .85), renewal_period (.8), specialized_requirement
     (.75 — NO ``value`` key, a reference quirk that later collapses all
     such rows in dedup);
  5. threshold filter (>= confidence_threshold) on pattern rows (:124-129);
  6. proximity relations (:376-415): results sorted by span start,
     adjacent pairs <= 50 chars apart, first substring hit from
     ``["of","for","in","requires","must have"]`` in the between-text
     (note "in" matches inside words — preserved), confidence 0.65 (below
     the default 0.7 threshold, so relations only surface when the caller
     lowers it — reference behavior);
  7. verification (:417-450): +0.2 for ``^\\d+\\s*[a-zA-Z]+$`` values,
     +min(0.1*occurrences, 0.2) when the value recurs, +0.1 for non-empty
     named groups, capped at 1.0; ``verified`` = score >= threshold;
  8. dedup by ``f"{type}:{value}"`` keeping the higher-confidence row in
     the FIRST row's position (:486-511), then stable sort by confidence
     desc (:173) and rank assignment.

Entity extraction (:346-374) needs spaCy — the reference itself degrades
to ``nlp=None`` when spaCy is absent, which is exactly this subset.

Spark shape: one Arrow ``mapInPandas`` pass over (url, html) rows that
explodes matches into rows — embarrassingly parallel, no shuffle; the
regex work is pure CPU per page.  The oracle twin
(oracle/expected.py ensure_rules_expected) re-implements the same spec
sequentially with zero imports from this module.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_SKIP_TEXT_TAGS = {"script", "style"}


class _TextGrab(HTMLParser):
    """bs4>=4.9 ``get_text(separator=" ", strip=True)`` twin: every text
    segment except script/style/comments, stripped, empties dropped."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_TAGS:
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_TAGS and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip and data.strip():
            self.parts.append(data.strip())


def html_text(html: str) -> str:
    """sanitize_html + get_text(separator=" ", strip=True)."""
    clean = (html or "").replace('"', '\\"').replace("'", "\\'")
    g = _TextGrab()
    try:
        g.feed(clean)
        g.close()
    except Exception:
        pass
    return " ".join(g.parts)


def normalize_text(text: str) -> str:
    """utils.py:2641-2659."""
    if not text:
        return ""
    text = re.sub(r"\s+", " ", text).strip().lower()
    return re.sub(r"[^\w\s]", "", text)


@dataclass(frozen=True)
class RulePattern:
    name: str
    pattern: str
    kind: str = "regex"  # "regex" | "keyword"


def _confidence(match_text: str, pattern: str) -> float:
    # _calculate_confidence :467-484
    base = 0.7
    if re.search(r"\d+", match_text):
        base += 0.1
    complexity = len(re.findall(r"[()[\]{}|+*?]", pattern)) if isinstance(pattern, str) else 0
    base += min(0.01 * complexity, 0.1)
    base += min(0.01 * len(match_text), 0.1)
    return min(0.95, base)


def _context(text: str, start: int, end: int, window: int) -> str:
    # _get_context :452-465
    before = text[max(0, start - window):start].strip()
    after = text[end:min(len(text), end + window)].strip()
    return f"{before} [EXTRACTION] {after}"


def _apply_custom(text: str, patterns: list[RulePattern], include_context: bool,
                  window: int) -> list[dict]:
    results = []
    for p in patterns:
        if p.kind == "regex":
            try:
                matches = list(re.finditer(p.pattern, text))
            except re.error:
                continue
            for m in matches:
                mt = m.group(0)
                results.append({
                    "type": p.name, "value": mt,
                    "confidence": _confidence(mt, p.pattern),
                    "context": _context(text, m.start(), m.end(), window)
                    if include_context else "",
                    "groups": dict(m.groupdict()),
                    "span": (m.start(), m.end()),
                })
        elif p.kind == "keyword":
            lo, klo = text.lower(), p.pattern.lower()
            start = 0
            while True:
                start = lo.find(klo, start)
                if start == -1:
                    break
                end = start + len(p.pattern)
                mt = text[start:end]
                results.append({
                    "type": p.name, "value": mt,
                    "confidence": _confidence(mt, p.pattern),
                    "context": _context(text, start, end, window)
                    if include_context else "",
                    "span": (start, end),
                })
                start = end
    return results


def _apply_defaults(text: str, include_context: bool, window: int) -> list[dict]:
    # _apply_default_patterns :269-327
    results = []
    for m in re.finditer(
        r"(\d+)\s*(?:hours?|hrs?|credit\s*hours?|CE\s*hours?|contact\s*hours?|CEUs?)",
        text, re.IGNORECASE,
    ):
        results.append({
            "type": "ce_hours", "value": m.group(1), "raw_match": m.group(0),
            "confidence": 0.85,
            "context": _context(text, m.start(), m.end(), window)
            if include_context else "",
            "span": (m.start(), m.end()),
        })
    for m in re.finditer(
        r"(?:renewal|license renewal|renew).{0,30}(?:every|each)\s+(\d+)\s*(years?|months?)",
        text, re.IGNORECASE,
    ):
        results.append({
            "type": "renewal_period",
            "value": f"{m.group(1)} {m.group(2)}", "raw_match": m.group(0),
            "confidence": 0.8,
            "context": _context(text, m.start(), m.end(), window)
            if include_context else "",
            "span": (m.start(), m.end()),
        })
    for m in re.finditer(
        r"(\d+)\s*(?:hours?|credits?).{0,50}(?:in|of|for)\s+([a-zA-Z\s]{3,50})",
        text, re.IGNORECASE,
    ):
        results.append({
            # quirk :317-325 — NO "value" key on specialized rows
            "type": "specialized_requirement", "hours": m.group(1),
            "topic": m.group(2).strip(), "raw_match": m.group(0),
            "confidence": 0.75,
            "context": _context(text, m.start(), m.end(), window)
            if include_context else "",
            "span": (m.start(), m.end()),
        })
    return results


_RELATION_INDICATORS = ["of", "for", "in", "requires", "must have"]


def _relations(entities: list[dict], text: str) -> list[dict]:
    # _extract_relations :376-415
    out = []
    se = sorted(entities, key=lambda x: x.get("span", (0, 0))[0])
    for e1, e2 in zip(se, se[1:]):
        _, end1 = e1.get("span", (0, 0))
        start2, _ = e2.get("span", (0, 0))
        if start2 - end1 <= 50:
            between = text[end1:start2]
            for ind in _RELATION_INDICATORS:
                if ind in between.lower():
                    out.append({
                        "type": "relation",
                        "entity1": e1.get("value"), "entity1_type": e1.get("type"),
                        "entity2": e2.get("value"), "entity2_type": e2.get("type"),
                        "relation": ind,
                        "text": text[e1.get("span", (0, 0))[0]:e2.get("span", (0, 0))[1]],
                        "confidence": 0.65,
                        "span": (e1.get("span", (0, 0))[0], e2.get("span", (0, 0))[1]),
                    })
                    break
    return out


def _verify(results: list[dict], text: str, threshold: float) -> list[dict]:
    # _add_verification :417-450
    for r in results:
        score = r.get("confidence", 0.5)
        value = r.get("value", "")
        if isinstance(value, str) and len(value) > 0:
            if re.match(r"^\d+\s*[a-zA-Z]+$", value):
                score += 0.2
            occ = text.lower().count(value.lower())
            if occ > 1:
                score += min(0.1 * occ, 0.2)
            if "groups" in r and r["groups"]:
                score += 0.1
        score = min(1.0, score)
        r["verification_score"] = score
        r["verified"] = score >= threshold
    return results


def _dedup(results: list[dict]) -> list[dict]:
    # _deduplicate_results :486-511
    seen: set[str] = set()
    unique: list[dict] = []
    for r in results:
        key = f"{r.get('type', '')}:{r.get('value', '')}"
        if key not in seen:
            seen.add(key)
            unique.append(r)
        else:
            for i, ex in enumerate(unique):
                if f"{ex.get('type', '')}:{ex.get('value', '')}" == key:
                    if r.get("confidence", 0) > ex.get("confidence", 0):
                        unique[i] = r
                    break
    return unique


_CORE_KEYS = {"type", "value", "raw_match", "confidence",
              "verification_score", "verified", "context", "span", "url",
              "extraction_method"}


def extract_rules(url: str, html: str,
                  patterns: list[RulePattern] | None = None,
                  confidence_threshold: float = 0.7,
                  extract_relations: bool = True,
                  include_context: bool = True,
                  context_window: int = 100) -> list[dict]:
    """One page through the full pipeline; rows in final rank order."""
    if not html:
        return [{"type": "error", "value": "Empty HTML content",
                 "confidence": 0.0, "verification_score": 0.0,
                 "verified": False, "context": "", "span": (0, 0)}]
    text = html_text(html)
    if not text:
        return [{"type": "error", "value": "No text content in HTML",
                 "confidence": 0.0, "verification_score": 0.0,
                 "verified": False, "context": "", "span": (0, 0)}]
    t = normalize_text(text)
    matched = (
        _apply_custom(t, patterns, include_context, context_window)
        if patterns else _apply_defaults(t, include_context, context_window)
    )
    results = [m for m in matched if m["confidence"] >= confidence_threshold]
    if extract_relations and len(results) > 1:
        results += [r for r in _relations(results, t)
                    if r["confidence"] >= confidence_threshold]
    results = _verify(results, t, confidence_threshold)
    unique = _dedup(results)
    return sorted(unique, key=lambda x: x.get("confidence", 0), reverse=True)


RULES_SCHEMA = (
    "url string, rank int, rtype string, value string, raw_match string, "
    "confidence double, verification_score double, verified boolean, "
    "context string, span_start long, span_end long, extra string"
)


def rules_extract_stage(pages: DataFrame, patterns: list[RulePattern] | None = None,
                        html_col: str = "html", url_col: str = "url",
                        **kwargs) -> DataFrame:
    """Arrow pass over (url, html) rows → one row per extraction, ranked."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "rank", "rtype", "value", "raw_match", "confidence",
                "verification_score", "verified", "context", "span_start",
                "span_end", "extra"]
        for b in batches:
            out = []
            for r in b.itertuples():
                url = getattr(r, url_col)
                rows = extract_rules(url, getattr(r, html_col),
                                     patterns=patterns, **kwargs)
                for rank, d in enumerate(rows):
                    extra = {k: v for k, v in d.items() if k not in _CORE_KEYS}
                    span = d.get("span", (0, 0))
                    out.append({
                        "url": url, "rank": rank, "rtype": d.get("type", ""),
                        "value": d.get("value"),
                        "raw_match": d.get("raw_match"),
                        "confidence": float(d.get("confidence", 0.0)),
                        "verification_score": float(d.get("verification_score", 0.0)),
                        "verified": bool(d.get("verified", False)),
                        "context": d.get("context", ""),
                        "span_start": int(span[0]), "span_end": int(span[1]),
                        "extra": json.dumps(extra, sort_keys=True) if extra else None,
                    })
            yield pd.DataFrame(out, columns=cols)

    return pages.select(url_col, html_col).mapInPandas(run, RULES_SCHEMA)
