"""URL filters as Catalyst boolean columns (P1-P7, SURVEY §2.2).

Reference: crawl4ai/deep_crawling/filters.py. A FilterChain is a
short-circuit AND (filters.py:69-116) → here a boolean conjunction that
Catalyst short-circuits inside codegen. Pattern specialization
(suffix/prefix/domain/regex, filters.py:119-237) happens once driver-side;
the executors see only cheap string predicates ordered cheap-first with
regex last.

Each FilterSpec also evaluates driver-side (``py_apply``) so the in-memory
oracle crawler applies *identical* semantics.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from .urlparts import filename_extension, host_of

# ContentTypeFilter._MIME_MAP (filters.py:246-333) — standard extension→MIME
# table; needed verbatim so allowed-extension precomputation matches.
MIME_MAP: dict[str, str] = {
    "txt": "text/plain", "html": "text/html", "htm": "text/html",
    "xhtml": "application/xhtml+xml", "css": "text/css", "csv": "text/csv",
    "ics": "text/calendar", "js": "application/javascript",
    "bmp": "image/bmp", "gif": "image/gif", "jpeg": "image/jpeg",
    "jpg": "image/jpeg", "png": "image/png", "svg": "image/svg+xml",
    "tiff": "image/tiff", "ico": "image/x-icon", "webp": "image/webp",
    "mp3": "audio/mpeg", "wav": "audio/wav", "ogg": "audio/ogg",
    "m4a": "audio/mp4", "aac": "audio/aac",
    "mp4": "video/mp4", "mpeg": "video/mpeg", "webm": "video/webm",
    "avi": "video/x-msvideo", "mov": "video/quicktime", "flv": "video/x-flv",
    "wmv": "video/x-ms-wmv", "mkv": "video/x-matroska",
    "json": "application/json", "xml": "application/xml",
    "pdf": "application/pdf", "zip": "application/zip",
    "gz": "application/gzip", "tar": "application/x-tar",
    "rar": "application/vnd.rar", "7z": "application/x-7z-compressed",
    "exe": "application/vnd.microsoft.portable-executable",
    "msi": "application/x-msdownload",
    "woff": "font/woff", "woff2": "font/woff2", "ttf": "font/ttf",
    "otf": "font/otf",
    "doc": "application/msword", "dot": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "xls": "application/vnd.ms-excel", "ppt": "application/vnd.ms-powerpoint",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
    "tar.gz": "application/gzip", "tgz": "application/gzip",
    "bz2": "application/x-bzip2",
    "rtf": "application/rtf", "apk": "application/vnd.android.package-archive",
    "epub": "application/epub+zip", "jar": "application/java-archive",
    "swf": "application/x-shockwave-flash", "midi": "audio/midi",
    "mid": "audio/midi", "ps": "application/postscript",
    "ai": "application/postscript", "eps": "application/postscript",
    "bin": "application/octet-stream", "dmg": "application/x-apple-diskimage",
    "iso": "application/x-iso9660-image", "deb": "application/x-debian-package",
    "rpm": "application/x-rpm", "sqlite": "application/vnd.sqlite3",
    "unknown": "application/octet-stream",
}


def url_validity(url: Column) -> Column:
    """P1 (bfs_strategy.py:46-66): scheme ∈ {http,https} ∧ netloc present
    with a dot.  Depth-0 bypass is applied by the caller."""
    return url.rlike(r"^https?://[^/?#]*\.[^/?#]*") & (host_of(url) != "")


def _is_regex_pattern(pattern: str) -> bool:
    # filters.py:155-160
    return pattern.startswith("^") or pattern.endswith("$") or "\\d" in pattern


def _translate_glob(pattern: str) -> str:
    # filters.py:189-204: ** → .*, {a,b} → (a|b), then fnmatch.translate.
    if "**" in pattern:
        pattern = pattern.replace("**", ".*")
    if "{" in pattern:
        pattern = re.sub(
            r"\{([^}]+)\}", lambda m: f'({"|".join(m.group(1).split(","))})', pattern
        )
    return fnmatch.translate(pattern)


@dataclass
class _CompiledPatterns:
    suffixes: set[str]
    prefixes: set[str]
    domain_regexes: list[str]
    path_regexes: list[str]


def _compile_patterns(patterns: list[str]) -> _CompiledPatterns:
    """Exact reference categorization (filters.py:154-204)."""
    out = _CompiledPatterns(set(), set(), [], [])
    for pattern in patterns:
        if _is_regex_pattern(pattern):
            out.path_regexes.append(pattern)
            continue
        stars = pattern.count("*")
        if stars == 1 and pattern.startswith("*."):
            out.suffixes.add(pattern[2:])
            continue
        if stars == 1 and pattern.endswith("/*"):
            out.prefixes.add(pattern[:-2])
            continue
        if "://" in pattern and pattern.startswith("*."):
            out.domain_regexes.append("^" + pattern.replace("*.", r"[^/]+\."))
            continue
        out.path_regexes.append(_translate_glob(pattern))
    return out


def url_pattern_filter(url: Column, patterns: list[str]) -> Column:
    """URLPatternFilter.apply (filters.py:206-237) as an OR of specialized
    predicates: suffix-set, domain-regex (anchored match), prefix-set,
    then translated glob/regex search."""
    cp = _compile_patterns(patterns)
    preds: list[Column] = []
    if cp.suffixes:
        path = F.substring_index(url, "?", 1)
        last_seg = F.substring_index(path, "/", -1)
        ext = F.substring_index(last_seg, ".", -1)
        preds.append(ext.isin(sorted(cp.suffixes)))
    for rx in cp.domain_regexes:
        preds.append(url.rlike(rx))
    if cp.prefixes:
        path = F.substring_index(url, "?", 1)
        pref = None
        for p in sorted(cp.prefixes):
            c = path.startswith(p)
            pref = c if pref is None else (pref | c)
        preds.append(pref)
    for rx in cp.path_regexes:
        preds.append(url.rlike(rx))
    if not preds:
        return F.lit(False)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def content_type_filter(url: Column, allowed_types: list[str],
                        check_extension: bool = True) -> Column:
    """ContentTypeFilter (filters.py:240-394): allowed when extension-less
    or extension maps to an allowed MIME family."""
    if not check_extension:
        return F.lit(True)
    allowed = {t.lower() for t in allowed_types}
    ext_set = sorted(
        ext for ext, mime in MIME_MAP.items() if any(a in mime for a in allowed)
    )
    ext = filename_extension(url)
    return (ext == "") | ext.isin(ext_set)


def domain_filter(url: Column, allowed_domains: list[str] | None = None,
                  blocked_domains: list[str] | None = None) -> Column:
    """DomainFilter (filters.py:397-471): blocked beats allowed; subdomain
    match is equality or '.parent' suffix; domain keeps the port (the
    reference's regex ``://([^/]+)`` does not strip it)."""
    blocked = [d.lower() for d in (blocked_domains or [])]
    allowed = [d.lower() for d in (allowed_domains or [])] if allowed_domains else None
    if not blocked and allowed is None:
        return F.lit(True)
    dom = host_of(url)

    def sub_of(parent: str) -> Column:
        return (dom == parent) | dom.endswith("." + parent)

    cond = F.lit(True)
    for b in blocked:
        cond = cond & ~sub_of(b)
    if allowed is not None:
        acc = F.lit(False)
        for a in allowed:
            acc = acc | sub_of(a)
        cond = cond & acc
    return cond


def _tokens(col: Column) -> Column:
    """Python str.split() analog: split on whitespace runs, drop empties."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def bm25_relevance_score(title: Column, meta: Column, query: str,
                         k1: float = 1.2, b: float = 0.75, avgdl: int = 1000) -> Column:
    """ContentRelevanceFilter._bm25 (filters.py:474-546) on head fields.

    Doc construction (filters.py:512-521): title repeated ×3, description
    ×2, keywords ×1, plus all meta values, space-joined; simplified IDF
    log(2/(tf+0.5)+1). ``meta`` is a MapType(string,string) column.
    """
    desc = F.coalesce(meta.getItem("description"), F.lit(""))
    kw = F.coalesce(meta.getItem("keywords"), F.lit(""))
    all_meta = F.concat_ws(" ", F.map_values(meta))
    doc = F.concat_ws(
        " ", F.repeat(F.coalesce(title, F.lit("")), 3), F.repeat(desc, 2), kw, all_meta
    )
    toks = _tokens(F.lower(doc))
    doc_len = F.size(toks).cast("double")
    score = F.lit(0.0)
    for term in sorted(set(query.lower().split())):
        tf = F.size(F.filter(toks, lambda t: t == F.lit(term))).cast("double")
        idf = F.log((F.lit(1.0) + 1.0) / (tf + 0.5) + 1.0)
        num = tf * (k1 + 1.0)
        den = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (doc_len / F.lit(float(avgdl))))
        score = score + idf * (num / den)
    return score


SEO_DEFAULT_WEIGHTS = {
    # filters.py:555-563
    "title_length": 0.15, "title_kw": 0.18, "meta_description": 0.12,
    "canonical": 0.10, "robot_ok": 0.20, "schema_org": 0.10, "url_quality": 0.15,
}


def seo_score(url: Column, title: Column, meta: Column, has_ldjson: Column,
              keywords: list[str] | None = None,
              weights: dict[str, float] | None = None) -> Column:
    """SEOFilter score (filters.py:549-659) as column arithmetic.

    ``has_ldjson`` stands in for the raw-head ld+json regex probe
    (filters.py:634-641) since our pages table carries structured head
    fields, not raw HTML.
    """
    w = weights or SEO_DEFAULT_WEIGHTS
    title = F.coalesce(title, F.lit(""))
    tlen = F.length(title)
    s_title = (
        F.when((tlen >= 50) & (tlen <= 60), 1.0)
        .when(((tlen >= 40) & (tlen < 50)) | ((tlen > 60) & (tlen <= 70)), 0.7)
        .otherwise(0.3)
    )
    if keywords:
        pat = r"\b(" + "|".join(re.escape(k) for k in keywords) + r")\b"
        matches = F.size(F.regexp_extract_all(F.lower(title), F.lit(pat), 1))
        s_kw = F.least(matches.cast("double") * 0.3, F.lit(1.0))
    else:
        s_kw = F.lit(0.0)
    desc = F.coalesce(meta.getItem("description"), F.lit(""))
    dlen = F.length(desc)
    s_desc = (
        F.when((dlen >= 140) & (dlen <= 160), 1.0)
        .when((dlen >= 120) & (dlen <= 200), 0.5)
        .otherwise(0.2)
    )
    canonical = meta.getItem("canonical")
    s_canon = (
        F.when(canonical.isNull() | (canonical == ""), 0.5)
        .when(canonical == url, 1.0)
        .otherwise(0.2)
    )
    robots = F.coalesce(meta.getItem("robots"), F.lit(""))
    s_robot = F.when(robots.contains("noindex"), 0.0).otherwise(1.0)
    s_schema = F.when(F.coalesce(has_ldjson, F.lit(False)), 1.0).otherwise(0.0)
    path = F.lower(F.regexp_extract(url, r"^[^:]+://[^/?#]+([^?#]*)", 1))
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    s_url = F.lit(1.0)
    s_url = s_url * F.when(F.length(path) > 80, 0.7).otherwise(1.0)
    s_url = s_url * F.when(path.rlike(r"\d{4}"), 0.8).otherwise(1.0)
    s_url = s_url * F.when(q != "", 0.6).otherwise(1.0)
    s_url = s_url * F.when(path.contains("_"), 0.9).otherwise(1.0)
    comps = {
        "title_length": s_title, "title_kw": s_kw, "meta_description": s_desc,
        "canonical": s_canon, "robot_ok": s_robot, "schema_org": s_schema,
        "url_quality": s_url,
    }
    total = F.lit(0.0)
    for factor, wt in w.items():
        total = total + F.lit(float(wt)) * comps[factor]
    return total


# ---------------------------------------------------------------------------
# Serializable filter specs (engine config + oracle parity)
# ---------------------------------------------------------------------------

@dataclass
class FilterSpec:
    """One URL filter; ``chain`` of these == FilterChain (AND)."""

    kind: str  # pattern | content_type | domain
    patterns: list[str] = field(default_factory=list)
    allowed_types: list[str] = field(default_factory=list)
    check_extension: bool = True
    allowed_domains: list[str] | None = None
    blocked_domains: list[str] | None = None

    def column(self, url: Column) -> Column:
        if self.kind == "pattern":
            return url_pattern_filter(url, self.patterns)
        if self.kind == "content_type":
            return content_type_filter(url, self.allowed_types, self.check_extension)
        if self.kind == "domain":
            return domain_filter(url, self.allowed_domains, self.blocked_domains)
        raise ValueError(f"unknown filter kind {self.kind!r}")

    def py_apply(self, url: str) -> bool:
        if self.kind == "pattern":
            cp = _compile_patterns(self.patterns)
            if cp.suffixes:
                path = url.split("?")[0]
                if path.split("/")[-1].split(".")[-1] in cp.suffixes:
                    return True
            for rx in cp.domain_regexes:
                if re.match(rx[1:], url):  # stored with leading ^, match() anchors
                    return True
            if cp.prefixes:
                path = url.split("?")[0]
                if any(path.startswith(p) for p in cp.prefixes):
                    return True
            for rx in cp.path_regexes:
                if re.search(rx, url):
                    return True
            return False
        if self.kind == "content_type":
            if not self.check_extension:
                return True
            allowed = {t.lower() for t in self.allowed_types}
            ext_set = {e for e, m in MIME_MAP.items() if any(a in m for a in allowed)}
            u = url.split("://", 1)[-1] if "://" in url else url
            path_start = u.find("/")
            path = u[path_start:] if path_start != -1 else ""
            filename = path.rsplit("/", 1)[-1] if "/" in path else ""
            if "." not in filename:
                return True
            return filename.rpartition(".")[-1].lower() in ext_set
        if self.kind == "domain":
            blocked = {d.lower() for d in (self.blocked_domains or [])}
            allowed = (
                {d.lower() for d in self.allowed_domains}
                if self.allowed_domains
                else None
            )
            if not blocked and allowed is None:
                return True
            m = re.search(r"://([^/]+)", url)
            dom = m.group(1).lower() if m else ""
            for b in blocked:
                if dom == b or dom.endswith("." + b):
                    return False
            if allowed is None:
                return True
            return any(dom == a or dom.endswith("." + a) for a in allowed)
        raise ValueError(f"unknown filter kind {self.kind!r}")


def chain_column(url: Column, chain: list[FilterSpec]) -> Column:
    """FilterChain.apply (filters.py:69-116): AND of all filters."""
    cond = F.lit(True)
    for spec in chain:
        cond = cond & spec.column(url)
    return cond


def py_chain_apply(url: str, chain: list[FilterSpec]) -> bool:
    return all(spec.py_apply(url) for spec in chain)


def py_url_validity(url: str) -> bool:
    """Driver-side P1 (bfs_strategy.py:46-66)."""
    from urllib.parse import urlparse

    try:
        parsed = urlparse(url)
        if not parsed.scheme or not parsed.netloc:
            return False
        if parsed.scheme not in ("http", "https"):
            return False
        if "." not in parsed.netloc:
            return False
    except Exception:
        return False
    return True
