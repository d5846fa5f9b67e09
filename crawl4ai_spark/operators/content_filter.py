"""Content-filter scoring (G9, SURVEY §2.7) as pure Catalyst columns.

Reference: PruningContentFilter
(crawl4ai/content_filter_strategy.py:525-770) — a composite
text-density / link-density / tag-weight / class-id / text-length metric per
DOM node, pruned below a fixed threshold (default 0.48).  The reference
walks a BeautifulSoup tree; the set-oriented form scores *chunk rows*
carrying the node metrics the walk would compute:

    (tag_name, text_len, tag_len, link_text_len, classes, elem_id[, text])

which is exactly what a scrape pass emits per top-level block.  All
arithmetic stays in whole-stage codegen; the fixed-threshold decision is
one filter.  The dynamic-threshold variant (:699-712) adjusts the cutoff
per row from tag importance / text ratio / link ratio — also pure columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# content_filter_strategy.py:603-616
TAG_WEIGHTS = {
    "div": 0.5, "p": 1.0, "article": 1.5, "section": 1.0, "span": 0.3,
    "li": 0.5, "ul": 0.5, "ol": 0.5, "h1": 1.2, "h2": 1.1, "h3": 1.0,
    "h4": 0.9, "h5": 0.8, "h6": 0.7,
}
# :571-582
TAG_IMPORTANCE = {
    "article": 1.5, "main": 1.4, "section": 1.3, "p": 1.2, "h1": 1.4,
    "h2": 1.3, "h3": 1.2, "div": 0.7, "span": 0.6,
}
# :114-116 (re.I); reference uses .match → anchored at start
NEGATIVE_PATTERN = r"(?i)^(?:nav|footer|header|sidebar|ads|comment|promo|advert|social|share)"
# :585-601
METRIC_WEIGHTS = {
    "text_density": 0.4, "link_density": 0.2, "tag_weight": 0.2,
    "class_id_weight": 0.1, "text_length": 0.1,
}
DEFAULT_THRESHOLD = 0.48  # :556


def _tag_weight_col(tag: Column) -> Column:
    m = F.create_map(*[F.lit(v) for kv in TAG_WEIGHTS.items() for v in kv])
    return F.coalesce(m[tag], F.lit(0.5))


def class_id_weight(classes: Column, elem_id: Column) -> Column:
    """:759-770 — −0.5 per negative-pattern hit on classes / id."""
    neg_c = F.when(F.coalesce(classes, F.lit("")).rlike(NEGATIVE_PATTERN), -0.5).otherwise(0.0)
    neg_i = F.when(F.coalesce(elem_id, F.lit("")).rlike(NEGATIVE_PATTERN), -0.5).otherwise(0.0)
    return neg_c + neg_i


def pruning_score(tag_name: Column, text_len: Column, tag_len: Column,
                  link_text_len: Column, classes: Column | None = None,
                  elem_id: Column | None = None,
                  text: Column | None = None,
                  min_word_threshold: int | None = None) -> Column:
    """_compute_composite_score (:721-757), weight-for-weight."""
    tl = text_len.cast("double")
    gl = tag_len.cast("double")
    ll = link_text_len.cast("double")
    density = F.when(gl > 0, tl / gl).otherwise(F.lit(0.0))
    link_density = F.lit(1.0) - F.when(tl > 0, ll / tl).otherwise(F.lit(0.0))
    tag_w = _tag_weight_col(tag_name)
    cls = class_id_weight(
        classes if classes is not None else F.lit(None),
        elem_id if elem_id is not None else F.lit(None),
    )
    score = (
        F.lit(METRIC_WEIGHTS["text_density"]) * density
        + F.lit(METRIC_WEIGHTS["link_density"]) * link_density
        + F.lit(METRIC_WEIGHTS["tag_weight"]) * tag_w
        + F.lit(METRIC_WEIGHTS["class_id_weight"]) * F.greatest(F.lit(0.0), cls)
        + F.lit(METRIC_WEIGHTS["text_length"]) * F.log(tl + 1.0)
    )  # total_weight == 1.0
    if min_word_threshold is not None and text is not None:
        # :723-728 — word_count = text.count(' ') + 1
        wc = F.length(text) - F.length(F.regexp_replace(text, " ", "")) + 1
        return F.when(wc < min_word_threshold, F.lit(-1.0)).otherwise(score)
    return score


def dynamic_threshold(tag_name: Column, text_len: Column, tag_len: Column,
                      link_text_len: Column,
                      base_threshold: float = DEFAULT_THRESHOLD) -> Column:
    """:699-712 — per-row adjusted cutoff."""
    imp = F.coalesce(
        F.create_map(*[F.lit(v) for kv in TAG_IMPORTANCE.items() for v in kv])[tag_name],
        F.lit(0.7),
    )
    tl = text_len.cast("double")
    gl = tag_len.cast("double")
    ll = link_text_len.cast("double")
    text_ratio = F.when(gl > 0, tl / gl).otherwise(F.lit(0.0))
    link_ratio = F.when(tl > 0, ll / tl).otherwise(F.lit(1.0))
    t = F.lit(base_threshold)
    t = t * F.when(imp > 1.0, 0.8).otherwise(1.0)
    t = t * F.when(text_ratio > 0.4, 0.9).otherwise(1.0)
    t = t * F.when(link_ratio > 0.6, 1.2).otherwise(1.0)
    return t


def prune_keep(score: Column, threshold: float = DEFAULT_THRESHOLD) -> Column:
    """Fixed-threshold keep decision (:697-698: remove when score < t)."""
    return score >= F.lit(threshold)
