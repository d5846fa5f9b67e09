"""Rule-based extraction (reference rule_based_extraction.py:30-511).

The truth table below is HAND-DERIVED from the reference semantics (the
derivation is spelled out inline), so it anchors BOTH the engine and the
oracle twin without circularity — the same pattern as
test_backoff_truth.py.
"""

from __future__ import annotations

import json

import pytest

from crawl4ai_spark.operators.rules import (
    RulePattern,
    extract_rules,
    html_text,
    normalize_text,
    rules_extract_stage,
)
from crawl4ai_spark.oracle.expected import _rules_twin

HTML = (
    "<html><head><title>Board</title>"
    '<script>var h = "30 hours";</script></head>'
    "<body><p>Nurses must complete 24 contact hours for license renewal "
    "every 2 years.</p>"
    "<p>At least 4 hours of pharmacology training; 24 hours total.</p>"
    "<!-- 99 hours --></body></html>"
)

# Derivation (reference rule_based_extraction.py, utils.py:716/2641):
#   text   = "Board Nurses must complete 24 contact hours for license
#             renewal every 2 years. At least 4 hours of pharmacology
#             training; 24 hours total."   (script + comment excluded)
#   t      = lowercased, '.'/';' stripped.
#   ce_hours (conf .85):  "24 contact hours"→value 24;  "4 hours"→4;
#                         "24 hours"→24  ("2 years" is not an hours unit)
#   renewal (conf .8):    alternation matches at "license" (the 'renewal'
#                         branch fails there, 'license renewal' matches
#                         first at the earlier offset) →
#                         raw "license renewal every 2 years", value
#                         "2 years"
#   specialized (conf .75): only "4 hours … of pharmacology training"
#                         (the '24's are followed by 'contact'/'total',
#                         not an hours/credits unit with of/in/for+topic
#                         … "24 hours total" has no indicator after it)
#   threshold .7 keeps all five; relations (conf .65) are CUT at .7.
#   verification: value "24" recurs (count('24')==2 → +0.2, cap 1.0);
#                 value "4" occurs 3× as a substring (24,4,24 → +0.2);
#                 "2 years" matches ^\d+\s*[a-zA-Z]+$ → +0.2 = 1.0;
#                 specialized has NO value key (reference quirk) → .75.
#   dedup: second ce_hours "24" row collapses into the first.
#   sort by confidence desc (stable): ce 24, ce 4, renewal, specialized.
EXPECTED_07 = [
    ("ce_hours", "24", "24 contact hours", 0.85, 1.0, True),
    ("ce_hours", "4", "4 hours", 0.85, 1.0, True),
    ("renewal_period", "2 years", "license renewal every 2 years", 0.8, 1.0, True),
    ("specialized_requirement", None, "4 hours of pharmacology training ",
     0.75, 0.75, True),
]


def _norm_rows(rows):
    return [(r["type"], r.get("value"), r.get("raw_match"),
             r["confidence"], r["verification_score"], r["verified"])
            for r in rows]


def test_text_extraction_excludes_script_and_comments():
    text = html_text(HTML)
    assert "30 hours" not in text       # script excluded (bs4>=4.9)
    assert "99 hours" not in text       # comment excluded
    assert text.startswith("Board Nurses must complete")


def test_default_patterns_truth_table():
    rows = extract_rules("u", HTML, confidence_threshold=0.7)
    got = _norm_rows(rows)
    want = [
        (t, v, r, c, vs, ok)
        for (t, v, r, c, vs, ok) in EXPECTED_07
    ]
    # specialized rows carry hours/topic instead of value/raw uses topic
    assert got[:3] == want[:3]
    t, v, r, c, vs, ok = got[3]
    assert (t, v, c, vs, ok) == ("specialized_requirement", None, 0.75, 0.75, True)
    assert rows[3]["hours"] == "4" and rows[3]["topic"] == "pharmacology training"


def test_relation_surfaces_below_default_threshold():
    # derivation: sorted by span start the adjacent pair is
    # (ce_hours "24 contact hours", renewal "license renewal every 2
    # years"); the between-text " for " hits indicator "for" ("of" is not
    # a substring of " for "); all other adjacent gaps carry no indicator.
    # conf .65 ≥ .6 → exactly ONE relation row, ranked last.
    rows = extract_rules("u", HTML, confidence_threshold=0.6)
    rels = [r for r in rows if r["type"] == "relation"]
    assert len(rels) == 1
    rel = rels[0]
    assert rel["entity1"] == "24" and rel["entity1_type"] == "ce_hours"
    assert rel["entity2"] == "2 years" and rel["entity2_type"] == "renewal_period"
    assert rel["relation"] == "for"
    assert rel["confidence"] == 0.65
    assert rel["verified"]          # score .65 >= .6
    assert rows[-1]["type"] == "relation"   # lowest confidence ranks last


def test_oracle_twin_matches_truth_table():
    # the twin consumes plain text; feed it the hand-derived text
    text = ("Board Nurses must complete 24 contact hours for license "
            "renewal every 2 years. At least 4 hours of pharmacology "
            "training; 24 hours total.")
    rows = _rules_twin("u", text, threshold=0.7)
    got = [(r["rtype"], r["value"], r["raw_match"], r["confidence"],
            r["verification_score"], r["verified"]) for r in rows]
    assert got[:3] == EXPECTED_07[:3]
    assert got[3][0] == "specialized_requirement" and got[3][1] is None
    extra = json.loads(rows[3]["extra"])
    assert extra["hours"] == "4" and extra["topic"] == "pharmacology training"


def test_custom_regex_and_keyword_patterns():
    pats = [
        RulePattern("email", r"[a-z0-9]+@[a-z]+\.[a-z]+"),
        RulePattern("brand", "ACME", kind="keyword"),
    ]
    # normalize_text strips '@' and '.' — custom patterns see the
    # NORMALIZED text (reference behavior :117-121), so the email regex
    # cannot match post-normalization; the keyword still hits.
    html = "<body><p>Contact bob@acme.com — ACME sells acme widgets.</p></body>"
    rows = extract_rules("u", html, patterns=pats, confidence_threshold=0.5)
    kinds = {r["type"] for r in rows}
    assert "email" not in kinds
    brands = [r for r in rows if r["type"] == "brand"]
    # "acme" appears 3× case-insensitively; dedup keys on the MATCHED
    # text, so "acme" (2×, collapsed) and "ACME"… matched text comes from
    # the normalized (lowercased) string → all collapse to one row
    assert len(brands) == 1 and brands[0]["value"] == "acme"


def test_empty_and_textless_html():
    assert extract_rules("u", "")[0]["type"] == "error"
    assert extract_rules("u", "<body><script>x</script></body>")[0]["type"] == "error"


def test_normalize_text_spec():
    assert normalize_text("  A.  B,c!  ") == "a bc"
    assert normalize_text("") == ""


def test_stage_matches_sequential(spark):
    pdf_rows = [("https://x.test/1", HTML),
                ("https://x.test/2", "<body><p>renew every 3 years; "
                                     "12 CE hours of ethics.</p></body>")]
    df = spark.createDataFrame(pdf_rows, "url string, html string")
    got = (
        rules_extract_stage(df, confidence_threshold=0.6)
        .orderBy("url", "rank").collect()
    )
    want = []
    for url, html in pdf_rows:
        for rank, d in enumerate(extract_rules(url, html,
                                               confidence_threshold=0.6)):
            want.append((url, rank, d["type"]))
    assert [(r["url"], r["rank"], r["rtype"]) for r in got] == sorted(
        want, key=lambda x: (x[0], x[1])
    )
