"""Scalar text utilities from the reference's ``utils.py``, vectorized.

Column twins of the general-purpose string helpers crawl4ai exposes and
uses across its extraction/LLM paths (reference cites per function).  All
of them are pure Catalyst column expressions — whole-stage codegen, zero
shuffle, no Python in the hot path.  The two utilities that genuinely need
imperative per-row scans (``split_and_parse_json_objects``,
``merge_chunks``) already live in ``operators/llm.py`` as Arrow stages
(``split_json_objects``, ``merge_chunks``).

Documented divergences:

* ``extract_xml_tags`` (utils.py:1540-1552) returns ``list(set(tags))`` —
  Python set-iteration order, which is run-to-run UNSTABLE.  The column
  twin returns first-occurrence order (``array_distinct``), a determinism
  upgrade rather than a behavior change.
* ``sanitize_input_encode`` (utils.py:741-757) re-encodes through UTF-8
  with ``errors='ignore'``.  Spark SQL strings are already valid UTF-8 by
  construction, so the surviving semantics are exactly the null/empty
  guard — the twin documents that and returns '' for NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference utils.py:2376-2390 (noise) and :2392-2573 (STOP_WORDS),
# reproduced verbatim as data — the membership test is the semantics.
CLEAN_TOKENS_NOISE = [
    "ccp", "up", "↑", "▲", "⬆️", "a", "an", "at", "by", "in", "of", "on",
    "to", "the",
]

CLEAN_TOKENS_STOP = [
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "has",
    "he", "in", "is", "it", "its", "of", "on", "that", "the", "to", "was",
    "were", "will", "with",
    "i", "you", "she", "we", "they", "me", "him", "her", "us", "them",
    "my", "your", "his", "our", "their", "mine", "yours", "hers", "ours",
    "theirs", "myself", "yourself", "himself", "herself", "itself",
    "ourselves", "themselves",
    "am", "been", "being", "have", "had", "having", "do", "does", "did",
    "doing",
    "about", "above", "across", "after", "against", "along", "among",
    "around", "before", "behind", "below", "beneath", "beside", "between",
    "beyond", "down", "during", "except", "inside", "into", "near", "off",
    "out", "outside", "over", "past", "through", "toward", "under",
    "underneath", "until", "upon", "within",
    "but", "or", "nor", "yet", "so", "although", "because", "since",
    "unless",
    "this", "these", "those", "what", "which", "who", "whom", "whose",
    "when", "where", "why", "how", "all", "any", "both", "each", "few",
    "more", "most", "other", "some", "such", "can", "cannot", "can't",
    "could", "couldn't", "may", "might", "must", "mustn't", "shall",
    "should", "shouldn't", "won't", "would", "wouldn't", "not", "n't",
    "no", "none",
]


def normalize_text_col(c: Column) -> Column:
    """Twin of ``normalize_text`` (utils.py:2641-2662): collapse
    whitespace, strip, lowercase, then drop every char that is not a word
    char or whitespace.  ``(?U)`` makes Java's ``\\w`` match the Unicode
    set Python's ``re`` uses, so accented words survive like the
    reference's."""
    collapsed = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    out = F.regexp_replace(collapsed, r"(?U)[^\w\s]", "")
    return F.when(c.isNull() | (c == ""), F.lit("")).otherwise(out)


def clean_tokens_col(tokens: Column) -> Column:
    """Twin of ``clean_tokens`` (utils.py:2359-2586): keep tokens longer
    than 2 chars that are neither noise nor stop words and don't start
    with ↑/▲/⬆ (the Wikipedia edit-marker glyphs)."""
    stop = F.array(*[F.lit(w) for w in
                     sorted(set(CLEAN_TOKENS_NOISE) | set(CLEAN_TOKENS_STOP))])
    return F.filter(
        tokens,
        lambda t: (F.length(t) > 2)
        & ~F.array_contains(stop, t)
        & ~t.startswith("↑") & ~t.startswith("▲") & ~t.startswith("⬆"),
    )


def sanitize_html_col(c: Column) -> Column:
    """Twin of ``sanitize_html`` (utils.py:716-739): escape double and
    single quotes with a backslash (the commented-out char strip in the
    reference is dead code and stays dead here)."""
    return F.replace(F.replace(c, F.lit('"'), F.lit('\\"')),
                     F.lit("'"), F.lit("\\'"))


def sanitize_input_encode_col(c: Column) -> Column:
    """Twin of ``sanitize_input_encode`` (utils.py:741-757).  Spark SQL
    strings are valid UTF-8 by construction, so the encode/decode
    round-trip with errors='ignore' is the identity; what remains is the
    falsy guard (None/'' → '')."""
    return F.coalesce(c, F.lit(""))


# Control chars escape_json_string \u-escapes AFTER the named ones
# (\b \f \n \r \t) are replaced: [\x00-\x1f\x7f-\x9f] minus those five.
_JSON_CTRL = [i for i in list(range(0x20)) + list(range(0x7F, 0xA0))
              if i not in (0x08, 0x0C, 0x0A, 0x0D, 0x09)]


def escape_json_string_col(c: Column) -> Column:
    """Twin of ``escape_json_string`` (utils.py:759-786): backslash first,
    then the double quote, the five named controls, and finally every
    remaining control char in [\\x00-\\x1f\\x7f-\\x9f] as ``\\uXXXX``.
    Each control char maps to a FIXED replacement, so the regex-with-
    callback becomes a chain of literal replaces — still pure codegen."""
    out = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    for ch, esc in (("\b", "\\b"), ("\f", "\\f"), ("\n", "\\n"),
                    ("\r", "\\r"), ("\t", "\\t")):
        out = F.replace(out, F.lit(ch), F.lit(esc))
    for i in _JSON_CTRL:
        out = F.replace(out, F.lit(chr(i)), F.lit("\\u{:04x}".format(i)))
    return out


def extract_xml_tags_col(c: Column) -> Column:
    """Twin of ``extract_xml_tags`` (utils.py:1540-1552): the distinct
    ``<word>`` tag names.  First-occurrence order (the reference's
    ``list(set(...))`` order is unstable; see module docstring)."""
    return F.array_distinct(F.regexp_extract_all(c, F.lit(r"<(\w+)>"), 1))


def extract_xml_data_cols(c: Column, tags: list[str]) -> Column:
    """Twin of ``extract_xml_data`` (utils.py:1554-1581) for a FIXED tag
    list: a map of tag → first ``<tag>…</tag>`` payload (DOTALL, trimmed,
    '' when absent) — the shape the LLM block parsers consume."""
    pairs = []
    for tag in tags:
        pairs.append(F.lit(tag))
        pairs.append(F.trim(F.regexp_extract(c, f"(?s)<{tag}>(.*?)</{tag}>", 1)))
    return F.create_map(*pairs)


def fast_format_html_col(c: Column) -> Column:
    """Twin of ``fast_format_html`` (utils.py:2102-2145): the string-
    operation HTML formatter — split on tag boundaries, two-space indent,
    closing tags dedent before printing, opening tags indent after
    (quirks preserved: void tags like ``<br>`` indent too, negative
    indents clamp only through repeat()'s empty result).

    Runs as ONE Catalyst ``aggregate`` over the split parts with a
    (text, indent) accumulator — codegen, zero shuffle, no Python."""
    parts = F.split(
        F.replace(F.replace(c, F.lit(">"), F.lit(">\n")),
                  F.lit("<"), F.lit("\n<")),
        "\n",
    )
    ind = lambda n: F.repeat(F.lit("  "), F.greatest(n, F.lit(0)))  # noqa: E731

    def step(acc, part):
        p = F.trim(part)
        out, n = acc["out"], acc["ind"]
        line = lambda lvl: F.concat(  # noqa: E731
            out, F.when(out == "", F.lit("")).otherwise(F.lit("\n")),
            ind(lvl), p)
        return (
            F.when(p == "", acc)
            .when(p.startswith("</"), F.struct(
                line(n - 1).alias("out"), (n - 1).alias("ind")))
            .when(p.startswith("<") & p.endswith("/>"), F.struct(
                line(n).alias("out"), n.alias("ind")))
            .when(p.startswith("<"), F.struct(
                line(n).alias("out"), (n + 1).alias("ind")))
            .otherwise(F.struct(line(n).alias("out"), n.alias("ind")))
        )

    acc0 = F.struct(F.lit("").alias("out"), F.lit(0).alias("ind"))
    return F.aggregate(parts, acc0, step, lambda acc: acc["out"])
