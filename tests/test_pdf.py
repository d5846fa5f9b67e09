"""PDF tier: builder↔parser round-trip, cleaner golden table, Spark stage.

The golden md/html fixtures are a ported truth table: inputs were run
through the reference's ``clean_pdf_text`` / ``clean_pdf_text_to_html``
(crawl4ai processors/pdf/utils.py:213-350 / :71-212) once, offline, and
the outputs hard-coded here — the twins in operators/pdf.py must
reproduce them byte-for-byte (quirks included: the author-heuristic
false-positive on "Abstract", the md-only ``.\\n`` paragraph split, the
md negative-index previous-line check at line 0).
"""

import pyspark.sql.functions as F
import pytest

from crawl4ai_spark.operators.pdf import (
    parse_pdf,
    pdf_extract_stage,
    pdf_html,
    pdf_markdown,
)
from crawl4ai_spark.sources.pdfsynth import build_pdf, doc_pages_of

# (name, page_number, raw_text, expected_markdown, expected_html)
GOLDEN = [
    ("title+para", 1,
     "A Study Of Synthetic Corpora\n\nalpha beta gamma delta. epsilon zeta eta theta iota kappa lam mu nu xi.",
     "## A Study Of Synthetic Corpora\n\nalpha beta gamma delta. epsilon zeta eta theta iota kappa lam mu nu xi.",
     '<h2>A Study Of Synthetic Corpora</h2>\n<div class="paragraph"><p>alpha beta gamma delta. epsilon zeta eta theta iota kappa lam mu nu xi.</p></div><hr/>'),
    ("numbered-headers", 2,
     "intro line one\n\n2.1 Background\nbody text here continues.\n\n3 Results\nmore body.",
     "## intro line one\n\n### Background\n\nbody text here continues.\n\n## Results\n\nmore body.",
     '<h2>intro line one</h2>\n<h3>Background</h3>\n<div class="paragraph"><p>body text here continues.</p></div><hr/>\n<h2>Results</h2>\n<div class="paragraph"><p>more body.</p></div><hr/>'),
    ("authors-affil-email", 1,
     "Short Title Here Now\nJane Roe, John Doe and Alex Poe\n†Example University\n{jane,john}@ex.test\nbody sentence one.",
     "## Short Title Here Now\n\n*†Example University*\n\n`{jane,john}@ex.test`\n\nJane Roe, John Doe and Alex Poe body sentence one.",
     '<h2>Short Title Here Now</h2>\n<p><em>†Example University</em></p>\n<p><code>{jane,john}@ex.test</code></p>\n<div class="paragraph"><p>Jane Roe, John Doe and Alex Poe body sentence one.</p></div><hr/>'),
    ("section+quote+hyphen", 1,
     "Abstract\nThis para has a hyphen-\nated word.\n\"quoted line\nReferences\nSmith et al. (Smith et al. 2020) said.",
     "**Abstract**\n\nThis para has a hyphen ated word.\n\n> \"quoted line\n\n**References**\n\nSmith et al. [Smith et al. 2020] said.",
     '<p><strong>Abstract</strong></p>\n<div class="paragraph"><p>This para has a hyphen ated word.</p></div><hr/>\n<blockquote><p>&quot;quoted line</p></blockquote>\n<p><strong>References</strong></p>\n<div class="paragraph"><p>Smith et al. <cite>Smith et al. 2020</cite> said.</p></div><hr/>'),
    ("neg-index-quirk", 3,
     "1 Introduction\nbody.",
     "_[1 Introduction]_\n\nbody.",
     '<h2 class="section-header"><em>1 Introduction</em></h2>\n<div class="paragraph"><p>body.</p></div><hr/>'),
    ("empty", 1, "", "", ""),
    ("dot-newline", 2,
     "one sentence.\nnext starts here and continues going on for a while longer.",
     "one sentence.\n\nnext starts here and continues going on for a while longer.",
     '<div class="paragraph"><p>one sentence. next starts here and continues going on for a while longer.</p></div><hr/>'),
    ("escapes", 2,
     'x < y & z > "w"\ncontinues on.',
     '## x < y & z > "w"\n\ncontinues on.',
     '<h2>x &lt; y &amp; z &gt; &quot;w&quot;</h2>\n<div class="paragraph"><p>continues on.</p></div><hr/>'),
]


@pytest.mark.parametrize("name,pno,text,md,html",
                         GOLDEN, ids=[g[0] for g in GOLDEN])
def test_cleaner_golden(name, pno, text, md, html):
    assert pdf_markdown(pno, text) == md
    assert pdf_html(pno, text) == html


def _mk(pages, **kw):
    return build_pdf(pages, **kw)


def test_roundtrip_compressed_and_not():
    pages = [["first line", "second line"], ["page two only"]]
    for compress in (True, False):
        res = parse_pdf(_mk(pages, compress=compress))
        assert res["metadata"]["n_pages"] == 2
        assert [p["raw_text"] for p in res["pages"]] == [
            "first line\nsecond line", "page two only"]
        assert [p["page_number"] for p in res["pages"]] == [1, 2]


def test_roundtrip_escapes_and_metadata():
    pages = [["parens (x) and \\ backslash", "tab\\t literal text"]]
    pdf = _mk(pages, title="T (1) \\ two", author="A & B",
              producer="synth é", created="D:20260817103000",
              modified="D:20251231235959")
    res = parse_pdf(pdf)
    m = res["metadata"]
    assert m["title"] == "T (1) \\ two"
    assert m["author"] == "A & B"
    assert m["producer"] == "synth é"
    assert m["created"] == "2026-08-17T10:30:00"
    assert m["modified"] == "2025-12-31T23:59:59"
    assert m["file_size"] == len(pdf)
    assert res["pages"][0]["raw_text"] == (
        "parens (x) and \\ backslash\ntab\\t literal text")


def test_roundtrip_links():
    pdf = _mk([["a"], ["b"], ["c"]],
              links=[["https://x.test/1", "https://x.test/2"], [],
                     ["https://x.test/3"]])
    res = parse_pdf(pdf)
    assert [p["links"] for p in res["pages"]] == [
        ["https://x.test/1", "https://x.test/2"], [], ["https://x.test/3"]]


def test_bad_date_is_none():
    res = parse_pdf(_mk([["x"]], created="yesterday"))
    assert res["metadata"]["created"] is None


def test_encrypted_detected_not_parsed():
    pdf = _mk([["secret"]])
    enc = pdf.replace(b"trailer\n<< ", b"trailer\n<< /Encrypt 99 0 R ")
    res = parse_pdf(enc)
    assert res["metadata"]["encrypted"] is True
    assert res["pages"] == []


def test_doc_pages_of_wraps_deterministically():
    text = " ".join(f"w{i}" for i in range(8 * 20 + 5))  # 1 page + 1 line
    pages = doc_pages_of(text)
    assert len(pages) == 2
    assert len(pages[0]) == 20 and len(pages[1]) == 1
    assert pages[0][0] == " ".join(f"w{i}" for i in range(8))
    assert doc_pages_of("") == [[""]]
    # non-latin1 chars are replaced as part of the fixture definition
    assert doc_pages_of("café 中文")[0] == ["café ??"]


def test_stage_rows_and_error_isolation(spark):
    good = _mk([["hello world"], ["second page"]], title="Doc A",
               links=[["https://a.test"], []])
    rows = [("a", bytearray(good)),
            ("b", bytearray(b"%PDF-1.4 not really a pdf")),
            ("c", bytearray(_mk([["only page"]], title="Doc C")))]
    df = spark.createDataFrame(rows, "doc_id string, pdf binary")
    out = pdf_extract_stage(df).orderBy("doc_id", "page_number").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.page_number for r in by_doc["a"]] == [1, 2]
    assert by_doc["a"][0].raw_text == "hello world"
    assert by_doc["a"][0].links == ["https://a.test"]
    assert by_doc["a"][0].title == "Doc A"
    assert by_doc["a"][0].n_pages == 2
    assert by_doc["a"][0].error is None
    # the broken document yields exactly one error row, others unharmed
    assert len(by_doc["b"]) == 1
    assert by_doc["b"][0].error is not None
    assert by_doc["b"][0].page_number == 0
    assert by_doc["c"][0].markdown == pdf_markdown(1, "only page")


def test_stage_stream_noise_immunity(spark):
    """Stream payloads containing byte patterns like 'N 0 obj' or
    'trailer' must not derail the object scan (the consumed-offset guard).
    Uncompressed streams carry the patterns literally; compressed ones
    model the accidental-bytes case."""
    lines = ["7 0 obj << /Root 1 0 R >> trailer %d" % i for i in range(50)]
    for compress in (False, True):
        res = parse_pdf(_mk([lines], title="T", compress=compress))
        assert res["pages"][0]["raw_text"] == "\n".join(lines)
        assert res["metadata"]["title"] == "T"


# ------------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_spark.sources.pdfsynth import pdf_bytes_of


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=4000), st.integers(min_value=0, max_value=10_000))
def test_build_parse_roundtrip_property(text, i):
    """For ANY text: parse(pdf_bytes_of(i, text)) reproduces exactly the
    page/line recipe (doc_pages_of) and the metadata recipe — the same
    identity the pdf_extract gate oracle relies on."""
    from crawl4ai_spark.sources.pdfsynth import doc_meta_of

    res = parse_pdf(pdf_bytes_of(i, text))
    pages = doc_pages_of(text)
    meta = doc_meta_of(i)
    assert res["metadata"]["n_pages"] == len(pages)
    assert res["metadata"]["title"] == meta["title"]
    assert res["metadata"]["created"] == meta["created_iso"]
    for want, got in zip(pages, res["pages"]):
        assert got["raw_text"] == "\n".join(want)
