"""Deterministic minimal-PDF builder (the fixture side of the PDF tier).

Emits valid PDF 1.4 bytes from pure inputs (page line-lists + metadata +
links), so the PDF extraction oracle can be derived from the SAME inputs
without ever running the parser: text in == text out, links in == links
out, metadata in == metadata out.  The builder writes the subset of PDF a
text-centric generator needs — Helvetica text via ``Tj`` show-ops, one
``Td`` per line, optional FlateDecode content streams, ``/Annots`` URI
links, an ``/Info`` dict, and a correct xref table (external tools can
read these files too).

Reference analog: the crawl4ai PDF processor consumes arbitrary real-world
PDFs through PyPDF2 (processors/pdf/processor.py:57-120); this sandbox has
no PyPDF2 and no real PDFs, so the builder defines the deterministic
corpus the from-scratch parser (operators/pdf.py) is exercised against.
"""

from __future__ import annotations

import zlib

__all__ = ["build_pdf", "escape_pdf_string", "doc_pages_of", "doc_meta_of",
           "doc_links_of", "pdf_bytes_of", "pdf_corpus", "PAGE_LINES",
           "LINE_WORDS"]

# Page-ification recipe shared by the engine probe and the oracle twin:
# wrap the document's whitespace tokens into lines of LINE_WORDS words,
# PAGE_LINES lines per page (FIXTURES.md §5).
LINE_WORDS = 8
PAGE_LINES = 20


def _latin1(s: str) -> str:
    """PDF literal strings in this builder are Latin-1; anything outside
    is replaced with '?' — part of the fixture definition (both the built
    bytes and the expected table apply it), not parser behavior."""
    return s.encode("latin-1", "replace").decode("latin-1")


def escape_pdf_string(s: str) -> str:
    """Escape for a PDF literal string: backslash, parens (ISO 32000-1
    §7.3.4.2)."""
    return (
        _latin1(s).replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    )


def doc_pages_of(text: str) -> list[list[str]]:
    """Split a document's text into per-page line lists (shared recipe —
    the oracle reconstructs expected raw_text as '\\n'.join(lines))."""
    words = _latin1(text or "").split()
    lines = [
        " ".join(words[i:i + LINE_WORDS])
        for i in range(0, len(words), LINE_WORDS)
    ]
    if not lines:
        lines = [""]
    return [
        lines[i:i + PAGE_LINES] for i in range(0, len(lines), PAGE_LINES)
    ]


def _content_stream(lines: list[str]) -> bytes:
    ops = ["BT", "/F1 11 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({escape_pdf_string(line)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def build_pdf(pages: list[list[str]], *, title: str | None = None,
              author: str | None = None, producer: str | None = None,
              created: str | None = None, modified: str | None = None,
              links: list[list[str]] | None = None,
              compress: bool = True) -> bytes:
    """Build a complete PDF.

    ``pages``  — one list of text lines per page.
    ``links``  — optional per-page URI lists (become /Annots link
                 annotations with zero-size rects).
    ``created``/``modified`` — PDF date strings like ``D:20260817103000``.
    ``compress`` — FlateDecode the content streams (zlib).
    """
    objs: list[bytes] = []  # 1-based object bodies, index i -> obj i+1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    n_pages = len(pages)
    # Object layout: 1=Catalog, 2=Pages, 3=Font, then per page:
    # page obj, content obj, link annot objs; finally Info.
    catalog_num = add(b"")     # placeholder, filled below
    pages_num = add(b"")
    font_num = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    page_nums: list[int] = []
    for pi, page_lines in enumerate(pages):
        data = _content_stream(page_lines)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b" /Filter /FlateDecode"
        content_num = add(
            b"<< /Length " + str(len(data)).encode() + filt
            + b" >>\nstream\n" + data + b"\nendstream"
        )
        annot_nums = []
        for uri in (links[pi] if links and pi < len(links) else []):
            annot_nums.append(add(
                b"<< /Type /Annot /Subtype /Link /Rect [0 0 0 0] /A << "
                b"/S /URI /URI (" + escape_pdf_string(uri).encode("latin-1")
                + b") >> >>"
            ))
        annots = (
            b" /Annots [" + b" ".join(b"%d 0 R" % a for a in annot_nums)
            + b"]" if annot_nums else b""
        )
        page_nums.append(add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R%s >>"
            % (pages_num, font_num, content_num, annots)
        ))

    info_parts = []
    for key, val in (("Title", title), ("Author", author),
                     ("Producer", producer)):
        if val is not None:
            info_parts.append(
                f"/{key} ({escape_pdf_string(val)})".encode("latin-1"))
    for key, val in (("CreationDate", created), ("ModDate", modified)):
        if val is not None:
            info_parts.append(f"/{key} ({val})".encode("latin-1"))
    info_num = add(b"<< " + b" ".join(info_parts) + b" >>")

    objs[catalog_num - 1] = b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num
    objs[pages_num - 1] = (
        b"<< /Type /Pages /Count %d /Kids [%s] >>"
        % (n_pages, b" ".join(b"%d 0 R" % p for p in page_nums))
    )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0] * (len(objs) + 1)
    for i, body in enumerate(objs, start=1):
        offsets[i] = len(out)
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objs) + 1):
        out += b"%010d 00000 n \n" % offsets[i]
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R /Info %d 0 R >>\n"
        b"startxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog_num, info_num, xref_at)
    )
    return bytes(out)


# ------------------------------------------------- per-document recipes
# Pure functions of (doc_id, text) — the oracle derives its expected
# table from THESE, never from the parser (oracle/expected.py
# ensure_pdf_expected), so the gate checks the parser against its inputs.

def doc_meta_of(i: int) -> dict:
    day, hour = 1 + i % 28, i % 24
    minute, sec = (7 * i) % 60, (13 * i) % 60
    return {
        "title": f"Synthetic Document {i}",
        "author": f"Author {i % 97}",
        "producer": "crawl4ai-spark-synth",
        "created": f"D:202601{day:02d}{hour:02d}{minute:02d}{sec:02d}",
        "created_iso": f"2026-01-{day:02d}T{hour:02d}:{minute:02d}:{sec:02d}",
        "compress": i % 2 == 0,
    }


def doc_links_of(i: int, n_pages: int) -> list[list[str]]:
    return [[f"https://pdf.test/{i}/p{p}"] for p in range(1, n_pages + 1)]


def pdf_bytes_of(i: int, text: str) -> bytes:
    pages = doc_pages_of(text)
    m = doc_meta_of(i)
    return build_pdf(
        pages, title=m["title"], author=m["author"], producer=m["producer"],
        created=m["created"], links=doc_links_of(i, len(pages)),
        compress=m["compress"],
    )


def pdf_corpus(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(numeric id, text) DataFrame → (doc_id string, pdf binary) via
    ``pdf_bytes_of`` — the Spark-side corpus builder for the PDF probes."""
    import pandas as pd

    def run(batches):
        for b in batches:
            ids = b[id_col].astype("int64")
            yield pd.DataFrame({
                "doc_id": ids.astype(str),
                "pdf": [pdf_bytes_of(int(i), t if isinstance(t, str) else "")
                        for i, t in zip(ids, b[text_col])],
            })

    return docs.mapInPandas(run, "doc_id string, pdf binary")
