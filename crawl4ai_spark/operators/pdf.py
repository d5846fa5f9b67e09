"""PDF processing tier (reference: crawl4ai/processors/pdf/).

The reference's ``NaivePDFProcessorStrategy`` (processors/pdf/processor.py:
57-120) reads PDFs with PyPDF2 and emits per-page ``raw_text`` / ``markdown``
/ ``html`` / ``links`` / image info plus document metadata
(processor.py:24-50).  PyPDF2 is absent in this sandbox, so the reading
side here is a from-scratch stdlib parser for the well-formed text-PDF
subset (the corpus built by sources/pdfsynth.py, and any real PDF of the
same shape): object scan, dict/array/string/name value parser, FlateDecode
(zlib), page-tree walk, content-stream text extraction, /Annots URI links,
/Info metadata with PDF-date parsing (processor.py:441-455 semantics).

Supported-subset notes (documented divergences from a full PDF reader):
  * Filters: FlateDecode and unfiltered streams.  Other filters (DCT,
    LZW, ...) surface as a per-document ``error`` row — at corpus scale a
    bad document must never kill the batch.
  * Text semantics: literal/hex strings are Latin-1; font CMap /
    ToUnicode tables are not consulted (PyPDF2 does; our corpus is
    Helvetica/latin-1).  Each ``Td``/``TD``/``T*``/``Tm`` after text has
    been shown starts a new line; ``'``/``"`` show with a leading
    newline; ``TJ`` concatenates its string elements.
  * Encrypted documents are detected (/Encrypt in the trailer) and
    reported, not decrypted — matching the reference, which only surfaces
    ``encrypted`` as metadata (processor.py:436).

``clean_pdf_text`` / ``clean_pdf_text_to_html`` (reference
processors/pdf/utils.py:213-350 / :71-212) are re-derived as ONE rule
core with two renderers — the two reference functions differ only in
output formatting.  Preserved reference quirks (checked by the fixture
truth table in tests/test_pdf.py):
  * the markdown variant inserts a blank line after ``.\\n`` BEFORE
    splitting (utils.py:222) — the html variant does not;
  * the markdown variant's numbered-header check reads ``lines[i-1]``
    without an ``i > 0`` guard (utils.py:266), so line 0 compares against
    the LAST line via Python negative indexing — the html variant guards;
  * the author heuristic fires for ANY all-capitalized-words line on
    page 1 (utils.py:231-234);
  * ``\\s+-\\s+`` post-processing joins across spaced hyphens and
    ``\\s+([.,!?)])`` tightens punctuation in both variants.
"""

from __future__ import annotations

import re
import warnings
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["parse_pdf", "pdf_extract_stage", "pdf_markdown", "pdf_html",
           "PDF_SCHEMA"]


# ===================================================================== lexer

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Byte-level PDF token reader (ISO 32000-1 §7.2-7.3 subset)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek(self) -> bytes:
        self._skip_ws()
        return self.data[self.pos:self.pos + 2]

    def _bareword(self) -> str:
        d, n = self.data, len(self.data)
        start = self.pos
        while self.pos < n and d[self.pos] not in _WS and \
                d[self.pos] not in _DELIM:
            self.pos += 1
        return d[start:self.pos].decode("latin-1")

    def name(self) -> str:
        self.pos += 1  # '/'
        raw = self._bareword()
        # #xx hex escapes in names (§7.3.5)
        return re.sub(r"#([0-9A-Fa-f]{2})",
                      lambda m: chr(int(m.group(1), 16)), raw)

    def literal_string(self) -> str:
        """( ... ) with nesting and backslash escapes (§7.3.4.2)."""
        d, n = self.data, len(self.data)
        self.pos += 1
        depth = 1
        out = []
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out.append({0x6E: "\n", 0x72: "\r", 0x74: "\t",
                                0x62: "\b", 0x66: "\f"}[e])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(chr(e))
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = ""
                    while len(oct_digits) < 3 and self.pos < n and \
                            0x30 <= d[self.pos] <= 0x37:
                        oct_digits += chr(d[self.pos])
                        self.pos += 1
                    out.append(chr(int(oct_digits, 8) & 0xFF))
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(chr(e))
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append("(")
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    break
                out.append(")")
            else:
                out.append(chr(c))
                self.pos += 1
        return "".join(out)

    def hex_string(self) -> str:
        self.pos += 1  # '<'
        end = self.data.find(b">", self.pos)
        if end < 0:
            end = len(self.data)
        digits = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos:end])
        self.pos = end + 1
        if len(digits) % 2:
            digits += b"0"
        return bytes.fromhex(digits.decode("ascii")).decode("latin-1")

    def value(self):
        """Parse one PDF object value; ``(n, 'R')`` refs become _Ref."""
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            return None
        two = d[self.pos:self.pos + 2]
        c = two[:1]
        if two == b"<<":
            return self._dict()
        if c == b"<":
            return self.hex_string()
        if c == b"(":
            return self.literal_string()
        if c == b"[":
            self.pos += 1
            arr = []
            while True:
                self._skip_ws()
                if self.pos >= len(d) or d[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.value())
        if c == b"/":
            return _Name(self.name())
        word = self._number_or_keyword()
        return word

    def _number_or_keyword(self):
        save = self.pos
        word = self._bareword()
        if not word:  # stray delimiter — consume one byte defensively
            self.pos += 1
            return None
        if re.fullmatch(r"[+-]?\d+", word):
            # possible indirect reference "n g R"
            mark = self.pos
            lex = _Lexer(self.data, self.pos)
            lex._skip_ws()
            gen = lex._bareword()
            if re.fullmatch(r"\d+", gen):
                lex._skip_ws()
                kw = lex._bareword()
                if kw == "R":
                    self.pos = lex.pos
                    return _Ref(int(word))
            self.pos = mark
            return int(word)
        if re.fullmatch(r"[+-]?(\d+\.\d*|\.\d+|\d+)", word):
            return float(word)
        if word == "true":
            return True
        if word == "false":
            return False
        if word == "null":
            return None
        return _Op(word)

    def _dict(self) -> dict:
        self.pos += 2  # '<<'
        out = {}
        while True:
            self._skip_ws()
            if self.data[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                return out
            if self.pos >= len(self.data):
                return out
            if self.data[self.pos] != 0x2F:  # malformed: not a /name key
                self.pos += 1
                continue
            key = self.name()
            out[key] = self.value()


class _Name(str):
    """A /Name token (distinct from string values)."""


class _Ref(int):
    """Indirect reference to object number N (generation ignored)."""


class _Op(str):
    """A bare keyword token inside a content stream (an operator)."""


# ================================================================== document

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_DATE_RE = re.compile(r"D:(\d{4})(\d{2})(\d{2})(\d{2})(\d{2})(\d{2})")


class _Pdf:
    def __init__(self, data: bytes):
        self.data = data
        self.objects: dict[int, tuple[dict | object, bytes | None]] = {}
        self.trailer: dict = {}
        self._scan()

    # -- object scan (xref-free: tolerant of broken offset tables) --------
    def _scan(self) -> None:
        data = self.data
        consumed = 0  # binary stream bytes can contain "N G obj"/"trailer"
        for m in _OBJ_RE.finditer(data):
            if m.start() < consumed:
                continue
            num = int(m.group(1))
            lex = _Lexer(data, m.end())
            val = lex.value()
            stream = None
            lex._skip_ws()
            consumed = lex.pos
            if data[lex.pos:lex.pos + 6] == b"stream":
                p = lex.pos + 6
                if data[p:p + 2] == b"\r\n":
                    p += 2
                elif data[p:p + 1] == b"\n":
                    p += 1
                length = val.get("Length") if isinstance(val, dict) else None
                if isinstance(length, _Ref):
                    length = None  # forward-referenced /Length: scan instead
                if isinstance(length, int):
                    stream = data[p:p + length]
                    consumed = p + length
                else:
                    end = data.find(b"endstream", p)
                    stream = data[p:end if end >= 0 else len(data)]
                    stream = stream.rstrip(b"\r\n")
                    consumed = end if end >= 0 else len(data)
            self.objects[num] = (val, stream)
            endobj = data.find(b"endobj", consumed)
            if endobj >= 0:
                consumed = endobj + 6
        # later trailers override earlier ones (incremental updates);
        # the skip above means `consumed` never sits inside a stream, so
        # trailer matches before it are stream noise.
        for t in re.finditer(rb"trailer\b", data):
            if t.start() < consumed:
                continue
            lex = _Lexer(data, t.end())
            d = lex.value()
            if isinstance(d, dict):
                self.trailer.update(d)
        if "Root" not in self.trailer:
            for num, (val, _) in self.objects.items():
                if isinstance(val, dict) and val.get("Type") == "Catalog":
                    self.trailer["Root"] = _Ref(num)
                    break

    def resolve(self, v):
        seen = 0
        while isinstance(v, _Ref) and seen < 32:
            v = self.objects.get(int(v), (None, None))[0]
            seen += 1
        return v

    def stream_of(self, ref) -> bytes:
        num = int(ref) if isinstance(ref, _Ref) else None
        if num is None or num not in self.objects:
            return b""
        val, stream = self.objects[num]
        if stream is None:
            return b""
        filt = self.resolve(val.get("Filter")) if isinstance(val, dict) else None
        filters = filt if isinstance(filt, list) else ([filt] if filt else [])
        out = stream
        for f in filters:
            f = self.resolve(f)
            if f == "FlateDecode":
                out = zlib.decompress(out)
            elif f is None:
                continue
            else:
                raise NotImplementedError(f"unsupported stream filter /{f}")
        return out

    # -- page tree --------------------------------------------------------
    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise ValueError("no /Root catalog found")
        out: list[dict] = []

        def walk(node, depth=0):
            node = self.resolve(node)
            if not isinstance(node, dict) or depth > 64:
                return
            if node.get("Type") == "Page":
                out.append(node)
                return
            for kid in self.resolve(node.get("Kids")) or []:
                walk(kid, depth + 1)

        walk(root.get("Pages"))
        return out


# ============================================================ text extraction

def _extract_text(content: bytes) -> str:
    """Text show-ops → lines (module-docstring newline semantics)."""
    lex = _Lexer(content)
    parts: list[str] = []
    stack: list = []
    shown = False  # any text shown since BT / start
    while True:
        lex._skip_ws()
        if lex.pos >= len(lex.data):
            break
        v = lex.value()
        if isinstance(v, _Op):
            op = str(v)
            if op == "Tj" and stack and isinstance(stack[-1], str):
                parts.append(stack[-1])
                shown = True
            elif op == "TJ" and stack and isinstance(stack[-1], list):
                parts.append("".join(
                    e for e in stack[-1] if isinstance(e, str)))
                shown = True
            elif op in ("'", '"') and stack and isinstance(stack[-1], str):
                parts.append("\n" + stack[-1])
                shown = True
            elif op in ("Td", "TD", "T*", "Tm"):
                if shown:
                    parts.append("\n")
            elif op == "BT":
                shown = False
            stack.clear()
        else:
            stack.append(v)
    return "".join(parts)


# ======================================================= text → markdown/html

_EMAIL_RE = re.compile(r"\{.*?\}")
_QUOTE_RE = re.compile(r'^["“]')
_AFFIL_RE = re.compile(r"^†")
_NUMHDR_RE = re.compile(r"^(\d+(?:\.\d+)*)\s+(.+)$")
_SECTION_RE = re.compile(r"^(Abstract|\d+\s+[A-Z]|References|Appendix|Figure|Table)")
_AUTHOR_RE = re.compile(
    r"^\s*[A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]+)*\s*(?:[†*0-9]+)?"
    r"(?:,\s*[A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]+)*\s*(?:[†*0-9]+)?)*"
    r"(?:,\s*(?:and|&)\s+[A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]+)*\s*(?:[†*0-9]+)?)?\s*$"
)
_CITE_RE = re.compile(r"\(([A-Z][a-z]+ et al\. \d{4})\)")


def _html_escape(s: str) -> str:
    """stdlib html.escape(quote=True) semantics (what the reference calls)."""
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;").replace("'", "&#x27;"))


def _predecode(text: str) -> str:
    """utils.py:215-219 — unicode-escape + surrogate-pair recovery."""
    try:
        with warnings.catch_warnings():
            # invalid escapes (e.g. "\F") intentionally pass through unchanged,
            # matching the reference; newer CPython deprecation-warns on them.
            warnings.simplefilter("ignore", DeprecationWarning)
            d = text.encode("latin-1").decode("unicode-escape")
        return d.encode("utf-16", "surrogatepass").decode("utf-16")
    except Exception:
        return text


def _clean_core(page_number: int, text: str, html: bool) -> str:
    """Shared rule walk for both renderers (see module docstring for the
    per-variant quirks preserved)."""
    decoded = _predecode(text)
    if not html:
        decoded = re.sub(r"\.\n", ".\n\n", decoded)  # md-only (utils.py:222)
    lines = decoded.split("\n")
    out: list[str] = []
    para: list[str] = []
    in_header = False

    def flush() -> None:
        if para:
            joined = re.sub(r"\s+", " ", " ".join(para)).strip()
            if joined:
                if html:
                    out.append(f'<div class="paragraph"><p>{joined}</p></div><hr/>')
                else:
                    out.append(joined)
            para.clear()

    for i, raw in enumerate(lines):
        line = raw.strip()
        if not line:
            flush()
            continue
        if i == 0 and len(lines) > 1 and 3 <= len(line.split()) <= 8:
            flush()
            out.append(f"<h2>{_html_escape(line)}</h2>" if html
                       else f"## {line}")
            continue
        hdr = _NUMHDR_RE.match(line)
        # md indexes lines[i-1] unguarded (wraps to last line at i=0);
        # html adds the i > 0 guard — both preserved.
        prev_blank = (not lines[i - 1].strip()) if (html and i > 0) or not html \
            else False
        if hdr and prev_blank:
            flush()
            level = min(hdr.group(1).count(".") + 2, 6)
            txt = hdr.group(2)
            out.append(f"<h{level}>{_html_escape(txt)}</h{level}>" if html
                       else f"{'#' * level} {txt}")
            in_header = True
            continue
        if page_number == 1 and _AUTHOR_RE.match(line):
            cleaned = re.sub("[†â€]", "", line)
            names = [a.strip() for a in re.split(r", | and ", cleaned)
                     if a.strip()]
            if html:
                bolded = ["<strong>%s</strong>"
                          % _html_escape(" ".join(n.split())) for n in names]
            else:
                bolded = ["**%s**" % " ".join(n.split()) for n in names]
            joined = (", ".join(bolded[:-1]) + " and " + bolded[-1]
                      if len(bolded) > 1 else bolded[0])
            out.append(f"<p>{joined}</p>" if html else joined)
            continue
        if _AFFIL_RE.match(line):
            out.append(f"<p><em>{_html_escape(line)}</em></p>" if html
                       else f"*{line}*")
            continue
        if _EMAIL_RE.match(line):
            out.append(f"<p><code>{_html_escape(line)}</code></p>" if html
                       else f"`{line}`")
            continue
        if _SECTION_RE.match(line):
            flush()
            out.append(
                f'<h2 class="section-header"><em>{_html_escape(line)}</em></h2>'
                if html else f"_[{line}]_")
            in_header = True
            continue
        if _QUOTE_RE.match(line):
            flush()
            out.append(f"<blockquote><p>{_html_escape(line)}</p></blockquote>"
                       if html else f"> {line}")
            continue
        para.append(line[:-1].strip() if line.endswith("-") else line)
        if in_header and not line.endswith((".", "!", "?")):
            flush()
            in_header = False
    flush()

    doc = "\n".join(out) if html else "\n\n".join(out)
    cite = r"<cite>\1</cite>" if html else r"[\1]"
    doc = _CITE_RE.sub(cite, doc)
    doc = doc.replace("\\ud835", "").replace("\\u2020", "†")
    doc = re.sub(r"\s+-\s+", "", doc)
    doc = re.sub(r"\s+([.,!?)])", r"\1", doc)
    return doc


def pdf_markdown(page_number: int, text: str) -> str:
    """Twin of reference ``clean_pdf_text`` (utils.py:213-350)."""
    return _clean_core(page_number, text, html=False)


def pdf_html(page_number: int, text: str) -> str:
    """Twin of reference ``clean_pdf_text_to_html`` (utils.py:71-212)."""
    return _clean_core(page_number, text, html=True)


# ================================================================= top level

def _parse_date(s) -> str | None:
    """processor.py:441-455 semantics; ISO string instead of datetime so
    the column is hash-stable across engines."""
    if not isinstance(s, str):
        return None
    m = _DATE_RE.match(s)
    if not m:
        return None
    return "%s-%s-%sT%s:%s:%s" % m.groups()


def parse_pdf(data: bytes) -> dict:
    """Parse one PDF; returns the processor-result shape
    (processor.py:24-50) as a plain dict."""
    pdf = _Pdf(data)
    encrypted = "Encrypt" in pdf.trailer
    info = pdf.resolve(pdf.trailer.get("Info")) or {}
    meta = {
        "title": info.get("Title"),
        "author": info.get("Author"),
        "producer": info.get("Producer"),
        "created": _parse_date(info.get("CreationDate")),
        "modified": _parse_date(info.get("ModDate")),
        "encrypted": encrypted,
        "file_size": len(data),
    }
    pages_out: list[dict] = []
    if not encrypted:
        page_nodes = pdf.pages()
        for pno, page in enumerate(page_nodes, start=1):
            refs = page.get("Contents")
            refs = refs if isinstance(refs, list) else [refs]
            raw = b"\n".join(pdf.stream_of(r) for r in refs if r is not None)
            text = _extract_text(raw)
            links = []
            for a in pdf.resolve(page.get("Annots")) or []:
                a = pdf.resolve(a)
                if isinstance(a, dict):
                    action = pdf.resolve(a.get("A"))
                    if isinstance(action, dict) and "URI" in action:
                        links.append(str(pdf.resolve(action["URI"])))
            n_images = 0
            res = pdf.resolve(page.get("Resources"))
            if isinstance(res, dict):
                xo = pdf.resolve(res.get("XObject"))
                if isinstance(xo, dict):
                    for v in xo.values():
                        v = pdf.resolve(v)
                        if isinstance(v, dict) and v.get("Subtype") == "Image":
                            n_images += 1
            pages_out.append({
                "page_number": pno,
                "raw_text": text,
                "markdown": pdf_markdown(pno, text),
                "html": pdf_html(pno, text),
                "links": links,
                "n_images": n_images,
            })
    meta["n_pages"] = len(pages_out)
    return {"metadata": meta, "pages": pages_out}


PDF_SCHEMA = (
    "doc_id string, page_number int, raw_text string, markdown string, "
    "html string, links array<string>, n_images int, title string, "
    "author string, producer string, created string, modified string, "
    "n_pages int, encrypted boolean, file_size long, error string"
)

_COLS = [f.split(" ")[0] for f in PDF_SCHEMA.split(", ")]


def pdf_extract_stage(pdfs: DataFrame, id_col: str = "doc_id",
                      bytes_col: str = "pdf") -> DataFrame:
    """binary PDF column → per-page extraction rows, one Arrow stage.

    Row shape: a parsed document fans out to one row per page with the
    document metadata repeated (columnar-friendly; group by doc_id to
    reassemble the processor-result).  A document the parser rejects
    (unsupported filter, no catalog, truncated) yields ONE row with
    ``error`` set and page_number 0 — corpus-scale jobs must account for
    every input, not drop or die on the bad ones."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                doc_id = getattr(r, id_col)
                data = getattr(r, bytes_col)
                try:
                    res = parse_pdf(bytes(data))
                except Exception as e:  # noqa: BLE001 — per-doc error row
                    rows.append(dict.fromkeys(_COLS) | {
                        "doc_id": doc_id, "page_number": 0,
                        "file_size": len(data),
                        "error": f"{type(e).__name__}: {e}"[:500],
                    })
                    continue
                meta = res["metadata"]
                base = {
                    "doc_id": doc_id, "error": None,
                    "title": meta["title"], "author": meta["author"],
                    "producer": meta["producer"], "created": meta["created"],
                    "modified": meta["modified"], "n_pages": meta["n_pages"],
                    "encrypted": meta["encrypted"],
                    "file_size": meta["file_size"],
                }
                if not res["pages"]:
                    rows.append(dict.fromkeys(_COLS) | base | {
                        "page_number": 0,
                        "error": "encrypted" if meta["encrypted"] else None,
                    })
                for page in res["pages"]:
                    rows.append(base | page)
            yield pd.DataFrame(rows, columns=_COLS)

    return pdfs.select(id_col, bytes_col).mapInPandas(run, PDF_SCHEMA)
