"""HTTP payload decoding — dechunk, decompress, charset-sniff, decode.

A crawl archive's raw response payloads are NOT text: they arrive
chunked (Transfer-Encoding), compressed (Content-Encoding), and in a
charset declared in any of three places with a fixed precedence.  The
reference gets all of this for free from aiohttp
(async_crawler_strategy.py — the client library dechunks, decompresses
and decodes before crawl4ai ever sees the body); replaying raw archives
through Spark means owning that layer explicitly.

``decode_http_payload`` is ONE Arrow ``mapInPandas`` stage over
(id, headers, payload) rows:

  1. Transfer-Encoding: chunked → de-chunk (hex size lines, chunk
     extensions after ';' ignored, terminated by the 0-chunk; a
     malformed size line stops decoding and keeps the chunks already
     decoded, with ``error`` set — per-row isolation, the stage never
     fails).
  2. Content-Encoding: gzip/deflate → zlib inflate (gzip wrapper 31;
     deflate tries 15 then raw -15, the double convention real servers
     disagree on).
  3. Charset precedence (WHATWG encoding-sniff order, the subset
     archives need): Content-Type header ``charset=`` → BOM
     (UTF-8 / UTF-16LE / UTF-16BE) → ``<meta charset>`` /
     ``http-equiv`` within the first 1024 bytes → UTF-8 default.
  4. Decode with strict-then-replace: ``decode_ok`` says whether the
     payload was clean in the chosen charset.

Scale shape: zero shuffle, per-file parallelism, zlib's C inflate and
CPython's C codecs doing the byte work — the same shape as the WARC
parse stage this feeds on (sources/warc.py).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["dechunk", "sniff_charset", "decode_payload",
           "decode_http_payload"]

OUT_SCHEMA = ("text string, charset string, was_chunked boolean, "
              "content_encoding string, decode_ok boolean, error string")

_BOMS = [(b"\xef\xbb\xbf", "utf-8"), (b"\xff\xfe", "utf-16-le"),
         (b"\xfe\xff", "utf-16-be")]


def _header(headers: str, name: str) -> str | None:
    """Case-insensitive single-header lookup over a raw header block."""
    want = name.lower()
    for ln in (headers or "").splitlines():
        k, sep, v = ln.partition(":")
        if sep and k.strip().lower() == want:
            return v.strip()
    return None


def dechunk(data: bytes) -> tuple[bytes, str | None]:
    """Decode a Transfer-Encoding: chunked body.  Returns (bytes,
    error) — on a malformed size line or truncation, the chunks decoded
    so far are kept and error says why."""
    out = bytearray()
    pos, n = 0, len(data)
    while True:
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            return bytes(out), "truncated chunk-size line"
        size_tok = data[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return bytes(out), f"bad chunk size {size_tok[:12]!r}"
        if size == 0:
            return bytes(out), None  # trailers ignored
        chunk = data[eol + 2:eol + 2 + size]
        if len(chunk) < size:
            out += chunk
            return bytes(out), "truncated chunk"
        out += chunk
        pos = eol + 2 + size + 2  # skip the chunk's trailing CRLF


_CHARSET_ALIASES = {"utf8": "utf-8", "utf_8": "utf-8"}
# (bare "utf-16"/"utf-16le" etc. are NOT folded: Python's utf-16 codec
# consumes its own BOM, and guessing an endianness here would be wrong)


def sniff_charset(headers: str, body: bytes) -> str:
    """Charset by precedence: header charset= → BOM → meta tag in the
    first 1024 bytes → utf-8.  Common aliases are folded to the
    canonical name so the BOM strip in decode_payload matches a
    header-declared 'utf8' the same as 'utf-8'."""
    ct = _header(headers, "content-type") or ""
    if "charset=" in ct.lower():
        cs = ct.lower().split("charset=", 1)[1].split(";")[0].strip(" \"'")
        if cs:
            return _CHARSET_ALIASES.get(cs, cs)
    for bom, cs in _BOMS:
        if body[:len(bom)] == bom:
            return cs
    head = body[:1024].decode("latin-1", "replace").lower()
    for marker in ("charset=", "charset ="):
        i = head.find(marker)
        if i >= 0:
            tail = head[i + len(marker):].lstrip()
            cs = ""
            for ch in tail:
                if ch.isalnum() or ch in "-_":
                    cs += ch
                else:
                    break
            if cs:
                return _CHARSET_ALIASES.get(cs, cs)
    return "utf-8"


def decode_payload(headers: str, payload: bytes) -> dict:
    """Full per-row pipeline; total for any byte string."""
    out = {"text": None, "charset": None, "was_chunked": False,
           "content_encoding": None, "decode_ok": False, "error": None}
    body = bytes(payload or b"")
    te = (_header(headers, "transfer-encoding") or "").lower()
    if "chunked" in te:
        out["was_chunked"] = True
        body, err = dechunk(body)
        if err is not None:
            out["error"] = err
    ce = (_header(headers, "content-encoding") or "").lower().strip()
    if ce in ("gzip", "x-gzip", "deflate") and out["error"] is None:
        out["content_encoding"] = ce
        try:
            if ce == "deflate":
                try:
                    body = zlib.decompress(body, 15)
                except zlib.error:
                    body = zlib.decompress(body, -15)
            else:
                body = zlib.decompress(body, 31)
        except zlib.error as e:
            out["error"] = f"inflate: {e}"
            out["charset"] = None
            return out
    cs = sniff_charset(headers, body)
    out["charset"] = cs
    for bom, bcs in _BOMS:
        if bcs == cs and body[:len(bom)] == bom:
            body = body[len(bom):]
            break
    try:
        out["text"] = body.decode(cs, "strict")
        out["decode_ok"] = out["error"] is None
    except (UnicodeDecodeError, LookupError):
        out["text"] = body.decode("utf-8", "replace")
        if cs not in ("utf-8",):
            out["error"] = out["error"] or f"undecodable as {cs}"
    return out


def decode_http_payload(
    responses: DataFrame,
    headers_col: str = "headers",
    payload_col: str = "payload",
    id_col: str = "url",
) -> DataFrame:
    """(id, headers, payload binary) → decoded text rows, one Arrow
    stage, zero shuffle, per-row error isolation."""
    out_schema = f"{id_col} string, " + OUT_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [id_col, "text", "charset", "was_chunked",
                "content_encoding", "decode_ok", "error"]
        for b in batches:
            rows = []
            for rid, hdrs, data in zip(b[id_col], b[headers_col],
                                       b[payload_col]):
                try:
                    rows.append({id_col: rid, **decode_payload(hdrs, data)})
                except Exception as e:  # never fail the stage for one row
                    rows.append({id_col: rid, "text": None, "charset": None,
                                 "was_chunked": False,
                                 "content_encoding": None,
                                 "decode_ok": False,
                                 "error": f"decode crash: {e}"})
            yield pd.DataFrame(rows, columns=cols)

    return responses.select(id_col, headers_col, payload_col).mapInPandas(
        run, out_schema)
