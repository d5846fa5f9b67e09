"""Deterministic raw-HTTP payload builder (fixture side of httpdecode).

Seven wire-shape classes per doc_id covering the decode surface: plain
utf-8, chunked transfer, UTF-16LE+BOM, meta-declared latin-1, gzip
content-encoding, a malformed chunk stream, and headerless default.
Every byte is a pure function of (doc_id, text) so the decode oracle is
derivable from the SAME recipe without running the decoder — fields in
== fields out, the warcsynth convention.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["http_fields_of", "http_corpus", "META_PREFIX"]

META_PREFIX = '<html><head><meta charset=latin-1></head><body>'


def _chunked(body: bytes, size: int = 16) -> bytes:
    out = bytearray()
    for i in range(0, len(body), size):
        c = body[i:i + size]
        out += f"{len(c):x}\r\n".encode() + c + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


def _gzip(body: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(body) + co.flush()


def http_fields_of(doc_id: int, text: str) -> dict:
    """(doc_id, text) → {headers, payload} — the shared recipe."""
    t = str(text).encode("utf-8")
    cls = doc_id % 7
    if cls == 0:
        return {"headers": "Content-Type: text/html; charset=utf-8",
                "payload": t}
    if cls == 1:
        return {"headers": "Transfer-Encoding: chunked\r\n"
                           "Content-Type: text/html; charset=utf-8",
                "payload": _chunked(t)}
    if cls == 2:
        return {"headers": "Content-Type: text/html",
                "payload": b"\xff\xfe" + str(text).encode("utf-16-le")}
    if cls == 3:
        return {"headers": "X-Server: synth",
                "payload": (META_PREFIX + str(text)).encode("latin-1")}
    if cls == 4:
        return {"headers": "Content-Encoding: gzip\r\n"
                           "Content-Type: text/html; charset=utf-8",
                "payload": _gzip(t)}
    if cls == 5:
        # one good 16-byte chunk, then a malformed size line
        good = t[:16]
        return {"headers": "Transfer-Encoding: chunked",
                "payload": f"{len(good):x}\r\n".encode() + good
                + b"\r\nzz\r\nrest"}
    return {"headers": "", "payload": t}


def http_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, headers, payload binary), one Arrow
    build stage — same per-file parallelism shape as warcsynth."""
    import pandas as pd

    def build(batches):
        for b in batches:
            rows = []
            for r in b.itertuples():
                f = http_fields_of(int(r.doc_id), r.text)
                rows.append({"doc_id": int(r.doc_id),
                             "headers": f["headers"],
                             "payload": f["payload"]})
            yield pd.DataFrame(rows,
                               columns=["doc_id", "headers", "payload"])

    return docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       "text").mapInPandas(
        build, "doc_id long, headers string, payload binary")
