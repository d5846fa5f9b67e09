"""Deterministic WARC/1.0 builder (the fixture side of the WARC tier).

Emits valid WARC bytes from pure inputs (uri, date, status, html body per
document), so the WARC ingestion oracle can be derived from the SAME
inputs without ever running the parser: fields in == fields out.  The
builder writes the subset a crawl archive needs — ``response`` records
with ``Content-Type: application/http; msgtype=response`` payloads
carrying an HTTP/1.1 status line, headers, and an HTML body — exactly the
shape of a Common Crawl segment (uncompressed; the sandbox gzip module
could wrap it, but splittability at scale comes from many files, not from
seeking inside one, so the tier models per-file parallelism).

Reference analog: crawl4ai fetches live pages; a 100 TB training-data
build starts from crawl ARCHIVES instead, so WARC ingestion is the
missing source tier on the Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DOCS_PER_FILE",
    "record_fields_of",
    "build_warc",
    "warc_corpus",
    "wet_fields_of",
    "build_wet",
    "wet_corpus",
]

DOCS_PER_FILE = 10

_BASE_DATE = "2024-01-01T00:00:{:02d}Z"


def record_fields_of(doc_id: int, text: str) -> dict:
    """The pure-input recipe shared by the builder, the engine probe and
    the oracle twin (FIXTURES-style): every field of a response record is
    a deterministic function of (doc_id, text)."""
    words = [w for w in str(text).split() if w]
    title = " ".join(words[:5])
    status = 404 if doc_id % 13 == 0 else 200
    body = (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>{text}</p></body></html>"
    )
    return {
        "target_uri": f"https://w{doc_id % 7}.test/doc/{doc_id}",
        "warc_date": _BASE_DATE.format(doc_id % 60),
        "http_status": status,
        "content_type": "text/html; charset=utf-8",
        "body": body,
    }


def build_warc(records: list[dict]) -> bytes:
    """Serialize response records into one WARC/1.0 file."""
    out = bytearray()
    for i, r in enumerate(records):
        http = (
            f"HTTP/1.1 {r['http_status']} "
            f"{'OK' if r['http_status'] == 200 else 'Not Found'}\r\n"
            f"Content-Type: {r['content_type']}\r\n"
            "\r\n"
        ).encode("utf-8") + r["body"].encode("utf-8")
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"WARC-Date: {r['warc_date']}\r\n"
            f"WARC-Target-URI: {r['target_uri']}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode("utf-8")
        out += header + http + b"\r\n\r\n"
    return bytes(out)


def warc_corpus(docs: DataFrame, docs_per_file: int = DOCS_PER_FILE) -> DataFrame:
    """Build (file_id, data binary) WARC files from a (doc_id, text)
    DataFrame — ``docs_per_file`` response records per file, record order
    = ascending doc_id (the recipe the expected table reproduces).  One
    hash shuffle on file_id, then an Arrow build stage per file group."""
    import pandas as pd

    keyed = docs.select(
        (F.col("doc_id").cast("long") / docs_per_file).cast("long")
        .alias("file_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs = [record_fields_of(int(r.doc_id), r.text)
                for r in pdf.itertuples()]
        return pd.DataFrame(
            [{"file_id": int(pdf["file_id"].iloc[0]),
              "data": build_warc(recs)}]
        )

    return keyed.groupBy("file_id").applyInPandas(
        build, "file_id long, data binary"
    )


def wet_fields_of(doc_id: int, text: str) -> dict:
    """Pure-input recipe for one WET ``conversion`` record (Common
    Crawl's extracted-plain-text sibling of the WARC ``response``):
    every field a deterministic function of (doc_id, text), shared by
    the builder, the engine probe and the oracle twin."""
    return {
        "target_uri": f"https://w{doc_id % 7}.test/doc/{doc_id}",
        "warc_date": _BASE_DATE.format(doc_id % 60),
        "content_type": "text/plain",
        "body": f"Extracted text of document {doc_id}.\n{text}",
    }


def build_wet(records: list[dict]) -> bytes:
    """Serialize conversion records into one WET (WARC/1.0) file."""
    out = bytearray()
    for i, r in enumerate(records):
        payload = r["body"].encode("utf-8")
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Record-ID: <urn:uuid:wet-{i}>\r\n"
            f"WARC-Date: {r['warc_date']}\r\n"
            f"WARC-Target-URI: {r['target_uri']}\r\n"
            f"Content-Type: {r['content_type']}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode("utf-8")
        out += header + payload + b"\r\n\r\n"
    return bytes(out)


def wet_corpus(docs: DataFrame, docs_per_file: int = DOCS_PER_FILE) -> DataFrame:
    """(doc_id, text) → (file_id, data binary) WET files; same sharding
    and record order as ``warc_corpus``."""
    import pandas as pd

    keyed = docs.select(
        (F.col("doc_id").cast("long") / docs_per_file).cast("long")
        .alias("file_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs = [wet_fields_of(int(r.doc_id), r.text) for r in pdf.itertuples()]
        return pd.DataFrame(
            [{"file_id": int(pdf["file_id"].iloc[0]),
              "data": build_wet(recs)}]
        )

    return keyed.groupBy("file_id").applyInPandas(
        build, "file_id long, data binary"
    )
