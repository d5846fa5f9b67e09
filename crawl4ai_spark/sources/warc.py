"""WARC ingestion — parse crawl-archive segments into a pages table.

From-scratch WARC/1.0 reader (no warcio in the sandbox; the format is an
RFC-style framed record stream: a ``WARC/1.0`` header block, CRLF-CRLF,
``Content-Length`` payload bytes, CRLF-CRLF).  ``response`` records with
``application/http`` payloads are split into status line / headers /
body; ``conversion`` (WET — Common Crawl's extracted plain text) and
``metadata`` (WAT — JSON link/header metadata) records carry their
payload straight into ``body`` with the WARC header's Content-Type; the
remaining types (warcinfo, request) pass through with empty payload
fields so a pipeline can filter on ``warc_type``.  One reader therefore
consumes all three Common Crawl formats (WARC / WET / WAT).

Scale shape: ONE ``mapInPandas`` stage over (file_id, data) rows — per
FILE parallelism, the way Common Crawl is actually consumed (a segment
per task; splitting inside a gzip member is not possible anyway).  Parse
errors are isolated per file: a malformed frame emits one error row for
the remainder of that file and never fails the stage.

Reference anchor: crawl4ai's fetch stage produces live HTTP responses
(async_crawler_strategy.py); a training-data backfill replays archived
responses instead — this source feeds the same downstream scrape/extract
operators (operators/scrape.py) with identical (url, html) columns.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["gunzip_members", "parse_warc", "warc_records_stage"]

OUT_SCHEMA = (
    "file_id long, record_idx int, warc_type string, target_uri string, "
    "warc_date string, http_status int, content_type string, body string, "
    "rec_offset long, rec_length long, error string"
)

_SEP = b"\r\n\r\n"


def _row(file_id: int, idx: int, **kw) -> dict:
    base = {
        "file_id": file_id, "record_idx": idx, "warc_type": None,
        "target_uri": None, "warc_date": None, "http_status": None,
        "content_type": None, "body": None, "rec_offset": None,
        "rec_length": None, "error": None,
    }
    base.update(kw)
    return base


def gunzip_members(data: bytes) -> tuple[bytes, str | None]:
    """Decompress a .warc.gz — a CONCATENATION of gzip members (Common
    Crawl writes one member per record so readers can seek); plain zlib
    only reads the first member, so loop over unused_data.  Returns
    (decoded bytes, error) — error is set when trailing bytes exist that
    are neither a further member nor empty (a corrupted mid-file member
    magic would otherwise drop every later record SILENTLY), or when a
    member is truncated."""
    out = bytearray()
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(31)  # 31 = gzip wrapper
        out += d.decompress(rest)
        out += d.flush()
        if not d.eof:  # truncated member: keep what decoded
            return bytes(out), "gzip member truncated"
        rest = d.unused_data
    if rest:
        return bytes(out), (
            f"{len(rest)} trailing bytes after the last gzip member are "
            "not a gzip member (corrupted member magic?)"
        )
    return bytes(out), None


def parse_warc(file_id: int, data: bytes) -> list[dict]:
    """Parse one WARC file's bytes into record rows (plain Python — the
    unit the Arrow stage maps; also used directly by tests).  Gzipped
    input (.warc.gz magic) is transparently decompressed, including the
    per-record-member concatenation Common Crawl uses."""
    gz_error: str | None = None
    if data[:2] == b"\x1f\x8b":
        try:
            data, gz_error = gunzip_members(data)
        except zlib.error as e:
            return [_row(file_id, 0, error=f"gzip: {e}")]
    rows: list[dict] = []
    pos = 0
    idx = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_SEP, pos)
        if head_end < 0 or not data.startswith(b"WARC/", pos):
            rows.append(_row(file_id, idx,
                             error="desynced: no WARC header at offset "
                                   f"{pos}"))
            break
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            if _:
                hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs.get("content-length", ""))
        except ValueError:
            rows.append(_row(file_id, idx, error="missing Content-Length"))
            break
        if clen < 0:
            # a negative length would move the cursor BACKWARD and loop
            # this record forever
            rows.append(_row(file_id, idx,
                             error=f"negative Content-Length: {clen}"))
            break
        payload = data[head_end + 4:head_end + 4 + clen]
        if len(payload) < clen:
            rows.append(_row(file_id, idx,
                             error=f"truncated payload: {len(payload)}"
                                   f"/{clen} bytes"))
            break
        rec_start = pos
        pos = head_end + 4 + clen
        wtype = hdrs.get("warc-type")
        row = _row(
            file_id, idx, warc_type=wtype,
            target_uri=hdrs.get("warc-target-uri"),
            warc_date=hdrs.get("warc-date"),
            # byte geometry within the (decompressed) stream — what a CDX
            # index records so a replay can seek straight to the record;
            # length spans header + payload, excluding the trailing CRLFs
            rec_offset=rec_start, rec_length=pos - rec_start,
        )
        if wtype in ("conversion", "metadata"):
            # WET (conversion, text/plain extracted text) and WAT
            # (metadata, application/json) records carry their payload
            # directly — no HTTP framing to split
            row["content_type"] = hdrs.get("content-type")
            row["body"] = payload.decode("utf-8", "replace")
        elif wtype == "response" and hdrs.get("content-type", "").startswith(
            "application/http"
        ):
            http_end = payload.find(_SEP)
            status_line = payload.split(b"\r\n", 1)[0].decode(
                "utf-8", "replace")
            parts = status_line.split(" ", 2)
            try:
                row["http_status"] = int(parts[1])
            except (IndexError, ValueError):
                row["error"] = f"bad status line: {status_line!r}"
            if http_end >= 0:
                for ln in payload[:http_end].decode(
                        "utf-8", "replace").split("\r\n")[1:]:
                    k, _, v = ln.partition(":")
                    if k.strip().lower() == "content-type":
                        row["content_type"] = v.strip()
                row["body"] = payload[http_end + 4:].decode("utf-8", "replace")
            else:
                row["error"] = row["error"] or "http payload has no header end"
        rows.append(row)
        idx += 1
    if gz_error is not None:
        rows.append(_row(file_id, idx, error=f"gzip: {gz_error}"))
    return rows


def warc_records_stage(files: DataFrame) -> DataFrame:
    """(file_id, data binary) → exploded record rows, one Arrow stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["file_id", "record_idx", "warc_type", "target_uri",
                "warc_date", "http_status", "content_type", "body",
                "rec_offset", "rec_length", "error"]
        for b in batches:
            rows: list[dict] = []
            for r in b.itertuples():
                try:
                    rows.extend(parse_warc(int(r.file_id), bytes(r.data)))
                except Exception as e:  # never fail the stage for one file
                    rows.append(_row(int(r.file_id), 0,
                                     error=f"parse crash: {e}"))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, OUT_SCHEMA)
