"""WebDataset tar-shard INGESTION — the read half of ``operators/export``.

``export.write_webdataset`` delivers an image+caption corpus as POSIX tar
shards (same-stem member groups, the LAION / ``webdataset`` convention).
Training pipelines also CONSUME that format — resharding, re-curation,
dedup over an already-exported corpus — so the engine needs the inverse:
tar shards back into the ``(key, <ext> bytes...)`` table the planner
started from.  This module is a from-scratch USTAR reader (stdlib
``tarfile`` is deliberately not used on the hot path: it builds per-member
TarInfo objects and seeks; here the shard arrives as one in-memory buffer
and header decoding is 5 fixed-offset field reads per member).

Scale shape: ``spark.read.format("binaryFile")`` yields ONE row per shard
file — per-SHARD parallelism, exactly how WebDataset is consumed (a shard
per loader worker; tar is not splittable mid-archive, and shards are
already budget-sized by ``webdataset_plan(shard_bytes=...)`` so a whole
shard fits an executor comfortably).  Parsing is ONE ``mapInPandas``
stage; header decode is O(#members) tiny fixed-offset reads and payload
slicing is zero-copy until Arrow serialization.  Output batches are
chunked (``batch_bytes``) so a 256 MiB shard never lands in a single
Arrow record batch.  Parse errors are isolated per shard: a malformed
header emits one error row for that shard and never fails the stage.

Reference anchor: crawl4ai stops at per-page media lists
(models.py:302-329); re-ingesting a packed training corpus is the
post-crawl stage this engine adds (twin of operators/export.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["parse_tar_members", "group_samples", "read_webdataset"]

_BLOCK = 512


def _octal(field: bytes) -> int:
    """Decode a tar octal number field (NUL/space padded)."""
    s = field.rstrip(b"\x00 ").lstrip(b" ")
    return int(s, 8) if s else 0


def parse_tar_members(data: bytes, *, verify_checksums: bool = True):
    """Yield ``(name, offset, payload_bytes)`` for every regular-file
    member of an in-memory tar archive.  ``offset`` is the byte offset of
    the member's 512-byte header within the archive (the quantity
    ``webdataset_plan`` plans as ``off_{ext}``).

    Stops at the first all-zero block (the EOF marker; the second zero
    block and the blocking-factor pad are not re-validated — writers vary
    in pad length and readers, including GNU tar, accept any).  Raises
    ``ValueError`` on a malformed header or a truncated payload so the
    caller can isolate the error per shard.
    """
    pos, n = 0, len(data)
    while pos + _BLOCK <= n:
        hdr = data[pos:pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:          # EOF marker
            return
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        try:
            size = _octal(hdr[124:136])
        except ValueError:
            raise ValueError(f"bad size field at offset {pos}")
        if verify_checksums:
            stored = _octal(hdr[148:156])
            computed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
            if stored != computed:
                raise ValueError(
                    f"checksum mismatch at offset {pos} "
                    f"(member {name!r}): {stored} != {computed}")
        typeflag = hdr[156:157]
        payload_end = pos + _BLOCK + size
        if payload_end > n:
            raise ValueError(
                f"truncated member {name!r} at offset {pos}: "
                f"needs {size} payload bytes, {n - pos - _BLOCK} left")
        # regular file under POSIX ('0') or old-style (NUL); skip
        # directories / links / pax headers like tar itself does
        if typeflag in (b"0", b"\x00"):
            yield name, pos, data[pos + _BLOCK:payload_end]
        pos = payload_end + ((-size) % _BLOCK)


def group_samples(members, exts: tuple[str, ...]):
    """Group a shard's member stream into WebDataset samples.

    WebDataset's contract is that a sample's members are CONSECUTIVE and
    share a stem (``{key}.img``, ``{key}.txt``); a stem change closes the
    current sample.  Members whose ext is not in ``exts`` are ignored
    (foreign sidecar files); a sample missing some of ``exts`` still
    emits, with None for the absent members — downstream screens on
    nullity rather than the reader guessing.

    Yields ``(key, sample_off, {ext: payload_or_None})``.
    """
    cur_key, cur_off, cur = None, 0, {}
    for name, off, payload in members:
        stem, dot, ext = name.rpartition(".")
        if not dot:                          # extension-less member
            stem, ext = name, ""
        if ext not in exts:
            # foreign sidecar (metadata.json, checksums, ...): ignored
            # entirely — it must neither split the surrounding sample
            # nor mint a phantom one
            continue
        if stem != cur_key:
            if cur_key is not None:
                yield cur_key, cur_off, cur
            cur_key, cur_off, cur = stem, off, {}
        cur[ext] = payload
    if cur_key is not None:
        yield cur_key, cur_off, cur


def read_webdataset(
    spark: SparkSession,
    path: str,
    exts: tuple[str, ...] = ("img", "txt"),
    key_name: str = "key",
    batch_bytes: int = 64 << 20,
    verify_checksums: bool = True,
    glob: str = "*.tar",
) -> DataFrame:
    """Read the WebDataset tar shards under ``path`` (a directory; shard
    files selected by ``glob`` via binaryFile's ``pathGlobFilter`` — a
    glob embedded in ``path`` itself also works) into one row per
    sample::

        (key string, sample_off long, shard_path string,
         <ext> binary ..., error string)

    ``sample_off`` is the byte offset of the sample's first member header
    within its shard — joinable back to ``webdataset_plan``'s
    ``sample_off`` for lineage/audit.  A malformed shard SALVAGES: every
    complete sample parsed before the corruption point is returned as
    usual, plus one row with ``error`` set (key/payloads NULL) recording
    the failure — so a truncated archive yields its good prefix, and a
    consumer that must reject partial shards filters on
    ``shard_path IN (SELECT shard_path ... WHERE error IS NOT NULL)``
    rather than assuming an errored shard contributed nothing.  Output
    batches flush at ``batch_bytes`` of accumulated payload so Arrow
    batch size stays bounded regardless of shard size.
    """
    reader = spark.read.format("binaryFile")
    if "*" not in path and "?" not in path:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")
    fields = ", ".join(
        [f"{key_name} string", "sample_off long", "shard_path string"]
        + [f"{ext} binary" for ext in exts] + ["error string"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out, acc = [], 0
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                try:
                    for key, off, group in group_samples(
                            parse_tar_members(
                                data, verify_checksums=verify_checksums),
                            exts):
                        row = {key_name: key, "sample_off": off,
                               "shard_path": shard_path, "error": None}
                        for ext in exts:
                            p = group.get(ext)
                            row[ext] = p
                            acc += len(p) if p is not None else 0
                        out.append(row)
                        if acc >= batch_bytes:
                            yield pd.DataFrame(out)
                            out, acc = [], 0
                except ValueError as exc:
                    row = {key_name: None, "sample_off": None,
                           "shard_path": shard_path, "error": str(exc)}
                    for ext in exts:
                        row[ext] = None
                    out.append(row)
            if out:
                yield pd.DataFrame(out)

    return files.mapInPandas(run, fields)
