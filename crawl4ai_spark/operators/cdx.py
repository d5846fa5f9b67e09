"""CDX index generation over ingested WARC records.

A web-scale crawl's archive is only usable with an index: the CDX(J)
file — one line per capture, keyed by (SURT, timestamp), globally sorted
so a replay/analysis tool can binary-search it and seek straight into
the WARC via (filename, offset, length).  Common Crawl publishes exactly
this index beside its segments; pywb/OpenWayback consume it.

``cdx_index`` turns the ``warc_records_stage`` output
(sources/warc.py — now carrying per-record ``rec_offset``/``rec_length``
byte geometry) into that table:

  surt, ts, url, mime, status, digest, length, offset, filename

Scale shape: the field derivation (SURT key, 14-digit timestamp, mime
split, md5 digest) is pure Catalyst — one codegen projection over the
ingest output.  The ONE intended shuffle is the final range-partitioned
global sort on (surt, ts): Spark's ``orderBy`` samples range bounds and
writes sorted shards — exactly the binary-searchable part files a CDX
index is, with no single-reducer stage.  Digest is md5-hex (a JVM
intrinsic both engines share) rather than CDX's sha1-base32 — same
dedup/revisit-detection power; documented divergence.

Reference anchor: crawl4ai keeps per-result metadata in memory
(models.py CrawlResult); it never builds an archive index because its
unit of work is one live fetch.  At 10^10 captures the index IS the
crawl's queryable surface, so this operator is the Spark-side
completion of the WARC sink tier (sources/warc.py, warcsynth.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.functions.surt import surt_key

__all__ = ["cdx_index", "revisit_stats"]


def cdx_index(
    records: DataFrame,
    filename_fmt: str = "crawl-%05d.warc",
    sort: bool = True,
) -> DataFrame:
    """(warc record rows) → sorted CDX capture table.

    Only ``response`` and ``conversion`` records index (request/
    warcinfo/metadata framing rows and error rows carry no capture);
    ``ts`` is the CDX 14-digit UTC timestamp derived from the ISO
    ``warc_date``; missing mime/status render as CDX's ``'-'``/0.
    ``sort=False`` skips the global sort for pipelines that re-sort
    downstream (e.g. after a union of daily increments).
    """
    cap = records.where(
        F.col("error").isNull()
        & F.col("warc_type").isin("response", "conversion")
        & F.col("target_uri").isNotNull()
    )
    out = cap.select(
        surt_key(F.col("target_uri")).alias("surt"),
        F.rpad(F.regexp_replace(F.col("warc_date"), "[^0-9]", ""),
               14, "0").substr(1, 14).alias("ts"),
        F.col("target_uri").alias("url"),
        F.coalesce(
            F.nullif(F.trim(F.substring_index("content_type", ";", 1)),
                     F.lit("")),
            F.lit("-"),
        ).alias("mime"),
        F.coalesce(F.col("http_status"), F.lit(0)).cast("int")
         .alias("status"),
        F.md5(F.coalesce(F.col("body"), F.lit(""))).alias("digest"),
        F.col("rec_length").cast("long").alias("length"),
        F.col("rec_offset").cast("long").alias("offset"),
        F.format_string(filename_fmt, F.col("file_id")).alias("filename"),
    )
    if sort:
        out = out.orderBy("surt", "ts", "filename", "offset")
    return out


def revisit_stats(cdx: DataFrame) -> DataFrame:
    """Per-SURT revisit/dedup summary over a CDX table — the archive-side
    payoff of the digest column: captures whose digest matches an earlier
    capture of the same SURT are ``revisits`` (a deduplicating archive
    stores them as WARC ``revisit`` stubs; ``dup_bytes`` is the storage
    the stubs save — every non-first capture's record bytes).

    Two-level partial aggregation: groupBy(surt, digest) shrinks the
    frame to one row per content version (map-side combine does most of
    the work), then the per-surt rollup runs over the version-sized
    frame only.  Both shuffles hash on surt-prefixed keys and AQE
    coalesces the tiny second exchange.
    """
    first_ord = F.concat_ws(
        "|", "ts", "filename", F.lpad(F.col("offset").cast("string"),
                                      12, "0"))
    per_version = cdx.groupBy("surt", "digest").agg(
        F.count(F.lit(1)).alias("caps"),
        F.sum("length").alias("bytes"),
        F.min_by("length", first_ord).alias("first_len"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
    return per_version.groupBy("surt").agg(
        F.sum("caps").cast("long").alias("captures"),
        F.count(F.lit(1)).cast("long").alias("versions"),
        F.sum(F.col("caps") - 1).cast("long").alias("revisits"),
        F.sum(F.col("bytes") - F.col("first_len")).cast("long")
         .alias("dup_bytes"),
        F.min("min_ts").alias("first_ts"),
        F.max("max_ts").alias("last_ts"),
    )
