"""parse_srcset (G5) golden parity + watermarked window aggregations."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from crawl4ai_spark.functions.images import parse_srcset_col
from crawl4ai_spark.streaming.windows import error_rate, host_throughput


# reference verbatim (content_scraping_strategy.py:39-58)
def ref_parse_srcset(s):
    if not s:
        return []
    variants = []
    for part in s.split(","):
        part = part.strip()
        if not part:
            continue
        parts = part.split()
        if len(parts) >= 1:
            url = parts[0]
            width = (
                parts[1].rstrip("w")
                if len(parts) > 1 and parts[1].endswith("w")
                else None
            )
            variants.append({"url": url, "width": width})
    return variants


SRCSETS = [
    "a.jpg 480w, b.jpg 800w",
    "  x.png  ,, y.png 2x , z.png 100w ",
    "single.webp",
    "",
    None,
    "u.jpg 640ww",
]


def test_parse_srcset_parity(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SRCSETS)], "i int, srcset string"
    )
    rows = df.select("i", parse_srcset_col(F.col("srcset")).alias("v")).collect()
    got = {r["i"]: [(x["url"], x["width"]) for x in r["v"]] for r in rows}
    for i, s in enumerate(SRCSETS):
        want = [(d["url"], d["width"]) for d in ref_parse_srcset(s)]
        assert got[i] == want, f"srcset {s!r}"


def _mk_events(spark):
    rows = [
        ("2026-01-01 00:00:01", "a.test", True, 200),
        ("2026-01-01 00:00:05", "a.test", False, 503),
        ("2026-01-01 00:00:11", "a.test", True, 200),
        ("2026-01-01 00:00:02", "b.test", True, 200),
    ]
    return spark.createDataFrame(
        rows, "ts_s string, host string, success boolean, status_code int"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")


def test_host_throughput_batch_semantics(spark):
    out = {
        (r["host"], str(r["window_start"])): (r["fetched"], r["successes"])
        for r in host_throughput(_mk_events(spark)).collect()
    }
    assert out[("a.test", "2026-01-01 00:00:00")] == (2, 1)
    assert out[("a.test", "2026-01-01 00:00:10")] == (1, 1)
    assert out[("b.test", "2026-01-01 00:00:00")] == (1, 1)


def test_error_rate_batch_semantics(spark):
    out = {
        r["status_code"]: r["n"] for r in error_rate(_mk_events(spark)).collect()
    }
    assert out[200] == 3 and out[503] == 1


def test_host_throughput_streaming_watermark(spark, tmp_path):
    """Real streaming run: file source → watermarked windowed agg →
    append-mode memory sink. Append mode only emits windows the watermark
    has passed — feed a late max-ts row so earlier windows finalize."""
    src = tmp_path / "stream_in"
    src.mkdir()
    _mk_events(spark).write.parquet(str(src / "batch0"))
    # a much later event advances the watermark past the first windows
    spark.createDataFrame(
        [("2026-01-01 00:05:00", "a.test", True, 200)],
        "ts_s string, host string, success boolean, status_code int",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").write.parquet(
        str(src / "batch1")
    )
    stream = (
        spark.readStream.schema("host string, success boolean, status_code int, ts timestamp")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        host_throughput(stream)
        .writeStream.format("memory")
        .queryName("tput")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from tput").collect()
    out = {
        (r["host"], str(r["window_start"])): (r["fetched"], r["successes"])
        for r in rows
    }
    assert out[("a.test", "2026-01-01 00:00:00")] == (2, 1)
    assert out[("b.test", "2026-01-01 00:00:00")] == (1, 1)
