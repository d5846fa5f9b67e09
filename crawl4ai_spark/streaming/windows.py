"""Event-time windowed aggregations for crawl telemetry streams.

The reference has NO event-time processing (SURVEY §2.8: its streaming mode
is result streaming only — no watermarks or late data anywhere).  These are
the Spark-native counterparts a production deployment of the engine needs:
fetch-throughput and error-rate rollups over the live results stream with
late-data tolerance, built on Structured Streaming watermarks.

Works on any stream (or batch frame — the same expressions run in both
modes, which is how the tests pin the semantics) carrying an event-time
timestamp column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_throughput(df: DataFrame, ts_col: str = "ts",
                    window: str = "10 seconds",
                    watermark: str = "30 seconds",
                    host_col: str = "host") -> DataFrame:
    """Pages fetched + success rate per (host, tumbling window); late rows
    beyond the watermark are dropped (state is bounded — the requirement
    for an unbounded crawl stream)."""
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return src.groupBy(
        F.window(F.col(ts_col), window).alias("w"), F.col(host_col)
    ).agg(
        F.count("*").alias("fetched"),
        F.sum(F.col("success").cast("long")).alias("successes"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        host_col, "fetched", "successes",
    )


def error_rate(df: DataFrame, ts_col: str = "ts",
               window: str = "1 minute",
               watermark: str = "2 minutes") -> DataFrame:
    """Per-window global status-code distribution (429/503 spikes drive the
    backoff controller, async_dispatcher.py:67-87 analog)."""
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return src.groupBy(
        F.window(F.col(ts_col), window).alias("w"), F.col("status_code")
    ).agg(F.count("*").alias("n")).select(
        F.col("w.start").alias("window_start"), "status_code", "n",
    )
