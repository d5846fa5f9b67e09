"""Event sessionization — gap-based sessions over the events stream.

The classic telemetry/clickstream operator a crawl-analytics deployment
runs next to the frontier (per-host fetch sessions, per-user activity
sessions): rows sharing ``user_col`` belong to one session while the gap
between consecutive events stays under ``gap_s``; a longer gap starts a
new session.

Shape: one shuffle on ``user_col`` (the window partition), everything
else whole-stage codegen.  The window is per-user, never global, so there
is no single-partition funnel; at 100 TB the shuffle on the
high-cardinality user key is the unavoidable minimum for this semantics.

All gap arithmetic is ``timestampdiff(MICROSECOND, ...)`` on the naive
timestamps themselves — integer WALL-CLOCK microseconds.  Verified
regression (test_sessionize_dst_timezone_invariant): with
``spark.sql.session.timeZone = America/New_York`` a naive 01:59 → 03:01
pair spanning the 2024-03-10 spring-forward still yields 62 min (wall),
not the 2-min instant difference — Spark 4.x evaluates timestampdiff on
TIMESTAMP_NTZ without a session-zone reinterpretation, so sessions are
identical under any session time zone (epoch-based math would not be).
The DuckDB oracle uses ``date_diff('microseconds', ...)`` — the identical
integer.  Event timestamps must be non-null (they order the window).
Value sums go through DECIMAL(18,2) to stay order-independent and exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats"]


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: int = 1800,
) -> DataFrame:
    """Tag every event with its 0-based per-user ``session_idx``.

    ``order_col`` breaks ties between identical timestamps so the index
    is deterministic under any partitioning.
    """
    gap_us = int(gap_s) * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    lagged = events.withColumn("__prev_ts", F.lag(F.col(ts_col)).over(w))
    gap = F.expr(f"timestampdiff(MICROSECOND, __prev_ts, {ts_col})")
    new_sess = F.when(
        F.col("__prev_ts").isNull() | (gap > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    return lagged.withColumn(
        "session_idx",
        (
            F.sum(new_sess).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1
        ).cast("long"),
    ).drop("__prev_ts")


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: int = 1800,
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session rollup: event count, span, total value.

    Returns (user, session_idx, n_events, start_ts, end_ts, duration_us
    [, total_value]); ``total_value`` sums through DECIMAL(18,2) so the
    aggregate is exact and order-independent, emitted as DOUBLE.
    """
    tagged = sessionize(events, user_col, ts_col, order_col, gap_s)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value")
        )
    return tagged.groupBy(user_col, "session_idx").agg(*aggs).withColumn(
        "duration_us",
        F.expr("timestampdiff(MICROSECOND, start_ts, end_ts)").cast("long"),
    )
