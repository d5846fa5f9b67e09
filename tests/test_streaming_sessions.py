"""Streaming sessionization: the applyInPandasWithState session operator
must emit exactly the batch session_stats rows for every CLOSED session,
regardless of micro-batch boundaries (time-sliced admission)."""

import os
from datetime import datetime, timedelta

import pytest


def _events():
    """Deterministic event fixture: 3 users, multiple sessions, events
    strictly ordered by ts so time-sliced files preserve per-user order."""
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for minute, user, value in [
        # slice 0: user 1 session 0 (3 events), user 2 session 0 starts
        (0, 1, 1.25), (5, 2, 2.50), (10, 1, 0.75), (20, 1, 3.00),
        # slice 1 (>= 60): user 1 session 1 (gap 40 > 30), user 2 session 0
        # continues at 25-min spacing then closes; user 3 appears
        (60, 1, 1.00), (62, 2, 4.75), (65, 3, 9.99), (70, 1, 2.00),
        # slice 2 (>= 120): user 2 session 1 (gap 58), user 3 session 1
        # (gap 55), user 1 session 2 (gap 49)
        (120, 2, 1.10), (121, 3, 0.01), (125, 1, 5.55), (126, 1, 0.45),
    ]:
        rows.append((eid, t0 + timedelta(minutes=minute), user, float(value)))
        eid += 1
    return rows


@pytest.fixture(scope="module")
def event_store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_sessions")
    path = str(root / "events")
    rows = _events()
    slices = [
        [r for r in rows if r[1].minute + r[1].hour * 60 < 60],
        [r for r in rows if 60 <= r[1].minute + r[1].hour * 60 < 120],
        [r for r in rows if r[1].minute + r[1].hour * 60 >= 120],
    ]
    for i, sl in enumerate(slices):
        df = spark.createDataFrame(
            sl, "event_id long, ts timestamp_ntz, user_id long, value double"
        )
        out = os.path.join(path, f"slice={i}")
        df.coalesce(1).write.mode("overwrite").parquet(out)
        # FileStreamSource admits oldest-mtime-first; make slice order strict
        for dirpath, _dirs, files in os.walk(out):
            for f in files:
                fp = os.path.join(dirpath, f)
                os.utime(fp, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return path, rows


def test_session_stream_matches_batch_minus_open(spark, event_store):
    from crawl4ai_spark.operators.sessions import session_stats
    from crawl4ai_spark.streaming.sessions import session_stream

    path, rows = event_store
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")  # one micro-batch per time slice
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
    q = (
        session_stream(stream, gap_s=1800)
        .writeStream.format("memory").queryName("sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_idx"]): r
        for r in spark.sql("select * from sessions").collect()
    }

    batch_df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )
    batch = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(batch_df, gap_s=1800).collect()
    }
    # the stream emits every session except each user's final open one
    open_keys = {
        (u, max(i for (uu, i) in batch if uu == u))
        for (u, _i) in batch
    }
    want_keys = set(batch) - open_keys
    assert set(got) == want_keys, (set(got), want_keys)
    assert want_keys, "fixture must close at least one session"
    for k in want_keys:
        g, b = got[k], batch[k]
        assert g["n_events"] == b["n_events"], k
        assert g["start_ts"] == b["start_ts"], k
        assert g["end_ts"] == b["end_ts"], k
        assert g["duration_us"] == b["duration_us"], k
        assert g["total_value"] == b["total_value"], k


def test_session_stream_batch_harness_equals_batch(spark, event_store):
    """The batch-equivalence harness (same fold core, closed + final open
    session) must equal session_stats exactly — the contract the
    sessionize_stream_equiv driver probe gates against DuckDB."""
    from crawl4ai_spark.operators.sessions import session_stats
    from crawl4ai_spark.streaming.sessions import session_stream_batch

    path, rows = event_store
    batch_df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double")
    cols = ["user_id", "session_idx", "n_events", "start_ts", "end_ts",
            "duration_us", "total_value"]
    got = sorted(
        tuple(r[c] for c in cols)
        for r in session_stream_batch(batch_df, gap_s=1800).collect()
    )
    want = sorted(
        tuple(r[c] for c in cols)
        for r in session_stats(batch_df, gap_s=1800).collect()
    )
    assert got == want
