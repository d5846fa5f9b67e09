"""Stateful streaming D2: the applyInPandasWithState domain-state operator
must converge to exactly the batch engine's fold, regardless of micro-batch
boundaries."""

import time

import pandas as pd
import pytest

from crawl4ai_spark.operators.politeness import (
    empty_domain_state,
    update_domain_state,
)


@pytest.fixture(scope="module")
def results_store(spark, tmp_path_factory):
    # three "supersteps" of crawl results with rate-limit trajectories
    from crawl4ai_spark.plans.checkpoint import SnapshotStore

    root = tmp_path_factory.mktemp("stream_state")
    store = SnapshotStore(str(root / "ckpt"))
    rows = [
        # superstep, seq, host, status
        (0, 0, "a.test", 429), (0, 1, "a.test", 200), (0, 2, "b.test", 503),
        (1, 3, "a.test", 200), (1, 4, "b.test", 503), (1, 5, "b.test", 503),
        (2, 6, "b.test", 503), (2, 7, "b.test", 503), (2, 8, "c.test", 200),
    ]
    import os

    for s in (0, 1, 2):
        df = spark.createDataFrame(
            [(sup, seq, h, st, f"https://{h}/p{seq}")
             for (sup, seq, h, st) in rows if sup == s],
            "superstep int, seq long, host string, status_code int, url string",
        )
        # one file per superstep: with maxFilesPerTrigger=1 each micro-batch
        # is exactly one superstep, matching the operator's in-order
        # contract (a production tail admits whole committed supersteps via
        # the store manifest; loose part files of one superstep carry no
        # intra-superstep order)
        path = store.write("results", df.coalesce(1), s)
        # FileStreamSource admits files oldest-mtime-first; same-ms writes
        # tie-break arbitrarily. The operator's contract is in-order
        # superstep delivery (the live store commits supersteps seconds
        # apart) — make the fixture's mtimes strictly increasing.
        for dirpath, _dirs, files in os.walk(path):
            for f in files:
                fp = os.path.join(dirpath, f)
                os.utime(fp, (1_700_000_000 + s * 10, 1_700_000_000 + s * 10))
    return store, rows


def _batch_truth(rows):
    state = empty_domain_state()
    for s in (0, 1, 2):
        pdf = pd.DataFrame(
            [{"host": h, "seq": seq, "status_code": st}
             for (sup, seq, h, st) in rows if sup == s]
        )
        state = update_domain_state(state, pdf, seed=42, superstep=s)
    return {r.host: (r.current_delay, int(r.fail_count), bool(r.give_up))
            for r in state.itertuples()}


def test_domain_state_stream_matches_batch_fold(spark, results_store):
    import os

    from crawl4ai_spark.streaming.state import domain_state_stream

    store, rows = results_store
    path = os.path.join(store.root, "results")
    stream = (
        spark.readStream.schema(
            "superstep int, seq long, host string, status_code int, url string"
        )
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
    snapshots = domain_state_stream(stream, seed=42)
    q = (
        snapshots.writeStream.format("memory").queryName("dstate")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got_rows = spark.sql("select * from dstate").collect()
    assert got_rows, "no state snapshots emitted"
    # last snapshot per host (highest last_superstep, then latest emission)
    final = {}
    for r in got_rows:
        cur = final.get(r["host"])
        if cur is None or r["last_superstep"] >= cur["last_superstep"]:
            final[r["host"]] = r
    want = _batch_truth(rows)
    assert set(final) == set(want)
    for host, (delay, fails, give_up) in want.items():
        got = final[host]
        assert got["current_delay"] == pytest.approx(delay, rel=1e-12), host
        assert got["fail_count"] == fails, host
        assert got["give_up"] == give_up, host
    # b.test took 5 consecutive rate-limit codes → gave up
    assert want["b.test"][2] is True
