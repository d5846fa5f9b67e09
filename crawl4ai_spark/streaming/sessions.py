"""Custom stateful streaming operator: live gap-based sessionization.

The batch engine computes sessions with a per-user window
(``operators/sessions.py``).  A monitoring consumer tailing the event
stream wants the same sessions live, closing each one as soon as the gap
rule decides it is over — so this module re-expresses the fold as an
``applyInPandasWithState`` operator:

  state key   = user,
  state value = the OPEN session (index, event count, start/last event
                time in integer microseconds, value sum in integer cents),
  output      = one row per CLOSED session (a session closes when a later
                event arrives more than ``gap_s`` after its last event).

Equivalence contract (verified in tests/test_streaming_sessions.py): fed
the same events in nondecreasing ts order per user across micro-batches,
the closed-session stream equals the batch ``session_stats`` output minus
each user's final (still-open) session — that one lives in the state
store until a later event closes it.  Within a micro-batch rows are
sorted by (ts, order_col); ACROSS batches ordered delivery is the same
admission contract as ``streaming/state.py`` (align batches to committed
time slices — FileStreamSource mtime order with one file per slice).

All arithmetic is integers: event times as microseconds (tz-free, the
batch operator's ``timestampdiff`` twin) and values as cents — converted
with the exact semantics of Spark's double→DECIMAL(18,2) cast
(HALF_UP on the shortest-repr digits, see ``_cents``), so the stream and
the batch DECIMAL sums agree bit-for-bit as doubles, including half-cent
values like 0.125.  A NULL value contributes 0 cents, matching SQL
``sum()`` null-skipping; event timestamps must be non-null (same
precondition as the batch operator's window ordering).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = (
    "session_idx long, n_events long, start_us long, last_us long, "
    "value_cents long"
)
OUTPUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, "
    "start_ts timestamp_ntz, end_ts timestamp_ntz, duration_us long, "
    "total_value double"
)


def _us(col: pd.Series) -> pd.Series:
    return col.astype("datetime64[us]").astype("int64")


_CENT = Decimal("0.01")


def _cents(values: pd.Series) -> list[int]:
    """Twin of Spark's ``cast(value as decimal(18,2))``: HALF_UP on the
    shortest decimal representation of the double (BigDecimal.valueOf
    semantics — 0.125 → 13 cents, where float*100 + banker's rounding
    would give 12).  NULL → 0, matching SQL sum() null-skipping."""
    return [
        0 if pd.isna(v)
        else int(Decimal(repr(float(v))).quantize(_CENT, ROUND_HALF_UP) * 100)
        for v in values
    ]


def _closed_row(user: int, state: tuple) -> dict:
    idx, n, start_us, last_us, cents = state
    return {
        "user_id": int(user),
        "session_idx": int(idx),
        "n_events": int(n),
        "start_ts": pd.Timestamp(int(start_us), unit="us"),
        "end_ts": pd.Timestamp(int(last_us), unit="us"),
        "duration_us": int(last_us - start_us),
        "total_value": float(cents) / 100.0,
    }


def _fold_user(user, ts_us, cents, cur: tuple | None,
               gap_us: int) -> tuple[list[dict], tuple]:
    """The fold core shared by the STREAM operator and the batch
    equivalence harness: advance the open-session state ``cur`` through
    one user's (sorted) events, returning (closed-session rows, new
    open-session state)."""
    closed: list[dict] = []
    for t, c in zip(ts_us, cents):
        if cur is None:
            cur = (0, 1, int(t), int(t), int(c))
        elif t - cur[3] > gap_us:
            closed.append(_closed_row(user, cur))
            cur = (cur[0] + 1, 1, int(t), int(t), int(c))
        else:
            cur = (cur[0], cur[1] + 1, cur[2], int(t), cur[4] + int(c))
    return closed, cur


_OUT_COLS = ["user_id", "session_idx", "n_events", "start_ts", "end_ts",
             "duration_us", "total_value"]


def session_stream(
    events: DataFrame,
    gap_s: int = 1800,
    order_col: str = "event_id",
) -> DataFrame:
    """``applyInPandasWithState`` over a streaming events DataFrame
    (user_id, ts, value, ``order_col``): emits one row per CLOSED session;
    the open session per user persists in the streaming state store."""
    gap_us = int(gap_s) * 1_000_000

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", order_col])
        ts_us = _us(rows["ts"]).to_numpy()
        cents = _cents(rows["value"])
        cur: tuple | None = state.get if state.exists else None
        closed, cur = _fold_user(user, ts_us, cents, cur, gap_us)
        state.update(cur)
        if closed:
            yield pd.DataFrame(closed)

    return (
        events.select("user_id", "ts", order_col, "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def session_stream_batch(
    events: DataFrame,
    gap_s: int = 1800,
    order_col: str = "event_id",
) -> DataFrame:
    """Batch-equivalence harness for :func:`session_stream`: run the SAME
    fold core (``_fold_user`` — the state-store transition function) over
    a STATIC events frame via plain ``applyInPandas``, emitting every
    session (the closed ones plus each user's final open session).

    By the module's equivalence contract this equals the batch
    ``session_stats`` output exactly, which is what makes the streaming
    fold DuckDB-gateable: the driver probe ``sessionize_stream_equiv``
    runs this harness against the same gap-sessionization SQL oracle as
    the batch ``sessionize`` probe.  (``applyInPandasWithState`` itself
    cannot run on a static frame; the harness is the standard way to pin
    a stateful fold's semantics to a batch oracle.)"""
    gap_us = int(gap_s) * 1_000_000

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        user = pdf["user_id"].iloc[0]
        rows = pdf.sort_values(["ts", order_col])
        ts_us = _us(rows["ts"]).to_numpy()
        cents = _cents(rows["value"])
        closed, cur = _fold_user(user, ts_us, cents, None, gap_us)
        if cur is not None:
            closed.append(_closed_row(user, cur))
        return pd.DataFrame(closed, columns=_OUT_COLS)

    return (
        events.select("user_id", "ts", order_col, "value")
        .groupBy("user_id")
        .applyInPandas(run, OUTPUT_SCHEMA)
    )
