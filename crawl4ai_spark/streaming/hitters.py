"""Custom stateful streaming operator: live vocabulary document-frequency.

The batch engine computes top-k terms by DOCUMENT frequency with one
partial-aggregating groupBy (``operators/text.py heavy_hitters`` — the
stat behind stopword lists, boilerplate detection, and the dedup df
caps).  A curation consumer tailing a live document stream wants the same
counter incrementally — a term's df grows as documents arrive, and
downstream screens (line dedup thresholds, hot-shingle caps) want the
running value without a full recount:

  state key   = term,
  state value = cumulative document frequency,
  output      = one (term, df) row per term UPDATED in the micro-batch
                (the running df after folding that batch's documents).

Tokenization is the SAME column expression the batch operator uses
(``text.tokens_col`` + per-doc ``array_distinct``), evaluated JVM-side
BEFORE the stateful stage, so stream and batch can never disagree on what
a token is.  Counting is integer addition — batch-boundary invariant by
construction.

Equivalence contract (tests/test_streaming_hitters.py): after any
partitioning of the corpus into micro-batches, the LAST emitted df per
term equals the batch document frequency, and the top-k over those finals
equals ``heavy_hitters`` (same tie rule: df desc, term asc).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from crawl4ai_spark.operators.text import tokens_col

STATE_SCHEMA = "df long"
OUTPUT_SCHEMA = "term string, df long"


def _fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    """The fold shared by the STREAM operator and the batch equivalence
    harness: add the batch's row count for this term onto the running df."""
    n = sum(len(p) for p in pdfs)
    df = (state.get[0] if state.exists else 0) + n
    state.update((df,))
    yield pd.DataFrame([{"term": key[0], "df": int(df)}])


def _terms(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("term")
    )


def term_df_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``applyInPandasWithState`` over a streaming documents DataFrame:
    emits the running document frequency of every term touched by each
    micro-batch.  The explode of per-doc DISTINCT tokens happens in
    Catalyst before the shuffle, so the stateful stage only ever adds
    row counts per key."""
    terms = _terms(docs, text_col)
    return terms.groupBy("term").applyInPandasWithState(
        _fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _BatchState:
    """Minimal GroupState twin so the stream fold can replay in batch."""

    def __init__(self) -> None:
        self.exists = False
        self._v: tuple | None = None

    @property
    def get(self) -> tuple:
        return self._v

    def update(self, v: tuple) -> None:
        self._v = v
        self.exists = True


def term_df_batch(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch-equivalence harness for :func:`term_df_stream`: replay the
    SAME ``_fold`` callable over a static frame (one batch per term)
    through a minimal GroupState twin.  The result — each term's final
    running df — equals the plain document frequency, so the driver probe
    ``term_df_stream_equiv`` can gate the stream fold against a DuckDB
    oracle the way ``heavy_hitters`` gates the batch operator."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return next(_fold((pdf["term"].iloc[0],), iter([pdf]), _BatchState()))

    return _terms(docs, text_col).groupBy("term").applyInPandas(
        run, OUTPUT_SCHEMA)
