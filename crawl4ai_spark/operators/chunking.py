"""Chunking strategies (G11, SURVEY §2.7) as Catalyst dataflow.

Reference: crawl4ai/chunking_strategy.py —
  RegexChunking (re.split per pattern, default ["\\n\\n"], :38-61;
  NB re.split KEEPS empty strings),
  FixedLengthWordChunking (word blocks of N, :148-175),
  SlidingWindowChunking (window W step S over words + tail window,
  :178-216; short text returns [text] UNSPLIT),
  OverlappingWindowChunking (window W, stride W−V, :219-257; short text
  returns [text] UNSPLIT).

All pure expressions: split / sequence / transform / slice / posexplode —
whole-stage codegen, no Python, and each is ANSI-SQL expressible so the
DuckDB oracle can verify (driver harness `chunk_*` queries).
Every chunker returns (… , chunk_idx int, chunk string) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def _explode(df: DataFrame, chunks: Column, text_col: str) -> DataFrame:
    return df.select(
        "*", F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).drop(text_col)


def regex_chunks(df: DataFrame, text_col: str = "text",
                 pattern: str = r"\n\n") -> DataFrame:
    """RegexChunking (chunking_strategy.py:38-61): re.split — empty
    fragments are KEPT (reference does not filter them)."""
    return _explode(df, F.split(F.col(text_col), pattern), text_col)


def fixed_word_chunks(df: DataFrame, chunk_size: int = 100,
                      text_col: str = "text") -> DataFrame:
    """FixedLengthWordChunking (:148-175): consecutive word blocks of
    ``chunk_size`` (last may be short); empty text → no chunks."""
    w = _words(F.col(text_col))
    n = F.size(w)
    n_chunks = F.ceil(n / F.lit(chunk_size)).cast("int")
    chunks = F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(w, i * chunk_size + 1, chunk_size)),
        )
    )
    return _explode(df, chunks, text_col)


def sliding_window_chunks(df: DataFrame, window: int = 100, step: int = 50,
                          text_col: str = "text") -> DataFrame:
    """SlidingWindowChunking (:178-216): windows of ``window`` words every
    ``step``; words ≤ window → [text] UNSPLIT (:196-197); a tail window of
    the last ``window`` words is appended when the stride does not land on
    the end (:205-207)."""
    w = _words(F.col(text_col))
    n = F.size(w)
    main = F.transform(
        F.sequence(F.lit(0), F.floor((n - window) / step).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(w, i * step + 1, window)),
    )
    # reference tail condition: last_start + window < n_words
    last_start = F.floor((n - window) / step).cast("int") * step
    tail_needed = (last_start + window) < n
    tail = F.concat_ws(" ", F.slice(w, n - window + 1, window))
    chunks = F.when(n <= window, F.array(F.col(text_col))).otherwise(
        F.when(tail_needed, F.concat(main, F.array(tail))).otherwise(main)
    )
    return _explode(df, chunks, text_col)


def overlapping_window_chunks(df: DataFrame, window: int = 1000,
                              overlap: int = 100,
                              text_col: str = "text") -> DataFrame:
    """OverlappingWindowChunking (:219-257): stride = window − overlap;
    words ≤ window → [text] UNSPLIT; else windows until one reaches the
    end (count = ceil((n−window)/stride) + 1)."""
    stride = window - overlap
    w = _words(F.col(text_col))
    n = F.size(w)
    n_extra = F.ceil((n - window) / F.lit(stride)).cast("int")
    chunks = F.when(n <= window, F.array(F.col(text_col))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_extra),
            lambda i: F.concat_ws(" ", F.slice(w, i * stride + 1, window)),
        )
    )
    return _explode(df, chunks, text_col)
