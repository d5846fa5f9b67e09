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

import re
from typing import Iterator

import numpy as np
import pandas as pd
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


def sentence_chunks(df: DataFrame, text_col: str = "text") -> DataFrame:
    """NlpSentenceChunking (chunking_strategy.py:62-88): split into
    sentences, strip, then ``list(set(...))`` — the reference DEDUPS and
    drops order, so the output is distinct (…, sentence) rows with no index.

    nltk punkt is unavailable offline; the splitter is the reference's own
    commented-out regex intent (:77-81) — break after ``.?!`` followed by
    whitespace — expressed without lookbehind (boundary-marker
    substitution) so the identical expression runs in Spark and in the
    DuckDB oracle (RE2 has no lookbehind either)."""
    marked = F.regexp_replace(F.col(text_col), r"([.!?])\s+", "$1\u001e")
    sents = F.filter(
        F.transform(F.split(marked, "\u001e"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    return df.select("*", F.explode(sents).alias("sentence")).drop(
        text_col
    ).distinct()


# --------------------------------------------------------------- TextTiling

def texttile_boundaries(tokens: list[str], w: int = 20, k: int = 6) -> list[int]:
    """TextTiling block comparison (Hearst 1997; reference
    TopicSegmentationChunking, chunking_strategy.py:91-145, delegates to
    nltk's TextTilingTokenizer — unavailable offline, so the published
    algorithm is implemented directly): pseudosentences of ``w`` tokens,
    cosine similarity of adjacent ``k``-pseudosentence blocks at every gap,
    depth scores, boundaries where depth > mean + stddev/2 valleys
    (Hearst's LC cutoff mean − stddev/2 on similarity depth).  Returns
    token offsets of segment starts (excluding 0).  Deterministic pure
    function — the driver oracle twin calls exactly this."""
    n_ps = len(tokens) // w
    if n_ps < 2:
        return []
    vocab: dict[str, int] = {}
    for t in tokens[: n_ps * w]:
        vocab.setdefault(t, len(vocab))
    mat = np.zeros((n_ps, len(vocab)), dtype=np.float64)
    for i in range(n_ps):
        for t in tokens[i * w:(i + 1) * w]:
            mat[i, vocab[t]] += 1.0
    sims = []
    for gap in range(1, n_ps):
        lo, hi = max(0, gap - k), min(n_ps, gap + k)
        left = mat[lo:gap].sum(axis=0)
        right = mat[gap:hi].sum(axis=0)
        denom = np.linalg.norm(left) * np.linalg.norm(right)
        sims.append(float(left @ right / denom) if denom > 0 else 0.0)
    sims = np.array(sims)
    depths = np.zeros(len(sims))
    for i in range(len(sims)):
        l = i
        while l > 0 and sims[l - 1] >= sims[l]:
            l -= 1
        r = i
        while r < len(sims) - 1 and sims[r + 1] >= sims[r]:
            r += 1
        depths[i] = (sims[l] - sims[i]) + (sims[r] - sims[i])
    if not len(depths) or depths.max() == 0.0:
        return []
    cutoff = depths.mean() + depths.std() / 2.0
    return [int((i + 1) * w) for i in np.nonzero(depths > cutoff)[0]]


def py_topic_chunks(text: str, w: int = 20, k: int = 6) -> list[str]:
    """Segment ``text`` at TextTiling boundaries; returns ordered segment
    strings (whitespace-normalized, like the tokenized reconstruction)."""
    tokens = [t for t in re.split(r"\s+", text or "") if t]
    cuts = [0] + texttile_boundaries(tokens, w, k) + [len(tokens)]
    return [
        " ".join(tokens[a:b]) for a, b in zip(cuts, cuts[1:]) if b > a
    ]


def topic_chunks(df: DataFrame, text_col: str = "text", w: int = 20,
                 k: int = 6) -> DataFrame:
    """TopicSegmentationChunking as an Arrow stage: documents are
    independent, so the per-doc sequential TextTiling runs inside
    ``mapInPandas`` batches (the correct shape — the algorithm is
    inherently per-document; parallelism comes from the row dimension)."""
    passthrough = [c for c in df.columns if c != text_col]
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != text_col
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                d = r._asdict()
                segs = py_topic_chunks(d.pop(text_col), w, k)
                for i, seg in enumerate(segs):
                    rows.append({**d, "chunk_idx": i, "chunk": seg})
            yield pd.DataFrame(
                rows, columns=passthrough + ["chunk_idx", "chunk"]
            )

    return df.mapInPandas(run, f"{fields}, chunk_idx int, chunk string")


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


def stream_chunks(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  chunk_token_threshold: int = 100, overlap: int = 10,
                  word_token_rate: float = 0.75,
                  n_shards: int = 8, seed: int = 5) -> DataFrame:
    """Cross-document streaming chunker — the reference's
    ``chunk_documents`` (utils.py:46-130): a token queue runs ACROSS
    document boundaries, emitting chunks whose weighted token total stays
    under ``chunk_token_threshold`` (each word weighs ``word_token_rate``
    tokens); up to ``overlap`` token-weight of each chunk's TAIL is pushed
    back onto the queue and opens the next chunk (reference quirk
    preserved: the yielded chunk EXCLUDES that tail — overlap defers
    tokens, it does not duplicate them).  The queue remainder flushes as a
    final short chunk per stream.

    The reference consumes one ordered iterable; at corpus scale the
    stream is sharded exactly like ``sampling.pack_sequences``: shard =
    first 16 bits of the md5 pack key (reproducible under any
    partitioning), docs ordered by (pack_key, id) within shard, ONE hash
    shuffle, then one Arrow ``applyInPandas`` fold per shard — shards are
    independent streams and run in parallel.

    Returns ``(shard int, chunk_idx long, chunk string, n_words long)``.
    Requires ``overlap < chunk_token_threshold`` (the reference loops
    forever otherwise).  Weights are multiples of 0.25 (0.75 or the
    tokenizer path's 1.0), so float comparisons are exact and the fold is
    bit-deterministic on any engine.
    """
    if overlap >= chunk_token_threshold:
        raise ValueError("overlap must be < chunk_token_threshold")
    key = F.md5(F.concat_ws("#", F.col(id_col).cast("string"), F.lit(str(seed))))
    staged = docs.select(
        F.col(id_col), F.col(text_col),
        key.alias("__pk"),
        (F.conv(F.substring(key, 1, 4), 16, 10).cast("int") % n_shards)
         .alias("shard"),
    )
    fields = "shard int, chunk_idx long, chunk string, n_words long"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        from collections import deque

        pdf = pdf.sort_values(["__pk", id_col])
        shard = int(pdf["shard"].iloc[0])
        toks: deque = deque()
        count = 0.0
        out = []

        def emit(chunk_toks: list[str]):
            out.append((shard, len(out), " ".join(chunk_toks),
                        len(chunk_toks)))

        for text in pdf[text_col]:
            ws = (text or "").split()
            toks.extend(ws)
            count += word_token_rate * len(ws)
            while count >= chunk_token_threshold:
                chunk: list[str] = []
                total = 0.0
                while toks:
                    if total + word_token_rate > chunk_token_threshold:
                        break
                    total += word_token_rate
                    chunk.append(toks.popleft())
                if not chunk:  # single token exceeds threshold
                    chunk.append(toks.popleft())
                    total += word_token_rate
                ov_total, ov_idx = 0.0, 0
                for _ in reversed(chunk):
                    if ov_total + word_token_rate > overlap:
                        break
                    ov_total += word_token_rate
                    ov_idx += 1
                if ov_idx > 0:
                    toks.extendleft(reversed(chunk[-ov_idx:]))
                    count += ov_total
                count -= total
                emit(chunk[:len(chunk) - ov_idx] if ov_idx else chunk)
        if toks:
            emit(list(toks))
        return pd.DataFrame(out, columns=["shard", "chunk_idx", "chunk",
                                          "n_words"])

    return staged.groupBy("shard").applyInPandas(fold, schema=fields)
