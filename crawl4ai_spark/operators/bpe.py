"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") + corpus
segmentation with the learned merges.

The reference estimates subword counts with a heuristic
(``operators/text.py subword_count``); training pipelines need the real
thing — a tokenizer LEARNED from the corpus being packed.  This module
trains byte-pair merges with Spark dataflow and applies them corpus-wide.

Scale shape
-----------
* The ONLY corpus-sized pass is the initial word count (explode + one
  partial-aggregating groupBy).  Classic BPE training operates on the
  DISTINCT-word table weighted by counts, which is vocabulary-sized
  (10^7-10^8 rows at 100 TB — still distributed, but many orders of
  magnitude under the corpus).
* Each merge round is one adjacent-pair explode + groupBy over that word
  table; the argmax is a single-row ``collect`` (a scalar control read,
  same budget as the crawl superstep reads).  The word table re-segments
  with a per-row Catalyst ``aggregate`` fold and is eagerly
  ``localCheckpoint``-ed per round so round k never re-executes rounds
  1..k-1 (flat lineage — the PageRank idiom).
* Segmentation of the full corpus is ONE Arrow stage with the merge
  ranks closed over (k rows — trivially broadcast); per-batch
  distinct-word memoization makes the per-row cost amortize to the
  distinct words of the batch.

Determinism: tie-broken argmax ``(freq DESC, left ASC, right ASC)`` —
UTF-8 binary string order equals code-point order, so any engine,
partitioning, or cluster size learns the identical merge sequence.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, its own symbol (Sennrich §3.2 variant)


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                     lambda w: w != "")
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word").agg(F.count("*").alias("wc"))
    )


def _merge_pair_expr(symbols, left: str, right: str):
    """Greedy left-to-right non-overlapping replacement of the adjacent
    symbol pair (left, right) with their concatenation — a Catalyst
    ``aggregate`` fold (push; if (last == left ∧ cur == right) fuse)."""
    l, r = F.lit(left), F.lit(right)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (s == r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.concat(l, r))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(docs: DataFrame, text_col: str = "text",
              num_merges: int = 50, min_pair_freq: int = 2) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus.  Returns the merge
    table ``(rank int, left string, right string, freq long)`` in learned
    order; stops early when the best pair's corpus frequency drops under
    ``min_pair_freq``."""
    spark = docs.sparkSession
    wc = _word_counts(docs, text_col)
    words = wc.select(
        "wc",
        F.concat(
            F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
            F.array(F.lit(END)),
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pairs = words.select(
            "wc",
            F.explode(F.when(
                F.size("syms") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("syms") - 2),
                    lambda i: F.struct(
                        F.element_at("syms", i + 1).alias("l"),
                        F.element_at("syms", i + 2).alias("r"),
                    ),
                ),
            ).otherwise(F.array().cast(
                "array<struct<l:string,r:string>>"))).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()  # ONE row — scalar control read
        )
        if not best or best[0]["freq"] < min_pair_freq:
            break
        l, r, freq = best[0]["l"], best[0]["r"], int(best[0]["freq"])
        merges.append((rank, l, r, freq))
        has = F.exists(
            F.when(F.size("syms") >= 2, F.transform(
                F.sequence(F.lit(0), F.size("syms") - 2),
                lambda i: F.struct(
                    F.element_at("syms", i + 1).alias("l"),
                    F.element_at("syms", i + 2).alias("r"),
                ),
            )).otherwise(F.array().cast("array<struct<l:string,r:string>>")),
            lambda p: (p["l"] == F.lit(l)) & (p["r"] == F.lit(r)),
        )
        words = words.select(
            "wc",
            F.when(has, _merge_pair_expr(F.col("syms"), l, r))
             .otherwise(F.col("syms")).alias("syms"),
        ).localCheckpoint(eager=True)  # flat lineage: round k costs round k

    return spark.createDataFrame(
        merges, "rank int, left string, right string, freq long"
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END]
    while len(syms) >= 2:
        best_rank, best_pair = None, None
        for a, b in zip(syms, syms[1:]):
            rk = ranks.get((a, b))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_pair = rk, (a, b)
        if best_pair is None:
            break
        l, r = best_pair
        out: list[str] = []
        for s in syms:
            if out and out[-1] == l and s == r:
                out[-1] = l + r
            else:
                out.append(s)
        syms = out
    return syms


def bpe_segment(docs: DataFrame, merges: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Apply a learned merge table to the corpus: standard BPE encoding
    (repeatedly fuse the LOWEST-rank adjacent pair, all non-overlapping
    occurrences left-to-right).  Returns ``(id_col, n_tokens, n_pieces)``.

    One Arrow stage; the merge table (k rows) is collected once and
    closed over — the 100 TB side never shuffles.  A per-batch memo keyed
    by distinct word amortizes encoding to the batch vocabulary."""
    ranks = {(r["left"], r["right"]): r["rank"] for r in merges.collect()}
    fields = f"{id_col} long, n_tokens long, n_pieces long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batches:
            ids, nt, np_ = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in (text or "").lower().split() if w]
                pieces = 0
                for w in ws:
                    n = memo.get(w)
                    if n is None:
                        n = len(_encode_word(w, ranks))
                        memo[w] = n
                    pieces += n
                ids.append(did)
                nt.append(len(ws))
                np_.append(pieces)
            yield pd.DataFrame({id_col: ids, "n_tokens": nt,
                                "n_pieces": np_})

    return docs.select(id_col, text_col).mapInPandas(run, schema=fields)
