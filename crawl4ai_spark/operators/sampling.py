"""Deterministic sampling + training-shard packing (SURVEY §2.10).

Training-data pipelines over a curated corpus need three things the
reference (a single-process crawler) never grows: reproducible sampling
at corpus scale, per-stratum rate control (domain / language rebalancing
a la data-mixing recipes), and packing the survivors into byte-balanced
shards for the training loader.  All three are built scale-first:

- ``bernoulli_sample`` / ``stratified_sample`` are pure Catalyst filters:
  keep a row iff ``md5(key '#' seed)`` — a uniform 128-bit hex string —
  is lexicographically below a per-row threshold.  Lowercase-hex string
  order IS numeric order, the md5 is portable across engines (the DuckDB
  oracle evaluates the identical expression), the decision is a pure
  function of (key, seed), so the sample is reproducible under
  re-partitioning, retries and cluster-size changes, and the whole thing
  is one whole-stage-codegen filter: ZERO shuffle, 10^10 rows is just a
  scan.  (Spark's native ``df.sample`` is partition-order-dependent and
  not portable to an oracle — deliberately avoided.)

- ``shard_pack`` assigns each row a shard id so every shard holds a
  contiguous ``shard_bytes`` run of the corpus in deterministic shuffled
  order (hash of the key, ties broken by the key): global running sum of
  the size column via the hex-bucketed cumsum
  (``dist.hex_bucketed_cumsum`` — md5 keys are uniform, so bucket
  boundaries are known a priori: no range-boundary sampling job, ONE
  shuffle, broadcast prefix offsets), then
  ``shard_id = floor(bytes_before / shard_bytes)``.  A row lands in the
  shard where its first byte falls (greedy packing; a row longer than
  ``shard_bytes`` still gets exactly one shard).  No single-partition
  window anywhere.

Reference anchor: crawl4ai has no corpus-sampling surface (its unit is
one crawl); these are the post-crawl curation stages a 100 TB corpus
needs before training.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dist import hex_bucketed_cumsum

__all__ = [
    "sample_threshold_hex",
    "hash_uniform_hex",
    "bernoulli_sample",
    "stratified_sample",
    "shard_pack",
    "pack_sequences",
    "stratified_topn",
    "mixture_sample",
]

_HEX_DIGITS = 16  # compare on the first 16 hex digits (64 bits) of md5


def sample_threshold_hex(rate: float) -> str:
    """Hex threshold t such that P[md5_hex < t] == rate (to 2^-64).

    rate >= 1 returns 'g' (greater than every hex string → keep all);
    rate <= 0 returns '' (empty string precedes everything → keep none).
    """
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return ""
    return format(int(rate * (16 ** _HEX_DIGITS)), f"0{_HEX_DIGITS}x")


def hash_uniform_hex(key: Column, seed: int) -> Column:
    """The portable per-row uniform draw: md5 of ``key '#' seed``."""
    return F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}")))


def bernoulli_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``.

    Pure filter — no shuffle, no RNG state, stable under re-partitioning
    and task retries; the same (key, seed) row set survives on any
    cluster size.
    """
    return df.filter(
        hash_uniform_hex(F.col(key_col), seed) < F.lit(sample_threshold_hex(rate))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum Bernoulli rates (language/domain rebalancing).

    ``rates`` maps stratum value → keep rate; unseen strata use
    ``default_rate``.  The threshold is a CASE ladder over the stratum
    column — still a single codegen'd filter, zero shuffle.
    """
    thr: Column = F.lit(sample_threshold_hex(default_rate))
    for value in sorted(rates):  # deterministic ladder order
        thr = F.when(
            F.col(stratum_col) == F.lit(value),
            F.lit(sample_threshold_hex(rates[value])),
        ).otherwise(thr)
    return df.filter(hash_uniform_hex(F.col(key_col), seed) < thr)


def shard_pack(
    df: DataFrame,
    key_col: str,
    size_col: str,
    shard_bytes: int,
    seed: int = 0,
    num_partitions: int | None = None,
    deterministic_upstream: bool = False,
) -> DataFrame:
    """Assign byte-balanced training-shard ids in deterministic shuffled
    order.

    Adds three columns:
      - ``pack_key``   — the md5 shuffle key (kept so the order is auditable),
      - ``shard_id``   — floor(bytes_before_this_row / shard_bytes),
      - ``shard_offset`` — bytes_before_this_row - shard_id * shard_bytes.

    Global order is (pack_key, key) — a reproducible corpus shuffle, which
    a training loader wants anyway (no correlated neighbors).  The running
    sum is the hex-bucketed cumsum: the pack key is a uniform md5 draw, so
    bucket boundaries are known a priori and the generic range-partition
    path's boundary-sampling job (a full second execution of the upstream)
    and cross-partition sort are skipped — one checkpoint, one tiny bucket
    agg, ONE shuffle.  No single-partition window.
    """
    if shard_bytes <= 0:
        raise ValueError("shard_bytes must be positive")
    keyed = df.withColumn("pack_key", hash_uniform_hex(F.col(key_col), seed))
    packed = hex_bucketed_cumsum(
        keyed,
        "pack_key",
        key_col,
        size_col,
        out_col="__cum",
        n_buckets=num_partitions,
        # default False = checkpoint once (A/B-measured faster when the
        # upstream carries real compute: 19-23s vs 26-27s at 8M rows);
        # True re-evaluates a CHEAP deterministic upstream instead
        deterministic_upstream=deterministic_upstream,
    )
    before = F.col("__cum") - F.col(size_col).cast("long")
    return (
        packed.withColumn(
            "shard_id", F.floor(before / F.lit(shard_bytes)).cast("long")
        )
        .withColumn(
            "shard_offset",
            (before - F.col("shard_id") * F.lit(shard_bytes)).cast("long"),
        )
        .drop("__cum")
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    seed: int = 0,
    n_shards: int = 256,
) -> DataFrame:
    """Token-budget sequence packing (the LM-training batch-prep step):
    pack documents into training sequences of at most ``budget`` tokens,
    next-fit in deterministic shuffled order — a document that would
    overflow the open sequence starts a new one; a document longer than
    ``budget`` occupies a sequence alone (the loader truncates it).

    Packing is a sequential fold, so it cannot be a window/cumsum; the
    scale shape is: deterministic shard = first 16 bits of the md5 pack
    key (NOT repartitionByRange, whose sampled boundaries would break
    reproducibility) → ONE hash shuffle on ``shard`` → next-fit inside
    each shard in one Arrow ``applyInPandas`` pass, shards packing in
    parallel and independently.  Sequence ids are (shard, seq_id) — stable
    under any cluster size, retries, and input partitioning.

    Adds ``shard`` (int), ``seq_id`` (long, per shard), ``seq_off`` (long,
    token offset of this document inside its sequence).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if not 1 <= n_shards <= 65536:
        raise ValueError("n_shards must be in [1, 65536]")
    keyed = df.withColumn("pack_key", hash_uniform_hex(F.col(key_col), seed))
    keyed = keyed.withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring("pack_key", 1, 4), 16, 10).cast("long"),
            F.lit(n_shards),
        ).cast("int"),
    )
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in keyed.schema.fields
    )
    out_schema = f"{fields}, seq_id long, seq_off long"

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["pack_key", key_col]).reset_index(drop=True)
        toks = pdf[tokens_col].astype("int64").to_numpy()
        seq_ids = np.empty(len(pdf), dtype="int64")
        offs = np.empty(len(pdf), dtype="int64")
        seq, fill = 0, 0
        for i, t in enumerate(toks):
            if fill > 0 and fill + t > budget:
                seq += 1
                fill = 0
            seq_ids[i] = seq
            offs[i] = fill
            fill += t
        pdf["seq_id"] = seq_ids
        pdf["seq_off"] = offs
        return pdf

    return keyed.groupBy("shard").applyInPandas(pack, out_schema)


def stratified_topn(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    n_per_stratum: int,
    seed: int = 0,
) -> DataFrame:
    """EXACT count-based sampling: the ``n_per_stratum`` rows of each
    stratum with the smallest md5 draws (rate-based sampling's dual — use
    this when the recipe says "N examples per class", not "p% of each").

    Deterministic for the same reasons as ``bernoulli_sample``; one
    shuffle on the stratum key for the per-stratum rank.  Strata are few
    by construction (languages, buckets, classes) and each stratum's rank
    is a partial TopK under the hood, so the window never funnels the
    corpus through one task beyond the per-stratum ceiling."""
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        hash_uniform_hex(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def importance_resample(scored: DataFrame, n: int,
                        id_col: str = "doc_id",
                        weight_col: str = "llr_micro",
                        seed: int = 11) -> DataFrame:
    """The resampling half of DSIR (Xie et al. 2023 §3: sample without
    replacement with probability ∝ exp(score)) — consume
    ``quality.dsir_weights`` output and draw ``n`` documents by the
    Gumbel-top-k / exponential-race trick: rank by
    ``score + Gumbel(id, seed)`` and keep the top n, which IS
    without-replacement sampling ∝ exp(score).

    Determinism: the Gumbel comes from the md5-uniform idiom
    (``u = (first 12 hex chars + 1) / 16^12``, ``g = -ln(-ln u)``) and
    the race key is rounded to integer MICRO-NATS before ranking (the
    dsir_weights idiom — the two lns are computed identically on both
    engines, and the ordering compares longs with an id tiebreak), so
    the drawn set is a pure function of (ids, scores, seed): invariant
    under partitioning, retries, and cluster size.

    Scale shape: one codegen projection + a global top-n
    (``TakeOrdered`` — per-partition heaps, no full sort, no
    single-partition window).  Returns
    ``(id_col, weight_col, race_micro, draw_rank)``.
    """
    u = (
        F.conv(F.substring(
            F.md5(F.concat_ws("#", F.col(id_col).cast("string"),
                              F.lit(str(seed)))), 1, 12), 16, 10)
        .cast("double") + F.lit(1.0)
    ) / F.lit(float(16 ** 12))
    gumbel = -F.log(-F.log(u))
    race = F.round(
        F.col(weight_col).cast("double") + F.lit(1_000_000.0) * gumbel, 0
    ).cast("long")
    from pyspark.sql import Window

    ranked = scored.select(
        F.col(id_col), F.col(weight_col), race.alias("race_micro")
    ).orderBy(F.col("race_micro").desc(), F.col(id_col).asc()).limit(n)
    # the window sorts only the n already-drawn rows
    w = Window.orderBy(F.col("race_micro").desc(), F.col(id_col).asc())
    return ranked.withColumn(
        "draw_rank", F.row_number().over(w).cast("long"))


def mixture_sample(df: DataFrame, key_col: str, domain_col: str,
                   weights: dict[str, int], total_budget: int,
                   size_col: str, seed: int = 0,
                   num_partitions: int | None = None) -> DataFrame:
    """Token-budget mixture (quota) sampling — the DoReMi/The-Pile-style
    "build a corpus with these domain proportions" stage (Xie et al. 2023
    DoReMi §2; Gao et al. 2020 The Pile Table 1 publish exactly such
    mixtures).  Given integer ``weights`` per domain and a ``total_budget``
    in units of ``size_col`` (tokens/chars/bytes), keep each domain's
    deterministic md5-shuffled PREFIX whose running size fits its quota::

        budget_d = weights[d] * total_budget // sum(weights)   (exact ints)
        keep row <=> its inclusive running size within the domain
                     (ordered by md5(key '#' seed), key) <= budget_d

    Domains absent from ``weights`` (and NULL domains) get budget 0 and
    drop out.  The kept set is a pure function of (rows, weights, budget,
    seed) — reproducible under re-partitioning, retries and cluster size,
    and every compared quantity is an exact integer (no float thresholds).

    Scale shape: NO per-domain single-reducer window.  The running sum is
    ``dist.with_global_cumsum`` over the GLOBAL (domain, md5, key) order —
    range partitioning spreads a hot domain across many partitions because
    the md5 component varies — and the per-domain inclusive cumsum is
    recovered by subtracting each domain's preceding-domains offset, a
    #domains-sized broadcast dim (mixture recipes have tens of domains).
    Cost: one range shuffle of the corpus + one vocab-sized aggregate.

    Returns df columns + ``cum_size`` (inclusive per-domain running size).
    """
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum > 0")
    budgets = {d: weights[d] * total_budget // wsum for d in weights}

    from ..dist import with_global_cumsum

    dom = F.coalesce(F.col(domain_col).cast("string"), F.lit("\x00null"))
    keyed = df.withColumn("__dom", dom).withColumn(
        "__draw", hash_uniform_hex(F.col(key_col), seed))
    cum = with_global_cumsum(
        keyed, ["__dom", "__draw", key_col], size_col, "__cum_all",
        num_partitions=num_partitions,
    )
    # Preceding-domains offset: cumsum of per-domain totals in __dom order
    # minus the domain's own total.  The window sorts the #domains-sized
    # aggregate only.  Totals aggregate the CHECKPOINTED cumsum frame, not
    # ``keyed`` — aggregating the pre-checkpoint frame would re-evaluate
    # the whole upstream a second time (a full extra corpus scan at scale).
    from pyspark.sql import Window

    totals = cum.groupBy("__dom").agg(
        F.sum(F.col(size_col).cast("long")).alias("__tot"))
    off_w = Window.orderBy("__dom").rowsBetween(Window.unboundedPreceding, 0)
    offsets = totals.select(
        "__dom", (F.sum("__tot").over(off_w) - F.col("__tot")).alias("__off"))

    budget_expr = F.lit(0).cast("long")
    for d in sorted(budgets):
        budget_expr = F.when(
            F.col("__dom") == F.lit(d), F.lit(budgets[d]).cast("long")
        ).otherwise(budget_expr)

    out = cum.join(F.broadcast(offsets), "__dom")
    return (
        out.withColumn("cum_size", (F.col("__cum_all") - F.col("__off")).cast("long"))
        .where(F.col("cum_size") <= budget_expr)
        .drop("__dom", "__draw", "__cum_all", "__off")
    )
