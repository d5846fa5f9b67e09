"""Corpus-hygiene tier: Gopher-style quality rules, repetition signals,
benchmark decontamination, and cross-corpus line dedup.

These are the standard pre-training text screens (Rae et al. 2021 "Scaling
Language Models: ... Gopher" Table A1; Penedo et al. 2023 RefinedWeb §4;
Brown et al. 2020 GPT-3 appendix C decontamination) re-expressed as Spark
dataflow.  They extend the reference's quality surface — crawl4ai's
word_count_threshold (`config.py:39`), PruningContentFilter
(`content_filter_strategy.py:127-303`) and BM25 relevance — to the
corpus-level screens a 100 TB training pipeline runs after the crawl.

Scale notes
-----------
* ``gopher_quality`` / ``repetition_signals`` are PER-ROW column
  expressions (higher-order array functions) — whole-stage codegen, zero
  shuffle, filter-pushdown friendly.  The top-n-gram mode is computed as a
  run-length scan over the SORTED gram array (O(L log L) per row), never a
  quadratic count.
* ``decontaminate`` broadcasts the benchmark gram set (eval suites are
  MBs; the corpus is the 100 TB side) so the contamination join is
  map-side; per-doc grams are array_distinct'ed BEFORE the explode so the
  join input is minimal.
* ``line_dedup`` needs exactly two shuffles at any scale: one hash
  partition by normalized line (a window computes the corpus-wide line
  frequency — counting is O(occurrences), so hot boilerplate lines cost
  their own cardinality, never a cross product), and one by doc id to
  reassemble the kept lines in order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Gopher Table A1 "required words": a doc must contain >= 2 distinct ones.
REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# (rule name, default bound) — first failing rule wins, in this order.
GOPHER_RULES = [
    ("too_few_words", 50),        # n_words < 50
    ("too_many_words", 100_000),  # n_words > 100000
    ("short_words", 3.0),         # mean word length < 3
    ("long_words", 10.0),         # mean word length > 10
    ("symbol_heavy", 0.1),        # (# + ellipsis) / words > 0.1
    ("bullet_heavy", 0.9),        # bullet-started lines > 90%
    ("ellipsis_heavy", 0.3),      # ellipsis-ended lines > 30%
    ("nonalpha_words", 0.8),      # words containing a letter < 80%
    ("no_stopwords", 2),          # distinct required stopwords < 2
]


def _words(text: Column) -> Column:
    # NULL text coalesces to '' (F.size(split(NULL)) is -1, which would
    # poison every downstream count) — same guard in every helper below
    return F.filter(F.split(F.coalesce(text, F.lit("")), r"\s+"),
                    lambda w: w != "")


def _lines(text: Column) -> Column:
    return F.filter(F.split(F.coalesce(text, F.lit("")), "\n"),
                    lambda l: F.trim(l) != "")


def gopher_quality(docs: DataFrame, text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: float = 3.0,
                   max_mean_word_len: float = 10.0,
                   max_symbol_ratio: float = 0.1,
                   max_bullet_frac: float = 0.9,
                   max_ellipsis_frac: float = 0.3,
                   min_alpha_word_frac: float = 0.8,
                   min_req_stopwords: int = 2) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 Table A1) as pure Catalyst
    columns: word-count window, mean-word-length window, symbol-to-word
    ratio (``#`` and ellipsis), bullet-started / ellipsis-ended line
    fractions, alphabetic-word floor, and the required-stopword rule.

    Adds the intermediate stats plus ``keep boolean`` and ``drop_reason``
    (FIRST failing rule in GOPHER_RULES order; NULL when kept).  Zero
    shuffle — run it before any dedup tier.

    Definitions (documented spec, deterministic on any engine):
    words = text split on whitespace, empties dropped; lines = text split
    on newline, blank lines dropped; a bullet line starts with '-' or
    '•' after lstrip; an ellipsis line ends with '...' or '…';
    symbols = occurrences of '#', '...' and '…' (a '...' run counts
    once, matched greedily left-to-right).
    """
    text = F.col(text_col)
    words = _words(text)
    lines = _lines(text)
    n_words = F.size(words)
    n_lines = F.size(lines)
    w_or_1 = F.greatest(n_words, F.lit(1)).cast("double")
    l_or_1 = F.greatest(n_lines, F.lit(1)).cast("double")

    mean_wlen = (
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w)).cast("double") / w_or_1
    )
    # '#' count + ellipsis-run count ('...'+ or U+2026, greedy/non-overlap)
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ellipsis = F.size(F.split(text, r"\.{3,}|…")) - F.lit(1)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / w_or_1
    bullet_frac = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[-•]"))
    ).cast("double") / l_or_1
    ellipsis_frac = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
    ).cast("double") / l_or_1
    alpha_word_frac = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("double") / w_or_1
    req_stop = F.size(F.array_distinct(F.filter(
        F.transform(words, F.lower),
        lambda w: w.isin(REQUIRED_STOPWORDS),
    )))

    reason = (
        F.when(n_words < F.lit(min_words), "too_few_words")
        .when(n_words > F.lit(max_words), "too_many_words")
        .when(mean_wlen < F.lit(float(min_mean_word_len)), "short_words")
        .when(mean_wlen > F.lit(float(max_mean_word_len)), "long_words")
        .when(symbol_ratio > F.lit(float(max_symbol_ratio)), "symbol_heavy")
        .when(bullet_frac > F.lit(float(max_bullet_frac)), "bullet_heavy")
        .when(ellipsis_frac > F.lit(float(max_ellipsis_frac)), "ellipsis_heavy")
        .when(alpha_word_frac < F.lit(float(min_alpha_word_frac)), "nonalpha_words")
        .when(req_stop < F.lit(min_req_stopwords), "no_stopwords")
    )
    return (
        docs
        .withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", F.round(mean_wlen, 6))
        .withColumn("symbol_ratio", F.round(symbol_ratio, 6))
        .withColumn("bullet_frac", F.round(bullet_frac, 6))
        .withColumn("ellipsis_frac", F.round(ellipsis_frac, 6))
        .withColumn("alpha_word_frac", F.round(alpha_word_frac, 6))
        .withColumn("req_stop_hits", req_stop.cast("long"))
        .withColumn("drop_reason", reason)
        .withColumn("keep", F.col("drop_reason").isNull())
    )


def _word_grams(words: Column, n: int) -> Column:
    """Word n-grams as ' '-joined strings; empty array when < n words.
    (Guarded: Spark's sequence(0, k) DESCENDS when k < 0, so the short-doc
    case must return an explicit empty array, not sequence(0, -1).)"""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    return F.when(F.size(words) < n, F.array().cast("array<string>")).otherwise(grams)


def _top_run(sorted_arr: Column) -> Column:
    """(count, element) of the most frequent element of a SORTED array via
    one run-length scan; ties go to the smallest element (first max run
    under strict >).  O(L) after the sort — never a quadratic count."""
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"), F.lit("").alias("bestg"),
    )

    def step(acc, g):
        run2 = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        better = run2 > acc["best"]
        return F.struct(
            g.alias("prev"), run2.alias("run"),
            F.when(better, run2).otherwise(acc["best"]).alias("best"),
            F.when(better, g).otherwise(acc["bestg"]).alias("bestg"),
        )

    return F.aggregate(
        sorted_arr, init, step,
        lambda acc: F.struct(acc["best"].alias("cnt"), acc["bestg"].alias("gram")),
    )


def repetition_signals(docs: DataFrame, text_col: str = "text",
                       ngram_sizes: tuple[int, ...] = (2, 3, 4)) -> DataFrame:
    """Gopher repetition signals, per row (Rae et al. 2021 Table A1):

    * ``dup_line_frac``    — fraction of (non-blank, trimmed) lines that are
      repeats of an earlier identical line: 1 - distinct/total.
    * ``dup_line_char_frac`` — fraction of line characters carried by those
      repeats: 1 - chars(each distinct line once)/chars(all lines).
    * ``top{n}gram_char_frac`` — chars covered by all occurrences of the
      MOST frequent word n-gram over the doc's char length:
      count * len(gram) / len(text).  The mode is a run-length scan over
      the sorted gram array; ties break to the lexicographically smallest
      gram (binary collation on both engines).

    All higher-order array expressions — zero shuffle, codegen.
    """
    text = F.col(text_col)
    words = _words(text)
    # explicit single-arg lambda: F.trim grew an optional second parameter,
    # and transform would otherwise bind it as an (element, index) callback
    # — silently leaving lines UNtrimmed
    lines = F.transform(_lines(text), lambda l: F.trim(l))
    n_lines = F.size(lines)
    l_or_1 = F.greatest(n_lines, F.lit(1)).cast("double")
    dlines = F.array_distinct(lines)
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, l: acc + F.length(l)
    )
    line_chars = chars(lines)
    out = docs.withColumn(
        "dup_line_frac",
        F.round((n_lines - F.size(dlines)).cast("double") / l_or_1, 6),
    ).withColumn(
        "dup_line_char_frac",
        F.round(
            (line_chars - chars(dlines)).cast("double")
            / F.greatest(line_chars, F.lit(1)).cast("double"), 6),
    )
    text_chars = F.greatest(F.length(text), F.lit(1)).cast("double")
    for n in ngram_sizes:
        top = _top_run(F.array_sort(_word_grams(words, n)))
        frac = F.when(
            F.size(words) < n, F.lit(0.0)
        ).otherwise(top["cnt"].cast("double") * F.length(top["gram"]) / text_chars)
        out = out.withColumn(f"top{n}gram_char_frac", F.round(frac, 6))
    return out


FINEWEB_TERMINALS = (".", "!", "?", '"')


def fineweb_filters(docs: DataFrame, text_col: str = "text",
                    punct_num: int = 12, punct_den: int = 100,
                    short_num: int = 67, short_den: int = 100,
                    short_chars: int = 30,
                    dupchar_num: int = 10, dupchar_den: int = 100
                    ) -> DataFrame:
    """The FineWeb custom quality filters (Penedo et al. 2024, "The
    FineWeb Datasets" §3.6 — the three heuristics the ablations added on
    top of the Gopher/C4 rulesets, completing this repo's quality-filter
    family alongside ``gopher_quality`` and ``c4_filters``):

    drop a page when, over its non-blank trimmed lines,
      1. the fraction ending in terminal punctuation (C4's ``. ! ? "``)
         is <= ``punct_num/punct_den``           (``line_punct``, 0.12);
      2. the fraction shorter than ``short_chars`` characters is
         >= ``short_num/short_den``              (``short_lines``, 0.67);
      3. the fraction of line characters carried by duplicated lines
         (the Gopher measure: 1 - chars(each distinct line once)/chars)
         is >= ``dupchar_num/dupchar_den``       (``dup_line_chars``, 0.1).

    ``drop_reason`` is the first failing rule in that order, '' when
    kept; a page with no non-blank lines fails rule 1 by convention
    (0 <= threshold).  Every decision is an INTEGER cross-multiplication
    over exact line counts — no float ratios anywhere near a boundary,
    so the kept set is bit-identical on any engine (the same rational-
    threshold contract as ``aspect_buckets``/``clip_alignment_gate``).
    Pure per-row Catalyst array expressions: zero shuffle, codegen,
    filter-pushdown friendly.
    """
    lines = F.transform(_lines(F.col(text_col)), lambda l: F.trim(l))
    n_lines = F.size(lines).cast("long")
    punct_lines = F.size(F.filter(
        lines, lambda l: F.substring(l, -1, 1).isin(list(FINEWEB_TERMINALS))
    )).cast("long")
    short_lines = F.size(F.filter(
        lines, lambda l: F.length(l) < short_chars)).cast("long")
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, l: acc + F.length(l))
    line_chars = chars(lines)
    dup_chars = line_chars - chars(F.array_distinct(lines))
    out = (
        docs.withColumn("n_lines", n_lines)
        .withColumn("punct_lines", punct_lines)
        .withColumn("short_lines", short_lines)
        .withColumn("line_chars", line_chars)
        .withColumn("dup_line_chars", dup_chars)
    )
    reason = (
        F.when(F.col("punct_lines") * punct_den
               <= F.lit(punct_num) * F.col("n_lines"), F.lit("line_punct"))
        .when(F.col("short_lines") * short_den
              >= F.lit(short_num) * F.col("n_lines"), F.lit("short_lines"))
        .when(F.col("dup_line_chars") * dupchar_den
              >= F.lit(dupchar_num) * F.col("line_chars"),
              F.lit("dup_line_chars"))
        .otherwise(F.lit(""))
    )
    return out.withColumn("drop_reason", reason).withColumn(
        "keep", reason == "")


def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str | None = None,
                  min_hits: int = 1) -> DataFrame:
    """Train/eval decontamination by exact n-gram overlap (the GPT-3 /
    Gopher recipe: flag a training doc that shares ANY word n-gram with a
    benchmark document; Brown et al. 2020 appendix C uses 13-grams, open
    pipelines commonly 8).

    Returns one row per corpus doc: ``(id_col, n_grams, n_contaminated,
    contaminated)`` where n_grams counts the doc's DISTINCT n-grams and
    n_contaminated those that also occur anywhere in the benchmark.

    Scale shape: the benchmark side (eval suites — MBs) collapses to a
    distinct-gram dimension that is explicitly ``broadcast()``, so the
    contamination probe is a map-side semi-join over the corpus explode;
    per-doc grams are distinct'ed before the explode.  Grams are compared
    on lowercase whitespace-normalized word n-grams.
    """
    bt = bench_text_col or text_col

    def grams_of(df, col):
        words = F.filter(F.split(F.lower(F.col(col)), r"\s+"), lambda w: w != "")
        return F.array_distinct(_word_grams(words, n))

    bench_grams = (
        benchmark.select(F.explode(grams_of(benchmark, bt)).alias("gram"))
        .distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col), F.explode(grams_of(corpus, text_col)).alias("gram")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy(id_col).agg(F.count("*").alias("n_contaminated"))
    )
    totals = corpus.select(
        F.col(id_col), F.size(grams_of(corpus, text_col)).cast("long").alias("n_grams")
    )
    return (
        totals.join(hits, id_col, "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)).cast("long"))
        .withColumn("contaminated", F.col("n_contaminated") >= F.lit(min_hits))
    )


DSIR_BUCKETS = 65536  # 4 hex chars of md5 — portable across engines


def _hashed_features(text: Column) -> Column:
    """DSIR hashed n-gram features: lowercased unigrams + bigrams, each
    hashed to one of 65536 buckets via the first 4 hex chars of md5 (the
    same portable-hash idiom as operators/sampling.py — NOT xxhash64,
    which DuckDB cannot reproduce).  NULL text → no features."""
    words = F.filter(F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+"),
                     lambda w: w != "")
    bigrams = F.when(
        F.size(words) < 2, F.array().cast("array<string>")
    ).otherwise(F.transform(
        F.sequence(F.lit(0), F.size(words) - 2),
        lambda i: F.array_join(F.slice(words, i + 1, 2), " "),
    ))
    return F.transform(
        F.concat(words, bigrams), lambda g: F.substring(F.md5(g), 1, 4)
    )


def dsir_weights(raw: DataFrame, target: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", target_text_col: str | None = None,
                 smoothing: float = 1.0) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"): score
    every raw document by how much more likely its hashed n-gram features
    are under the TARGET distribution (a small high-quality corpus) than
    under the RAW distribution.

    Returns ``(id_col, n_feats, llr_micro)`` where llr_micro is the
    per-doc sum of per-bucket log-likelihood ratios in integer MICRO-NATS:
    ``round(1e6 * ln(p_target(b) / p_raw(b)))`` with add-``smoothing``
    estimates over 65536 buckets.  Summing integers keeps the per-doc
    score exact under any partitioning (double sums are order-dependent;
    only the per-BUCKET constant goes through floating point, once).

    Scale shape: feature explode is O(tokens) and is materialized once
    (lazy localCheckpoint) to feed both the bucket histogram and the
    per-doc fold; bucket histograms are partial-aggregating groupBys with
    ≤ 65536-row outputs; grand totals ride along as a broadcast one-row
    dimension (no driver collect anywhere); the LLR dimension is broadcast
    so the per-doc join is map-side.
    """
    tb = target_text_col or text_col
    raw_feats = raw.select(
        F.col(id_col), F.explode(_hashed_features(F.col(text_col))).alias("bucket")
    ).localCheckpoint(eager=False)  # built once, read by histogram + fold
    tgt_counts = (
        target.select(F.explode(_hashed_features(F.col(tb))).alias("bucket"))
        .groupBy("bucket").agg(F.count("*").alias("ct"))
    )
    raw_counts = raw_feats.groupBy("bucket").agg(F.count("*").alias("cr"))
    totals = F.broadcast(
        raw_counts.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("__tr"))
        .crossJoin(tgt_counts.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("__tt")))
    )

    a = float(smoothing)
    ab = a * DSIR_BUCKETS
    llr = (
        raw_counts.join(tgt_counts, "bucket", "full_outer")
        .crossJoin(totals)
        .select(
            "bucket",
            F.round(F.lit(1_000_000.0) * F.log(
                ((F.coalesce("ct", F.lit(0)) + F.lit(a))
                 / (F.col("__tt").cast("double") + F.lit(ab)))
                / ((F.coalesce("cr", F.lit(0)) + F.lit(a))
                   / (F.col("__tr").cast("double") + F.lit(ab)))
            ), 0).cast("long").alias("w"),
        )
    )
    per_doc = (
        raw_feats.join(F.broadcast(llr), "bucket")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_feats"), F.sum("w").alias("llr_micro"))
    )
    return (
        raw.select(id_col).join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("llr_micro", F.lit(0)).cast("long").alias("llr_micro"),
        )
    )


def dsir_feature_stats(raw: DataFrame, target: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       target_text_col: str | None = None) -> DataFrame:
    """Integer sufficient statistics of the DSIR feature pipeline:
    ``(id_col, n_feats, tct_sum, rcr_sum)`` where for each raw document
    ``tct_sum`` / ``rcr_sum`` are the sums over its hashed features of the
    TARGET / RAW bucket counts (missing target buckets count 0).

    This is the exact same dataflow as :func:`dsir_weights` — feature
    extraction, md5 bucketing, both histograms, the broadcast dimension
    join, the per-doc fold — with the single floating-point step (the
    per-bucket ``ln``) removed, so every output value is an integer that
    any engine reproduces bit-exactly.  It exists for the correctness
    gate: round-4 showed that an exact cross-engine hash over
    ``round(1e6*ln(...))``-derived integers is hostage to the two
    runtimes' libm (neither guarantees a correctly-rounded ``ln``), even
    when no value sits near a .5 boundary on the local build.  The LLR
    arithmetic itself stays driver-covered through the ``dsir_resample``
    probe (green in round 4) and numpy-parity pytest.
    """
    tb = target_text_col or text_col
    raw_feats = raw.select(
        F.col(id_col), F.explode(_hashed_features(F.col(text_col))).alias("bucket")
    ).localCheckpoint(eager=False)
    tgt_counts = (
        target.select(F.explode(_hashed_features(F.col(tb))).alias("bucket"))
        .groupBy("bucket").agg(F.count("*").alias("ct"))
    )
    raw_counts = raw_feats.groupBy("bucket").agg(F.count("*").alias("cr"))
    dim = raw_counts.join(tgt_counts, "bucket", "left").select(
        "bucket", F.coalesce("ct", F.lit(0)).cast("long").alias("ct"),
        F.col("cr").cast("long").alias("cr"),
    )
    per_doc = (
        raw_feats.join(F.broadcast(dim), "bucket")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_feats"),
             F.sum("ct").alias("tct_sum"), F.sum("cr").alias("rcr_sum"))
    )
    return (
        raw.select(id_col).join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("tct_sum", F.lit(0)).cast("long").alias("tct_sum"),
            F.coalesce("rcr_sum", F.lit(0)).cast("long").alias("rcr_sum"),
        )
    )


def dedup_lines_within(docs: DataFrame, text_col: str = "text",
                       out_col: str = "text_clean") -> DataFrame:
    """Within-document line dedup (the RefinedWeb intra-doc repetition
    REMOVAL, complementing ``repetition_signals`` which only measures it):
    keep the FIRST occurrence of every trimmed line, drop later repeats,
    re-join with newlines.  Blank lines are dropped.

    Pure per-row Catalyst: a line survives iff its first index in the
    line array is its own index (``array_position`` finds the first
    match on both engines) — zero shuffle, codegen, no corpus state.
    (The trim lambda is explicitly single-arg: ``F.trim`` grew an optional
    second parameter, and transform would otherwise bind it as an
    (element, index) callback.)"""
    lines = F.transform(_lines(F.col(text_col)), lambda l: F.trim(l))
    kept = F.filter(lines, lambda l, i: F.array_position(lines, l) - 1 == i)
    return docs.withColumn(out_col, F.array_join(kept, "\n")).withColumn(
        "n_lines", F.size(lines).cast("long")
    ).withColumn("n_kept", F.size(kept).cast("long"))


def line_dedup(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", min_df: int = 2) -> DataFrame:
    """Cross-corpus line deduplication (the CCNet / RefinedWeb boilerplate
    screen): drop EVERY occurrence of a line whose trimmed form appears in
    >= ``min_df`` positions across the whole corpus (nav bars, cookie
    banners, share buttons).

    Returns ``(id_col, text_clean, n_lines, n_kept)`` with the surviving
    lines re-joined by '\\n' in original order.  Exactly two shuffles at
    any corpus size: (1) hash partition by trimmed line for the corpus-
    wide frequency (a window count — O(occurrences) per line, hot
    boilerplate costs its own cardinality only), (2) by doc id for ordered
    reassembly.  Blank lines are dropped up front; documents with NO
    non-blank lines still emit a row (text_clean='', n_lines=n_kept=0) —
    the aggregate is left-joined back onto the doc-id spine so no doc_id
    ever vanishes from the output (downstream joins keep their keys).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm", F.trim(F.col("line"))).where(F.col("norm") != "")
    w = Window.partitionBy("norm")
    flagged = lines.withColumn("line_df", F.count("*").over(w))
    agg = flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.when(
                    F.col("line_df") < F.lit(min_df),
                    F.struct("pos", "line"),
                ))),
                lambda s: s["line"],
            ), "\n",
        ).alias("text_clean"),
        F.count("*").cast("long").alias("n_lines"),
        F.sum(
            (F.col("line_df") < F.lit(min_df)).cast("long")
        ).alias("n_kept"),
    )
    return docs.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        F.coalesce("n_lines", F.lit(0).cast("long")).alias("n_lines"),
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )

def _lm_tokens(text: Column) -> Column:
    """LM token stream: lowercased whitespace tokens (same normalization as
    the DSIR features so the two selection signals share a vocabulary).
    NULL text → empty stream (guards F.size(NULL) = -1 in n_tokens)."""
    return F.filter(F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+"),
                    lambda w: w != "")


def _lm_bigrams(toks: Column) -> Column:
    """Adjacent-token bigram structs ``(w1, w2)``; < 2 tokens → empty."""
    return F.when(
        F.size(toks) < 2,
        F.array().cast("array<struct<w1:string,w2:string>>"),
    ).otherwise(F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("w1"),
            F.element_at(toks, i + 2).alias("w2"),
        ),
    ))


def ccnet_perplexity(corpus: DataFrame, target: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     target_text_col: str | None = None,
                     smoothing: float = 1.0,
                     sample_fraction: float = 1.0,
                     seed: str = "ccnet") -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    train a smoothed bigram language model on a TARGET corpus (CCNet uses
    a Wikipedia KenLM; any high-quality slice works), score every corpus
    document by its per-bigram negative log-likelihood, and split the
    corpus into head / middle / tail terciles — head being the most
    target-like text, the slice CCNet keeps for training.

    The LM is add-``smoothing`` over the target's bigram table:
    ``p(w2|w1) = (c(w1,w2)+a) / (c1(w1)+a*V)`` where ``c1(w1)`` is the
    number of target bigrams with history ``w1`` and ``V`` = distinct
    target vocabulary + 1 (the OOV type).  Unseen histories degrade to
    the uniform ``1/V``.

    Returns ``(id_col, n_tokens, n_bigrams, nll_micro, nll_per, bucket)``:
    ``nll_micro`` is the per-doc sum of ``round(-1e6 * ln p)`` in integer
    MICRO-NATS (the DSIR idiom — only the per-(c12,c1) constant goes
    through floating point; integer sums are exact under any partitioning),
    ``nll_per = nll_micro DIV n_bigrams`` (integer), and ``bucket`` is
    'head' / 'middle' / 'tail' by the tercile cutoffs of ``nll_per``
    (lower = more target-like).  Docs with < 2 tokens carry
    ``n_bigrams = 0`` and bucket 'tail' (no evidence — CCNet drops them).

    Scale shape: the bigram and history tables are target-corpus-sized
    dimensions (the target is the SMALL side by construction — CCNet's is
    one Wikipedia) and are broadcast, so scoring the 100 TB corpus side is
    two map-side joins + one partial-agg groupBy on the doc id.  Tercile
    cutoffs come from an md5-deterministic Bernoulli sample of the scored
    docs (``sample_fraction``; pick ~1e6/corpus_rows at scale) whose
    single-partition rank window is bounded by the SAMPLE size, never the
    corpus; the two cutoffs ride back as a broadcast one-row dimension.
    Everything downstream of the ln is integer, so buckets are
    reproducible on any engine/partitioning/cluster size.
    """
    tb = target_text_col or text_col
    a = float(smoothing)

    tgt_bi = (
        target.select(F.explode(_lm_bigrams(_lm_tokens(F.col(tb)))).alias("b"))
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    )
    hist = tgt_bi.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = F.broadcast(
        target.select(F.explode(_lm_tokens(F.col(tb))).alias("w"))
        .agg((F.count_distinct("w") + F.lit(1)).cast("double").alias("__v"))
    )

    toks = _lm_tokens(F.col(text_col))
    base = corpus.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        _lm_bigrams(toks).alias("bi"),
    ).localCheckpoint(eager=False)  # bigrams built once: scorer + spine
    pos = base.select(
        id_col, F.explode("bi").alias("b")
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    scored_rows = (
        pos.join(F.broadcast(tgt_bi), ["w1", "w2"], "left")
        .join(F.broadcast(hist), "w1", "left")
        .crossJoin(vocab)
        .select(
            id_col,
            F.round(F.lit(-1_000_000.0) * F.log(
                (F.coalesce("c12", F.lit(0)).cast("double") + F.lit(a))
                / (F.coalesce("c1", F.lit(0)).cast("double")
                   + F.lit(a) * F.col("__v"))
            ), 0).cast("long").alias("nll"),
        )
    )
    per_doc = scored_rows.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"), F.sum("nll").alias("nll_micro")
    )
    scored = (
        base.select(id_col, "n_tokens").join(per_doc, id_col, "left")
        .select(
            id_col, "n_tokens",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("nll_micro", F.lit(0)).cast("long").alias("nll_micro"),
        )
        .withColumn("nll_per", F.when(
            F.col("n_bigrams") > 0,
            F.expr("nll_micro div n_bigrams"),  # exact integer division
        ).otherwise(F.lit(0).cast("long")))
    )

    # Tercile cutoffs over an md5-deterministic sample of scoreable docs.
    # The rank window sorts only the SAMPLE (bounded by sample_fraction);
    # at sf the probe uses fraction 1.0.
    in_sample = F.lit(True) if sample_fraction >= 1.0 else (
        F.substring(F.md5(F.concat_ws("#", F.col(id_col).cast("string"),
                                      F.lit(seed))), 1, 8)
        < F.lit(format(min(int(sample_fraction * 16**8), 16**8 - 1), "08x"))
    )
    samp = scored.where(
        (F.col("n_bigrams") > 0) & in_sample
    ).select("nll_per", F.col(id_col).alias("__tie"))
    rk = Window.orderBy("nll_per", "__tie")
    ranked = samp.select(
        "nll_per", F.row_number().over(rk).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    cuts = F.broadcast(ranked.agg(
        F.max(F.when(F.col("rn") == F.ceil(F.col("n") / 3.0), F.col("nll_per")))
         .alias("__cut1"),
        F.max(F.when(F.col("rn") == F.ceil(F.lit(2.0) * F.col("n") / 3.0),
                     F.col("nll_per"))).alias("__cut2"),
    ))
    return scored.crossJoin(cuts).select(
        id_col, "n_tokens", "n_bigrams", "nll_micro", "nll_per",
        F.when(F.col("n_bigrams") == 0, F.lit("tail"))
         .when(F.col("nll_per") <= F.col("__cut1"), F.lit("head"))
         .when(F.col("nll_per") <= F.col("__cut2"), F.lit("middle"))
         .otherwise(F.lit("tail")).alias("bucket"),
    )


# --------------------------------------------------------------------------
# PII redaction (corpus-release hygiene)
# --------------------------------------------------------------------------

# (kind, pattern, replacement) — applied IN ORDER, each stage counting on
# the previous stage's redacted text so an email's host can never be
# re-counted as an IPv4 (user@1.2.3.4 is one email, zero IPs).  Patterns
# deliberately use only constructs whose semantics are identical in Java
# regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
# repetition, alternation — no lookaround (RE2 has none), no word
# boundaries, no backreferences.  The IPv4 form is the naive C4-style
# scrubber (no 0-255 octet check — '999.999.999.999' redacts, matching
# what corpus scrubbers actually ship); the phone form is E.164-ish plus
# the US dashed/dotted shape.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", r"\+[0-9]{7,15}|[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "<PHONE>"),
]


def pii_redact(docs: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """Detect-and-mask PII spans (emails, IPv4s, phone numbers) — the
    standard pre-release scrub (C4 / BigCode-style: regex detection,
    typed placeholder substitution).

    The reference crawls pages but ships no scrubbing surface
    (crawl4ai/utils.py has no PII pass); a corpus release at 100 TB
    needs one, so this extends the hygiene tier alongside
    ``gopher_quality``/``line_dedup``.

    Adds ``n_email``/``n_ipv4``/``n_phone`` (non-overlapping match counts,
    each counted AFTER the previous kind was masked), ``n_pii`` (their
    sum) and ``out_col`` (the masked text).

    Scale shape: three chained ``regexp_count``/``regexp_replace`` column
    expressions — whole-stage codegen, ZERO shuffle, filter-pushdown
    friendly; 10^10 rows is a scan.  NULL text coalesces to '' (the
    F.size/-1 class of hole flagged in round-4 ADVICE never applies:
    counts on '' are 0 and the redacted text is '').
    """
    outs = {f"n_{k}" for k, _, _ in PII_PATTERNS} | {"n_pii", out_col}
    clash = outs & set(docs.columns)
    if clash:
        raise ValueError(
            f"docs already carries output column(s) {sorted(clash)}; "
            "rename them first (select('*', ...) would emit silent "
            "duplicate names)")
    red = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for kind, pat, token in PII_PATTERNS:
        counts.append(
            F.regexp_count(red, F.lit(pat)).cast("long").alias(f"n_{kind}"))
        red = F.regexp_replace(red, pat, token)
    out = docs.select("*", *counts, red.alias(out_col))
    total = None
    for kind, _, _ in PII_PATTERNS:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("long"))


# --------------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020 §2.2)
# --------------------------------------------------------------------------

# Page-level kill list: C4 drops any page containing a bad word (the
# public "List of Dirty, Naughty ..." list); a deterministic token-level
# stand-in keeps the check portable (C4 matches substrings; we match
# lowercased whitespace tokens — documented divergence, same plan shape).
C4_BAD_TOKENS = ["badword1", "badword2", "badword3"]
C4_MIN_SENTENCES = 3
C4_MIN_LINE_WORDS = 5
_C4_TERMINALS = [".", "!", "?", '"']


def c4_filters(docs: DataFrame, text_col: str = "text",
               out_col: str = "text_clean") -> DataFrame:
    """The C4 cleaning pass (Raffel et al. 2020 §2.2 — the rules behind
    the C4/mC4 corpora), complementing ``gopher_quality`` (Gopher's
    thresholds) and ``line_dedup`` (C4's three-sentence dedup is the
    span-level cousin of ``dedup.remove_dup_spans``):

    line level — keep a line iff it ends in terminal punctuation
    (``. ! ? "``), has >= ``C4_MIN_LINE_WORDS`` words, and does not
    contain the token ``javascript`` (lowercased);
    page level — ``keep`` is false when the cleaned page has fewer than
    ``C4_MIN_SENTENCES`` sentences (counted as ``.!?`` characters in the
    kept text — our deterministic stand-in for C4's sentence splitter),
    or the RAW page contains ``lorem ipsum``, a ``{``, or a bad-list
    token.  ``drop_reason`` reports the first failing rule in that
    order, '' when kept.

    Scale shape: pure per-row Catalyst array/string expressions — zero
    shuffle, whole-stage codegen, filter-pushdown friendly; at 10^10
    rows this is a scan, exactly like ``gopher_quality``.
    """
    raw_lower = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    lines = F.transform(_lines(F.col(text_col)), lambda l: F.trim(l))

    def line_ok(l: Column) -> Column:
        last = F.substring(l, -1, 1)
        words = F.filter(F.split(l, r"\s+"), lambda w: w != "")
        return (
            last.isin(_C4_TERMINALS)
            & (F.size(words) >= C4_MIN_LINE_WORDS)
            & ~F.exists(F.transform(words, F.lower),
                        lambda w: w.contains("javascript"))
        )

    kept = F.filter(lines, line_ok)
    clean = F.array_join(kept, "\n")
    n_sentences = (
        F.length(clean)
        - F.length(F.translate(clean, ".!?", ""))
    ).cast("long")
    toks = F.filter(F.split(raw_lower, r"\s+"), lambda w: w != "")
    has_bad = F.exists(toks, lambda w: w.isin(C4_BAD_TOKENS))
    has_lorem = raw_lower.contains("lorem ipsum")
    has_brace = raw_lower.contains("{")

    out = docs.withColumn(out_col, clean).withColumn(
        "n_lines", F.size(lines).cast("long")
    ).withColumn("n_kept", F.size(kept).cast("long")).withColumn(
        "n_sentences", n_sentences
    )
    reason = (
        F.when(has_lorem, F.lit("lorem_ipsum"))
        .when(has_brace, F.lit("brace"))
        .when(has_bad, F.lit("bad_word"))
        .when(F.col("n_sentences") < C4_MIN_SENTENCES,
              F.lit("too_few_sentences"))
        .otherwise(F.lit(""))
    )
    return out.withColumn("drop_reason", reason).withColumn(
        "keep", reason == "")
