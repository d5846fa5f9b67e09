"""Document deduplication for training-data pipelines at 100 TB.

Four tiers, cheapest-first (the production pipeline runs them in this
order, each shrinking the next one's input):

  1. exact        — hash-groupBy on a normalized fingerprint (one shuffle,
                    map-side combinable);
  2. MinHash+LSH  — shingle → 64 minhashes → band buckets → same-bucket
                    candidate join → exact-Jaccard verify.  The classic
                    Broder construction; only same-band-bucket pairs ever
                    meet in the shuffle, so cost is ~O(docs × bands), not
                    O(docs²);
  3. SimHash      — 64-bit Charikar fingerprint; Hamming-≤k candidates via
                    the pigeonhole band trick (k+1 chunks, equal-chunk
                    blocking);
  4. embedding cosine near-dup — delegated to operators/similarity.py.

All heavy math is numpy inside Arrow batches (no per-row Python);
bucketing/joins/aggregation are native Catalyst shuffles.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawl4ai_spark.dist import widen

_MERSENNE = (1 << 61) - 1


def normalized_text(col):
    """Whitespace-collapsed lowercase text — the exact-dedup key."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per normalized-text group (deterministic).
    One hash shuffle on the fingerprint; partial aggregation map-side."""
    key = F.xxhash64(normalized_text(F.col(text_col))).alias("__fp")
    w = Window.partitionBy("__fp").orderBy(F.col(id_col))
    return (
        df.withColumn("__fp", key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def _hash_params(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def _shingle_hash_col(text_col: str, k: int):
    """JVM-side word-shingle hashing: lowercase split → k-gram concat →
    xxhash64 & 2^63-1 (identical bits to the old pure-Python xxh64 path),
    distinct.  Keeps the whole string/hash hot path in whole-stage codegen;
    Python only ever sees int64 arrays.  NULL text (failed fetches) folds to
    '' so the Arrow stage sees an empty array, never None."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )
    grams = F.when(F.size(toks) < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )
    return F.array_distinct(
        F.transform(grams, lambda g: F.xxhash64(g).bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF)))
    )


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       n_hashes: int = 64, shingle_k: int = 3,
                       seed: int = 42) -> DataFrame:
    """(id, sig array<long>) — shingle hashing in Catalyst (codegen), then
    one numpy (a·h + b) mod p min-reduction per Arrow batch.  The
    reduction is vectorized ACROSS documents (concatenate all shingle
    arrays, one (total_shingles × n_hashes) pass, segment-min via
    ``np.minimum.reduceat``) — no per-row Python loop — and chunked so the
    intermediate stays ≲128 MB regardless of batch size.  Arithmetic is
    bit-identical to the sequential oracle twin (int64 wrap + mod p)."""
    a, b = _hash_params(n_hashes, seed)
    # tile size: keep the (tile × n_hashes) int64 intermediate ~4 MB so it
    # stays cache-resident — large tiles are memory-bound and LOSE to the
    # per-row loop; tiny tiles pay Python overhead per doc
    chunk_shingles = max(1, 524_288 // n_hashes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch[id_col].to_numpy()
            # empty docs get one zero shingle (same padding as the twin)
            arrs = [np.asarray(x, dtype=np.int64) if len(x) else
                    np.zeros(1, dtype=np.int64) for x in batch["sh"]]
            sig_rows: list[np.ndarray] = []
            i = 0
            while i < len(arrs):
                j, tot = i, 0
                while j < len(arrs) and (tot == 0 or tot + len(arrs[j]) <= chunk_shingles):
                    tot += len(arrs[j]); j += 1
                vals = np.concatenate(arrs[i:j])[:, None] * a[None, :]
                vals += b[None, :]
                vals %= _MERSENNE
                lens = np.array([len(x) for x in arrs[i:j]], dtype=np.int64)
                offs = np.zeros(len(lens), dtype=np.int64)
                np.cumsum(lens[:-1], out=offs[1:])
                sig_rows.extend(np.minimum.reduceat(vals, offs, axis=0))
                i = j
            yield pd.DataFrame({id_col: ids, "sig": sig_rows})

    # widen BEFORE the shingle expr: a single-row-group parquet scan gives
    # 1-2 splits and the codegen'd k-gram/xxhash work serializes on them
    hashed = widen(df.select(id_col, text_col)).select(
        F.col(id_col), _shingle_hash_col(text_col, shingle_k).alias("sh")
    )
    return hashed.mapInPandas(run, f"{id_col} long, sig array<long>")


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n_hashes: int = 64, bands: int = 16, shingle_k: int = 3,
                      threshold: float = 0.8, seed: int = 42) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard) whose estimated
    Jaccard (matching minhashes / n_hashes) ≥ threshold, candidates from
    same-(band, band-hash) buckets only."""
    rows_per_band = n_hashes // bands
    # eager localCheckpoint, not persist(): materializes once for the
    # banded self-join AND releases its blocks via ContextCleaner when the
    # plan is GC'd — a plain persist() stays registered in the CacheManager
    # forever (block-manager leak over long pipelines).
    sigs = minhash_signatures(
        df, text_col, id_col, n_hashes, shingle_k, seed
    ).localCheckpoint(eager=True)
    # the ×bands exploded join ships ONLY (id, band, bucket) — never the
    # n_hashes-long signature array (that would multiply shuffle volume by
    # bands); the two compact sig lookups below rejoin it once per side
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.concat_ws(
                        ",", F.transform(
                            F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        )
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        cand.join(sigs.select(F.col(id_col).alias("id_a"),
                              F.col("sig").alias("sig_a")), "id_a")
        .join(sigs.select(F.col(id_col).alias("id_b"),
                          F.col("sig").alias("sig_b")), "id_b")
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
        )
    ).cast("double") / F.lit(float(n_hashes))
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash_col(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash long): Charikar 64-bit fingerprint over word hashes.

    Token hashing runs JVM-side (codegen xxhash64, bit-identical to the
    driver xxh64 — tests/test_hashing.py); Python does only the vectorized
    bit-vote accumulation per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(64, dtype=np.uint64)
        weights = (np.uint64(1) << shifts).astype(np.uint64)
        for batch in batches:
            # vectorized ACROSS docs: concatenate all token-hash arrays,
            # one (total_tokens × 64) bit expansion, segment-sum via
            # np.add.reduceat — identical bit-vote arithmetic, no per-row
            # Python loop
            arrs = [np.asarray(x, dtype=np.int64) for x in batch["th"]]
            lens = np.array([len(x) for x in arrs], dtype=np.int64)
            acc = np.zeros((len(arrs), 64), dtype=np.int64)
            nz = lens > 0
            if nz.any():
                h = np.concatenate([a for a in arrs if len(a)]).view(np.uint64)
                bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
                offs = np.zeros(int(nz.sum()), dtype=np.int64)
                np.cumsum(lens[nz][:-1], out=offs[1:])
                acc[nz] = 2 * np.add.reduceat(bits, offs, axis=0) - lens[nz, None]
            # subset-of-bit-weights sum never wraps uint64; the int64 view
            # IS the old `val - 2^64 if val >= 2^63` two's-complement fold
            vals = ((acc > 0) * weights).sum(axis=1, dtype=np.uint64).view(np.int64)
            yield pd.DataFrame({id_col: batch[id_col].to_numpy(),
                                "simhash": vals})

    # NULL text → '' → empty token array (simhash 0), matching the
    # pre-vectorization `(text or '')` behavior on failed fetches.
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda t: t != "",
        )
    )
    hashed = widen(df.select(id_col, text_col)).select(
        F.col(id_col), F.transform(toks, lambda t: F.xxhash64(t)).alias("th")
    )
    return hashed.mapInPandas(run, f"{id_col} long, simhash long")


def hamming_pairs(df: DataFrame, hash_col: str, id_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """EXACT pairs with Hamming(hash) ≤ max_hamming over any int64 hash
    column. Pigeonhole blocking: split 64 bits into (max_hamming+1)
    chunks — a qualifying pair has fewer differing bits than chunks, so it
    shares ≥1 exact chunk and every true pair survives the equal-chunk
    candidate join (bits above n_chunks·chunk_bits stay uncovered, which
    only widens the candidate set; the final `bit_count(xor)` gate is
    exact over all 64 bits).

    Scale: candidates ≈ rows² · (k+1) / 2^(64//(k+1)) for uniform hashes —
    k=3 → /16384, k=4 → /819.  Near-dup corpora cluster far below that.
    All joins/gates are native Catalyst (codegen `bit_count`); nothing
    leaves the JVM.  Candidate dedup is the CANONICAL-CHUNK rule — a pair
    is emitted only from its first agreeing chunk (for every earlier chunk
    the two hashes must differ), a pure-codegen predicate on (h_a, h_b) —
    so the candidate stream never pays a dropDuplicates shuffle: the only
    exchange in the whole operator is the equality join itself."""
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    mask = (1 << chunk_bits) - 1

    def chunk_of(col, i: int):
        return F.shiftrightunsigned(col, i * chunk_bits).bitwiseAND(F.lit(mask))

    chunks = df.select(
        F.col(id_col), F.col(hash_col).alias("__h"),
        F.posexplode(
            F.array(*[chunk_of(F.col(hash_col), i) for i in range(n_chunks)])
        ).alias("chunk_idx", "chunk_val"),
    )
    left = chunks.select(F.col(id_col).alias("id_a"), F.col("__h").alias("h_a"),
                         "chunk_idx", "chunk_val")
    right = chunks.select(F.col(id_col).alias("id_b"), F.col("__h").alias("h_b"),
                          "chunk_idx", "chunk_val")
    first_agreeing = None
    for j in range(n_chunks - 1):
        disagree_before_j = (F.col("chunk_idx") <= j) | (
            chunk_of(F.col("h_a"), j) != chunk_of(F.col("h_b"), j))
        first_agreeing = (disagree_before_j if first_agreeing is None
                          else first_agreeing & disagree_before_j)
    cand = (
        left.join(right, ["chunk_idx", "chunk_val"])
        .filter((F.col("id_a") < F.col("id_b")) & first_agreeing)
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming (pigeonhole
    blocking via :func:`hamming_pairs`)."""
    return hamming_pairs(simhash_col(df, text_col, id_col), "simhash",
                         id_col, max_hamming)


def phash_pairs(images: DataFrame, max_hamming: int = 4,
                id_col: str = "image_id", hash_col: str = "phash") -> DataFrame:
    """Near-duplicate IMAGES by perceptual-hash Hamming distance.

    The payload table (BASELINE.json input_hint) carries a 64-bit
    ``phash`` per image precisely so web-scale image dedup never has to
    touch pixel bytes: re-served / re-encoded / lightly-edited copies of
    the same picture land within a few bits of each other while unrelated
    images sit near Hamming 32.  Same pigeonhole construction as SimHash
    (reference analog: crawl4ai keys images by content URL only —
    content_scraping_strategy.py:217-241 — so this is the added
    training-pipeline tier, not a port).  Zero Python: the blocking join
    and the `bit_count` gate are whole-stage-codegen Catalyst."""
    return hamming_pairs(images.select(id_col, hash_col), hash_col,
                         id_col, max_hamming)


def caption_fp_col(caption_col):
    """Fingerprint of the NORMALIZED caption (lowercase, whitespace
    collapsed) — byte-exact copies and case/whitespace reformats of the
    same alt text share one fingerprint."""
    return F.md5(normalized_text(caption_col))


def caption_dedup(images: DataFrame, caption_col: str = "caption",
                  id_col: str = "image_id",
                  phash_col: str = "phash") -> DataFrame:
    """Exact image-caption dedup over the payload table (BASELINE.json
    input_hint shape): group by normalized-caption fingerprint, keep the
    lowest image_id, report group size and how many DISTINCT perceptual
    hashes share the caption (>1 ⇒ same alt text on visually different
    images — the classic alt-text-boilerplate signal in image-caption
    training sets).  One hash shuffle on the fingerprint with map-side
    partial aggregation; no skew expected (captions are near-unique), and
    a pathological single-caption corpus degrades to one hot key, not a
    cross join."""
    return (
        images.groupBy(caption_fp_col(F.col(caption_col)).alias("caption_fp"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct(phash_col).cast("long").alias("n_phash"),
        )
    )


def image_joint_neardup(images: DataFrame, max_hamming: int = 4,
                        id_col: str = "image_id",
                        hash_col: str = "phash",
                        caption_col: str = "caption") -> DataFrame:
    """Joint image+caption near-dup: pairs whose phash Hamming distance is
    ≤ max_hamming AND whose normalized captions are byte-equal — the
    high-precision "same picture re-served with its alt text" tier a
    web-scale image-caption pipeline drops first.  Candidate generation is
    the pigeonhole blocking join (never all-pairs); the caption gate is two
    hash joins against a tiny (id, fingerprint) projection."""
    pairs = phash_pairs(images, max_hamming, id_col=id_col, hash_col=hash_col)
    fp = images.select(
        F.col(id_col), caption_fp_col(F.col(caption_col)).alias("__cfp"))
    return (
        pairs
        .join(fp.withColumnRenamed(id_col, "id_a")
                .withColumnRenamed("__cfp", "__cfp_a"), "id_a")
        .join(fp.withColumnRenamed(id_col, "id_b")
                .withColumnRenamed("__cfp", "__cfp_b"), "id_b")
        .filter(F.col("__cfp_a") == F.col("__cfp_b"))
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.8,
                        max_shingle_df: int | None = None) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via an inverted-index join:
    explode distinct shingles, join on shingle, count intersections, then
    |A∩B| / (|A|+|B|−|A∩B|).

    ``max_shingle_df`` is the hot-shingle skew guard for 100 TB corpora: a
    shingle appearing in more than this many documents contributes O(df²)
    join pairs (one boilerplate phrase shared by 10^6 docs → 10^12 pairs in
    one task).  When set, postings for such shingles are dropped before the
    join (the hot set is tiny → broadcast anti-join), bounding every
    shingle's contribution to ≤ max_shingle_df² pairs.  Denominators keep
    the FULL gram counts, so reported jaccard becomes a LOWER BOUND and
    pairs similar only through dropped boilerplate are skipped — exactly
    the standard inverted-index prune.  None (default) = exact."""
    toks = F.filter(F.split(normalized_text(F.col(text_col)), " "), lambda t: t != "")
    # empty/NULL text yields zero grams (an '' gram would spuriously pair
    # every empty doc with every other empty doc)
    grams = F.filter(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
        lambda g: g != "",
    )
    g = widen(df.select(id_col, text_col)).select(
        F.col(id_col), grams.alias("grams")
    ).withColumn("n_grams", F.size("grams"))
    posting = g.select(id_col, "n_grams", F.explode("grams").alias("gram"))
    if max_shingle_df is not None:
        hot = (
            posting.groupBy("gram")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("gram")
        )
        posting = posting.join(F.broadcast(hot), "gram", "left_anti")
    left = posting.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na"), "gram")
    right = posting.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb"), "gram")
    inter = (
        left.join(right, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("both"))
    )
    jac = F.col("both").cast("double") / (F.col("na") + F.col("nb") - F.col("both"))
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dup_ngram_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    n: int = 8, min_df: int = 2) -> DataFrame:
    """Per-document duplicated-substring signal (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" exact-
    substring criterion, at n-gram granularity): for every document,
    how many of its distinct token n-grams also appear in at least
    ``min_df - 1`` OTHER documents (document frequency >= min_df), and the
    duplicated fraction.  Pipelines drop or trim documents whose
    ``dup_frac`` exceeds a policy threshold.

    Returns (id, n_grams, n_dup, dup_frac); documents with fewer than
    ``n`` tokens carry n_grams = 0 and dup_frac = 0.

    Scale shape: grams are hashed to int64 (xxhash64) the moment they are
    built, so every downstream exchange moves 8-byte keys instead of
    ~50-byte strings; per-gram document frequency is ONE partial-
    aggregating groupBy (map-side combine makes hot boilerplate grams
    cheap — counting is O(df), not the O(df²) a pair join pays); postings
    then join only against the grams that ARE duplicated (df >= min_df) —
    in a real corpus that set is a small fraction, so AQE broadcasts it
    and the join never shuffles the posting list a second time; a
    pathological all-duplicate corpus degrades to a sort-merge join, not
    to a blowup.  n_grams per doc comes from the local array size — no
    shuffle.  (Hash collisions can overcount n_dup with probability
    ≈ postings²/2⁶⁴ — negligible at any real scale.)"""
    toks = F.filter(F.split(normalized_text(F.col(text_col)), " "), lambda t: t != "")
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = widen(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.transform(grams, lambda s: F.xxhash64(s)).alias("grams"),
    ).localCheckpoint(eager=False)  # grams built once, read by both jobs
    posting = g.select("id", F.explode("grams").alias("gram"))
    dup_grams = (
        posting.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("gram")
    )
    n_dup = (
        posting.join(dup_grams, "gram")
        .groupBy("id")
        .agg(F.count("*").alias("n_dup"))
    )
    return (
        g.select("id", F.size("grams").cast("long").alias("n_grams"))
        .join(n_dup, "id", "left")
        .select(
            "id",
            "n_grams",
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.when(
                F.col("n_grams") > 0,
                F.coalesce("n_dup", F.lit(0)).cast("double") / F.col("n_grams"),
            ).otherwise(F.lit(0.0)).alias("dup_frac"),
        )
    )


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iters: int = 50) -> DataFrame:
    """(id, component) for every id in ``pairs``; component = the minimum
    id in the connected component (hash-min label propagation).

    This is the pairs→clusters step every near-dup dedup pipeline needs:
    pair emitters (phash_pairs / simhash_pairs / minhash_lsh_pairs /
    embedding_neardup_pairs) produce EDGES, but "keep one copy" requires
    transitive closure — a∼b, b∼c must collapse a,b,c into one group even
    when a∼c was never emitted.

    Per iteration each node takes the min label over itself and its
    neighbors (two shuffles: edge join + groupBy-min), with an eager
    localCheckpoint to keep lineage flat and a changed-count early exit.
    Convergence is O(graph diameter) rounds — near-dup components are
    star-ish (copies cluster around an original), so real corpora
    converge in 2-4 rounds regardless of corpus size; the per-round cost
    is two hash shuffles of the EDGE set, never anything quadratic.  For
    adversarially chain-shaped graphs swap in the two-phase
    large-star/small-star variant (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14) — same join primitives, O(log n)
    rounds; not needed for dedup-shaped graphs.

    No reference analog (crawl4ai dedups by exact URL/content key only);
    added for the training-data pipeline tier.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"),
                        F.coalesce("nbr_comp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.withColumnRenamed("comp", "comp_new")
            .join(labels.withColumnRenamed("comp", "comp_old"), "id")
            .where(F.col("comp_new") != F.col("comp_old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_clusters(df: DataFrame, pairs: DataFrame, id_col: str,
                   id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Full-corpus cluster assignment: every row of ``df`` gets
    (id, component, canonical) — rows in no pair are their own singleton
    component; ``canonical`` marks the one row per component to keep
    (the minimum id).  One broadcast-or-hash join over the label table
    (labels ≈ #ids-in-pairs ≪ corpus)."""
    labels = connected_components(pairs, id_a, id_b)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("comp", F.col("id")).alias("component"),
            (F.coalesce("comp", F.col("id")) == F.col("id")).alias("canonical"),
        )
    )


def remove_dup_spans(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 8,
                     min_count: int = 2) -> DataFrame:
    """Duplicated-span REMOVAL (the acting half of the Lee et al. 2022
    exact-substring criterion whose measuring half is ``dup_ngram_stats``):
    delete every token covered by a token n-gram that occurs >= ``min_count``
    times across the whole corpus (within-doc repeats count — the paper
    removes ALL copies of a duplicated substring, not all-but-one).

    Operates in normalized token space (lowercased, whitespace-collapsed —
    the same stream the measuring op and exact dedup key on; Lee et al.
    likewise dedup the tokenized stream, not raw bytes).  Returns
    ``(id_col, text_clean, n_tokens, n_removed)`` where text_clean is the
    surviving tokens re-joined with single spaces, in original order.

    Scale shape: gram occurrences are counted with ONE partial-aggregating
    groupBy over 128-bit hashed grams (a struct of two independent
    xxhash64 draws — 16-byte exchange keys; at ~10^11 grams for a 100 TB
    corpus a single 64-bit key would already expect birthday collisions,
    which for this ACTING op would excise never-duplicated tokens and
    violate the Lee et al. exact-substring contract; 128 bits pushes the
    expected first collision past ~2^64 grams.  The measuring twin
    ``dup_ngram_stats`` keeps 64-bit keys deliberately — a collision there
    only perturbs one count.  Counting is O(occurrences), no pair join);
    the duplicated-gram set joins back to
    the posting list (AQE broadcasts it when small), duplicate START
    positions fold to a sorted per-doc array, and coverage is resolved
    per row: starts merge into disjoint intervals with one linear
    ``aggregate`` pass, then each token index tests membership against the
    MERGED intervals — O(L × intervals) per row with intervals ≤ L/n
    after merging, so a fully-boilerplate doc costs O(L²/n), not O(L²).
    Docs with no duplicated grams skip the join entirely (left join +
    coalesce keeps the doc-id spine intact).  NULL text is coalesced to ''
    up front (otherwise F.size(NULL) = -1 would emit n_tokens=-1)."""
    toks = F.filter(
        F.split(normalized_text(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda t: t != "")
    g = widen(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
    ).localCheckpoint(eager=False)  # tokens built once: posting + rebuild
    gram_strs = F.transform(
        F.sequence(F.lit(0), F.size("toks") - n),
        lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, n)),
    )
    posting = g.select(
        "id",
        F.posexplode(F.when(
            F.size("toks") >= n,
            F.transform(gram_strs, lambda s: F.struct(
                F.xxhash64(s).alias("h1"),
                F.xxhash64(s, F.lit(1)).alias("h2"),
            )),
        ).otherwise(
            F.array().cast("array<struct<h1:bigint,h2:bigint>>")
        )).alias("pos", "gram"),
    )
    dup_grams = (
        posting.groupBy("gram").agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_count).select("gram")
    )
    dup_starts = (
        posting.join(dup_grams, "gram")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("pos")).alias("starts"))
    )
    iv = F.aggregate(
        F.col("starts"),
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (s <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1)["s"].alias("s"),
                    F.greatest(F.element_at(acc, -1)["e"],
                               s + F.lit(n)).cast("int").alias("e"),
                )),
            ),
        ).otherwise(F.concat(acc, F.array(F.struct(
            s.cast("int").alias("s"), (s + F.lit(n)).cast("int").alias("e"),
        )))),
    )
    joined = g.join(dup_starts, "id", "left").select(
        "id", "toks",
        F.coalesce(iv, F.array().cast("array<struct<s:int,e:int>>"))
         .alias("iv"),
    )
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.exists(
            F.col("iv"), lambda m: (m["s"] <= i) & (i < m["e"])
        ),
    )
    return joined.select(
        F.col("id").alias(id_col),
        F.array_join(kept, " ").alias("text_clean"),
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# Incremental dedup: a new crawl batch against the released-corpus store
# ---------------------------------------------------------------------------

def incremental_dedup(batch: DataFrame, store: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      store_fp_col: str = "fp",
                      store_id_col: str = "keep_id") -> DataFrame:
    """Deduplicate a NEW batch against the fingerprint store of everything
    already released — the production daily-increment pattern: a 100 TB
    corpus is never re-shuffled when a day's crawl lands; only the batch
    is fingerprinted and probed against the persisted store
    (``exact_dedup`` is the full-corpus bootstrap; this is every run
    after it).

    ``store`` is ``(store_fp_col, store_id_col)`` — one row per released
    fingerprint with its canonical doc id (what
    ``updated_fingerprint_store`` persists).  Returns every batch row
    plus ``fp`` (xxhash64 of the normalized text — same key as
    ``exact_dedup``), ``status`` ('new' | 'dup_in_batch' |
    'dup_in_store'; the store wins over a batch twin — the canonical is
    already released), ``keep`` (status == 'new') and ``dup_of`` (the
    canonical id, -1 for kept rows).

    Scale shape: fingerprinting is codegen; the within-batch winner
    window shuffles ONLY the batch on fp; the store probe is one hash
    join on fp — keep the store bucketed by fp so the probe co-locates
    and only the (small) batch moves.  The store never rewrites: the
    update is an append of the kept rows' fingerprints.
    """
    b = batch.withColumn(
        "fp", F.xxhash64(normalized_text(F.col(text_col))))
    wfp = Window.partitionBy("fp")
    b = (b.withColumn("__rn", F.row_number().over(wfp.orderBy(id_col)))
          .withColumn("__win", F.min(id_col).over(wfp)))
    s = store.select(F.col(store_fp_col).alias("fp"),
                     F.col(store_id_col).alias("__store_id"))
    j = b.join(s, "fp", "left")
    status = (
        F.when(F.col("__store_id").isNotNull(), F.lit("dup_in_store"))
        .when(F.col("__rn") > 1, F.lit("dup_in_batch"))
        .otherwise(F.lit("new"))
    )
    # dup_of keeps the id column's own type (a hard cast("long") would
    # NULL string doc ids and silently drop the dedup lineage); kept
    # rows carry the -1 sentinel cast into that type ('-1' for strings)
    id_type = batch.schema[id_col].dataType.simpleString()
    dup_of = (
        # the sentinel is cast BEFORE the when-chain: a bare int -1
        # would make Spark coerce the string branches to BIGINT (ANSI
        # cast error on non-numeric ids), not the other way round
        F.when(F.col("__store_id").isNotNull(), F.col("__store_id"))
        .when(F.col("__rn") > 1, F.col("__win"))
        .otherwise(F.lit(-1).cast(id_type))
    ).cast(id_type)
    return (j.withColumn("status", status)
             .withColumn("keep", F.col("status") == "new")
             .withColumn("dup_of", dup_of)
             .drop("__rn", "__win", "__store_id"))


def fingerprint_store(corpus: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Bootstrap the ``(fp, keep_id)`` store from a released corpus: the
    lowest id per fingerprint — exactly the rows ``exact_dedup`` keeps.
    One partial-agg groupBy on fp."""
    return (
        corpus.select(
            F.xxhash64(normalized_text(F.col(text_col))).alias("fp"),
            F.col(id_col).alias(id_col))  # id keeps its own type
        .groupBy("fp").agg(F.min(id_col).alias("keep_id"))
    )


def updated_fingerprint_store(store: DataFrame,
                              classified: DataFrame,
                              id_col: str = "doc_id") -> DataFrame:
    """The store after a classified batch lands: append the kept rows'
    fingerprints (an APPEND, never a rewrite — at 10^10 fingerprints the
    store is an Iceberg/parquet table that only ever grows)."""
    add = (classified.filter(F.col("keep"))
           .select("fp", F.col(id_col).cast("long").alias("keep_id")))
    return store.select("fp", "keep_id").unionByName(add)
