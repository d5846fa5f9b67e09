"""Benchmark harness (driver contract + BASELINE.json north_rule metric).

Runs the headline operator pipelines at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The two north-rule throughput numbers (frontier URLs scheduled+deduped/sec,
image-pages fetched+decoded/sec) ride along under ``"throughput"``; the
N→4N scaling evidence is produced by tools/scaling_bench.py which re-runs
``frontier_schedule``/``fetch_decode`` at two ``local[N]`` parallelism
levels (BASELINE.md).

Synthetic inputs are materialized to parquet once per (sf, size) under
/tmp/spark_graft_bench and reused; generation time is excluded from the
timed queries (the timed pipelines read parquet like production would read
Iceberg).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from crawl4ai_spark.functions.canonical import canonical_col, url_hash_col
from crawl4ai_spark.functions.images import decode_stage
from crawl4ai_spark.functions.scorers import freshness_score
from crawl4ai_spark.functions.urlparts import host_of
from crawl4ai_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    phash_pairs,
)
from crawl4ai_spark.operators.politeness import with_salted_host_slots
from crawl4ai_spark.operators.similarity import brute_force_topk
from crawl4ai_spark.session import get_spark
from crawl4ai_spark.sources import synth

BENCH_CACHE = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")

# Pipeline input sizes as a function of sf (sf0.1 → 200k-page graph,
# ~1.6M raw links, 20k image payloads).
LINK_PAGES_PER_SF = 2_000_000
IMAGE_ROWS_PER_SF = 200_000


def bench_spark(app_name: str = "bench"):
    """Bench session: file-split sizing so scan parallelism tracks cores.

    The synthetic inputs are a few hundred MB in ~128 small files; default
    maxPartitionBytes (128 MB) + openCostInBytes (4 MB) would pack them
    into a handful of splits and cap every Arrow stage at that width. At
    100 TB the same knob sizes scan tasks to executor memory."""
    return get_spark(
        app_name=app_name,
        extra_conf={
            # fine splits: ≥4 task waves per stage at local[32], so the last
            # wave's stragglers cost ≤1/4 of a wave, not half the stage
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
        },
    )


def _sf_of(sf_dir: str) -> float:
    tail = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return 0.1


def _ensure_graph(spark, n_pages: int, with_images: bool):
    """Materialize the synthetic link graph (and image payloads) once."""
    p = synth.GraphParams(n_pages=n_pages, n_domains=max(16, n_pages // 5000),
                          hot_fraction=0.3, seed=42)
    gdir = (f"{BENCH_CACHE}/graph_r{synth.FIXTURE_REV}_n{n_pages}"
            + ("_img" if with_images else ""))
    marker = f"{gdir}/_done"
    if not os.path.exists(marker):
        # 128 output files: with the bench session's file-split sizing the
        # scan width tracks the core count at every parallelism level.
        pages, links, images = synth.synth_tables(spark, p)
        links.repartition(128).write.mode("overwrite").parquet(f"{gdir}/links.parquet")
        pages.select("url", "success", "status_code", "image_id").repartition(
            64
        ).write.mode("overwrite").parquet(f"{gdir}/pages.parquet")
        if with_images:
            images.repartition(128).write.mode("overwrite").parquet(
                f"{gdir}/images.parquet"
            )
        with open(marker, "w") as fh:
            fh.write("ok")
    return p, gdir


def frontier_schedule(spark, n_pages: int) -> tuple[float, int]:
    """ONE frontier superstep at scale: raw discovered links → canonicalize
    (Arrow UDF) → xxhash64 key → URL-seen anti-join (half the universe
    pre-seen) → per-host dedup+politeness ranking → scored priority order.

    Returns (seconds, scheduled_rows). This is the north-rule
    'frontier URLs scheduled+deduped/sec' numerator/denominator."""
    p, gdir = _ensure_graph(spark, n_pages, with_images=False)
    links = spark.read.parquet(f"{gdir}/links.parquet")
    n_links = links.count()
    # seen = every even page (half the universe), keyed by xxhash64(url)
    seen = (
        spark.read.parquet(f"{gdir}/pages.parquet")
        .withColumn("pid", F.regexp_extract("url", r"p(\d{8})", 1).cast("long"))
        .filter(F.col("pid") % 2 == 0)
        .select(url_hash_col(F.col("url")).alias("url_hash"))
    )
    politeness = spark.createDataFrame(synth.gen_politeness(p))
    # D7 hot-host list: in the engine this comes from the PREVIOUS
    # superstep's per-host metrics (politeness.makespan_metrics), so it is
    # an input to the schedule step, not part of its work — computed here
    # outside the timer from the raw link hosts.
    host_counts = (
        links.groupBy(F.lower(host_of(F.col("href"))).alias("h")).count().collect()
    )
    mean = sum(r["count"] for r in host_counts) / max(len(host_counts), 1)
    hot = [r["h"] for r in host_counts if r["count"] > 4 * mean and r["h"]]

    t0 = time.time()
    cand = links.select(
        canonical_col(F.col("href"), F.col("src_url")).alias("url"), "pos"
    )
    cand = cand.withColumn("url_hash", url_hash_col(F.col("url"))).withColumn(
        "host", F.lower(host_of(F.col("url")))
    )
    # dedup within the batch (min pos wins) + anti-join the seen table
    cand = cand.groupBy("url_hash").agg(
        F.first("url").alias("url"), F.first("host").alias("host"),
        F.min("pos").alias("pos"),
    )
    fresh = cand.join(seen, "url_hash", "left_anti")
    fresh = fresh.withColumn(
        "score", freshness_score(F.col("url"), current_year=2024)
    )
    scheduled = with_salted_host_slots(
        fresh, politeness, order_cols=[F.col("score").desc(), "url_hash"],
        hot_hosts=hot, salt_buckets=32,
    )
    n_out = scheduled.count()
    assert n_out > 0
    return time.time() - t0, n_links


def frontier_schedule_bloom(spark, n_pages: int) -> dict:
    """The same frontier superstep with the engine's Bloom URL-seen sidecar
    in the anti-join hot path (north_rule mandate): candidates flagged
    definitely-new by a same-bucket cogroup probe BYPASS the seen-table
    join; only the maybe-seen slice (true dups + ~fp) pays it.  The sidecar
    is built incrementally across supersteps in the engine, so its build
    (like the politeness table and hot-host list) is an input here, outside
    the timer.  Reports the probe-side reduction — the quantity that
    matters at 10^10 seen URLs, where the seen side, not the candidates,
    dominates the join."""
    from crawl4ai_spark.operators.seen import BloomSidecar

    p, gdir = _ensure_graph(spark, n_pages, with_images=False)
    links = spark.read.parquet(f"{gdir}/links.parquet")
    n_links = links.count()
    seen_urls = (
        spark.read.parquet(f"{gdir}/pages.parquet")
        .withColumn("pid", F.regexp_extract("url", r"p(\d{8})", 1).cast("long"))
        .filter(F.col("pid") % 2 == 0)
        .select("url")
    )
    n_seen = seen_urls.count()
    bloom = BloomSidecar(spark, capacity=max(n_seen, 1024), fp_rate=0.01,
                         n_buckets=64)
    bloom.add(seen_urls)
    seen = seen_urls.select(url_hash_col(F.col("url")).alias("url_hash"))

    t0 = time.time()
    cand = links.select(
        canonical_col(F.col("href"), F.col("src_url")).alias("url"), "pos"
    )
    cand = cand.groupBy("url").agg(F.min("pos").alias("pos"))
    flagged = bloom.prefilter(cand, "url")
    flagged = flagged.withColumn("url_hash", url_hash_col(F.col("url")))
    fresh = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspect = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = suspect.join(seen, "url_hash", "left_anti")
    out = fresh.unionByName(checked)
    agg = flagged.agg(
        F.count("*").alias("cand"),
        F.sum(F.col("maybe_seen").cast("long")).alias("suspect"),
    ).collect()[0]
    n_out = out.count()
    secs = time.time() - t0
    return {
        "sec": round(secs, 3),
        "input_links": n_links,
        "candidates": int(agg["cand"]),
        "suspect_rows": int(agg["suspect"]),
        "bypass_fraction": round(1 - agg["suspect"] / max(agg["cand"], 1), 4),
        "scheduled": n_out,
    }


def cuckoo_seen_bench(spark, n_urls: int = 200_000,
                      evict_frac: float = 0.25) -> dict:
    """The cuckoo sidecar's full lifecycle at a scale batch: add n_urls,
    delete evict_frac of them (the recrawl-TTL scenario Bloom cannot
    express), probe everything.  Separate timers per phase — the insert
    fold is per-key Python inside each shard's Arrow batch (eviction
    chains are inherently sequential), so its cost per URL is THE number
    that decides bloom-vs-cuckoo for pure-add crawls."""
    from crawl4ai_spark.operators.seen import CuckooSidecar

    urls = spark.range(n_urls).select(
        F.concat(F.lit("https://ck.test/p"), F.col("id")).alias("url"),
        F.col("id"))
    urls = urls.localCheckpoint(eager=True)
    ck = CuckooSidecar(spark, capacity=int(n_urls * 1.25), n_shards=64)

    t0 = time.time()
    ck.add(urls.select("url"))
    ck.state.count()  # materialize the fold
    add_s = time.time() - t0

    t0 = time.time()
    ck.delete(urls.where(F.col("id") < int(n_urls * evict_frac))
              .select("url"))
    ck.state.count()
    del_s = time.time() - t0

    t0 = time.time()
    flagged = ck.prefilter(urls.select("url"), "url", num_partitions=64)
    n_seen = flagged.agg(
        F.sum(F.col("maybe_seen").cast("long"))).collect()[0][0]
    probe_s = time.time() - t0
    return {
        "sec": round(add_s + del_s + probe_s, 3),
        "urls": n_urls,
        "add_sec": round(add_s, 3),
        "delete_sec": round(del_s, 3),
        "probe_sec": round(probe_s, 3),
        "add_urls_per_sec": round(n_urls / max(add_s, 1e-9), 1),
        "still_seen": int(n_seen),
    }


def _ensure_crawl_graph(spark, n_pages: int):
    """Materialize (once per n_pages) the synthetic crawl graph both
    engine-loop benches read; returns (params, pages, links)."""
    p = synth.GraphParams(n_pages=n_pages, n_domains=max(16, n_pages // 5000),
                          hot_fraction=0.3, seed=42)
    gdir = f"{BENCH_CACHE}/crawl_r{synth.FIXTURE_REV}_n{n_pages}"
    marker = f"{gdir}/_done"
    if not os.path.exists(marker):
        pages, links, _ = synth.synth_tables(spark, p)
        pages.select("url", "success", "status_code", "image_id").repartition(
            32
        ).write.mode("overwrite").parquet(f"{gdir}/pages.parquet")
        links.repartition(32).write.mode("overwrite").parquet(f"{gdir}/links.parquet")
        with open(marker, "w") as fh:
            fh.write("ok")
    return (p, spark.read.parquet(f"{gdir}/pages.parquet"),
            spark.read.parquet(f"{gdir}/links.parquet"))


def crawl_e2e(spark, n_pages: int = 50_000, n_seeds: int = 500) -> dict:
    """Integrated engine-loop throughput: a multi-seed BFS deep crawl with
    the full schedule wired in (bloom URL-seen, canonicalize, robots off,
    capacity windows, snapshot-free) over a ``n_pages``-page graph.
    Reports end-to-end pages/s and the per-superstep wall times from
    CrawlRun.metrics — the integration number the stage benches can't show.
    For context, the reference's asyncio crawler is politeness-bound at
    1-3 s/domain (async_dispatcher.py:33): tens of pages/s single-node."""
    from crawl4ai_spark.plans.frontier import CrawlConfig, deep_crawl

    p, pages, links = _ensure_crawl_graph(spark, n_pages)
    seeds = [synth.url_of(i, p) for i in range(0, n_pages, n_pages // n_seeds)]
    cfg = CrawlConfig(strategy="bfs", max_depth=2)
    t0 = time.time()
    run = deep_crawl(spark, seeds, pages, links, cfg)
    n_results = run.results.count()
    secs = time.time() - t0
    steps = [m for m in run.metrics if m.get("wall_ms")]
    steady = max(
        (m["successes"] / (m["wall_ms"] / 1000.0) for m in steps), default=0.0
    )
    return {
        "sec": round(secs, 3),
        "seeds": len(seeds),
        "pages_crawled": run.pages_crawled,
        "results": n_results,
        "pages_per_sec": round(run.pages_crawled / secs, 1),
        # biggest superstep's fetch rate — the number that scales with
        # batch size; the ~15-20 s fixed cost per superstep (sequential
        # Spark jobs + python-stage round trips) amortizes at production
        # batches of 10^6+ rows
        "steady_state_pages_per_sec": round(steady, 1),
        "superstep_ms": [m["wall_ms"] for m in steps],
    }


def fetch_decode(spark, n_images: int) -> tuple[float, int]:
    """Payload stage at scale: read the image+caption table, decode every
    payload in Arrow batches, verify PSNR/pixel invariants, emit channel
    stats. Returns (seconds, images)."""
    _, gdir = _ensure_graph(spark, n_images, with_images=True)
    images = spark.read.parquet(f"{gdir}/images.parquet")
    decoded = decode_stage(images, seed=42, check_truth=True)
    bad_expr = F.sum(
        F.when(F.col("pixel_exact") | (F.col("psnr") >= 40.0), 0).otherwise(1)
    ).alias("bad")
    t0 = time.time()
    row = decoded.agg(F.count("*").alias("n"), bad_expr).collect()[0]
    secs = time.time() - t0
    assert row["bad"] == 0, f"{row['bad']} payloads violated the PSNR/pixel invariant"
    return secs, row["n"]


def bf_batch(spark, n_pages: int = 50_000, n_seeds: int = 500,
             batch_size: int = 100_000) -> dict:
    """Best-first loop at a SCALE batch (VERDICT r2 #7): batch_size=10^5
    pops per superstep — the regime the distributed TakeOrdered pop,
    cumulative-capacity cumsum and anti-join queue subtraction are built
    for (parity mode runs batch_size=10)."""
    from crawl4ai_spark.plans.frontier import CrawlConfig, deep_crawl

    p, pages, links = _ensure_crawl_graph(spark, n_pages)
    seeds = [synth.url_of(i, p) for i in range(0, n_pages, n_pages // n_seeds)]
    cfg = CrawlConfig(strategy="best_first", max_depth=2,
                      batch_size=batch_size)
    t0 = time.time()
    run = deep_crawl(spark, seeds, pages, links, cfg)
    n_results = run.results.count()
    secs = time.time() - t0
    return {
        "sec": round(secs, 3),
        "batch_size": batch_size,
        "results": n_results,
        "pages_crawled": run.pages_crawled,
        "pages_per_sec": round(run.pages_crawled / secs, 1),
        "supersteps": len([m for m in run.metrics if m.get("wall_ms")]),
    }


def phash_neardup_bench(spark, n_rows: int = 200_000,
                        max_hamming: int = 4) -> dict:
    """Image near-dup at scale: the pigeonhole Hamming join over n
    UNIFORM-RANDOM 64-bit phashes (worst case for the blocking — real
    corpora cluster) with a planted near-dup every 7th row (base hash with
    ≤2 bits flipped).  All generation and joining is Catalyst codegen; no
    Python anywhere."""
    dup = (F.col("id") % 7) == 6
    base_id = (F.col("id") - (F.col("id") % 7)).cast("string")
    flip = lambda salt: F.expr(
        "shiftleft(1L, cast(pmod(xxhash64(concat(cast(id as string), "
        f"'{salt}')), 64) as int))")
    flipped = (F.xxhash64(base_id)
               .bitwiseXOR(flip("a")).bitwiseXOR(flip("b")))
    images = spark.range(n_rows).select(
        F.col("id").cast("string").alias("image_id"),
        F.when(dup, flipped)
        .otherwise(F.xxhash64(F.col("id").cast("string"))).alias("phash"),
    )
    t0 = time.time()
    n_pairs = phash_pairs(images, max_hamming=max_hamming).count()
    secs = time.time() - t0
    return {
        "sec": round(secs, 3),
        "rows": n_rows,
        "pairs": n_pairs,
        "rows_per_sec": round(n_rows / secs, 1),
    }


def pdf_extract_bench(spark, n_docs: int = 2_000) -> dict:
    """PDF tier at scale: parse-stage throughput over a cached synthetic
    corpus (~4 pages/doc, half FlateDecode / half plain).  The corpus is
    built once per (rev, n_docs); the timed region is ONLY the stdlib
    parse stage (operators/pdf.py) — the number that matters for a
    100 TB document-payload backfill."""
    from crawl4ai_spark.operators.pdf import pdf_extract_stage
    from crawl4ai_spark.sources import pdfsynth

    pdir = f"{BENCH_CACHE}/pdfs_r{synth.FIXTURE_REV}_n{n_docs}"
    marker = f"{pdir}/_done"
    if not os.path.exists(marker):
        def build(batches):
            import pandas as pd
            for b in batches:
                rows = []
                for i in b["id"]:
                    i = int(i)
                    text = " ".join(
                        f"w{(i * 2654435761 + k * 97) % 4093}"
                        for k in range(600))
                    rows.append({"doc_id": str(i),
                                 "pdf": pdfsynth.pdf_bytes_of(i, text)})
                yield pd.DataFrame(rows, columns=["doc_id", "pdf"])

        n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        (spark.range(0, n_docs, 1, n_parts)
         .mapInPandas(build, "doc_id string, pdf binary")
         .write.mode("overwrite").parquet(f"{pdir}/pdfs.parquet"))
        with open(marker, "w") as fh:
            fh.write("ok")
    pdfs = spark.read.parquet(f"{pdir}/pdfs.parquet")
    t0 = time.time()
    row = (pdf_extract_stage(pdfs)
           .agg(F.count("*").alias("pages"),
                F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
                .alias("errs")).collect()[0])
    secs = time.time() - t0
    assert row["errs"] == 0, f"{row['errs']} documents failed to parse"
    return {
        "sec": round(secs, 3),
        "docs": n_docs,
        "pages": row["pages"],
        "pages_per_sec": round(row["pages"] / secs, 1),
    }


def training_prep_bench(spark, n_rows: int = 200_000) -> dict:
    """The post-crawl training-prep tier end-to-end at scale: curation
    gate → aspect buckets → stratified sample (per-bucket rates) →
    byte-balanced shard packing.  Everything up to the pack is pure
    codegen (zero shuffle); the pack pays exactly one range shuffle +
    Arrow cumsum.  Input is a synthetic (image_id, w, h, caption, bytes
    size) table generated by Catalyst expressions — no Python in the
    build or the gate."""
    from crawl4ai_spark.operators.multimodal import (
        aspect_buckets,
        curate_image_captions,
    )
    from crawl4ai_spark.operators.sampling import shard_pack, stratified_sample

    # input pre-materialized to parquet (generation outside the timer,
    # like every other bench/scaling lane)
    pdir = f"{BENCH_CACHE}/prep_r{synth.FIXTURE_REV}_n{n_rows}"
    marker = f"{pdir}/_done"
    if not os.path.exists(marker):
        n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        h = F.xxhash64(F.col("id").cast("string"))
        # alphabetic vocabulary (captions must clear the alpha screen)
        vocab = F.array(*[
            F.lit("".join(chr(ord("a") + (v * 7 + k * 3) % 26)
                          for k in range(5)))
            for v in range(64)
        ])
        word = lambda salt: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(salt)),
                    F.lit(64)) + 1).cast("int"))
        caption = F.concat_ws(
            " ", *[word(s) for s in range(12)],
            F.when(F.pmod(h, 19) == 0,
                   F.lit("echo echo echo echo echo echo echo echo"))
            .otherwise(F.lit("fin")),
        )
        (spark.range(0, n_rows, 1, n_parts).select(
            F.col("id").cast("string").alias("image_id"),
            (F.pmod(h, 2048) + 16).cast("int").alias("w"),
            (F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit("h")), 2048)
             + 16).cast("int").alias("h"),
            caption.alias("caption"),
            (F.pmod(h, 900_000) + 20_000).cast("long").alias("n_bytes"),
        ).write.mode("overwrite").parquet(f"{pdir}/images.parquet"))
        with open(marker, "w") as fh:
            fh.write("ok")
    images = spark.read.parquet(f"{pdir}/images.parquet")
    t0 = time.time()
    gated = curate_image_captions(images).filter(F.col("keep"))
    bucketed = aspect_buckets(gated)
    sampled = stratified_sample(
        bucketed, "image_id", "bucket",
        {"square": 1.0, "wide": 0.8, "tall": 0.8}, default_rate=0.5, seed=11,
    )
    # pack under a DIFFERENT seed than the sample: reusing the sampling
    # hash would sort survivors by their own acceptance draw, piling the
    # rate-1.0 bucket into the trailing shards instead of mixing buckets
    packed = shard_pack(sampled, "image_id", "n_bytes",
                        shard_bytes=1 << 28, seed=12)
    row = packed.agg(
        F.count("*").alias("n"), F.max("shard_id").alias("max_shard")
    ).collect()[0]
    secs = time.time() - t0
    return {
        "sec": round(secs, 3),
        "rows_in": n_rows,
        "rows_packed": row["n"],
        "shards": int(row["max_shard"]) + 1,
        "rows_per_sec": round(n_rows / secs, 1),
    }


def dup_ngrams_bench(spark, n_docs: int = 100_000) -> dict:
    """Duplicated-substring signal at scale: 100k synthetic ~100-token
    docs (7% share a boilerplate prefix) → per-doc dup-8-gram fraction.
    The gram document-frequency is ONE partial-aggregating groupBy —
    counting is O(df) per gram, so the planted boilerplate (7k-doc df)
    costs nothing like the O(df²) a pair join would pay."""
    from crawl4ai_spark.operators.dedup import dup_ngram_stats

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    word = lambda salt: F.concat(
        F.lit("w"), F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(salt)),
                           F.lit(30_000)).cast("string"))
    boiler = " ".join(f"b{k}" for k in range(40))
    body = F.concat_ws(" ", *[word(s) for s in range(60)])
    text = F.when(
        F.pmod(F.col("id"), 14) == 0, F.concat(F.lit(boiler + " "), body)
    ).otherwise(body)
    docs = spark.range(0, n_docs, 1, n_parts).select(
        F.col("id").alias("doc_id"), text.alias("text"))
    t0 = time.time()
    row = dup_ngram_stats(docs, n=8).agg(
        F.count("*").alias("n"),
        F.sum((F.col("dup_frac") > 0.3).cast("long")).alias("flagged"),
    ).collect()[0]
    secs = time.time() - t0
    return {
        "sec": round(secs, 3),
        "docs": n_docs,
        "flagged": int(row["flagged"]),
        "docs_per_sec": round(n_docs / secs, 1),
    }


def warc_ingest_bench(spark, n_docs: int = 50_000) -> dict:
    """WARC tier at scale: parse-stage throughput over a cached synthetic
    archive (~10 records/file).  The corpus is built once per (rev,
    n_docs); the timed region is ONLY the parse Arrow stage — per-FILE
    parallelism, the Common Crawl consumption shape."""
    from crawl4ai_spark.sources.warc import warc_records_stage
    from crawl4ai_spark.sources.warcsynth import warc_corpus

    wdir = f"{BENCH_CACHE}/warc_r{synth.FIXTURE_REV}_n{n_docs}"
    marker = f"{wdir}/_done"
    if not os.path.exists(marker):
        word = lambda salt: F.concat(
            F.lit("tok"),
            F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(salt)),
                   F.lit(9000)).cast("string"))
        text = F.concat_ws(" ", *[word(s) for s in range(80)])
        docs = spark.range(0, n_docs, 1,
                           int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
                           ).select(F.col("id").alias("doc_id"),
                                    text.alias("text"))
        warc_corpus(docs).write.mode("overwrite").parquet(
            f"{wdir}/files.parquet")
        with open(marker, "w") as fh:
            fh.write("ok")
    files = spark.read.parquet(f"{wdir}/files.parquet")
    t0 = time.time()
    row = warc_records_stage(files).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errs"),
    ).collect()[0]
    secs = time.time() - t0
    assert row["errs"] == 0, f"{row['errs']} WARC frames failed to parse"
    out = {
        "sec": round(secs, 3),
        "records": int(row["n"]),
        "records_per_sec": round(row["n"] / secs, 1),
    }
    # CDX lane: parse → capture-index derivation → the range-partitioned
    # global (surt, ts) sort — the index build a crawl ships beside its
    # segments.  Timed end-to-end including the sort shuffle.
    from crawl4ai_spark.operators.cdx import cdx_index

    t0 = time.time()
    cdx = cdx_index(warc_records_stage(files))
    # noop sink executes the FULL plan (a count would let Catalyst elide
    # the global sort)
    cdx.write.format("noop").mode("overwrite").save()
    cdx_secs = time.time() - t0
    out["cdx_sec"] = round(cdx_secs, 3)
    out["cdx_captures_per_sec"] = round(out["records"] / max(cdx_secs, 1e-9), 1)
    out["sec"] = round(out["sec"] + cdx_secs, 3)
    return out


def hygiene_bench(spark, n_docs: int = 100_000) -> dict:
    """Corpus-hygiene tier at scale: Gopher quality rules + repetition
    signals + C4 cleaning rules (zero-shuffle codegen), CCNet line dedup
    (two shuffles), and benchmark decontamination (broadcast gram dim)
    over a synthetic ~60-token corpus with newline structure and 7%
    planted boilerplate lines.  Timed sections are separate so a
    regression localizes."""
    from crawl4ai_spark.operators.quality import (
        decontaminate, gopher_quality, line_dedup, repetition_signals,
    )

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    def word(salt):
        if salt % 9 == 0:   # real stopwords so the Gopher keep-path runs
            return F.lit("the")
        if salt % 9 == 1:
            return F.lit("of")
        return F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(salt)),
                   F.lit(20_000)).cast("string"))
    # 12 lines of 5 tokens; every 14th doc gets a shared boilerplate line
    line = lambda k: F.concat_ws(" ", *[word(k * 5 + s) for s in range(5)])
    body = F.concat_ws("\n", *[line(k) for k in range(12)])
    text = F.when(
        F.pmod(F.col("id"), 14) == 0,
        F.concat(F.lit("subscribe to our newsletter now\n"), body),
    ).otherwise(body)
    docs = spark.range(0, n_docs, 1, n_parts).select(
        F.col("id").alias("doc_id"), text.alias("text"))
    docs = docs.localCheckpoint(eager=True)  # time operators, not the gen

    out: dict = {"docs": n_docs}
    t0 = time.time()
    r = gopher_quality(docs).agg(
        F.count("*").alias("n"), F.sum(F.col("keep").cast("long")).alias("kept")
    ).collect()[0]
    out["gopher_sec"] = round(time.time() - t0, 3)
    out["gopher_kept"] = int(r["kept"])

    t0 = time.time()
    repetition_signals(docs).agg(
        F.sum((F.col("top2gram_char_frac") > 0.2).cast("long"))).collect()
    out["repetition_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    r = line_dedup(docs, min_df=1000).agg(
        F.count("*").alias("n"), F.sum("n_kept").alias("kept_lines")
    ).collect()[0]
    out["line_dedup_sec"] = round(time.time() - t0, 3)
    out["kept_lines"] = int(r["kept_lines"])

    bench_docs = docs.where(F.pmod(F.col("doc_id"), 100) == 0)
    t0 = time.time()
    r = decontaminate(docs, bench_docs, n=8).agg(
        F.sum(F.col("contaminated").cast("long")).alias("c")).collect()[0]
    out["decontaminate_sec"] = round(time.time() - t0, 3)
    out["contaminated"] = int(r["c"])

    from crawl4ai_spark.operators.quality import dsir_weights
    t0 = time.time()
    r = dsir_weights(docs, bench_docs).agg(
        F.sum((F.col("llr_micro") > 0).cast("long")).alias("pos")).collect()[0]
    out["dsir_sec"] = round(time.time() - t0, 3)
    out["dsir_positive"] = int(r["pos"])

    from crawl4ai_spark.operators.quality import c4_filters
    t0 = time.time()
    r = c4_filters(docs).agg(
        F.sum(F.col("keep").cast("long")).alias("kept")).collect()[0]
    out["c4_sec"] = round(time.time() - t0, 3)
    out["c4_kept"] = int(r["kept"])

    from crawl4ai_spark.operators.quality import fineweb_filters
    t0 = time.time()
    r = fineweb_filters(docs).agg(
        F.sum(F.col("keep").cast("long")).alias("kept")).collect()[0]
    out["fineweb_sec"] = round(time.time() - t0, 3)
    out["fineweb_kept"] = int(r["kept"])

    from crawl4ai_spark.operators.dedup import (
        fingerprint_store, incremental_dedup)
    store = fingerprint_store(
        docs.where(F.pmod(F.col("doc_id"), 3) == 0)).localCheckpoint(
        eager=True)
    batch = docs.where(F.pmod(F.col("doc_id"), 3) != 0)
    t0 = time.time()
    r = incremental_dedup(batch, store).agg(
        F.sum(F.col("keep").cast("long")).alias("kept")).collect()[0]
    out["incr_dedup_sec"] = round(time.time() - t0, 3)
    out["incr_kept"] = int(r["kept"])
    store.unpersist()

    total = (out["gopher_sec"] + out["repetition_sec"]
             + out["line_dedup_sec"] + out["decontaminate_sec"]
             + out["dsir_sec"] + out["c4_sec"] + out["fineweb_sec"]
             + out["incr_dedup_sec"])
    out["sec"] = round(total, 3)
    out["docs_per_sec"] = round(8 * n_docs / max(total, 1e-9), 1)
    docs.unpersist()
    return out


def pagerank_bench(spark, n_nodes: int = 200_000, n_iter: int = 8) -> dict:
    """Link-graph authority at scale: fixed-point PageRank over a
    synthetic 4-out-degree graph with a planted hub (1 in 16 edges point
    at node 0 — the hot-host shape a real host graph has).  Exactness is
    the oracle's job; this measures the per-iteration join+agg cost."""
    from crawl4ai_spark.operators.linkgraph import pagerank

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ids = spark.range(0, n_nodes, 1, n_parts)
    parts = []
    for c in (17, 34, 51):
        parts.append(ids.select(
            F.col("id").alias("src"),
            ((F.col("id") * 31 + c) % n_nodes).alias("dst")))
    parts.append(ids.select(  # hub edges: skewed in-degree on node 0
        F.col("id").alias("src"),
        F.when(F.pmod(F.col("id"), 16) == 0, F.lit(0).cast("long"))
         .otherwise((F.col("id") * 37 + 5) % n_nodes).alias("dst")))
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    edges = edges.localCheckpoint(eager=True)
    n_edges = 4 * n_nodes
    t0 = time.time()
    top = (pagerank(edges, n_iter=n_iter)
           .orderBy(F.desc("rank_micro")).limit(3).collect())
    secs = time.time() - t0
    assert top[0]["node"] == 0, "hub must win the authority ranking"
    return {
        "sec": round(secs, 3),
        "nodes": n_nodes,
        "iters": n_iter,
        "edge_visits_per_sec": round(n_edges * n_iter / secs, 1),
        "hub_rank": int(top[0]["rank_micro"]),
    }


def bpe_train_bench(spark, n_docs: int = 50_000, num_merges: int = 500,
                    merges_per_round: int = 64) -> dict:
    """BPE training at a REAL merge count (VERDICT r4 #6): 500 merges,
    batched 64/round with disjoint-symbol batching.  The corpus pays one
    word-count pass; every round after that is vocab-table-sized, so the
    cost here is dominated by per-round fixed job overhead — exactly the
    quantity the batching exists to amortize (a classic 1-merge-per-job
    run would pay ~``num_merges`` sequential jobs; this pays
    ``num_merges / batch-yield`` of them)."""
    from crawl4ai_spark.operators.bpe import bpe_train

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # ~25k distinct 6-char words over a 72-symbol LOWERCASE-STABLE
    # alphabet (the trainer lowercases; A-Z would fold onto a-z and
    # concentrate pair mass on 26 hot symbols, capping the disjoint-batch
    # yield at ~13/round no matter the batch size).  The yield cap is
    # alphabet/2 early on, so symbol diversity is what lets batching
    # actually amortize.
    chars = ("abcdefghijklmnopqrstuvwxyz" "0123456789"
             "!#$%&()*+,-./:;<=>?@[]^_{|}~" "åæçèéêëìíîïð")
    alpha = F.array(*[F.lit(c) for c in chars])
    word = lambda salt: F.concat(*[
        F.element_at(alpha, (F.pmod(
            F.xxhash64(F.col("id").cast("string"), F.lit(salt * 7 + k)),
            F.lit(len(chars))) + 1).cast("int"))
        for k in range(6)
    ])
    docs = spark.range(0, n_docs, 1, n_parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[word(s) for s in range(30)]).alias("text"),
    ).localCheckpoint(eager=True)
    t0 = time.time()
    merges = bpe_train(docs, num_merges=num_merges,
                       merges_per_round=merges_per_round)
    n_learned = merges.count()
    secs = time.time() - t0
    return {
        "sec": round(secs, 3),
        "docs": n_docs,
        "merges": int(n_learned),
        "merges_per_round": merges_per_round,
        "merges_per_sec": round(n_learned / secs, 1),
    }


def bpe_segment_bench(spark, n_docs: int = 100_000) -> dict:
    """Corpus segmentation with a learned merge table: ONE Arrow stage,
    merge ranks closed over, per-batch distinct-word memoization.  The
    train side reuses a tiny corpus (the table is vocab-shaped either
    way); the timed region is segmentation of the big corpus only."""
    from crawl4ai_spark.operators.bpe import bpe_segment, bpe_train

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    word = lambda salt: F.concat(*[
        F.chr(F.lit(97) + F.pmod(
            F.xxhash64(F.col("id").cast("string"), F.lit(salt * 7 + k)),
            F.lit(26)))
        for k in range(4)
    ])
    docs = spark.range(0, n_docs, 1, n_parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[word(s) for s in range(40)]).alias("text"),
    ).localCheckpoint(eager=True)
    merges = bpe_train(docs.limit(2_000), num_merges=100,
                       merges_per_round=32).localCheckpoint(eager=True)
    t0 = time.time()
    row = bpe_segment(docs, merges).agg(
        F.count("*").alias("n"), F.sum("n_pieces").alias("pieces")
    ).collect()[0]
    secs = time.time() - t0
    return {
        "sec": round(secs, 3),
        "docs": n_docs,
        "pieces": int(row["pieces"]),
        "docs_per_sec": round(n_docs / secs, 1),
    }


def semdedup_bench(spark, n_rows: int = 100_000, dim: int = 64) -> dict:
    """SemDeDup at scale with PLANTED SKEW: 35% of the vectors share one
    dominant direction, so one k-means cluster is ~5x the mean size —
    the exact shape the blocked pairwise pass (VERDICT r4 #5) exists
    for.  1-in-16 rows is an exact copy of a lower-id row (must dedup).
    Vectors are built by Catalyst expressions — no Python in the build."""
    from crawl4ai_spark.operators.similarity import semdedup

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = F.when(F.pmod(F.col("id"), 16) == 1, F.col("id") - 1) \
            .otherwise(F.col("id"))  # id%16==1 duplicates its predecessor
    skewed = F.pmod(base, 20) < 7    # 35% pile into one direction
    elem = lambda i: F.when(
        skewed, (F.lit(200.0) + F.pmod(
            F.xxhash64(base.cast("string"), F.lit(i)), F.lit(41)).cast("double"))
    ).otherwise(
        (F.pmod(F.xxhash64(base.cast("string"), F.lit(i)), F.lit(1001))
         - F.lit(500)).cast("double"))
    emb = spark.range(0, n_rows, 1, n_parts).select(
        F.col("id").alias("vec_id"),
        F.array(*[(elem(i) / 250.0).cast("float")
                  for i in range(dim)]).alias("embedding"),
    ).localCheckpoint(eager=True)
    t0 = time.time()
    row = semdedup(emb, threshold=0.95, n_centroids=16).agg(
        F.count("*").alias("n"),
        F.sum((~F.col("keep")).cast("long")).alias("dropped"),
    ).collect()[0]
    secs = time.time() - t0
    assert int(row["dropped"]) >= n_rows // 16 - 1, "planted copies must drop"
    return {
        "sec": round(secs, 3),
        "rows": n_rows,
        "dropped": int(row["dropped"]),
        "rows_per_sec": round(n_rows / secs, 1),
    }


def ccnet_bench(spark, n_docs: int = 100_000) -> dict:
    """CCNet perplexity bucketing at scale: a 5k-doc target trains the
    bigram LM (broadcast dims); the timed region scores the full corpus
    and buckets it into terciles.  A third of the corpus is drawn from
    the target's vocabulary (must skew head), the rest from a disjoint
    vocabulary (must skew tail)."""
    from crawl4ai_spark.operators.quality import ccnet_perplexity

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tword = lambda salt: F.concat(F.lit("t"), F.pmod(
        F.xxhash64(F.col("id").cast("string"), F.lit(salt)),
        F.lit(500)).cast("string"))
    oword = lambda salt: F.concat(F.lit("z"), F.pmod(
        F.xxhash64(F.col("id").cast("string"), F.lit(salt + 100)),
        F.lit(50_000)).cast("string"))
    target = spark.range(0, 5_000, 1, n_parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[tword(s) for s in range(30)]).alias("text"),
    ).localCheckpoint(eager=True)
    corpus = spark.range(0, n_docs, 1, n_parts).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod(F.col("id"), 3) == 0,
               F.concat_ws(" ", *[tword(s) for s in range(30)]))
         .otherwise(F.concat_ws(" ", *[oword(s) for s in range(30)]))
         .alias("text"),
    ).localCheckpoint(eager=True)
    t0 = time.time()
    row = ccnet_perplexity(corpus, target).agg(
        F.count("*").alias("n"),
        F.sum((F.col("bucket") == "head").cast("long")).alias("head"),
    ).collect()[0]
    secs = time.time() - t0
    return {
        "sec": round(secs, 3),
        "docs": n_docs,
        "head_docs": int(row["head"]),
        "docs_per_sec": round(n_docs / secs, 1),
    }


def dup_span_bench(spark, n_docs: int = 50_000) -> dict:
    """Duplicated-span REMOVAL at scale (the acting Lee et al. op): same
    planted-boilerplate corpus shape as dup_ngrams_bench (1 in 14 docs
    carries a 40-token boilerplate prefix that must be excised from ALL
    its copies), plus the occurrence-count agg, posting join, and
    per-row merged-interval coverage pass that measuring never pays."""
    from crawl4ai_spark.operators.dedup import remove_dup_spans

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    word = lambda salt: F.concat(
        F.lit("w"), F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(salt)),
                           F.lit(30_000)).cast("string"))
    boiler = " ".join(f"b{k}" for k in range(40))
    body = F.concat_ws(" ", *[word(s) for s in range(60)])
    text = F.when(
        F.pmod(F.col("id"), 14) == 0, F.concat(F.lit(boiler + " "), body)
    ).otherwise(body)
    docs = spark.range(0, n_docs, 1, n_parts).select(
        F.col("id").alias("doc_id"), text.alias("text"))
    t0 = time.time()
    row = remove_dup_spans(docs, n=8, min_count=2).agg(
        F.count("*").alias("n"), F.sum("n_removed").alias("removed")
    ).collect()[0]
    secs = time.time() - t0
    assert int(row["removed"]) >= (n_docs // 14) * 40, \
        "boilerplate tokens must be excised from every copy"
    return {
        "sec": round(secs, 3),
        "docs": n_docs,
        "tokens_removed": int(row["removed"]),
        "docs_per_sec": round(n_docs / secs, 1),
    }


def stream_chunks_bench(spark, n_docs: int = 100_000) -> dict:
    """Cross-document streaming chunker at scale: md5-sharded token
    queue, ONE hash shuffle + one Arrow fold per shard.  Shard count is
    sized to cores so the per-shard sequential folds run in parallel."""
    from crawl4ai_spark.operators.chunking import stream_chunks

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    word = lambda salt: F.concat(
        F.lit("w"), F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(salt)),
                           F.lit(10_000)).cast("string"))
    docs = spark.range(0, n_docs, 1, n_parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[word(s) for s in range(40)]).alias("text"),
    ).localCheckpoint(eager=True)
    t0 = time.time()
    row = stream_chunks(docs, chunk_token_threshold=100, overlap=10,
                        n_shards=n_parts).agg(
        F.count("*").alias("chunks"), F.sum("n_words").alias("words")
    ).collect()[0]
    secs = time.time() - t0
    return {
        "sec": round(secs, 3),
        "docs": n_docs,
        "chunks": int(row["chunks"]),
        "docs_per_sec": round(n_docs / secs, 1),
    }


def curation_bench(spark, n_docs: int = 100_000) -> dict:
    """Round-5 curation tier at scale: PII redaction (three chained codegen
    regex stages, zero shuffle), URL category-blocklist gate (two broadcast
    joins over a 60k-entry list), and token-budget mixture sampling (one
    range shuffle + vocab-sized offsets dim).  PII spans are planted in
    ~1/3 of docs; blocklist coverage is min(1, 60k/(ids mod 300k))."""
    from crawl4ai_spark.operators.blocklist import blocklist_gate
    from crawl4ai_spark.operators.quality import pii_redact
    from crawl4ai_spark.operators.sampling import mixture_sample

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    word = lambda salt: F.concat(
        F.lit("w"),
        F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(salt)),
               F.lit(20_000)).cast("string"))
    body = F.concat_ws(" ", *[word(s) for s in range(60)])
    planted = F.concat(
        body, F.lit(" mail u"), F.col("id").cast("string"),
        F.lit("@ex"), F.pmod(F.col("id"), 9).cast("string"),
        F.lit(".org ip 10."), F.pmod(F.col("id"), 256).cast("string"),
        F.lit(".0.7 tel +1415555"),
        F.lpad(F.pmod(F.col("id"), 10_000).cast("string"), 4, "0"))
    docs = spark.range(0, n_docs, 1, n_parts).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod(F.col("id"), 3) == 0, planted).otherwise(body)
         .alias("text"),
        F.concat(F.lit("d"), F.pmod(F.col("id"), 20).cast("string"))
         .alias("lang"),
        (F.length(body)).cast("long").alias("n_chars"),
        F.concat(F.lit("https://h"), F.pmod(F.col("id"), 997).cast("string"),
                 F.lit(".dom"), F.pmod(F.col("id"), 300_000).cast("string"),
                 F.lit(".com/p/"), F.col("id").cast("string")).alias("url"),
    ).localCheckpoint(eager=True)  # time operators, not the generator

    out: dict = {"docs": n_docs}
    t0 = time.time()
    r = pii_redact(docs).agg(
        F.sum("n_pii").alias("s"), F.count("*").alias("n")).collect()[0]
    out["pii_sec"] = round(time.time() - t0, 3)
    out["pii_spans"] = int(r["s"])

    bl = spark.range(0, 60_000).select(
        F.concat(F.lit("dom"), F.col("id").cast("string"), F.lit(".com"))
         .alias("pattern"),
        F.lit("domain").alias("kind"),
        F.concat(F.lit("cat"), F.pmod(F.col("id"), 12).cast("string"))
         .alias("category"))
    t0 = time.time()
    r = blocklist_gate(docs.select("doc_id", "url"), bl).agg(
        F.sum(F.col("blocked").cast("long")).alias("b")).collect()[0]
    out["blocklist_sec"] = round(time.time() - t0, 3)
    out["blocked"] = int(r["b"])

    weights = {f"d{i}": (i % 5) + 1 for i in range(20)}
    t0 = time.time()
    kept = mixture_sample(
        docs.select("doc_id", "lang", "n_chars"), "doc_id", "lang",
        weights, total_budget=n_docs * 150, size_col="n_chars", seed=7,
    ).count()
    out["mixture_sec"] = round(time.time() - t0, 3)
    out["mixture_kept"] = int(kept)

    total = out["pii_sec"] + out["blocklist_sec"] + out["mixture_sec"]
    out["sec"] = round(total, 3)
    out["docs_per_sec"] = round(3 * n_docs / max(total, 1e-9), 1)
    docs.unpersist()
    return out


def image_export_bench(spark, n_images: int = 20_000,
                       n_pairs: int = 200_000) -> dict:
    """Round-5 image-payload tier at scale: container sniffing (pure
    codegen over a 64-byte hexed prefix — payload bytes never copied),
    DCT pHash from pixels (Arrow decode + Q12 integer DCT per image),
    WebDataset tar-shard planning (ONE bucketed-cumsum shuffle + broadcast
    shard bases), and the CLIP-score alignment gate (codegen integer
    cross-multiplication over dim-16 quantized embedding pairs)."""
    from crawl4ai_spark.operators.export import (
        webdataset_plan, webdataset_shards)
    from crawl4ai_spark.operators.multimodal import (
        dct_phash_stage, sniff_format)
    from crawl4ai_spark.operators.similarity import clip_alignment_gate

    _, gdir = _ensure_graph(spark, n_images, with_images=True)
    images = spark.read.parquet(f"{gdir}/images.parquet")
    out: dict = {"images": n_images}

    t0 = time.time()
    r = sniff_format(images).agg(
        F.count("*").alias("n"),
        F.sum((~F.col("fmt_match")).cast("long")).alias("mislabeled"),
        F.sum(F.when(F.col("header_ok") == False, 1)  # noqa: E712
              .otherwise(0)).alias("bad_hdr"),
    ).collect()[0]
    out["sniff_sec"] = round(time.time() - t0, 3)
    out["mislabeled"] = int(r["mislabeled"])
    out["bad_headers"] = int(r["bad_hdr"])

    t0 = time.time()
    n = dct_phash_stage(images).count()
    secs = time.time() - t0
    out["dct_phash_sec"] = round(secs, 3)
    out["dct_img_per_sec"] = round(n / max(secs, 1e-9), 1)

    from crawl4ai_spark.operators.multimodal import png_chunk_audit

    t0 = time.time()
    r = png_chunk_audit(images).agg(
        F.count("*").alias("n"),
        F.sum(F.col("is_png").cast("long")).alias("pngs"),
        F.sum(F.coalesce("n_crc_bad", F.lit(0))).alias("crc_bad"),
    ).collect()[0]
    secs = time.time() - t0
    out["png_audit_sec"] = round(secs, 3)
    out["png_audit_imgs_per_sec"] = round(int(r["n"]) / max(secs, 1e-9), 1)
    out["png_audit_pngs"] = int(r["pngs"])

    from crawl4ai_spark.operators.multimodal import png_text_metadata

    t0 = time.time()
    r = png_text_metadata(images).agg(
        F.count("*").alias("n"),
        F.sum(F.coalesce("n_text", F.lit(0))).alias("texts"),
    ).collect()[0]
    secs = time.time() - t0
    out["png_meta_sec"] = round(secs, 3)
    out["png_meta_imgs_per_sec"] = round(int(r["n"]) / max(secs, 1e-9), 1)

    from crawl4ai_spark.operators.multimodal import jpeg_segment_audit

    def build_jpegs(batches):
        # deterministic JFIF containers with ~4 KB entropy scans — the
        # walker pays for marker walking + scan traversal, not decode.
        # seg() computes every segment length (no hand-maintained length
        # bytes to desync from the payloads).
        def seg(marker, payload):
            return bytes([0xFF, marker]) \
                + (len(payload) + 2).to_bytes(2, "big") + payload

        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                scan_len = 3500 + (i * 37) % 1000
                scan = ((i * 31 + np.arange(scan_len) * 17) % 0xFE
                        ).astype(np.uint8).tobytes()
                data = (
                    b"\xff\xd8"
                    + seg(0xE0, b"JFIF\x00\x01\x02\x01"
                          + (72 + i % 5).to_bytes(2, "big")
                          + (72 + i % 7).to_bytes(2, "big") + b"\x00\x00")
                    + seg(0xDB, b"\x00" + bytes(
                        (i + j * 7) % 251 + 1 for j in range(64)))
                    + seg(0xC0, b"\x08"
                          + (16 + i % 9 * 8).to_bytes(2, "big")
                          + (16 + i % 11 * 8).to_bytes(2, "big")
                          + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01")
                    + seg(0xC4, b"\x00" + bytes([0, 1] + [0] * 14)
                          + b"\x05")
                    + seg(0xDA, b"\x03\x01\x00\x02\x11\x03\x11"
                          + b"\x00\x3f\x00")
                    + scan
                    + b"\xff\xd9")
                rows.append({"image_id": f"j{i:07d}", "bytes": data})
            yield pd.DataFrame(rows, columns=["image_id", "bytes"])

    n_parts0 = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    jpegs = spark.range(0, n_images, 1, n_parts0).mapInPandas(
        build_jpegs, "image_id string, bytes binary")
    t0 = time.time()
    r = jpeg_segment_audit(jpegs).agg(
        F.count("*").alias("n"),
        F.sum(F.col("has_eoi").cast("long")).alias("eois"),
        F.sum("scan_bytes").alias("scan"),
    ).collect()[0]
    secs = time.time() - t0
    assert int(r["eois"]) == n_images
    out["jpeg_audit_sec"] = round(secs, 3)
    out["jpeg_audit_imgs_per_sec"] = round(
        int(r["n"]) / max(secs, 1e-9), 1)
    out["jpeg_scan_mb"] = round(int(r["scan"]) / 1e6, 1)

    sized = images.select(
        "image_id",
        F.length("bytes").cast("long").alias("img_size"),
        F.length("caption").cast("long").alias("txt_size"))
    t0 = time.time()
    plan = webdataset_plan(sized, shard_bytes=1 << 24, seed=5)
    n_shards = webdataset_shards(plan).count()
    out["wds_sec"] = round(time.time() - t0, 3)
    out["wds_shards"] = int(n_shards)

    import shutil
    import tempfile

    from crawl4ai_spark.operators.export import write_webdataset

    wdir = tempfile.mkdtemp(prefix="wds_bench_")
    try:
        payload = plan.join(
            images.select("image_id", F.col("bytes").alias("img_bytes"),
                          F.encode("caption", "UTF-8").alias("txt_bytes")),
            "image_id")
        t0 = time.time()
        m = write_webdataset(payload, wdir).agg(
            F.sum("archive_bytes").alias("b")).collect()[0]
        secs = time.time() - t0
        out["wds_write_sec"] = round(secs, 3)
        out["wds_write_mb_per_sec"] = round(
            int(m["b"]) / 1e6 / max(secs, 1e-9), 1)

        from crawl4ai_spark.sources.webdataset import read_webdataset

        t0 = time.time()
        r = read_webdataset(spark, wdir).agg(
            F.count("*").alias("n"),
            F.sum(F.length("img") + F.length("txt")).alias("b"),
        ).collect()[0]
        secs = time.time() - t0
        assert int(r["n"]) == n_images, (r["n"], n_images)
        out["wds_read_sec"] = round(secs, 3)
        out["wds_read_mb_per_sec"] = round(
            int(r["b"]) / 1e6 / max(secs, 1e-9), 1)
    finally:
        shutil.rmtree(wdir, ignore_errors=True)

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    img = F.array(*[
        ((F.col("id") * (c + 3) + 7 * c * c) % 41 - 20).cast("int")
        for c in range(16)])
    txt = F.array(*[
        F.when(F.col("id") % 3 != 0,
               ((F.col("id") * (c + 3) + 7 * c * c) % 41) * 2 - 40
               + ((F.col("id") + c) % 3 - 1))
        .otherwise((F.col("id") * 5 + 11 * c) % 41 - 20).cast("int")
        for c in range(16)])
    pairs = spark.range(0, n_pairs, 1, n_parts).select(
        F.col("id"), img.alias("img_vec"), txt.alias("txt_vec"))
    t0 = time.time()
    kept = clip_alignment_gate(pairs).agg(
        F.sum(F.col("keep").cast("long")).alias("k")).collect()[0]["k"]
    secs = time.time() - t0
    out["clip_sec"] = round(secs, 3)
    out["clip_kept"] = int(kept)
    out["clip_pairs_per_sec"] = round(n_pairs / max(secs, 1e-9), 1)

    from crawl4ai_spark.operators.similarity import aesthetic_gate

    t0 = time.time()
    kept = aesthetic_gate(
        pairs, weights=(5, -3, 2, 7, -1, 4, -6, 2, 3, -2, 1, 6, -4, 2, -1, 3),
        tau2_num=1, tau2_den=10,
    ).agg(F.sum(F.col("aest_keep").cast("long")).alias("k")).collect()[0]["k"]
    secs = time.time() - t0
    out["aest_sec"] = round(secs, 3)
    out["aest_kept"] = int(kept)
    out["aest_imgs_per_sec"] = round(n_pairs / max(secs, 1e-9), 1)

    out["sec"] = round(out["sniff_sec"] + out["dct_phash_sec"]
                       + out["png_audit_sec"] + out["png_meta_sec"]
                       + out["jpeg_audit_sec"]
                       + out["wds_sec"] + out["wds_write_sec"]
                       + out["wds_read_sec"] + out["clip_sec"]
                       + out["aest_sec"], 3)
    return out


def frontier_ops_bench(spark, n_urls: int = 1_000_000,
                       n_hosts: int = 50_000,
                       n_files: int = 200_000) -> dict:
    """Round-5 crawl-ops additions at scale: priority aging + starvation
    rollup over a best-first frontier (codegen + ONE host window),
    IP-collocated politeness split over a host-dimension frame (ONE
    join + ONE ip window), and Iceberg-style snapshot expiry over a
    multi-snapshot file-reference manifest (broadcast snapshot dim + ONE
    path groupBy)."""
    from crawl4ai_spark.operators.aging import (
        age_priorities, starvation_report)
    from crawl4ai_spark.operators.maintenance import expire_snapshots
    from crawl4ai_spark.operators.politeness import ip_budget_split

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out: dict = {"urls": n_urls, "hosts": n_hosts, "files": n_files}

    fr = spark.range(0, n_urls, 1, n_parts).select(
        F.concat(F.lit("h"), (F.col("id") % (n_urls // 200)).cast("string"))
        .alias("host"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 97).cast("long").alias("priority"),
        (F.col("id") % 50).cast("long").alias("enq_superstep"))
    t0 = time.time()
    aged = age_priorities(fr, current_superstep=60, boost_per_step=2,
                          starve_after=45)
    n_starved = starvation_report(aged).agg(
        F.sum("n_starved").alias("s")).collect()[0]["s"]
    secs = time.time() - t0
    out["aging_sec"] = round(secs, 3)
    out["aging_urls_per_sec"] = round(n_urls / max(secs, 1e-9), 1)
    out["n_starved"] = int(n_starved)

    hosts = spark.range(0, n_hosts, 1, n_parts).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test"))
        .alias("host"))
    dns = spark.range(0, n_hosts, 1, n_parts).filter(
        F.col("id") % 4 != 3).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test"))
        .alias("host"),
        F.concat(F.lit("10."),
                 ((F.col("id") % (n_hosts // 100)) % 250).cast("string"),
                 F.lit("."),
                 ((F.col("id") % (n_hosts // 100)) / 250).cast("long")
                 .cast("string"),
                 F.lit(".1")).alias("ip"))  # ~100 hosts share each IP
    t0 = time.time()
    granted = ip_budget_split(hosts, dns, ip_budget=8).agg(
        F.sum("granted").alias("g")).collect()[0]["g"]
    secs = time.time() - t0
    out["ip_split_sec"] = round(secs, 3)
    out["ip_split_hosts_per_sec"] = round(n_hosts / max(secs, 1e-9), 1)
    out["ip_granted"] = int(granted)

    refs = spark.range(0, n_files, 1, n_parts).select(
        F.concat(F.lit("f"), F.col("id").cast("string")).alias("path"),
        ((F.col("id") * 37) % 4096 + 1).cast("long").alias("bytes"),
        F.explode(F.sequence(F.col("id") % 20,
                             F.col("id") % 20 + F.col("id") % 4))
        .alias("snapshot_id"))
    snaps = spark.range(0, 24).select(
        F.col("id").cast("long").alias("snapshot_id"),
        (100 + 10 * F.col("id")).cast("long").alias("ts"))
    t0 = time.time()
    plan = expire_snapshots(refs, snaps, retain_last=4, min_ts=250)
    freed = plan.filter("removable").agg(
        F.sum("bytes").alias("b"), F.count("*").alias("n")).collect()[0]
    secs = time.time() - t0
    out["expire_sec"] = round(secs, 3)
    out["expire_files_per_sec"] = round(n_files / max(secs, 1e-9), 1)
    out["expire_removable"] = int(freed["n"])

    from crawl4ai_spark.operators.budget import (
        apportion_budget, yield_report)

    log = spark.range(0, n_urls, 1, n_parts).select(
        F.concat(F.lit("h"), (F.col("id") % (n_urls // 200)).cast("string"))
        .alias("host"),
        (F.col("id") % 7 != 0).alias("success"),
        (F.col("id") % 30).cast("long").alias("n_links"),
        F.expr("CAST((id % 30) * 2 DIV 3 AS BIGINT)").alias("n_new"))
    t0 = time.time()
    n_hosts_seen = yield_report(log).count()
    secs = time.time() - t0
    out["yield_sec"] = round(secs, 3)
    out["yield_rows_per_sec"] = round(n_urls / max(secs, 1e-9), 1)

    weights = spark.range(0, n_hosts, 1, n_parts).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        ((F.col("id") * F.col("id") * 13) % 997).cast("long")
        .alias("weight"))
    budget = 10_000_000
    t0 = time.time()
    granted = apportion_budget(weights, budget).agg(
        F.sum("granted").alias("g")).collect()[0]["g"]
    secs = time.time() - t0
    assert int(granted) == budget, (granted, budget)
    out["apportion_sec"] = round(secs, 3)
    out["apportion_hosts_per_sec"] = round(n_hosts / max(secs, 1e-9), 1)
    out["yield_hosts"] = int(n_hosts_seen)

    out["sec"] = round(out["aging_sec"] + out["ip_split_sec"]
                       + out["expire_sec"] + out["yield_sec"]
                       + out["apportion_sec"], 3)
    return out


def host_calibration(spark) -> dict:
    """Fixed micro-workloads recorded per run so round-over-round deltas
    can be normalized for host drift (this VM's per-core throughput moves
    between rounds — BASELINE.md).  Three lanes: JVM codegen, a python
    Arrow stage, and raw numpy BLAS."""
    t0 = time.time()
    spark.range(0, 50_000_000, 1, 32).select(
        # shiftright keeps the per-row hash work but bounds the ANSI sum
        F.sum(F.shiftright(F.xxhash64("id"), 32))
    ).collect()
    jvm_s = time.time() - t0

    def _ident(bs):
        for b in bs:
            yield b

    df = spark.range(0, 2_000_000, 1, 32)
    t0 = time.time()
    df.mapInPandas(_ident, "id long").count()
    py_s = time.time() - t0

    rng = np.random.Generator(np.random.PCG64(3))
    a = rng.standard_normal((2048, 2048))
    t0 = time.time()
    (a @ a).sum()
    gemm_s = time.time() - t0
    return {
        "jvm_hash_50m_s": round(jvm_s, 3),
        "py_stage_2m_s": round(py_s, 3),
        "numpy_gemm_2048_s": round(gemm_s, 3),
    }


def warm_python_workers(spark) -> None:
    """Spawn the full Python-worker pool once before timing.

    Cold workers re-import numpy/pandas (~1 s each, serialized by disk/CPU),
    which at local[32] costs ~30 s on the first python-stage job of a JVM —
    a fixed cost per executor in production, not part of steady-state
    throughput. One dummy pandas_udf job + one mapInPandas job of
    defaultParallelism partitions warms both runner pools."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    n = spark.sparkContext.defaultParallelism

    @pandas_udf(LongType())
    def _noop(s: pd.Series) -> pd.Series:
        return s

    def _ident(bs):
        for b in bs:
            yield b

    df = spark.range(0, n * 4, numPartitions=n)
    df.select(_noop(F.col("id"))).count()
    df.mapInPandas(_ident, "id long").count()


def section_reset(spark, drift: dict | None = None, tag: str | None = None) -> None:
    """Drop cross-section JVM state so each bench section times ITS plan,
    not the previous section's leftovers: unpersist every lingering RDD
    block (localCheckpoints whose DataFrames are garbage), clear the SQL
    cache, and run one JVM GC cycle so the ContextCleaner releases
    shuffle files.  crawl_e2e measured 2x slower after the 1.6M-row
    frontier sections than standalone before this.

    When ``drift``/``tag`` are given, a 1-second fixed JVM lane (the
    host_calibration hash lane at 1/10 size) is timed AFTER the reset and
    recorded under ``drift[tag]`` — this shared VM shows multi-x
    minute-to-minute external contention (consecutive identical crawl
    runs measured 24.8 s and 187.7 s), so per-section lane times are the
    only way to tell a slow section from a slow minute."""
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        try:
            rdd.unpersist()
        except Exception:
            pass
    spark._jvm.System.gc()
    time.sleep(1.0)  # let the async ContextCleaner drain
    if drift is not None and tag is not None:
        t0 = time.time()
        spark.range(0, 5_000_000, 1, 32).select(
            F.sum(F.shiftright(F.xxhash64("id"), 32))
        ).collect()
        drift[tag] = round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)
    spark = bench_spark()
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    n_link_pages = max(2000, int(LINK_PAGES_PER_SF * sf))
    n_image_rows = max(1000, int(IMAGE_ROWS_PER_SF * sf))

    # recorded per run so round deltas can be normalized for host drift
    calibration = host_calibration(spark)

    secs, n_sched = frontier_schedule(spark, n_link_pages)
    queries["frontier_schedule"] = round(secs, 3)
    extras["frontier_urls_per_sec"] = round(n_sched / secs, 1)  # input links/s

    secs, n_img = fetch_decode(spark, n_image_rows)
    queries["fetch_decode"] = round(secs, 3)
    extras["fetch_images_per_sec"] = round(n_img / secs, 1)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    exact_dedup(docs).count()
    queries["exact_dedup"] = round(time.time() - t0, 3)

    t0 = time.time()
    minhash_lsh_pairs(docs, n_hashes=64, bands=16, threshold=0.5).count()
    queries["minhash_lsh"] = round(time.time() - t0, 3)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rng = np.random.Generator(np.random.PCG64(7))
    qvecs = rng.standard_normal((8, 64))
    t0 = time.time()
    brute_force_topk(emb, qvecs, k=10).count()
    queries["ann_topk"] = round(time.time() - t0, 3)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    t0 = time.time()
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")), F.sum(dec("l_extendedprice")), F.count("*")
    ).collect()
    queries["pricing_summary"] = round(time.time() - t0, 3)

    # ---- extras AFTER the headline block (VERDICT r2 #4: the 107 s
    # crawl_e2e used to run before exact_dedup/minhash in the same JVM,
    # polluting round-over-round headline deltas with cache/GC state)

    # T6 Bloom sidecar variant: probe-side reduction evidence (not part of
    # the headline total — frontier_schedule stays round-comparable)
    drift: dict[str, float] = {}
    section_reset(spark, drift, "frontier_bloom")
    extras["frontier_bloom"] = frontier_schedule_bloom(spark, n_link_pages)

    # cuckoo sidecar lifecycle (add / TTL-evict / probe) at a scale batch
    section_reset(spark, drift, "cuckoo_seen")
    extras["cuckoo_seen"] = cuckoo_seen_bench(spark, n_urls=200_000)

    # integrated engine loop (multi-seed deep crawl, full schedule)
    section_reset(spark, drift, "crawl_e2e")
    extras["crawl_e2e"] = crawl_e2e(spark, n_pages=max(5_000, int(500_000 * sf)))

    # best-first at a scale batch (10^5 pops per superstep)
    section_reset(spark, drift, "bf_batch")
    extras["bf_batch"] = bf_batch(spark, n_pages=max(5_000, int(500_000 * sf)))

    # image near-dup join at scale (uniform-random worst case + planted dups)
    section_reset(spark, drift, "phash_neardup")
    extras["phash_neardup"] = phash_neardup_bench(
        spark, n_rows=max(20_000, int(2_000_000 * sf)))

    # PDF parse-stage throughput over a cached synthetic corpus
    section_reset(spark, drift, "pdf_extract")
    extras["pdf_extract"] = pdf_extract_bench(
        spark, n_docs=max(1_000, int(50_000 * sf)))

    # post-crawl training prep (curate → bucket → sample → shard-pack)
    section_reset(spark, drift, "training_prep")
    extras["training_prep"] = training_prep_bench(
        spark, n_rows=max(20_000, int(2_000_000 * sf)))

    # duplicated-substring signal over a synthetic 100-token corpus
    section_reset(spark, drift, "dup_ngrams")
    extras["dup_ngrams"] = dup_ngrams_bench(
        spark, n_docs=max(10_000, int(1_000_000 * sf)))

    # WARC archive parse throughput
    section_reset(spark, drift, "warc_ingest")
    extras["warc_ingest"] = warc_ingest_bench(
        spark, n_docs=max(5_000, int(500_000 * sf)))

    # corpus hygiene (Gopher rules / repetition / line dedup / decontam)
    section_reset(spark, drift, "hygiene")
    extras["hygiene"] = hygiene_bench(
        spark, n_docs=max(10_000, int(500_000 * sf)))

    # link-graph authority (fixed-point PageRank, planted hub skew)
    section_reset(spark, drift, "pagerank")
    extras["pagerank"] = pagerank_bench(
        spark, n_nodes=max(20_000, int(2_000_000 * sf)))

    # ---- round-5 lanes (VERDICT r4 #6/#7): the round-4 operators

    # BPE training at a real merge count (500 merges, batched 64/round)
    section_reset(spark, drift, "bpe_train")
    extras["bpe_train"] = bpe_train_bench(
        spark, n_docs=max(5_000, int(500_000 * sf)))

    # BPE corpus segmentation (one Arrow stage, memoized per batch)
    section_reset(spark, drift, "bpe_segment")
    extras["bpe_segment"] = bpe_segment_bench(
        spark, n_docs=max(10_000, int(1_000_000 * sf)))

    # SemDeDup with planted cluster skew (blocked pairwise pass)
    section_reset(spark, drift, "semdedup")
    extras["semdedup"] = semdedup_bench(
        spark, n_rows=max(10_000, int(1_000_000 * sf)))

    # CCNet perplexity buckets (broadcast bigram LM, tercile split)
    section_reset(spark, drift, "ccnet")
    extras["ccnet"] = ccnet_bench(
        spark, n_docs=max(10_000, int(1_000_000 * sf)))

    # duplicated-span removal (acting Lee et al. op, planted boilerplate)
    section_reset(spark, drift, "dup_span")
    extras["dup_span"] = dup_span_bench(
        spark, n_docs=max(5_000, int(500_000 * sf)))

    # cross-document streaming chunker (sharded token queue)
    section_reset(spark, drift, "stream_chunks")
    extras["stream_chunks"] = stream_chunks_bench(
        spark, n_docs=max(10_000, int(1_000_000 * sf)))

    # curation tier (PII scrub / blocklist gate / mixture quota)
    section_reset(spark, drift, "curation")
    extras["curation"] = curation_bench(
        spark, n_docs=max(10_000, int(1_000_000 * sf)))

    # crawl-ops tier (priority aging / IP politeness / snapshot expiry)
    section_reset(spark, drift, "frontier_ops")
    extras["frontier_ops"] = frontier_ops_bench(
        spark, n_urls=max(20_000, int(2_000_000 * sf)),
        n_hosts=max(2_000, int(200_000 * sf)),
        n_files=max(5_000, int(500_000 * sf)))

    # image-payload tier (sniff / DCT pHash / WebDataset plan / CLIP gate)
    section_reset(spark, drift, "image_export")
    extras["image_export"] = image_export_bench(
        spark, n_images=n_image_rows,
        n_pairs=max(20_000, int(2_000_000 * sf)))

    total = round(sum(queries.values()), 3)
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "host_calibration": calibration,
        "section_drift_lane_s": drift,
        "throughput": extras,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "frontier_rows": n_sched,
        "decoded_images": n_img,
    }
    # Full per-section detail (nested dicts: counts, rates, drift lanes)
    # goes to a sidecar file; the stdout contract line must stay well
    # under the driver's 2000-char stdout tail capture or it truncates
    # mid-line and the round records "parsed": null (this bit r03+r04).
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)

    sections_s = {k: v["sec"] for k, v in extras.items() if isinstance(v, dict)}
    rates = {k: v for k, v in extras.items() if not isinstance(v, dict)}
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": detail["cpus"],
        "sections_s": sections_s,
        "rates": rates,
        "detail": "BENCH_DETAIL.json",
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
