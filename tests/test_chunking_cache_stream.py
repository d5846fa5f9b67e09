"""Chunking (G11) golden parity vs reference-verbatim Python, CacheMode
matrix (S5/S6), and stream-mode result emission (S10)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.chunking import (
    fixed_word_chunks,
    overlapping_window_chunks,
    regex_chunks,
    sliding_window_chunks,
)
from crawl4ai_spark.sources.cache import CacheMode, cached_fetch

# ---- reference algorithms, verbatim (crawl4ai/chunking_strategy.py) ----


def ref_regex(text, pattern=r"\n\n"):
    paragraphs = [text]
    out = []
    for p in paragraphs:
        out.extend(re.split(pattern, p))
    return out


def ref_fixed(text, chunk_size):
    words = text.split()
    return [
        " ".join(words[i : i + chunk_size])
        for i in range(0, len(words), chunk_size)
    ]


def ref_sliding(text, window, step):
    words = text.split()
    chunks = []
    if len(words) <= window:
        return [text]
    i = 0
    for i in range(0, len(words) - window + 1, step):
        chunks.append(" ".join(words[i : i + window]))
    if i + window < len(words):
        chunks.append(" ".join(words[-window:]))
    return chunks


def ref_overlap(text, window, overlap):
    words = text.split()
    chunks = []
    if len(words) <= window:
        return [text]
    start = 0
    while start < len(words):
        end = start + window
        chunks.append(" ".join(words[start:end]))
        if end >= len(words):
            break
        start = end - overlap
    return chunks


TEXTS = [
    "one two three four five six seven eight nine ten",
    "a b c",
    "word " * 37,
    "first para\n\nsecond para\n\n\n\nthird",
    "   leading and   odd   spacing here   ",
    "solo",
    "x " * 100 + "tail",
]


@pytest.fixture(scope="module")
def text_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )


def _collect(df):
    rows = df.orderBy("doc_id", "chunk_idx").collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(r["chunk"])
    return out


def test_regex_chunking_parity(spark, text_df):
    got = _collect(regex_chunks(text_df))
    for i, t in enumerate(TEXTS):
        assert got.get(i, []) == ref_regex(t), f"doc {i}"


@pytest.mark.parametrize("size", [3, 10, 100])
def test_fixed_word_parity(spark, text_df, size):
    got = _collect(fixed_word_chunks(text_df, chunk_size=size))
    for i, t in enumerate(TEXTS):
        assert got.get(i, []) == ref_fixed(t, size), f"doc {i} size {size}"


@pytest.mark.parametrize("window,step", [(5, 2), (10, 10), (4, 3), (100, 7)])
def test_sliding_window_parity(spark, text_df, window, step):
    got = _collect(sliding_window_chunks(text_df, window=window, step=step))
    for i, t in enumerate(TEXTS):
        assert got.get(i, []) == ref_sliding(t, window, step), (
            f"doc {i} w={window} s={step}"
        )


@pytest.mark.parametrize("window,overlap", [(5, 2), (8, 1), (100, 10)])
def test_overlapping_window_parity(spark, text_df, window, overlap):
    got = _collect(overlapping_window_chunks(text_df, window=window, overlap=overlap))
    for i, t in enumerate(TEXTS):
        assert got.get(i, []) == ref_overlap(t, window, overlap), (
            f"doc {i} w={window} v={overlap}"
        )


# ------------------------------- cache modes (cache_context.py:4-87) ----


def test_cache_mode_bits():
    assert CacheMode.ENABLED.should_read() and CacheMode.ENABLED.should_write()
    assert CacheMode.READ_ONLY.should_read() and not CacheMode.READ_ONLY.should_write()
    assert not CacheMode.WRITE_ONLY.should_read() and CacheMode.WRITE_ONLY.should_write()
    assert not CacheMode.BYPASS.should_read() and not CacheMode.BYPASS.should_write()
    assert not CacheMode.DISABLED.should_read() and not CacheMode.DISABLED.should_write()


@pytest.fixture(scope="module")
def cache_world(spark):
    frontier = spark.createDataFrame(
        [(f"u{i}",) for i in range(10)], "fetch_key string"
    )
    cache = spark.createDataFrame(
        [(f"u{i}", f"cached{i}") for i in range(4)], "fetch_key string, body string"
    )
    fetch_calls = []

    def fetch_fn(batch):
        rows = [r["fetch_key"] for r in batch.collect()]
        fetch_calls.append(sorted(rows))
        return batch.withColumn("body", F.concat(F.lit("fetched-"), F.col("fetch_key")))

    return frontier, cache, fetch_fn, fetch_calls


def test_cached_fetch_enabled(spark, cache_world):
    frontier, cache, fetch_fn, calls = cache_world
    results, delta = cached_fetch(frontier, cache, fetch_fn, CacheMode.ENABLED)
    got = {r["fetch_key"]: r["body"] for r in results.collect()}
    assert len(got) == 10
    for i in range(4):
        assert got[f"u{i}"] == f"cached{i}"  # hit served from cache
    for i in range(4, 10):
        assert got[f"u{i}"] == f"fetched-u{i}"
    assert calls[-1] == [f"u{i}" for i in range(4, 10)]  # only misses fetched
    assert delta.count() == 6  # writes the fetched misses


def test_cached_fetch_bypass(spark, cache_world):
    frontier, cache, fetch_fn, calls = cache_world
    results, delta = cached_fetch(frontier, cache, fetch_fn, CacheMode.BYPASS)
    assert results.count() == 10
    assert calls[-1] == [f"u{i}" for i in range(10)]  # everything refetched
    assert delta.count() == 0  # and nothing written


def test_cached_fetch_write_only(spark, cache_world):
    frontier, cache, fetch_fn, calls = cache_world
    results, delta = cached_fetch(frontier, cache, fetch_fn, CacheMode.WRITE_ONLY)
    assert calls[-1] == [f"u{i}" for i in range(10)]
    assert delta.count() == 10


# --------------------------------------- stream emission (S10 / D5) ----


def test_stream_crawl_micro_batches(spark, tmp_path):
    from crawl4ai_spark.plans.checkpoint import SnapshotStore
    from crawl4ai_spark.plans.frontier import CrawlConfig, deep_crawl
    from crawl4ai_spark.sources.synth import GraphParams, synth_tables, url_of
    from crawl4ai_spark.streaming.results import stream_crawl

    p = GraphParams(n_pages=60, n_domains=4, mean_degree=5, seed=42)
    pages, links, _ = synth_tables(spark, p)
    pages, links = pages.cache(), links.cache()
    cfg = CrawlConfig(strategy="bfs", max_depth=2)

    batches = list(
        stream_crawl(
            spark, [url_of(0, p)], pages, links, cfg,
            store=SnapshotStore(str(tmp_path / "stream")),
        )
    )
    assert len(batches) >= 2  # one per superstep, emitted as committed
    supersteps = [s for s, _ in batches]
    assert supersteps == sorted(supersteps)

    # streamed union == batch-mode results
    streamed = {
        (r["superstep"], r["seq"], r["url"])
        for _, df in batches
        for r in df.collect()
    }
    batch_run = deep_crawl(spark, [url_of(0, p)], pages, links, cfg)
    want = {
        (r["superstep"], r["seq"], r["url"]) for r in batch_run.results.collect()
    }
    assert streamed == want
