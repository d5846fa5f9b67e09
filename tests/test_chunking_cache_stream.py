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


# -------- NlpSentence / TextTiling / BM25ContentFilter (G11, G9) --------


def test_sentence_chunks_dedup_and_split(spark):
    from crawl4ai_spark.operators.chunking import sentence_chunks

    df = spark.createDataFrame(
        [(1, "One fish. Two fish! Red fish? Two fish! "),
         (2, "No terminal punctuation here")],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["sentence"]) for r in sentence_chunks(df).collect()}
    # list(set(...)) semantics: duplicates collapse; strip applied
    assert got == {
        (1, "One fish."), (1, "Two fish!"), (1, "Red fish?"),
        (2, "No terminal punctuation here"),
    }


def test_topic_chunks_distributed_matches_driver(spark):
    from crawl4ai_spark.operators.chunking import py_topic_chunks, topic_chunks

    # two lexically distinct topics of 60 tokens each → a boundary between
    topic_a = " ".join(["spark shuffle join table query agg"] * 10)
    topic_b = " ".join(["ocean coral reef wave tide fish"] * 10)
    text = topic_a + " " + topic_b
    df = spark.createDataFrame([(1, text), (2, topic_a)], "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk"])
        for r in topic_chunks(df, w=10, k=3).collect()
    )
    want = []
    for did, t in [(1, text), (2, topic_a)]:
        for i, seg in enumerate(py_topic_chunks(t, w=10, k=3)):
            want.append((did, i, seg))
    assert got == sorted(want)
    # the two-topic doc must split, and at the topic seam
    segs1 = [c for d, _i, c in got if d == 1]
    assert len(segs1) >= 2
    assert "spark" in segs1[0] and "coral" in segs1[-1]
    # every token lands in exactly one segment (lossless segmentation)
    assert " ".join(segs1).split() == text.split()


def test_bm25_chunk_filter_math(spark):
    import math

    from crawl4ai_spark.operators.content_filter import (
        bm25_chunk_filter,
        py_bm25_tokens,
    )

    rows = [
        (1, 0, "spark shuffle join engine", "h1"),
        (1, 1, "cooking pasta tonight maybe", "p"),
        (1, 2, "spark spark window engine", "p"),
        (2, 0, "totally unrelated words here", "p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx long, chunk string, tag string")
    out = {(r["doc_id"], r["chunk_idx"]): r for r in
           bm25_chunk_filter(df, "spark window").collect()}
    # manual Okapi for doc 1, term 'spark': N=3, df=2, dl=4, avgdl=4
    idf_spark = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    tf = 1.0
    s_chunk0 = idf_spark * (tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * 1.0))
    assert out[(1, 0)]["bm25_score"] == pytest.approx(s_chunk0, rel=1e-12)
    # h1 boost = 5.0
    assert out[(1, 0)]["adjusted_score"] == pytest.approx(5 * s_chunk0, rel=1e-12)
    assert out[(1, 1)]["bm25_score"] == 0.0 and not out[(1, 1)]["keep"]
    assert out[(2, 0)]["bm25_score"] == 0.0
    # tokenizer twin: stems + stop words + short tokens
    assert py_bm25_tokens("The Joins, joining WINDOWS it's ok") == ["join", "join", "window", "it's"]
