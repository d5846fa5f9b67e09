"""CosineStrategy extraction (G10) — reference extraction_strategy.py:118-474.

Unit truths for the ward/flat-cut recipe and the semantic pre-filter
quirks, plus the engine-vs-independent-twin parity on synthetic pages."""

import numpy as np
import pandas as pd
import pytest

from crawl4ai_spark.functions.embed import py_hash_embedding
from crawl4ai_spark.operators.cosine import (
    cluster_page,
    cosine_extract_stage,
    semantic_keep_indices,
    ward_labels,
)
from crawl4ai_spark.oracle.expected import _cosine_twin_clusters


def test_ward_labels_planted_clusters():
    # two tight direction bundles + one outlier: ward at a small cut must
    # recover exactly the bundles
    rng = np.random.Generator(np.random.PCG64(5))
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    pts = [a + 0.01 * rng.standard_normal(3) for _ in range(4)]
    pts += [b + 0.01 * rng.standard_normal(3) for _ in range(3)]
    pts.append(np.array([0.0, 0.0, 1.0]))
    labels = ward_labels(np.stack(pts), max_dist=0.1)
    assert len(set(labels[:4])) == 1
    assert len(set(labels[4:7])) == 1
    assert labels[7] not in (labels[0], labels[4])
    # labels numbered by first-leaf order
    assert labels[0] == 1 and labels[4] == 2 and labels[7] == 3


def test_ward_labels_single_cluster_at_loose_cut():
    rng = np.random.Generator(np.random.PCG64(6))
    pts = np.stack([np.ones(4) + 0.05 * rng.standard_normal(4)
                    for _ in range(6)])
    assert set(ward_labels(pts, max_dist=10.0)) == {1}
    # degenerate sizes
    assert list(ward_labels(pts[:1], 0.2)) == [1]
    assert list(ward_labels(pts[:0], 0.2)) == []


def test_semantic_keep_indices_reference_quirks():
    sims = np.array([0.9, 0.1, 0.8, 0.2, 0.05])
    # n=5 < at_least_k=20 -> at_least_k = 5 // 2 = 2 (reference :250-251):
    # thresholded in original order, TRUNCATED to 2 even though 2 pass
    assert semantic_keep_indices(sims, 0.5) == [0, 2]
    # nothing passes -> back-fill by similarity rank, still truncated
    assert semantic_keep_indices(sims, 0.99) == [0, 2]
    # at_least_k respected when the page is large enough; back-fill is by
    # similarity DESC (0.2 at idx 3 outranks 0.1 at idx 1)
    assert semantic_keep_indices(sims, 0.5, at_least_k=4) == [0, 2, 3, 1]


def test_cluster_page_word_count_filter():
    texts = ["alpha beta gamma delta", "tiny", "epsilon zeta eta theta"]
    emb = np.stack([py_hash_embedding(t, 6) for t in texts])
    out = cluster_page(texts, emb, None, 0.3, word_count_threshold=4,
                       max_dist=0.05)
    # max_dist tiny -> each chunk its own cluster; 'tiny' (1 word) dropped
    assert [c for _l, c in out] == [texts[0], texts[2]]


@pytest.mark.parametrize("max_dist", [0.3, 1.0, 2.5])
def test_engine_matches_independent_twin(spark, max_dist):
    """The distributed stage reproduces the oracle's dict-based sequential
    ward twin exactly — pages with mixed chunk counts, query filter on."""
    rng = np.random.Generator(np.random.PCG64(11))
    words = ["spark", "join", "window", "batch", "crawl", "frontier",
             "robot", "delta", "page", "queue"]
    pages = []
    for pid in range(12):
        n_words = int(rng.integers(5, 400))
        pages.append((pid, " ".join(rng.choice(words, n_words))))
    qvec = py_hash_embedding("spark join", 6)

    rows = []
    expected = []
    for pid, text in pages:
        toks = text.split()
        chunks = [" ".join(toks[i:i + 20]) for i in range(0, len(toks), 20)]
        emb = np.stack([py_hash_embedding(c, 6) for c in chunks])
        for i, c in enumerate(chunks):
            rows.append((pid, i, c, py_hash_embedding(c, 6).tolist()))
        for label, content in _cosine_twin_clusters(
            chunks, emb, qvec, sim_threshold=0.1, word_count_threshold=5,
            max_dist=max_dist,
        ):
            expected.append((pid, label, content))

    df = spark.createDataFrame(
        rows, "page_url long, chunk_idx int, chunk string, embedding array<double>"
    )
    got = cosine_extract_stage(
        df, page_col="page_url", query_vec=qvec, sim_threshold=0.1,
        word_count_threshold=5, max_dist=max_dist,
    ).orderBy("page_url", "cluster_idx").collect()
    got = [(r["page_url"], r["cluster_idx"], r["content"]) for r in got]
    assert got == sorted(expected)
