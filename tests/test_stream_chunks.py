"""Cross-document streaming chunker (reference utils.py:46-130) vs an
independent sequential twin (hashlib + deque re-derivation of the spec)."""

import hashlib
from collections import deque

from crawl4ai_spark.operators.chunking import stream_chunks


def _twin(docs, threshold, overlap, rate=0.75, n_shards=8, seed=5):
    staged = []
    for did, text in docs:
        pk = hashlib.md5(f"{did}#{seed}".encode()).hexdigest()
        staged.append((int(pk[:4], 16) % n_shards, pk, did, text))
    out = []
    for shard in sorted({s for s, *_ in staged}):
        stream = sorted([x for x in staged if x[0] == shard],
                        key=lambda x: (x[1], x[2]))
        toks, count, idx = deque(), 0.0, 0
        for _s, _pk, _did, text in stream:
            ws = (text or "").split()
            toks.extend(ws)
            count += rate * len(ws)
            while count >= threshold:
                chunk, total = [], 0.0
                while toks:
                    if total + rate > threshold:
                        break
                    total += rate
                    chunk.append(toks.popleft())
                if not chunk:
                    chunk.append(toks.popleft())
                    total += rate
                ov_total, ov_idx = 0.0, 0
                for _ in reversed(chunk):
                    if ov_total + rate > overlap:
                        break
                    ov_total += rate
                    ov_idx += 1
                if ov_idx:
                    toks.extendleft(reversed(chunk[-ov_idx:]))
                    count += ov_total
                count -= total
                kept = chunk[:len(chunk) - ov_idx] if ov_idx else chunk
                out.append((shard, idx, " ".join(kept), len(kept)))
                idx += 1
        if toks:
            out.append((shard, idx, " ".join(toks), len(toks)))
    return sorted(out)


DOCS = [(i, " ".join(f"w{i}_{j}" for j in range(7 + (i * 13) % 23)))
        for i in range(40)]


def test_stream_chunks_matches_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(map(tuple, stream_chunks(
        df, chunk_token_threshold=30, overlap=6).collect()))
    assert got == _twin(DOCS, 30, 6)
    # chunks respect the weighted budget: ≤ floor(30/0.75) = 40 words
    assert all(n <= 40 for *_rest, n in got)


def test_stream_chunks_overlap_defers_not_duplicates(spark):
    # every input word appears exactly once across a shard's chunks —
    # the reference quirk: overlap re-queues the tail, never copies it
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = stream_chunks(df, chunk_token_threshold=30, overlap=6).collect()
    words = [w for r in rows for w in r["chunk"].split()]
    assert len(words) == len(set(words)) == sum(
        len(t.split()) for _, t in DOCS)


def test_stream_chunks_partition_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, stream_chunks(
        df, chunk_token_threshold=25, overlap=3).collect()))
    b = sorted(map(tuple, stream_chunks(
        df.repartition(17), chunk_token_threshold=25, overlap=3).collect()))
    assert a == b == _twin(DOCS, 25, 3)


def test_stream_chunks_overlap_guard(spark):
    import pytest

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        stream_chunks(df, chunk_token_threshold=10, overlap=10)
