"""Expected-table generators for the engine-native probes.

The driver's correctness gate compares each ``queries()`` entry against a
DuckDB query.  For probes whose semantics are not ANSI-SQL-expressible
(superstep crawl loops, xxhash64-keyed minhash/simhash/SRP, Arrow decode
invariants) the DuckDB side is ``read_parquet('<EXPECTED_DIR>/<name>.parquet')``
over a table generated HERE — driver-side, in plain Python/numpy, without
Spark — by the same oracle twins that back the pytest parity suite:

  - crawl probes: oracle/crawler.py executes the reference algorithms
    (bfs_strategy.py:141-187, bff_strategy.py:127-199) verbatim over the
    deterministic synth graph;
  - dedup/ANN probes: the signature/bucket recipes recomputed sequentially
    with the INLINE ``_xxh64_twin`` below (an independent spec
    implementation, cross-checked bit-for-bit against the JVM's xxhash64
    in tests/test_hashing.py) — this checks that the DISTRIBUTED pipeline
    (Catalyst shingle hashing, Arrow folds, banded joins) reproduces the
    sequential computation exactly;
  - image probes: per-row truth from the synth generator (meta) and the
    shared pure-numpy codecs.

Generation is deterministic and idempotent; callables regenerate for their
actual ``sf_dir`` before the gate's DuckDB read (the gate runs Spark, then
the oracle SQL, per query).

Float rounding: Spark's ``round(double, n)`` goes through
``BigDecimal.valueOf`` = shortest-repr digits, ties HALF_UP — mirrored with
``Decimal(repr(x))``.
"""

from __future__ import annotations

import os
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

EXPECTED_DIR = "/root/repo/.oracle_expected"

# Regeneration memo: set of exact param keys already WRITTEN.  Since round 4
# every sf-dependent expected table embeds its sf tag in the parquet path
# (``<EXPECTED_DIR>/<sf_tag>__<name>.parquet``), so distinct sfs never share
# a file and plain membership is sufficient — a process that gates two sfs
# writes two files and serves each from its own path.
_done: set[tuple] = set()


def spark_round(x: float, nd: int) -> float:
    """Twin of Spark round(double, nd): shortest-repr digits, HALF_UP."""
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP))


def _sf_tag(sf_dir: str | None) -> str:
    """'sf0.01__' for /root/testdata/sf0.01, '' for sf-independent tables."""
    if sf_dir is None:
        return ""
    return os.path.basename(os.path.normpath(sf_dir)) + "__"


def _write(name: str, pdf: pd.DataFrame, sf_dir: str | None = None) -> str:
    os.makedirs(EXPECTED_DIR, exist_ok=True)
    path = f"{EXPECTED_DIR}/{_sf_tag(sf_dir)}{name}.parquet"
    pdf.to_parquet(path, index=False)
    return path


def expected_path(name: str, sf_dir: str | None = None) -> str:
    return f"{EXPECTED_DIR}/{_sf_tag(sf_dir)}{name}.parquet"


# ----------------------------------------------------------------- xxh64
# VERIFICATION-INDEPENDENT twin of XXH64 (public spec, seed 42 = Spark's
# F.xxhash64 default).  Deliberately NOT imported from ..hashing: an engine
# bug there must show up as a gate mismatch, not be reproduced here.  The
# twin itself is cross-checked bit-for-bit against the JVM's xxhash64 in
# tests/test_hashing.py.

_XP = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
       0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5)
_M64 = (1 << 64) - 1


def _xx_rot(v: int, r: int) -> int:
    return ((v << r) & _M64) | (v >> (64 - r))


def _xxh64_twin(data: bytes, seed: int = 42) -> int:
    """XXH64 per the published algorithm description (xxhash spec v0.8)."""
    import struct

    n = len(data)
    pos = 0
    if n >= 32:
        acc = [(seed + _XP[0] + _XP[1]) & _M64, (seed + _XP[1]) & _M64,
               seed, (seed - _XP[0]) & _M64]
        while pos + 32 <= n:
            lanes = struct.unpack_from("<4Q", data, pos)
            for i in range(4):
                acc[i] = (_xx_rot((acc[i] + lanes[i] * _XP[1]) & _M64, 31)
                          * _XP[0]) & _M64
            pos += 32
        h = (_xx_rot(acc[0], 1) + _xx_rot(acc[1], 7) + _xx_rot(acc[2], 12)
             + _xx_rot(acc[3], 18)) & _M64
        for a in acc:
            h ^= (_xx_rot((a * _XP[1]) & _M64, 31) * _XP[0]) & _M64
            h = (h * _XP[0] + _XP[3]) & _M64
    else:
        h = (seed + _XP[4]) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        h ^= (_xx_rot((lane * _XP[1]) & _M64, 31) * _XP[0]) & _M64
        h = ((_xx_rot(h, 27) * _XP[0]) + _XP[3]) & _M64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h ^= (lane * _XP[0]) & _M64
        h = ((_xx_rot(h, 23) * _XP[1]) + _XP[2]) & _M64
        pos += 4
    for byte in data[pos:]:
        h ^= (byte * _XP[4]) & _M64
        h = (_xx_rot(h, 11) * _XP[0]) & _M64
    h ^= h >> 33
    h = (h * _XP[1]) & _M64
    h ^= h >> 29
    h = (h * _XP[2]) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------- crawls

def _graph(n_pages=240, **kw):
    from ..sources import synth

    return synth.GraphParams(n_pages=n_pages, n_domains=12, seed=42, **kw)


def ensure_crawl_expected() -> None:
    """bfs_crawl / best_first_crawl / robots_politeness_crawl /
    backoff_crawl expected tables from the in-memory oracle crawlers."""
    key = ("crawls",)
    if key in _done:
        return
    from ..functions.filters import FilterSpec
    from ..functions.scorers import ScorerSpec
    from ..sources import synth
    from .crawler import (
        CrawlSpec,
        OracleGraph,
        ScheduleSpec,
        crawl,
        crawl_bfs_scheduled,
    )

    p = _graph()
    pages, links, _ = synth.synth_local(p)
    graph = OracleGraph.from_frames(pages, links)
    seeds = [synth.url_of(0, p)]

    # --- bfs_crawl (plain BFS + freshness scorer; scores ride the frontier)
    res, _seen = crawl_bfs_scheduled(
        graph, seeds,
        ScheduleSpec(strategy="bfs", max_depth=2, max_pages=150,
                     scorer=ScorerSpec(kind="freshness", current_year=2024,
                                       weight=1.0)),
    )
    _write("bfs_crawl", pd.DataFrame(
        [{"superstep": r["superstep"], "seq": r["seq"], "url": r["url"],
          "depth": r["depth"], "parent": r["parent"],
          "score": spark_round(r["score"], 6), "success": r["success"],
          "status_code": r["status_code"]} for r in res]
    ))

    # --- best_first_crawl (heap pop parity oracle)
    bff, _ = crawl(
        graph, seeds[0],
        CrawlSpec(strategy="best_first", max_depth=2, max_pages=40,
                  batch_size=10,
                  scorer=ScorerSpec(kind="keyword", keywords=["blog", "docs"],
                                    weight=1.0),
                  filters=[FilterSpec(kind="content_type",
                                      allowed_types=["text/html"])]),
    )
    _write("best_first_crawl", pd.DataFrame(
        [{"seq": r.seq, "url": r.url, "depth": r.depth, "parent": r.parent,
          "score": spark_round(r.score, 6), "success": r.success,
          "status_code": r.status_code} for r in bff]
    ))

    # --- robots_politeness_crawl (budget 40 + robots gate)
    res, _ = crawl_bfs_scheduled(
        graph, seeds,
        ScheduleSpec(strategy="bfs", max_depth=2, max_pages=120,
                     politeness_budget=40),
        robots_pdf=synth.gen_robots(p),
    )
    _write("robots_politeness_crawl", pd.DataFrame(
        [{"superstep": r["superstep"], "seq": r["seq"], "url": r["url"],
          "host": r["host"], "depth": r["depth"], "success": r["success"],
          "status_code": r["status_code"]} for r in res]
    ))

    # --- bff_scheduled_crawl (best-first with D1 budget + D2 backoff)
    from .crawler import crawl_best_first_scheduled

    pbf = _graph(fail_rate=0.25)
    pages_f, links_f, _ = synth.synth_local(pbf)
    graph_f = OracleGraph.from_frames(pages_f, links_f)
    res, _ = crawl_best_first_scheduled(
        graph_f, [synth.url_of(0, pbf)],
        ScheduleSpec(strategy="best_first", max_depth=2, max_pages=40,
                     batch_size=12, politeness_budget=3, backoff=True,
                     scorer=ScorerSpec(kind="keyword",
                                       keywords=["blog", "docs"], weight=1.0)),
    )
    _write("bff_scheduled_crawl", pd.DataFrame(
        [{"superstep": r["superstep"], "seq": r["seq"], "url": r["url"],
          "host": r["host"], "depth": r["depth"],
          "score": spark_round(r["score"], 6), "success": r["success"],
          "status_code": r["status_code"], "attempt": r["attempt"]}
         for r in res]
    ))

    # --- dfs_batched_crawl (batched "DFS-ish" segment pops + scorer)
    from .crawler import crawl_dfs_batched

    res, _ = crawl_dfs_batched(
        graph, seeds[0],
        CrawlSpec(strategy="dfs_batched", max_depth=2, max_pages=120,
                  batch_size=6,
                  scorer=ScorerSpec(kind="freshness", current_year=2024,
                                    weight=1.0)),
    )
    _write("dfs_batched_crawl", pd.DataFrame(
        [{"superstep": r["superstep"], "seq": r["seq"], "url": r["url"],
          "depth": r["depth"], "parent": r["parent"],
          "score": spark_round(r["score"], 6), "success": r["success"],
          "status_code": r["status_code"]} for r in res]
    ))

    # --- backoff_crawl (D2: fail-heavy graph, retry requeue trajectories)
    pb = _graph(fail_rate=0.25)
    pages_b, links_b, _ = synth.synth_local(pb)
    graph_b = OracleGraph.from_frames(pages_b, links_b)
    res, _ = crawl_bfs_scheduled(
        graph_b, [synth.url_of(0, pb)],
        ScheduleSpec(strategy="bfs", max_depth=2, backoff=True),
    )
    _write("backoff_crawl", pd.DataFrame(
        [{"superstep": r["superstep"], "seq": r["seq"], "url": r["url"],
          "host": r["host"], "depth": r["depth"], "success": r["success"],
          "status_code": r["status_code"], "attempt": r["attempt"]}
         for r in res]
    ))
    _done.add(key)


# ------------------------------------------------------- dedup (documents)
#
# VERIFICATION INDEPENDENCE: nothing below imports from
# ``crawl4ai_spark.operators`` — the minhash parameter recipe, the SRP
# plane construction, the TextTiling segmentation and the nearest-neighbour
# resize are re-derived here from their published specs, so an engine bug
# in operators/dedup.py, similarity.py, chunking.py or multimodal.py shows
# up as a gate mismatch instead of being reproduced on both sides.  The
# shared pieces are limited to the input generator (sources/synth — both
# sides must read the same data) and the codec spec (codecs.py — the format
# definition itself); the hash primitive is the inline _xxh64_twin above
# (NOT hashing.xxh64), so even a hashing-module bug surfaces as a mismatch.

_MINHASH_PRIME = (1 << 61) - 1  # 2^61-1, the classic MinHash modulus


def _minhash_params(n_hashes: int, seed: int):
    """Engine-spec parameter recipe, re-derived: seeded PCG64 draws of
    (a, b) for the universal hash family h_i(x) = (a_i·x + b_i) mod p."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MINHASH_PRIME, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MINHASH_PRIME, size=n_hashes, dtype=np.int64)
    return a, b


def _srp_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Signed-random-projection hyperplanes, re-derived from the engine
    spec: seeded PCG64 standard normals, row per plane."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def _tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"\s+", text.lower()) if t != ""]


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Twin of dedup._shingle_hash_col: k-gram concat → xxh64 & 2^63-1,
    distinct (first-occurrence order irrelevant for min/sets)."""
    toks = _tokens(text or "")
    if len(toks) < k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    seen, out = set(), []
    for g in grams:
        h = _xxh64_twin(g.encode()) & 0x7FFFFFFFFFFFFFFF
        if h not in seen:
            seen.add(h)
            out.append(h)
    return np.array(out, dtype=np.uint64).view(np.int64)


def ensure_minhash_expected(sf_dir: str, n_hashes=64, bands=16, shingle_k=3,
                            threshold=0.5, seed=42) -> None:
    key = ("minhash", sf_dir, n_hashes, bands, shingle_k, threshold, seed)
    if key in _done:
        return

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    a, b = _minhash_params(n_hashes, seed)
    sigs: dict[int, np.ndarray] = {}
    for r in docs.itertuples():
        sh = _shingle_hashes(r.text, shingle_k)
        if sh.size == 0:
            sh = np.zeros(1, dtype=np.int64)
        vals = (sh[:, None] * a[None, :] + b[None, :]) % _MINHASH_PRIME
        sigs[int(r.doc_id)] = vals.min(axis=0).astype(np.int64)
    rows_per_band = n_hashes // bands
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sig in sigs.items():
        for bi in range(bands):
            chunk = sig[bi * rows_per_band:(bi + 1) * rows_per_band]
            bucket = _xxh64_twin(",".join(str(int(v)) for v in chunk).encode())
            bucket = bucket - (1 << 64) if bucket >= (1 << 63) else bucket
            buckets.setdefault((bi, bucket), []).append(did)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    out = []
    for ia, ib in sorted(pairs):
        est = float(np.mean(sigs[ia] == sigs[ib]))
        if est >= threshold:
            out.append({"id_a": ia, "id_b": ib, "est_jaccard": est})
    _write("minhash_lsh", pd.DataFrame(out, columns=["id_a", "id_b",
                                                     "est_jaccard"]), sf_dir)
    _done.add(key)


def ensure_simhash_expected(sf_dir: str, max_hamming=3) -> None:
    key = ("simhash", sf_dir, max_hamming)
    if key in _done:
        return

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    hashes: dict[int, int] = {}
    for r in docs.itertuples():
        toks = list(dict.fromkeys(_tokens(r.text or "")))
        acc = np.zeros(64, dtype=np.int64)
        for t in toks:
            h = _xxh64_twin(t.encode())
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += 2 * bits.astype(np.int64) - 1
        val = int(((np.uint64(1) << np.arange(64, dtype=np.uint64))[acc > 0]).sum(
            dtype=np.uint64)) if toks else 0
        hashes[int(r.doc_id)] = val
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    mask = (1 << chunk_bits) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, h in hashes.items():
        for ci in range(n_chunks):
            buckets.setdefault((ci, (h >> (ci * chunk_bits)) & mask, ), []).append(did)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    out = []
    for ia, ib in sorted(pairs):
        ham = bin(hashes[ia] ^ hashes[ib]).count("1")
        if ham <= max_hamming:
            out.append({"id_a": ia, "id_b": ib, "hamming": ham})
    _write("simhash_pairs", pd.DataFrame(out, columns=["id_a", "id_b",
                                                       "hamming"]), sf_dir)
    _done.add(key)


def ensure_lsh_ann_expected(sf_dir: str, queries: np.ndarray, k=10,
                            n_planes=8, seed=42) -> None:
    key = ("lsh_ann", sf_dir, queries.tobytes(), k, n_planes, seed)
    if key in _done:
        return
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    planes = _srp_planes(mat.shape[1], n_planes, seed)
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    vbuckets = ((mat @ planes.T) > 0) @ weights
    qbuckets = ((queries @ planes.T) > 0) @ weights
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    unit = mat / norms
    out = []
    for qi, qb in enumerate(qbuckets):
        probes = {int(qb)} | {int(qb) ^ (1 << p) for p in range(n_planes)}
        sel = np.isin(vbuckets, list(probes))
        cos = np.einsum("ij,j->i", unit[sel], qn[qi])
        cand = sorted(zip(cos, ids[sel]), key=lambda t: (-t[0], t[1]))[:k]
        for rank, (c, vid) in enumerate(cand, start=1):
            out.append({"query_id": qi, "vec_id": int(vid),
                        "cosine": spark_round(float(c), 4), "rank": rank})
    _write("lsh_ann", pd.DataFrame(out, columns=["query_id", "vec_id",
                                                 "cosine", "rank"]), sf_dir)
    _done.add(key)



def ensure_ivf_ann_expected(sf_dir: str, queries: np.ndarray, k=10,
                            n_centroids=16, nprobe=4, iters=3) -> None:
    """Sequential IVF twin — pure numpy, NO engine imports.  Centroid
    updates are fixed-point int64 (scale 2^20) floor-division, matching the
    engine's order-independent distributed sums bit-for-bit."""
    key = ("ivf_ann", sf_dir, queries.tobytes(), k, n_centroids, nprobe, iters)
    if key in _done:
        return
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    scale = 1 << 20
    fx = np.round(unit * scale).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    cent_fx = fx[order[:n_centroids]].copy()
    for _ in range(iters):
        cent_f = cent_fx.astype(np.float64) / scale
        cid = np.argmax(unit @ cent_f.T, axis=1)
        sums = np.zeros_like(cent_fx)
        cnts = np.zeros(n_centroids, dtype=np.int64)
        np.add.at(sums, cid, fx)
        np.add.at(cnts, cid, 1)
        live = cnts > 0  # empty clusters keep their previous centroid
        cent_fx[live] = np.floor_divide(sums[live], cnts[live, None])
    cent_f = cent_fx.astype(np.float64) / scale
    cid = np.argmax(unit @ cent_f.T, axis=1)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    sims = qn.astype(np.float64) @ cent_f.T
    out = []
    for qi in range(len(qn)):
        probes = [int(c) for c in np.argsort(-sims[qi], kind="stable")[:nprobe]]
        sel = np.isin(cid, probes)
        cos = np.einsum("ij,j->i", unit[sel], qn[qi])
        cand = sorted(zip(cos, ids[sel]), key=lambda t: (-t[0], t[1]))[:k]
        for rank, (c, vid) in enumerate(cand, start=1):
            out.append({"query_id": qi, "vec_id": int(vid),
                        "cosine": spark_round(float(c), 4), "rank": rank})
    _write("ivf_ann", pd.DataFrame(out, columns=["query_id", "vec_id",
                                                 "cosine", "rank"]), sf_dir)
    _done.add(key)


def ensure_neardup_expected(sf_dir: str, threshold=0.9, bands=4, band_bits=8,
                            seed=42) -> None:
    """embedding_neardup: SRP-banded candidates + exact cosine recomputed
    sequentially over embeddings ∪ (+0.05 perturbed copies).  The cosine
    twin folds left-to-right exactly like Spark's F.aggregate."""
    key = ("neardup", sf_dir, threshold, bands, band_bits, seed)
    if key in _done:
        return
    import math

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    base = np.stack(emb["embedding"].to_numpy()).astype(np.float32)
    pert = (base.astype(np.float64) + 0.05).astype(np.float32)
    mats = np.concatenate([base, pert])
    ids = np.concatenate([emb["vec_id"].to_numpy(),
                          emb["vec_id"].to_numpy() + 1_000_000])
    planes = _srp_planes(mats.shape[1], bands * band_bits, seed)
    bits = (mats.astype(np.float64) @ planes.T) > 0
    weights = 1 << np.arange(band_bits, dtype=np.int64)
    buckets: dict[tuple[int, int], list[int]] = {}
    for band in range(bands):
        bk = bits[:, band * band_bits:(band + 1) * band_bits] @ weights
        for row, b in enumerate(bk):
            buckets.setdefault((band, int(b)), []).append(row)
    pairs = set()
    for rows in buckets.values():
        rows = sorted(rows, key=lambda r: ids[r])
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                if ids[a] != ids[b]:
                    pairs.add((a, b) if ids[a] < ids[b] else (b, a))

    def fold_cos(a: np.ndarray, b: np.ndarray) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        na = 0.0
        for x in a:
            na += float(x) * float(x)
        nb = 0.0
        for y in b:
            nb += float(y) * float(y)
        return acc / (math.sqrt(na) * math.sqrt(nb))

    out = []
    for a, b in sorted(pairs, key=lambda p: (ids[p[0]], ids[p[1]])):
        c = fold_cos(mats[a], mats[b])
        if c >= threshold:
            out.append({"id_a": int(ids[a]), "id_b": int(ids[b]),
                        "cosine": spark_round(c, 6)})
    _write("embedding_neardup", pd.DataFrame(out, columns=["id_a", "id_b",
                                                           "cosine"]), sf_dir)
    _done.add(key)


def _texttile_chunks(text: str, w: int, k: int) -> list[str]:
    """Independent TextTiling twin (Hearst 1997, Computational Linguistics
    23(1) §3): w-token pseudosentences, cosine of the summed term vectors of
    the adjacent k-pseudosentence blocks at every gap, depth score = rise to
    the nearest non-descending peak on each side, boundary where depth >
    mean + std/2.  Re-derived from the published algorithm — NOT imported
    from operators/chunking.py.  Bit-equality with the engine holds because
    every block vector entry is a small integer (exact in float64, so the
    dot/norm values are identical regardless of summation order) and the
    mean/std cutoff is computed with the same numpy calls on those values.
    """
    import collections
    import math
    import re

    toks = [t for t in re.split(r"\s+", text or "") if t]
    n_ps = len(toks) // w
    bounds: list[int] = []
    if n_ps >= 2:
        counts = [
            collections.Counter(toks[i * w:(i + 1) * w]) for i in range(n_ps)
        ]

        def block(a: int, b: int) -> collections.Counter:
            tot: collections.Counter = collections.Counter()
            for c in counts[a:b]:
                tot.update(c)
            return tot

        sims_l: list[float] = []
        for gap in range(1, n_ps):
            left = block(max(0, gap - k), gap)
            right = block(gap, min(n_ps, gap + k))
            dot = float(sum(v * right.get(t, 0) for t, v in left.items()))
            nl = math.sqrt(float(sum(v * v for v in left.values())))
            nr = math.sqrt(float(sum(v * v for v in right.values())))
            denom = nl * nr
            sims_l.append(dot / denom if denom > 0 else 0.0)
        sims = np.array(sims_l)
        depths = np.zeros(len(sims))
        for i in range(len(sims)):
            lo = i
            while lo > 0 and sims[lo - 1] >= sims[lo]:
                lo -= 1
            hi = i
            while hi < len(sims) - 1 and sims[hi + 1] >= sims[hi]:
                hi += 1
            depths[i] = (sims[lo] - sims[i]) + (sims[hi] - sims[i])
        if len(depths) and depths.max() > 0.0:
            cutoff = depths.mean() + depths.std() / 2.0
            bounds = [int((i + 1) * w) for i in np.nonzero(depths > cutoff)[0]]
    cuts = [0] + bounds + [len(toks)]
    return [" ".join(toks[a:b]) for a, b in zip(cuts, cuts[1:]) if b > a]


def ensure_topic_expected(sf_dir: str, w=20, k=4) -> None:
    """chunk_topic: the per-document TextTiling segmentation recomputed
    sequentially from the published algorithm (independent of the engine's
    operators/chunking.py implementation)."""
    key = ("topic", sf_dir, w, k)
    if key in _done:
        return
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    rows = []
    for r in docs.itertuples():
        for i, seg in enumerate(_texttile_chunks(r.text, w, k)):
            rows.append({"doc_id": int(r.doc_id), "chunk_idx": i,
                         "chunk": seg})
    _write("chunk_topic", pd.DataFrame(rows, columns=["doc_id", "chunk_idx",
                                                      "chunk"]), sf_dir)
    _done.add(key)


def _cosine_twin_clusters(texts: list[str], emb: np.ndarray, qvec,
                          sim_threshold: float, word_count_threshold: int,
                          max_dist: float, at_least_k: int = 20):
    """Independent CosineStrategy twin (reference
    extraction_strategy.py:225-426 semantics; shared clustering recipe from
    operators/cosine.py's docstring, re-implemented here as a dict-based
    sequential ward instead of the engine's masked-matrix version).  The
    numpy expressions named by the recipe (U @ U.T, the Lance-Williams
    formula) are part of the spec — same IEEE ops on both sides."""
    n = len(texts)
    if n and qvec is not None:
        a = emb.astype(np.float64)
        u = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-30)
        q = np.asarray(qvec, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-30)
        sims = u @ q
        k = at_least_k if n >= at_least_k else n // 2
        kept = [i for i in range(n) if sims[i] >= sim_threshold]
        if len(kept) < k:
            rest = sorted((i for i in range(n) if sims[i] < sim_threshold),
                          key=lambda i: -sims[i])
            kept += rest[: k - len(kept)]
        kept = kept[:k]
        texts = [texts[i] for i in kept]
        emb = emb[kept]
        n = len(texts)
    if n == 0:
        return []
    if n == 1:
        labels = {0: 1}
    else:
        a = emb.astype(np.float64)
        u = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-30)
        d2m = (1.0 - u @ u.T) ** 2
        # clusters: id -> dict(size, first, leaves, maxh); pair dists in d
        clus = {i: {"size": 1.0, "first": i, "leaves": [i], "maxh": 0.0}
                for i in range(n)}
        d = {(i, j): float(d2m[i, j]) for i in range(n) for j in range(i + 1, n)}
        groups: list[list[int]] = []  # flat subtrees cut at max_dist

        def pd_(x, y):
            return d[(x, y) if x < y else (y, x)]

        flat = {i: [i] for i in range(n)}  # current flat grouping by rep
        while len(clus) > 1:
            best = None
            for (x, y), dist in d.items():
                key = (dist, min(clus[x]["first"], clus[y]["first"]),
                       max(clus[x]["first"], clus[y]["first"]))
                if best is None or key < best[0]:
                    best = (key, x, y)
            _, x, y = best
            if clus[y]["first"] < clus[x]["first"]:
                x, y = y, x
            dxy = pd_(x, y)
            h = float(np.sqrt(max(dxy, 0.0)))
            new_maxh = max(clus[x]["maxh"], clus[y]["maxh"], h)
            nx, ny = clus[x]["size"], clus[y]["size"]
            for z in list(clus):
                if z in (x, y):
                    continue
                nz = clus[z]["size"]
                nd = ((nx + nz) * pd_(x, z) + (ny + nz) * pd_(y, z)
                      - nz * dxy) / (nx + ny + nz)
                d[(x, z) if x < z else (z, x)] = nd
                d.pop((y, z) if y < z else (z, y))
            d.pop((x, y) if x < y else (y, x))
            if new_maxh <= max_dist:
                flat[x] = flat.pop(x) + flat.pop(y)
            clus[x] = {"size": nx + ny,
                       "first": min(clus[x]["first"], clus[y]["first"]),
                       "leaves": clus[x]["leaves"] + clus[y]["leaves"],
                       "maxh": new_maxh}
            del clus[y]
        groups = sorted(flat.values(), key=min)
        labels = {}
        for gi, g in enumerate(groups, start=1):
            for leaf in g:
                labels[leaf] = gi
    by_label: dict[int, list[str]] = {}
    for i in range(n):
        by_label.setdefault(labels[i], []).append(texts[i])
    out = []
    for label in sorted(by_label):
        content = " ".join(by_label[label])
        if len(content.split()) >= word_count_threshold:
            out.append((label, content))
    return out


def ensure_cosine_expected(sf_dir: str, chunk_size=20, dim=6, max_dist=1.0,
                           query="spark join window batch",
                           sim_threshold=0.1,
                           word_count_threshold=10) -> None:
    """cosine_extract: fixed-word chunks -> hash embeddings -> semantic
    pre-filter -> ward clusters, all recomputed here from the documented
    specs (chunking = \\s+ split into chunk_size word blocks joined by ' ';
    embedding component c = xxh64('emb|c|text')/2^63 - 1)."""
    key = ("cosine", sf_dir, chunk_size, dim, max_dist, query,
           sim_threshold, word_count_threshold)
    if key in _done:
        return
    import re

    def embed(text: str) -> np.ndarray:
        return np.array(
            [_xxh64_twin(f"emb|{c}|{text}".encode()) / 2.0**63 - 1.0
             for c in range(dim)],
            dtype=np.float64,
        )

    qvec = embed(query)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    rows = []
    for r in docs.itertuples():
        toks = [t for t in re.split(r"\s+", r.text or "") if t]
        chunks = [" ".join(toks[i:i + chunk_size])
                  for i in range(0, len(toks), chunk_size)]
        if not chunks:
            continue
        emb = np.stack([embed(c) for c in chunks])
        for label, content in _cosine_twin_clusters(
            chunks, emb, qvec, sim_threshold, word_count_threshold, max_dist,
        ):
            rows.append({"doc_id": int(r.doc_id), "cluster_idx": label,
                         "content": content})
    _write("cosine_extract", pd.DataFrame(
        rows, columns=["doc_id", "cluster_idx", "content"]
    ), sf_dir)
    _done.add(key)


# ----------------------------------------------------------------- images

def ensure_image_expected(n_pages=200, grid=4) -> None:
    """image_decode: per-row truth straight from the synth meta (decode must
    restore dims and the pixel/PSNR/phash invariants for EVERY row);
    image_features: encode→decode→grid-means recomputed sequentially."""
    key = ("images", n_pages, grid)
    if key in _done:
        return
    from .. import codecs
    from ..sources import synth

    def nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
        # floor-index nearest neighbour (src = (dst·src_len)//dst_len),
        # re-derived from the spec — independent of operators/multimodal.py
        h_, w_ = px.shape[:2]
        ys = [min((i * h_) // out_h, h_ - 1) for i in range(out_h)]
        xs = [min((j * w_) // out_w, w_ - 1) for j in range(out_w)]
        return px[np.ix_(ys, xs)]

    p = _graph(n_pages=n_pages)
    dec_rows, feat_rows = [], []
    for i in range(n_pages):
        image_id, w, h, fmt = synth.image_meta_of(i, p)
        dec_rows.append({"image_id": image_id, "w": w, "h": h, "fmt": fmt,
                         "decoded_w": w, "decoded_h": h,
                         "invariant_ok": True, "phash_match": True})
        px = synth.image_pixels(image_id, w, h, p.seed)
        rt = codecs.decode(codecs.encode(px, fmt), fmt, w, h).astype(np.float32)
        small = nearest(rt, grid, grid)
        f0 = float((small / 255.0).ravel().astype(np.float32)[0])
        feat_rows.append({"image_id": image_id,
                          "f0": spark_round(f0, 4),
                          "n_features": grid * grid * 3})
    _write("image_decode", pd.DataFrame(dec_rows))
    _write("image_features", pd.DataFrame(feat_rows))
    _done.add(key)


# ------------------------------------------------------------------ rules

def _rules_twin(url: str, text: str, threshold: float) -> list[dict]:
    """Independent sequential twin of the reference
    RuleBasedExtractionStrategy default-pattern pipeline
    (rule_based_extraction.py:80-511), transcribed from the reference
    semantics — NOT imported from operators/rules.py.  Input is the
    already-extracted plain text (the probe HTML is built from a known
    construction rule, so the twin derives the text directly)."""
    import re as _re

    t = _re.sub(r"\s+", " ", text).strip().lower()
    t = _re.sub(r"[^\w\s]", "", t)

    def ctx(s, e):
        return f"{t[max(0, s - 100):s].strip()} [EXTRACTION] {t[e:min(len(t), e + 100)].strip()}"

    res: list[dict] = []
    for m in _re.finditer(
        r"(\d+)\s*(?:hours?|hrs?|credit\s*hours?|CE\s*hours?|contact\s*hours?|CEUs?)",
        t, _re.IGNORECASE,
    ):
        res.append({"type": "ce_hours", "value": m.group(1),
                    "raw_match": m.group(0), "confidence": 0.85,
                    "context": ctx(m.start(), m.end()),
                    "span": (m.start(), m.end())})
    for m in _re.finditer(
        r"(?:renewal|license renewal|renew).{0,30}(?:every|each)\s+(\d+)\s*(years?|months?)",
        t, _re.IGNORECASE,
    ):
        res.append({"type": "renewal_period",
                    "value": f"{m.group(1)} {m.group(2)}",
                    "raw_match": m.group(0), "confidence": 0.8,
                    "context": ctx(m.start(), m.end()),
                    "span": (m.start(), m.end())})
    for m in _re.finditer(
        r"(\d+)\s*(?:hours?|credits?).{0,50}(?:in|of|for)\s+([a-zA-Z\s]{3,50})",
        t, _re.IGNORECASE,
    ):
        res.append({"type": "specialized_requirement", "hours": m.group(1),
                    "topic": m.group(2).strip(), "raw_match": m.group(0),
                    "confidence": 0.75,
                    "context": ctx(m.start(), m.end()),
                    "span": (m.start(), m.end())})
    res = [r for r in res if r["confidence"] >= threshold]
    if len(res) > 1:
        rels = []
        se = sorted(res, key=lambda x: x["span"][0])
        for i in range(len(se) - 1):
            e1, e2 = se[i], se[i + 1]
            if e2["span"][0] - e1["span"][1] <= 50:
                between = t[e1["span"][1]:e2["span"][0]]
                for ind in ["of", "for", "in", "requires", "must have"]:
                    if ind in between.lower():
                        rels.append({
                            "type": "relation", "entity1": e1.get("value"),
                            "entity1_type": e1["type"],
                            "entity2": e2.get("value"),
                            "entity2_type": e2["type"], "relation": ind,
                            "text": t[e1["span"][0]:e2["span"][1]],
                            "confidence": 0.65,
                            "span": (e1["span"][0], e2["span"][1]),
                        })
                        break
        res += [r for r in rels if r["confidence"] >= threshold]
    for r in res:
        score = r["confidence"]
        value = r.get("value", "")
        if isinstance(value, str) and len(value) > 0:
            if _re.match(r"^\d+\s*[a-zA-Z]+$", value):
                score += 0.2
            occ = t.count(value.lower())
            if occ > 1:
                score += min(0.1 * occ, 0.2)
            if r.get("groups"):
                score += 0.1
        r["verification_score"] = min(1.0, score)
        r["verified"] = r["verification_score"] >= threshold
    seen: set[str] = set()
    unique: list[dict] = []
    for r in res:
        key = f"{r['type']}:{r.get('value', '')}"
        if key not in seen:
            seen.add(key)
            unique.append(r)
        else:
            for i, ex in enumerate(unique):
                if f"{ex['type']}:{ex.get('value', '')}" == key:
                    if r["confidence"] > ex["confidence"]:
                        unique[i] = r
                    break
    out = sorted(unique, key=lambda x: x["confidence"], reverse=True)
    import json as _json

    rows = []
    core = {"type", "value", "raw_match", "confidence", "verification_score",
            "verified", "context", "span"}
    for rank, d in enumerate(out):
        extra = {k: v for k, v in d.items() if k not in core}
        rows.append({
            "url": url, "rank": rank, "rtype": d["type"],
            "value": d.get("value"), "raw_match": d.get("raw_match"),
            "confidence": float(d["confidence"]),
            "verification_score": float(d["verification_score"]),
            "verified": bool(d["verified"]),
            "context": d.get("context", ""),
            "span_start": d["span"][0], "span_end": d["span"][1],
            "extra": _json.dumps(extra, sort_keys=True) if extra else None,
        })
    return rows


def ensure_rules_expected(sf_dir: str, threshold: float = 0.6) -> None:
    """rules_extract probe: the synthesized regulatory paragraphs per
    document (same construction rule as the Spark probe) through the
    sequential twin."""
    key = ("rules", sf_dir, threshold)
    if key in _done:
        return
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    rows = []
    for r in docs.itertuples():
        n = 10 + int(r.doc_id) % 30
        k = 1 + int(r.doc_id) % 4
        m = 5 + int(r.doc_id) % 10
        text = (
            f"Members complete {n} CE hours for license renewal "
            f"every {k} years. {m} hours of {r.lang} safety training."
        )
        url = f"https://rules.test/{int(r.doc_id)}"
        rows.extend(_rules_twin(url, text, threshold))
    _write("rules_extract", pd.DataFrame(
        rows, columns=["url", "rank", "rtype", "value", "raw_match",
                       "confidence", "verification_score", "verified",
                       "context", "span_start", "span_end", "extra"],
    ), sf_dir)
    _done.add(key)


def ensure_phash_expected(n_pages: int = 280, max_hamming: int = 4) -> None:
    """phash_neardup probe: brute-force O(n²) popcount over the synthetic
    image table's phash column — independent of the engine's pigeonhole
    blocking join (operators/dedup.py hamming_pairs); any blocking bug
    (missed chunk, wrong mask width) diverges from this exhaustive twin."""
    key = ("phash", n_pages, max_hamming)
    if key in _done:
        return
    from ..sources import synth

    p = _graph(n_pages=n_pages)
    ids, hashes = [], []
    for i in range(n_pages):
        image_id, w, h, _fmt = synth.image_meta_of(i, p)
        px = synth.image_pixels(image_id, w, h, p.seed)
        ids.append(image_id)
        hashes.append(np.uint64(synth.codecs.phash64(px) % (1 << 64)))
    h = np.array(hashes, dtype=np.uint64)
    x = h[:, None] ^ h[None, :]
    pop = np.unpackbits(x.view(np.uint8).reshape(len(h), len(h), 8), axis=2).sum(
        axis=2, dtype=np.int64)
    ia, ib = np.nonzero(np.triu(pop <= max_hamming, k=1))
    rows = [{"id_a": min(ids[a], ids[b]), "id_b": max(ids[a], ids[b]),
             "hamming": int(pop[a, b])} for a, b in zip(ia.tolist(), ib.tolist())]
    _write("phash_neardup", pd.DataFrame(
        rows, columns=["id_a", "id_b", "hamming"]).astype(
        {"hamming": "int64"}))

    # clusters twin: sequential union-find over the SAME brute-force
    # pairs — independent of the engine's label-propagation joins
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r["id_a"]), find(r["id_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    _write("image_dedup_clusters", pd.DataFrame(
        [{"image_id": i, "component": find(i), "canonical": find(i) == i}
         for i in ids],
        columns=["image_id", "component", "canonical"]))
    _done.add(key)


def ensure_images_input(n_pages: int = 280) -> None:
    """INPUT table for the caption-dedup / joint-neardup / sniff /
    webdataset oracles: (image_id, bytes, w, h, fmt, caption, phash) from
    the deterministic fixture generator.  Unlike the expected-OUTPUT
    tables above, this carries no operator logic — the oracle SQL
    re-derives groupings / brute-force pairings / magic-byte sniffs / tar
    geometry from scratch in DuckDB (hex/octet_length work natively on
    the BLOB column), so the probes stay independent of the engine's
    operators."""
    key = ("images_input", n_pages)
    if key in _done:
        return
    from ..sources import synth

    p = _graph(n_pages=n_pages)
    rows = []
    for i in range(n_pages):
        image_id, w, h, fmt = synth.image_meta_of(i, p)
        px = synth.image_pixels(image_id, w, h, p.seed)
        rows.append({
            "image_id": image_id,
            "bytes": synth.codecs.encode(px, fmt),
            "w": w,
            "h": h,
            "fmt": fmt,
            "caption": synth._caption_of(i, p),
            "phash": int(synth.codecs.phash64(px)),
        })
    _write("images_input", pd.DataFrame(
        rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption",
                       "phash"]).astype(
        {"phash": "int64", "w": "int32", "h": "int32"}))
    _done.add(key)


def ensure_dct_phash_expected(n_pages: int = 280) -> None:
    """dct_phash: expected (image_id, dct_phash) recomputed sequentially
    with an INDEPENDENT implementation — plain-Python loops over the
    round-tripped fixture pixels (encode→decode through the declared
    codec, exactly what the engine stage decodes).  The committed
    ``codecs.DCT_Q12`` integer table is the operator's SPEC (the
    ASPECT_BUCKETS pattern) and is shared; everything downstream of it —
    luma, the selection resize, the two matrix products, the middle-pair
    median, the bit packing — is re-derived here without numpy matmuls or
    the engine's ``dct_phash64``."""
    key = ("dct_phash", n_pages)
    if key in _done:
        return
    from .. import codecs
    from ..sources import synth

    m = codecs.DCT_Q12  # the committed spec constant

    def twin(px) -> int:
        h, w = px.shape[:2]
        luma = [[int(px[y, x, 0]) * 299 + int(px[y, x, 1]) * 587
                 + int(px[y, x, 2]) * 114 for x in range(w)]
                for y in range(h)]
        g = [[luma[(i * h) // 32][(j * w) // 32] for j in range(32)]
             for i in range(32)]
        t = [[sum(m[k][n] * g[n][j] for n in range(32)) for j in range(32)]
             for k in range(8)]
        c = [[sum(t[k][n] * m[l][n] for n in range(32)) for l in range(8)]
             for k in range(8)]
        flat = [c[i][j] for i in range(8) for j in range(8)]
        mid = sorted(flat)
        med2 = mid[31] + mid[32]
        val = 0
        for v in flat:
            val = (val << 1) | (1 if 2 * v > med2 else 0)
        return val - (1 << 64) if val >= (1 << 63) else val

    p = _graph(n_pages=n_pages)
    rows = []
    for i in range(n_pages):
        image_id, w, h, fmt = synth.image_meta_of(i, p)
        px = synth.image_pixels(image_id, w, h, p.seed)
        rt = codecs.decode(codecs.encode(px, fmt), fmt, w, h)
        rows.append({"image_id": image_id, "dct_phash": twin(rt)})
    _write("dct_phash", pd.DataFrame(
        rows, columns=["image_id", "dct_phash"]).astype({"dct_phash": "int64"}))
    _done.add(key)


def _crc32_twin(data: bytes) -> int:
    """Bitwise table-free CRC-32 (ISO-HDLC, poly 0xEDB88320) — the PNG
    spec's checksum re-derived WITHOUT zlib so the engine's zlib.crc32
    path is checked against an independent implementation."""
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (0xEDB88320 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def ensure_png_audit(n_pages: int = 280) -> None:
    """png_audit: INPUT corpus (every fixture image re-encoded as PNG,
    then deterministically damaged by image index) + expected OUTPUT from
    an independent stdlib walk (slicing + ``_crc32_twin`` — no zlib, no
    engine import).

    Plants, by ``i % 7``:
      1 → one byte inside the IDAT payload XOR 0xFF   (CRC bad)
      2 → final 7 bytes cut                           (truncated, no IEND)
      3 → 11 junk bytes appended after IEND           (trailing garbage)
      4 → the image's ORIGINAL non-PNG encoding kept  (is_png = False;
          PNG-fmt rows in this class stay clean PNGs)
      else → clean PNG
    """
    key = ("png_audit", n_pages)
    if key in _done:
        return
    from .. import codecs
    from ..sources import synth

    p = _graph(n_pages=n_pages)
    in_rows, out_rows = [], []
    for i in range(n_pages):
        image_id, w, h, fmt = synth.image_meta_of(i, p)
        px = synth.image_pixels(image_id, w, h, p.seed)
        data = codecs.encode_png(px)
        cls = i % 7
        if cls == 1:
            # IHDR chunk spans [8, 33); IDAT payload starts at 33+8
            pos = 33 + 8 + 3
            data = data[:pos] + bytes([data[pos] ^ 0xFF]) + data[pos + 1:]
        elif cls == 2:
            data = data[:-7]
        elif cls == 3:
            data = data + b"\x00garbage!!!"
        elif cls == 4 and fmt != "png":
            data = codecs.encode(px, fmt)
        in_rows.append({"image_id": image_id, "bytes": data})

        # ------- independent walk (mirrors the documented contract)
        rec = {"image_id": image_id, "is_png": None, "n_chunks": None,
               "ihdr_w": None, "ihdr_h": None, "idat_bytes": None,
               "has_iend": None, "n_crc_bad": None, "first_bad_tag": None,
               "truncated": None, "trailing_bytes": None}
        if len(data) >= 8 and data[:8] == b"\x89PNG\r\n\x1a\n":
            rec.update({"is_png": True, "n_chunks": 0, "ihdr_w": -1,
                        "ihdr_h": -1, "idat_bytes": 0, "has_iend": False,
                        "n_crc_bad": 0, "truncated": False,
                        "trailing_bytes": 0})
            pos, n = 8, len(data)
            while pos < n:
                if pos + 8 > n:
                    rec["truncated"] = True
                    break
                length = int.from_bytes(data[pos:pos + 4], "big")
                if pos + 12 + length > n:
                    rec["truncated"] = True
                    break
                tag = data[pos + 4:pos + 8]
                payload = data[pos + 8:pos + 8 + length]
                stored = int.from_bytes(
                    data[pos + 8 + length:pos + 12 + length], "big")
                rec["n_chunks"] += 1
                if _crc32_twin(tag + payload) != stored:
                    rec["n_crc_bad"] += 1
                    if rec["first_bad_tag"] is None:
                        rec["first_bad_tag"] = tag.decode("latin-1")
                if tag == b"IHDR" and length >= 8:
                    rec["ihdr_w"] = int.from_bytes(payload[0:4], "big")
                    rec["ihdr_h"] = int.from_bytes(payload[4:8], "big")
                elif tag == b"IDAT":
                    rec["idat_bytes"] += length
                pos += 12 + length
                if tag == b"IEND":
                    rec["has_iend"] = True
                    rec["trailing_bytes"] = n - pos
                    break
        else:
            rec["is_png"] = False
        out_rows.append(rec)

    _write("png_audit_input", pd.DataFrame(
        in_rows, columns=["image_id", "bytes"]))
    _write("png_audit", pd.DataFrame(out_rows, columns=[
        "image_id", "is_png", "n_chunks", "ihdr_w", "ihdr_h", "idat_bytes",
        "has_iend", "n_crc_bad", "first_bad_tag", "truncated",
        "trailing_bytes"]).astype({
            # nullable dtypes: NULL-bearing int columns must NOT decay to
            # float64 (the gate hashes 7794.0 != 7794)
            "is_png": "boolean", "n_chunks": "Int64", "ihdr_w": "Int64",
            "ihdr_h": "Int64", "idat_bytes": "Int64", "has_iend": "boolean",
            "n_crc_bad": "Int64", "truncated": "boolean",
            "trailing_bytes": "Int64"}))
    _done.add(key)


def ensure_png_meta(n_pages: int = 280) -> None:
    """png_metadata: INPUT corpus (fixture images re-encoded as PNG with
    deterministically planted tEXt/pHYs/gAMA chunks spliced after IHDR,
    plus a private 'prVt' chunk the extractor must skip) + expected
    OUTPUT straight from the planting recipe — fields in == fields out,
    the parser never consulted.

    Plants, by image index i:
      Title       'Image {image_id}'        iff i % 2 == 0
      Author      'author {i%13}'           iff i % 3 == 0
      Software    'synthpng 1.{i%4}'        always
      Description 'synthetic fixture {i}'   iff i % 5 == 0
      pHYs        (2835+(i%7)*100, 2835+(i%11)*100, unit 1) iff i%4 != 1
      gAMA        45455 + i                 iff i % 6 == 0
      prVt        (i%5)+1 junk bytes        always (never surfaces)
      i % 9 == 8 and fmt != 'png' → the ORIGINAL non-PNG encoding
                                    (is_png=false, all fields NULL)
    """
    key = ("png_meta", n_pages)
    if key in _done:
        return
    from .. import codecs
    from ..codecs import _png_chunk
    from ..sources import synth

    p = _graph(n_pages=n_pages)
    in_rows, out_rows = [], []
    for i in range(n_pages):
        image_id, w, h, fmt = synth.image_meta_of(i, p)
        px = synth.image_pixels(image_id, w, h, p.seed)
        rec = {"image_id": image_id, "is_png": True, "title": None,
               "author": None, "software": None, "description": None,
               "phys_x": None, "phys_y": None, "phys_unit": None,
               "gamma": None, "n_text": 0}
        if i % 9 == 8 and fmt != "png":
            data = codecs.encode(px, fmt)
            rec.update({"is_png": False, "n_text": None})
        else:
            base = codecs.encode_png(px)
            extra = b""
            texts = []
            if i % 2 == 0:
                texts.append(("Title", f"Image {image_id}"))
            if i % 3 == 0:
                texts.append(("Author", f"author {i % 13}"))
            texts.append(("Software", f"synthpng 1.{i % 4}"))
            if i % 5 == 0:
                texts.append(("Description", f"synthetic fixture {i}"))
            for k, v in texts:
                extra += _png_chunk(
                    b"tEXt", k.encode("latin-1") + b"\x00"
                    + v.encode("latin-1"))
                rec[k.lower()] = v
            rec["n_text"] = len(texts)
            if i % 4 != 1:
                rec["phys_x"] = 2835 + (i % 7) * 100
                rec["phys_y"] = 2835 + (i % 11) * 100
                rec["phys_unit"] = 1
                extra += _png_chunk(
                    b"pHYs", rec["phys_x"].to_bytes(4, "big")
                    + rec["phys_y"].to_bytes(4, "big") + b"\x01")
            if i % 6 == 0:
                rec["gamma"] = 45455 + i
                extra += _png_chunk(b"gAMA",
                                    rec["gamma"].to_bytes(4, "big"))
            extra += _png_chunk(b"prVt", b"\xa5" * ((i % 5) + 1))
            # IHDR chunk spans [8, 33); splice the ancillary chunks there
            data = base[:33] + extra + base[33:]
        in_rows.append({"image_id": image_id, "bytes": data})
        out_rows.append(rec)

    _write("png_meta_input", pd.DataFrame(
        in_rows, columns=["image_id", "bytes"]))
    _write("png_meta", pd.DataFrame(out_rows, columns=[
        "image_id", "is_png", "title", "author", "software", "description",
        "phys_x", "phys_y", "phys_unit", "gamma", "n_text"]).astype({
            "is_png": "boolean", "phys_x": "Int64", "phys_y": "Int64",
            "phys_unit": "Int64", "gamma": "Int64", "n_text": "Int64"}))
    _done.add(key)


# ------------------------------------------------------------------- llm

def _prompt_escape_twin(s: str) -> str:
    """Re-derivation of the reference's sanitize_html ∘ escape_json_string
    composition (utils.py:716-780) — independent of operators/llm.py."""
    s = s.replace('"', '\\"').replace("'", "\\'")
    s = s.replace("\\", "\\\\").replace('"', '\\"')
    for raw, esc in (("\b", "\\b"), ("\f", "\\f"), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
        s = s.replace(raw, esc)
    return s


def _merge_twin(text: str, target: int, overlap: int, ratio: float) -> list:
    """Independent deque-style re-derivation of merge_chunks
    (reference utils.py:132-188): scaled counts fix the chunk ceiling,
    raw tokens are dealt with overlap carry."""
    toks = text.split()
    scaled = int(len(toks) * ratio)
    if not scaled:
        return []
    import math
    ceiling = max(1, math.ceil(scaled / target))
    out, cur = [], []
    size = 0
    i = 0
    while i < len(toks):
        if size >= target and len(out) + 1 < ceiling:
            out.append(cur)
            cur = cur[-overlap:] if overlap > 0 else []
            size = len(cur)
            cur = list(cur)
        cur.append(toks[i])
        size += 1
        i += 1
    if cur:
        out.append(cur)
    return [" ".join(c) for c in out]


def fake_llm_extract(prompts):
    """Deterministic 'model' for the llm_extract probe: reads the CONTENT
    span out of the prompt, answers two <blocks> JSON blocks (head tokens
    + token count).  Shared fixture between probe and twin — it DEFINES
    the model; everything around it (merge/prompt/parse/explode) is
    checked engine-vs-twin."""
    import json as _j
    out = []
    for p in prompts:
        content = p.split("CONTENT:\n", 1)[1].split("\nINSTRUCTION:", 1)[0]
        toks = content.split()
        blocks = [
            {"index": 0, "tags": ["head"], "content": [" ".join(toks[:5])]},
            {"index": 1, "tags": ["stats"], "content": [str(len(toks))]},
        ]
        out.append("<blocks>" + _j.dumps(blocks) + "</blocks>")
    return out


def fake_llm_filter(prompts):
    """Deterministic 'model' for the llm_filter probe: echoes the CONTENT
    span uppercased inside <content>."""
    out = []
    for p in prompts:
        content = p.split("CONTENT:\n", 1)[1]
        out.append("<content># KEPT\n" + content.upper() + "</content>")
    return out


def ensure_llm_expected(sf_dir: str, threshold: int = 64,
                        overlap_rate: float = 0.25,
                        word_token_rate: float = 1.3) -> None:
    """llm_extract + llm_filter probes: documents through the independent
    merge/prompt twins and the shared fake models; blocks/sections
    constructed directly from the fakes' intent (the engine must arrive at
    the same rows through its own merge → prompt → parse → explode)."""
    key = ("llm", sf_dir, threshold, overlap_rate, word_token_rate)
    if key in _done:
        return
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    overlap = int(threshold * overlap_rate)
    ex_rows, fl_rows = [], []
    for r in docs.itertuples():
        url = f"doc://{int(r.doc_id)}"
        text = r.text or ""
        for ix, sec in enumerate(_merge_twin(text, threshold, overlap,
                                             word_token_rate)):
            esc = _prompt_escape_twin(sec)
            toks = esc.split()
            ex_rows.append({"url": url, "section_idx": ix, "block_idx": 0,
                            "tags": "head", "content": " ".join(toks[:5]),
                            "error": False})
            ex_rows.append({"url": url, "section_idx": ix, "block_idx": 1,
                            "tags": "stats", "content": str(len(toks)),
                            "error": False})
        # filter twin: reference default = one giant section per page
        if text:
            for ix, sec in enumerate(_merge_twin(text, int(1e9),
                                                 int(1e9 * 0.1),
                                                 word_token_rate)):
                fl_rows.append({
                    "url": url, "section_idx": ix,
                    "markdown": "# KEPT\n" + _prompt_escape_twin(sec).upper(),
                })
    _write("llm_extract", pd.DataFrame(
        ex_rows, columns=["url", "section_idx", "block_idx", "tags",
                          "content", "error"]).astype(
        {"section_idx": "int64", "block_idx": "int64"}), sf_dir)
    _write("llm_filter", pd.DataFrame(
        fl_rows, columns=["url", "section_idx", "markdown"]).astype(
        {"section_idx": "int64"}), sf_dir)
    _done.add(key)


def fake_llm_malformed(prompts):
    """Deterministic 'model' for the llm_extract_malformed NEGATIVE probe:
    exercises every parse_blocks failure path
    (extraction_strategy.py:644-662 semantics).  Keyed on the section's
    escaped token count mod 3:

      0 → well-formed <blocks> JSON (one block) — happy path;
      1 → NO blocks tag, one parseable top-level object followed by a
          balanced-but-invalid segment ``{oops}`` — the depth-scan
          fallback keeps the object and folds the rest into ONE error
          block (tags=['error'], error=true);
      2 → unclosed ``<blocks>`` tag and no balanced braces — zero blocks
          (the page yields no rows, the reference's silent-drop path).
    """
    import json as _j
    out = []
    for p in prompts:
        content = p.split("CONTENT:\n", 1)[1].split("\nINSTRUCTION:", 1)[0]
        toks = content.split()
        m = len(toks) % 3
        # payloads are derived from the token COUNT only (never the token
        # text) so no document content can reach the depth-scan fallback
        # and confuse its brace counting
        if m == 0:
            blocks = [{"index": 0, "tags": ["ok"],
                       "content": [f"sec of {len(toks)} toks"]}]
            out.append("<blocks>" + _j.dumps(blocks) + "</blocks>")
        elif m == 1:
            good = _j.dumps({"index": 1, "tags": ["fallback"],
                             "content": f"fb {len(toks)}"})
            out.append(good + " {oops}")
        else:
            out.append("<blocks>[{unterminated")
    return out


def ensure_llm_malformed_expected(sf_dir: str, threshold: int = 64,
                                  overlap_rate: float = 0.25,
                                  word_token_rate: float = 1.3) -> None:
    """Expected rows for the malformed-model negative probe, constructed
    from the fake's INTENT (which parse path each response takes), never
    by running the engine's parser."""
    key = ("llm_malformed", sf_dir, threshold, overlap_rate, word_token_rate)
    if key in _done:
        return
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    overlap = int(threshold * overlap_rate)
    rows = []
    for r in docs.itertuples():
        url = f"doc://{int(r.doc_id)}"
        text = r.text or ""
        for ix, sec in enumerate(_merge_twin(text, threshold, overlap,
                                             word_token_rate)):
            toks = _prompt_escape_twin(sec).split()
            m = len(toks) % 3
            if m == 0:
                rows.append({"url": url, "section_idx": ix, "block_idx": 0,
                             "tags": "ok",
                             "content": f"sec of {len(toks)} toks",
                             "error": False})
            elif m == 1:
                rows.append({"url": url, "section_idx": ix, "block_idx": 1,
                             "tags": "fallback",
                             "content": f"fb {len(toks)}", "error": False})
                rows.append({"url": url, "section_idx": ix, "block_idx": 0,
                             "tags": "error", "content": "{oops}",
                             "error": True})
            # m == 2 → the drop path: no rows for this section
    _write("llm_extract_malformed", pd.DataFrame(
        rows, columns=["url", "section_idx", "block_idx", "tags",
                       "content", "error"]).astype(
        {"section_idx": "int64", "block_idx": "int64"}), sf_dir)
    _done.add(key)


# ------------------------------------------------------------------- pdf

def ensure_pdf_expected(sf_dir: str) -> None:
    """pdf_extract probe: the expected table is reconstructed from the
    BUILDER INPUTS (sources/pdfsynth.py recipes — page-ification, link and
    metadata recipes), never from operators/pdf.py: text in == text out.
    Only file_size touches the built artifact (len of the bytes)."""
    key = ("pdf", sf_dir)
    if key in _done:
        return
    from ..sources import pdfsynth

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    rows = []
    for r in docs.itertuples():
        i = int(r.doc_id)
        text = r.text if isinstance(r.text, str) else ""
        pages = pdfsynth.doc_pages_of(text)
        meta = pdfsynth.doc_meta_of(i)
        links = pdfsynth.doc_links_of(i, len(pages))
        size = len(pdfsynth.pdf_bytes_of(i, text))
        for pno, lines in enumerate(pages, start=1):
            rows.append({
                "doc_id": str(i), "page_number": pno,
                "raw_text": "\n".join(lines),
                "links": ",".join(links[pno - 1]),
                "title": meta["title"], "author": meta["author"],
                "created": meta["created_iso"], "n_pages": len(pages),
                "encrypted": False, "file_size": size,
            })
    _write("pdf_extract", pd.DataFrame(
        rows, columns=["doc_id", "page_number", "raw_text", "links",
                       "title", "author", "created", "n_pages",
                       "encrypted", "file_size"]).astype(
        {"page_number": "int64", "n_pages": "int64", "file_size": "int64"}), sf_dir)
    _done.add(key)


def ensure_pack_sequences_expected(sf_dir: str, budget: int = 120,
                                   seed: int = 5, n_shards: int = 8) -> None:
    """Independent twin of operators/sampling.pack_sequences over the
    documents table: md5 pack keys via hashlib, whitespace token counts,
    shard = first 16 bits of the key mod n_shards, next-fit fold per shard
    in (pack_key, doc_id) order.  No engine imports — the fold is
    re-derived from the packing spec."""
    import hashlib
    import re

    key = ("pack_sequences", sf_dir, budget, seed, n_shards)
    if key in _done:
        return
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    recs = []
    for r in docs.itertuples():
        pk = hashlib.md5(f"{int(r.doc_id)}#{seed}".encode()).hexdigest()
        # Java-regex twin: Spark's split on \s+ is ASCII-whitespace only
        # (Python \s would also split on \xa0/ ); text is non-null by
        # the probe's contract (token_count(NULL) would NULL the weight)
        assert r.text is not None
        n_tok = len([t for t in re.split(r"\s+", r.text.lower(), flags=re.ASCII)
                     if t])
        recs.append((int(pk[:4], 16) % n_shards, pk, int(r.doc_id), n_tok))
    out = []
    for shard in sorted({s for s, *_ in recs}):
        members = sorted([x for x in recs if x[0] == shard],
                         key=lambda x: (x[1], x[2]))
        seq, fill = 0, 0
        for _s, _pk, did, t in members:
            if fill > 0 and fill + t > budget:
                seq += 1
                fill = 0
            out.append({"doc_id": did, "shard": shard, "seq_id": seq,
                        "seq_off": fill, "n_tokens": t})
            fill += t
    _write("pack_sequences", pd.DataFrame(
        out, columns=["doc_id", "shard", "seq_id", "seq_off", "n_tokens"]
    ).astype({"doc_id": "int64", "shard": "int32", "seq_id": "int64",
              "seq_off": "int64", "n_tokens": "int64"}), sf_dir)
    _done.add(key)


def ensure_warc_expected(sf_dir: str) -> None:
    """warc_ingest probe: the expected table is reconstructed from the
    BUILDER INPUTS (sources/warcsynth.py record_fields_of recipe — uri /
    date / status / body as pure functions of (doc_id, text)), never from
    the parser (sources/warc.py): fields in == fields out."""
    key = ("warc", sf_dir)
    if key in _done:
        return
    from ..sources import warcsynth

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    docs = docs.sort_values("doc_id")
    rows = []
    idx_in_file: dict[int, int] = {}
    for r in docs.itertuples():
        i = int(r.doc_id)
        fid = i // warcsynth.DOCS_PER_FILE
        rec = warcsynth.record_fields_of(i, r.text)
        rows.append({
            "file_id": fid,
            "record_idx": idx_in_file.get(fid, 0),
            "warc_type": "response",
            "target_uri": rec["target_uri"],
            "warc_date": rec["warc_date"],
            "http_status": rec["http_status"],
            "content_type": rec["content_type"],
            "body": rec["body"],
        })
        idx_in_file[fid] = idx_in_file.get(fid, 0) + 1
    _write("warc_ingest", pd.DataFrame(
        rows, columns=["file_id", "record_idx", "warc_type", "target_uri",
                       "warc_date", "http_status", "content_type", "body"]
    ).astype({"file_id": "int64", "record_idx": "int32",
              "http_status": "int32"}), sf_dir)
    _done.add(key)


def ensure_ssl_expected(sf_dir: str, n_hosts: int = 60) -> None:
    """ssl_certificates probe: the expected table is reconstructed from
    the BUILDER RECIPE (sources/sslsynth.py cert_fields — every field a
    pure function of the host) plus the raw built DER (fingerprint =
    sha256 of the bytes, PEM = wrapped base64 — both computed inline
    here), never from the engine's ASN.1 parser (operators/sslcert.py):
    fields in == fields out."""
    key = ("ssl", sf_dir, n_hosts)
    if key in _done:
        return
    import base64
    import hashlib

    from ..sources.sslsynth import build_cert_der, cert_fields

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    hosts = sorted({f"d{int(d) % n_hosts}.corpus.test"
                    for d in docs["doc_id"]})
    rows = []
    for h in hosts:
        f = cert_fields(h)
        der = build_cert_der(h)
        b64 = base64.b64encode(der).decode()
        pem = ("-----BEGIN CERTIFICATE-----\n"
               + "\n".join(b64[i:i + 64] for i in range(0, len(b64), 64))
               + "\n-----END CERTIFICATE-----\n")
        rows.append({
            "host": h, "ssl_version": f["version"],
            "ssl_serial": f["serial_number"],
            "ssl_not_before": f["not_before"],
            "ssl_not_after": f["not_after"],
            "ssl_subject_cn": f["subject_cn"],
            "ssl_issuer_cn": f["issuer_cn"],
            "ssl_sig_alg": f["signature_algorithm"],
            "ssl_fingerprint": hashlib.sha256(der).hexdigest(),
            "ssl_san": ",".join(f["san"]),
            "ssl_pem": pem,
        })
    _write("ssl_certificates", pd.DataFrame(
        rows, columns=["host", "ssl_version", "ssl_serial",
                       "ssl_not_before", "ssl_not_after", "ssl_subject_cn",
                       "ssl_issuer_cn", "ssl_sig_alg", "ssl_fingerprint",
                       "ssl_san", "ssl_pem"]).astype(
        {"ssl_version": "int32"}), sf_dir)
    _done.add(key)


def ensure_bpe_expected(sf_dir: str, num_merges: int = 20) -> None:
    """Independent sequential BPE twin over the documents table (no
    engine imports): word counts with the Java-regex ASCII ``\\s+`` split,
    greedy merge learning with the (freq DESC, left ASC, right ASC)
    argmax, and standard lowest-rank-first encoding.  Writes BOTH the
    merge table (``bpe_merges``) and the per-doc piece counts
    (``bpe_segment``)."""
    import re

    key = ("bpe", sf_dir, num_merges)
    if key in _done:
        return
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    wc: dict = {}
    per_doc: dict = {}
    for r in docs.itertuples():
        ws = [t for t in re.split(r"\s+", r.text.lower(), flags=re.ASCII)
              if t]
        per_doc[int(r.doc_id)] = ws
        for w in ws:
            wc[w] = wc.get(w, 0) + 1
    syms = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for rank in range(num_merges):
        pf: dict = {}
        for w, ss in syms.items():
            c = wc[w]
            for a, b in zip(ss, ss[1:]):
                pf[(a, b)] = pf.get((a, b), 0) + c
        if not pf:
            break
        (l, rt), freq = min(pf.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        merges.append((rank, l, rt, freq))
        for w, ss in syms.items():
            out = []
            for s in ss:
                if out and out[-1] == l and s == rt:
                    out[-1] = l + rt
                else:
                    out.append(s)
            syms[w] = out
    _write("bpe_merges", pd.DataFrame(
        merges, columns=["rank", "left", "right", "freq"]
    ).astype({"rank": "int32", "freq": "int64"}), sf_dir)

    ranks = {(l, rt): k for k, l, rt, _ in merges}

    def enc_len(word: str) -> int:
        ss = list(word) + ["</w>"]
        while len(ss) >= 2:
            cands = [(ranks[(a, b)], (a, b)) for a, b in zip(ss, ss[1:])
                     if (a, b) in ranks]
            if not cands:
                break
            _, (l, rt) = min(cands)
            out = []
            for s in ss:
                if out and out[-1] == l and s == rt:
                    out[-1] = l + rt
                else:
                    out.append(s)
            ss = out
        return len(ss)

    memo: dict = {}
    rows = []
    for did, ws in per_doc.items():
        pieces = 0
        for w in ws:
            n = memo.get(w)
            if n is None:
                n = enc_len(w)
                memo[w] = n
            pieces += n
        rows.append((did, len(ws), pieces))
    _write("bpe_segment", pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "n_pieces"]
    ).astype({"doc_id": "int64", "n_tokens": "int64", "n_pieces": "int64"}),
        sf_dir)
    _done.add(key)


def ensure_stream_chunks_expected(sf_dir: str, threshold: int = 100,
                                  overlap: int = 12, rate: float = 0.75,
                                  n_shards: int = 8, seed: int = 5) -> None:
    """Independent twin of operators/chunking.stream_chunks over the
    documents table: md5 shard keys via hashlib, the reference's
    cross-document token-queue fold (utils.py:46-130 semantics) re-derived
    with a deque — no engine imports."""
    import hashlib
    from collections import deque

    key = ("stream_chunks", sf_dir, threshold, overlap, rate, n_shards, seed)
    if key in _done:
        return
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    staged = []
    for r in docs.itertuples():
        pk = hashlib.md5(f"{int(r.doc_id)}#{seed}".encode()).hexdigest()
        staged.append((int(pk[:4], 16) % n_shards, pk, int(r.doc_id),
                       r.text or ""))
    out = []
    for shard in sorted({s for s, *_ in staged}):
        stream = sorted([x for x in staged if x[0] == shard],
                        key=lambda x: (x[1], x[2]))
        toks, count, idx = deque(), 0.0, 0
        for _s, _pk, _did, text in stream:
            ws = text.split()
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
    _write("chunk_stream", pd.DataFrame(
        out, columns=["shard", "chunk_idx", "chunk", "n_words"]
    ).astype({"shard": "int32", "chunk_idx": "int64", "n_words": "int64"}),
        sf_dir)
    _done.add(key)


def ensure_cuckoo_expected(sf_dir: str, n_shards: int = 8,
                           capacity: int = 1024) -> None:
    """Independent sequential twin of the partitioned cuckoo sidecar over
    URLs derived from the documents table: xxh64 via the inline twin
    above, shard = pmod(signed, n_shards), per-shard SIGNED-sorted
    insertion with the deterministic kick sequence, one-copy deletion.
    Probe scenario (mirrors the q_cuckoo_seen probe exactly): add urls for
    doc_id < 300, delete the 100..199 slice, probe every doc's url."""
    key = ("cuckoo", sf_dir, n_shards, capacity)
    if key in _done:
        return
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = sorted(int(x) for x in docs["doc_id"])

    SLOTS, KICKS, MUL = 4, 500, 0x5BD1E995
    per_shard = max(16, capacity // n_shards + 1)
    nb = 1
    while nb * SLOTS * 0.95 < per_shard:
        nb *= 2
    mask = nb - 1

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    def key_of(url):
        u = _xxh64_twin(url.encode())
        return signed(u), u  # (signed for sort/shard, raw bits for fp/i1)

    def fp_of(raw):
        f = (raw >> 32) & 0xFFFF
        return f if f else 1

    def mix(z):
        # splitmix64 finalizer — decorrelates the in-shard bucket index
        # from the low-bit shard key (same as the engine's _ck_mix)
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
        return z ^ (z >> 31)

    def alt(i, f):
        return i ^ ((f * MUL) & mask)

    tables = {s: [[0] * SLOTS for _ in range(nb)] for s in range(n_shards)}
    overflow = {s: False for s in range(n_shards)}

    def insert_batch(urls):
        byshard: dict = {}
        for url in urls:
            sg, raw = key_of(url)
            byshard.setdefault(sg % n_shards, []).append((sg, raw))
        for s, items in byshard.items():
            t = tables[s]
            ctr = 0  # batch-wide mixed eviction counter (engine twin)
            for _sg, raw in sorted(items):
                f, i1 = fp_of(raw), mix(raw) & mask
                i2 = alt(i1, f)
                placed = False
                for b in (i1, i2):
                    if 0 in t[b]:
                        t[b][t[b].index(0)] = f
                        placed = True
                        break
                if placed:
                    continue
                cur, b = f, i1
                for _kick in range(KICKS):
                    ctr += 1
                    slot = mix(ctr) & 3
                    cur, t[b][slot] = t[b][slot], cur
                    b = alt(b, cur)
                    if 0 in t[b]:
                        t[b][t[b].index(0)] = cur
                        placed = True
                        break
                if not placed:
                    overflow[s] = True

    def delete_batch(urls):
        byshard: dict = {}
        for url in urls:
            sg, raw = key_of(url)
            byshard.setdefault(sg % n_shards, []).append((sg, raw))
        for s, items in byshard.items():
            t = tables[s]
            for _sg, raw in sorted(items):
                f, i1 = fp_of(raw), mix(raw) & mask
                for b in (i1, alt(i1, f)):
                    if f in t[b]:
                        t[b][t[b].index(f)] = 0
                        break

    def contains(url):
        sg, raw = key_of(url)
        s = sg % n_shards
        if overflow[s]:
            return True
        t = tables[s]
        f, i1 = fp_of(raw), mix(raw) & mask
        return f in t[i1] or f in t[alt(i1, f)]

    url_of = "https://ex.test/p{}".format
    insert_batch([url_of(i) for i in ids if i < 300])
    delete_batch([url_of(i) for i in ids if 100 <= i < 200])
    rows = [(url_of(i), bool(contains(url_of(i)))) for i in ids]
    _write("cuckoo_seen", pd.DataFrame(
        rows, columns=["url", "maybe_seen"]), sf_dir)
    _done.add(key)


def ensure_semdedup_expected(sf_dir: str, threshold: float = 0.95,
                             n_centroids: int = 16, iters: int = 3) -> None:
    """Sequential SemDeDup twin — pure numpy, no engine imports: the same
    fixed-point k-means replica as the IVF twin, then per-cluster
    pairwise cosine with the keep-lowest-id rule."""
    key = ("semdedup", sf_dir, threshold, n_centroids, iters)
    if key in _done:
        return
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    scale = 1 << 20
    fx = np.round(unit * scale).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    cent_fx = fx[order[:n_centroids]].copy()
    for _ in range(iters):
        cent_f = cent_fx.astype(np.float64) / scale
        cid = np.argmax(unit @ cent_f.T, axis=1)
        sums = np.zeros_like(cent_fx)
        cnts = np.zeros(n_centroids, dtype=np.int64)
        np.add.at(sums, cid, fx)
        np.add.at(cnts, cid, 1)
        live = cnts > 0
        cent_fx[live] = np.floor_divide(sums[live], cnts[live, None])
    cent_f = cent_fx.astype(np.float64) / scale
    cid = np.argmax(unit @ cent_f.T, axis=1)

    rows = []
    for c in sorted(set(int(x) for x in cid)):
        sel = np.nonzero(cid == c)[0]
        sel = sel[np.argsort(ids[sel], kind="stable")]
        u = unit[sel]
        sim = u @ u.T
        cids = ids[sel]
        for j in range(len(sel)):
            over = np.nonzero(sim[:j, j] > threshold)[0]
            if len(over):
                rows.append((int(cids[j]), c, False, int(cids[over[0]])))
            else:
                rows.append((int(cids[j]), c, True, -1))
    _write("semdedup", pd.DataFrame(
        rows, columns=["vec_id", "centroid", "keep", "dup_of"]
    ).astype({"vec_id": "int64", "centroid": "int32", "dup_of": "int64"}),
        sf_dir)
    _done.add(key)


def ensure_jpeg_meta(n_pages: int = 280) -> None:
    """jpeg_segments: INPUT corpus of deterministically-constructed
    JPEG/JFIF containers + expected OUTPUT tracked while assembling —
    fields in == fields out, the walker never consulted.

    Per index i the container carries, in order:
      SOI; APP0 JFIF (ver 1.(i%3), density 72+12*(i%5) x 72+12*(i%7));
      APP1 Exif iff i%2==0 (endian II iff i%4==0 else MM; IFD0 has
        Orientation=1+(i%8) plus an offset-valued ASCII tag the walker
        must skip); DQT (second DQT iff i%5==0); SOF0 (SOF2/progressive
        iff i%6==0) with h=16+8*(i%9), w=16+8*(i%11),
        ncomp=1 iff i%7==0 else 3; DHT; SOS + entropy scan of
        20+(i%13) non-0xFF bytes (+2 stuffed 0xFF00 iff i%4==2,
        +7 for an in-scan RST0 run iff i%11==5); EOI.
    Special rows:
      i%9==8 and walkable alternative → the PNG encoding of a fixture
        image (is_jpeg=false, all fields NULL);
      i%9==4 → stream truncated 1 byte into the first DQT payload
        (truncated=true, dims -1, n_dqt excludes the cut segment);
      i%8==7 (and not i%9==4) → EOI omitted: stream ends after the scan
        (has_eoi=false, truncated=false);
      i%10==3 (with EOI) → (i%6)+1 bytes of trailing garbage.
    """
    key = ("jpeg_meta", n_pages)
    if key in _done:
        return
    from .. import codecs
    from ..sources import synth

    p = _graph(n_pages=n_pages)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    in_rows, out_rows = [], []
    for i in range(n_pages):
        image_id = f"im{i:05d}"
        rec = {"image_id": image_id, "is_jpeg": True, "w": -1, "h": -1,
               "n_components": -1, "progressive": False, "jfif_vmaj": None,
               "jfif_vmin": None, "density_x": None, "density_y": None,
               "exif_endian": None, "exif_orientation": None, "n_app": 0,
               "n_dqt": 0, "n_dht": 0, "n_segments": 0, "scan_bytes": 0,
               "has_eoi": False, "truncated": False, "trailing_bytes": 0}
        if i % 9 == 8:
            _, w, h, _ = synth.image_meta_of(i, p)
            px = synth.image_pixels(f"im{i:05d}", w, h, p.seed)
            data = codecs.encode_png(px)
            rec.update({"is_jpeg": False, "w": None, "h": None,
                        "n_components": None, "progressive": None,
                        "n_app": None, "n_dqt": None, "n_dht": None,
                        "n_segments": None, "scan_bytes": None,
                        "has_eoi": None, "truncated": None,
                        "trailing_bytes": None})
            in_rows.append({"image_id": image_id, "bytes": data})
            out_rows.append(rec)
            continue

        data = b"\xff\xd8"
        # APP0 JFIF
        rec["jfif_vmaj"], rec["jfif_vmin"] = 1, i % 3
        rec["density_x"] = 72 + 12 * (i % 5)
        rec["density_y"] = 72 + 12 * (i % 7)
        app0 = (b"JFIF\x00" + bytes([1, i % 3, 1])
                + rec["density_x"].to_bytes(2, "big")
                + rec["density_y"].to_bytes(2, "big") + b"\x00\x00")
        data += seg(0xE0, app0)
        rec["n_app"] += 1
        rec["n_segments"] += 1
        # APP1 Exif
        if i % 2 == 0:
            little = i % 4 == 0
            endian = "little" if little else "big"
            rec["exif_endian"] = "II" if little else "MM"
            rec["exif_orientation"] = 1 + (i % 8)

            def u(v: int, nb: int) -> bytes:
                return v.to_bytes(nb, endian)

            sw = b"synthjpg\x00"
            # IFD0 at offset 8: 2 entries, Orientation + ASCII Software
            # whose value lives past the entry table (offset-valued)
            ifd = u(2, 2)
            ifd += u(0x0112, 2) + u(3, 2) + u(1, 4) \
                + u(rec["exif_orientation"], 2) + u(0, 2)
            val_off = 8 + 2 + 2 * 12 + 4
            ifd += u(0x0131, 2) + u(2, 2) + u(len(sw), 4) + u(val_off, 4)
            ifd += u(0, 4)
            tiff = (b"II" if little else b"MM") + u(42, 2) + u(8, 4) \
                + ifd + sw
            data += seg(0xE1, b"Exif\x00\x00" + tiff)
            rec["n_app"] += 1
            rec["n_segments"] += 1
        # DQT (possibly truncated here)
        dqt = bytes([0]) + bytes((i + j * 7) % 251 + 1 for j in range(64))
        if i % 9 == 4:
            full = seg(0xDB, dqt)
            data += full[:5]  # marker + length + 1 payload byte
            rec["truncated"] = True
            in_rows.append({"image_id": image_id, "bytes": data})
            out_rows.append(rec)
            continue
        data += seg(0xDB, dqt)
        rec["n_dqt"] += 1
        rec["n_segments"] += 1
        if i % 5 == 0:
            dqt2 = bytes([1]) + bytes((i * 3 + j) % 251 + 1
                                      for j in range(64))
            data += seg(0xDB, dqt2)
            rec["n_dqt"] += 1
            rec["n_segments"] += 1
        # SOF
        rec["progressive"] = i % 6 == 0
        rec["h"] = 16 + 8 * (i % 9)
        rec["w"] = 16 + 8 * (i % 11)
        rec["n_components"] = 1 if i % 7 == 0 else 3
        sof = bytes([8]) + rec["h"].to_bytes(2, "big") \
            + rec["w"].to_bytes(2, "big") + bytes([rec["n_components"]])
        for c in range(rec["n_components"]):
            sof += bytes([c + 1, 0x22 if c == 0 else 0x11,
                          0 if c == 0 else 1])
        data += seg(0xC2 if rec["progressive"] else 0xC0, sof)
        rec["n_segments"] += 1
        # DHT: one code of length 2, one symbol
        counts = bytearray(16)
        counts[1] = 1
        data += seg(0xC4, bytes([0]) + bytes(counts) + bytes([0x05]))
        rec["n_dht"] += 1
        rec["n_segments"] += 1
        # SOS header + entropy-coded scan
        sos = bytes([rec["n_components"]])
        for c in range(rec["n_components"]):
            sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
        sos += bytes([0, 63, 0])
        data += seg(0xDA, sos)
        rec["n_segments"] += 1
        scan = bytes((i * 31 + j * 17) % 0xFE for j in range(20 + i % 13))
        rec["scan_bytes"] = len(scan)
        if i % 4 == 2:
            scan += b"\xff\x00"
            rec["scan_bytes"] += 2
        if i % 11 == 5:
            scan += b"\xff\xd0" + bytes((i + j) % 200 for j in range(5))
            rec["scan_bytes"] += 7
        data += scan
        if i % 8 == 7:
            in_rows.append({"image_id": image_id, "bytes": data})
            out_rows.append(rec)  # stream ends mid-scan: no EOI
            continue
        data += b"\xff\xd9"
        rec["has_eoi"] = True
        if i % 10 == 3:
            junk = (i % 6) + 1
            data += b"\xa5" * junk
            rec["trailing_bytes"] = junk
        in_rows.append({"image_id": image_id, "bytes": data})
        out_rows.append(rec)

    _write("jpeg_meta_input", pd.DataFrame(
        in_rows, columns=["image_id", "bytes"]))
    _write("jpeg_meta", pd.DataFrame(out_rows, columns=[
        "image_id", "is_jpeg", "w", "h", "n_components", "progressive",
        "jfif_vmaj", "jfif_vmin", "density_x", "density_y", "exif_endian",
        "exif_orientation", "n_app", "n_dqt", "n_dht", "n_segments",
        "scan_bytes", "has_eoi", "truncated", "trailing_bytes"]).astype({
            "is_jpeg": "boolean", "w": "Int64", "h": "Int64",
            "n_components": "Int64", "progressive": "boolean",
            "jfif_vmaj": "Int64", "jfif_vmin": "Int64",
            "density_x": "Int64", "density_y": "Int64",
            "exif_orientation": "Int64", "n_app": "Int64",
            "n_dqt": "Int64", "n_dht": "Int64", "n_segments": "Int64",
            "scan_bytes": "Int64", "has_eoi": "boolean",
            "truncated": "boolean", "trailing_bytes": "Int64"}))
    _done.add(key)
