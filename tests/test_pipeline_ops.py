"""Training-data pipeline operators over the driver testdata tables:
dedup (exact / minhash-LSH / simhash / n-gram Jaccard), similarity search
(brute-force vs LSH recall), text analysis, multimodal plumbing."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators import dedup, similarity, text

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_exact_dedup(spark, docs):
    base = docs.limit(50)
    dupes = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    union = base.unionByName(dupes)
    out = dedup.exact_dedup(union)
    assert out.count() == base.count()
    # deterministic keeper: the lowest doc_id survives
    assert out.agg(F.max("doc_id")).collect()[0][0] < 1_000_000


def test_minhash_lsh_finds_near_dups(spark, docs):
    rows = docs.limit(30).collect()
    mutated = []
    for r in rows[:10]:
        words = r["text"].split()
        words[len(words) // 2] = "MUTATED"
        mutated.append((r["doc_id"] + 10_000, " ".join(words)))
    df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows] + mutated, "doc_id long, text string"
    )
    pairs = dedup.minhash_lsh_pairs(df, threshold=0.5).collect()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    want = {(r["doc_id"], r["doc_id"] + 10_000) for r in rows[:10]}
    hit = len(found & want) / len(want)
    assert hit >= 0.8, (hit, found)


def test_simhash_pairs(spark, docs):
    rows = docs.limit(20).collect()
    clones = [(r["doc_id"] + 10_000, r["text"]) for r in rows[:5]]
    df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows] + clones, "doc_id long, text string"
    )
    pairs = dedup.simhash_pairs(df, max_hamming=3).collect()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    want = {(r["doc_id"], r["doc_id"] + 10_000) for r in rows[:5]}
    assert want <= found  # identical docs → hamming 0 → must all be found


def test_ngram_jaccard_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.3).collect()
    found = {(p["id_a"], p["id_b"]): p["jaccard"] for p in pairs}
    assert (1, 2) in found
    # docs 1,2: 7 trigrams each, only the final trigram differs → J = 6/8
    assert found[(1, 2)] == pytest.approx(6 / 8)
    assert (1, 3) not in found and (2, 3) not in found


def test_brute_force_topk_matches_numpy(spark, embeddings):
    rows = embeddings.collect()
    mat = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    queries = mat[:3].copy()
    got = similarity.brute_force_topk(embeddings, queries, k=5).collect()
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = unit @ qn.T
    for qi in range(3):
        order = sorted(zip(-sims[:, qi], ids))[:5]
        want = [int(i) for _, i in order]
        mine = [r["vec_id"] for r in sorted(
            (r for r in got if r["query_id"] == qi), key=lambda r: r["rank"]
        )]
        assert mine == want, qi


def test_lsh_ann_recall(spark):
    # planted clusters: LSH recall is only meaningful when neighbors are
    # actually closer than random (uniform-random vectors have none)
    rng = np.random.Generator(np.random.PCG64(7))
    centers = rng.standard_normal((5, 64))
    vecs, rows = [], []
    vid = 0
    for c in centers:
        for _ in range(30):
            v = c + 0.05 * rng.standard_normal(64)
            rows.append((vid, v.astype(np.float32).tolist()))
            vecs.append(v)
            vid += 1
    embeddings = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = np.stack(centers)
    exact = similarity.brute_force_topk(embeddings, queries, k=10).collect()
    approx = similarity.lsh_ann_topk(embeddings, queries, k=10, n_planes=8).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert np.mean(recalls) >= 0.8, recalls  # clustered data, multiprobe LSH


def test_text_analysis_columns(spark, docs):
    out = docs.select(
        "doc_id", "lang",
        text.token_count(F.col("text")).alias("n_tok"),
        text.subword_count(F.col("text")).alias("n_sub"),
        text.quality_score(F.col("text")).alias("q"),
        text.lang_id(F.col("text")).alias("lang_guess"),
        text.fingerprint_md5(F.col("text")).alias("fp"),
    ).collect()
    for r in out:
        assert r["n_tok"] > 0 and r["n_sub"] >= r["n_tok"] // 2
        assert 0.0 <= r["q"] <= 1.0
        assert len(r["fp"]) == 32
    # the synthetic docs' text is drawn from an English-ish wordlist for
    # every row; lang-id on the zh rows can't work without CJK chars, so
    # just check the column is total and produces known labels
    assert {r["lang_guess"] for r in out} <= set(text.LANG_PROFILES) | {"und", "zh"}


def test_multimodal_stages(spark):
    from crawl4ai_spark.operators.multimodal import (
        decode_rgb, feature_stage, resize_stage,
    )
    from crawl4ai_spark.sources.synth import GraphParams, synth_local

    _, _, images_pdf = synth_local(GraphParams(n_pages=12, n_domains=2), images=True)
    df = spark.createDataFrame(images_pdf)
    resized = resize_stage(df, 16, 16).collect()
    assert len(resized) == 12
    for r in resized:
        assert r["w"] == 16 and r["h"] == 16 and len(r["bytes"]) == 16 * 16 * 3
    feats = feature_stage(df, grid=4).collect()
    for r in feats:
        assert len(r["features"]) == 4 * 4 * 3
        assert all(0.0 <= x <= 1.0 for x in r["features"])
    # stubbed codec path is explicit, not silent
    with pytest.raises(NotImplementedError):
        decode_rgb(b"", "jpeg", 1, 1)


def test_null_text_dedup_ops(spark):
    # NULL cleaned_text is realistic (failed fetches): the JVM-side token
    # arrays must fold NULL → empty, not crash the Arrow worker.
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash_col(df).collect()}
    assert sh[2] == 0 and sh[3] == 0 and sh[1] != 0
    sigs = dedup.minhash_signatures(df, n_hashes=8).collect()
    assert {r["doc_id"] for r in sigs} == {1, 2, 3}
    assert dedup.ngram_jaccard_pairs(df, threshold=0.01).count() == 0


def test_ngram_hot_shingle_cap(spark, docs):
    sub = docs.limit(60).select("doc_id", "text")
    exact = dedup.ngram_jaccard_pairs(sub, threshold=0.2)
    # generous cap (no shingle is that hot) → identical output
    capped = dedup.ngram_jaccard_pairs(sub, threshold=0.2, max_shingle_df=10_000)
    key = lambda d: sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in d.collect()
    )
    assert key(exact) == key(capped)
    # a ubiquitous boilerplate shingle must be pruned by a tight cap:
    # docs share ONLY the boilerplate phrase → no surviving postings → no pairs
    boiler = spark.createDataFrame(
        [(i, f"unique{i} ipsum token{i} common shared boilerplate phrase")
         for i in range(20)],
        "doc_id long, text string",
    )
    pruned = dedup.ngram_jaccard_pairs(boiler, threshold=0.05, max_shingle_df=5)
    unpruned = dedup.ngram_jaccard_pairs(boiler, threshold=0.05)
    assert unpruned.count() > 0
    assert pruned.count() == 0


def test_embedding_neardup_pairs(spark, embeddings):
    # planted near-duplicates: slightly perturbed copies must pair with
    # their originals at high cosine; SRP banding must not go all-pairs
    emb = embeddings.select("vec_id", "embedding").limit(200)
    pert = emb.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") + 0.05).cast("float")
        ).alias("embedding"),
    )
    both = emb.unionByName(pert).cache()
    pairs = similarity.embedding_neardup_pairs(both, threshold=0.9).collect()
    planted = {(r["id_a"], r["id_b"]) for r in pairs
               if r["id_b"] == r["id_a"] + 10_000}
    n = emb.count()
    # SRP 4x8-bit banding: expect the vast majority of planted pairs back
    assert len(planted) >= int(0.85 * n)
    for r in pairs:
        assert r["cosine"] >= 0.9


def test_ivf_ann_recall_and_twin_parity(spark):
    # planted clusters (recall only meaningful with real neighbors), plus
    # the fixed-point k-means must match a sequential numpy twin exactly
    rng = np.random.Generator(np.random.PCG64(11))
    centers = rng.standard_normal((5, 64))
    rows = []
    vid = 0
    for c in centers:
        for _ in range(40):
            v = c + 0.05 * rng.standard_normal(64)
            rows.append((vid, v.astype(np.float32).tolist()))
            vid += 1
    embeddings = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = np.stack(centers)

    exact = similarity.brute_force_topk(embeddings, queries, k=10).collect()
    approx = similarity.ivf_ann_topk(
        embeddings, queries, k=10, n_centroids=8, nprobe=3, iters=3
    ).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert np.mean(recalls) >= 0.9, recalls  # nprobe=3/8 on tight clusters

    # ---- index parity: distributed fixed-point k-means == sequential twin
    _, cent_f = similarity.ivf_index(embeddings, n_centroids=8, iters=3)
    mat = np.stack([np.asarray(v, dtype=np.float32) for _, v in rows]).astype(np.float64)
    ids = np.arange(len(rows))
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    scale = 1 << 20
    fx = np.round(unit * scale).astype(np.int64)
    cent_fx = fx[np.argsort(ids, kind="stable")[:8]].copy()
    for _ in range(3):
        cf = cent_fx.astype(np.float64) / scale
        cid = np.argmax(unit @ cf.T, axis=1)
        sums = np.zeros_like(cent_fx)
        cnts = np.zeros(8, dtype=np.int64)
        np.add.at(sums, cid, fx)
        np.add.at(cnts, cid, 1)
        live = cnts > 0
        cent_fx[live] = np.floor_divide(sums[live], cnts[live, None])
    assert np.array_equal(
        np.round(cent_f * scale).astype(np.int64), cent_fx
    ), "distributed centroid arithmetic diverged from the sequential twin"


def test_stratified_sample_deterministic_and_rated(spark, docs):
    from crawl4ai_spark.operators import sampling

    rates = {"en": 1.0, "es": 0.5, "zh": 0.0}
    out = sampling.stratified_sample(
        docs, "doc_id", "lang", rates, default_rate=0.25, seed=3
    )
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {r["doc_id"] for r in
         out.repartition(7).select("doc_id").collect()}
    assert a == b, "sample must be invariant under re-partitioning"
    kept = out.groupBy("lang").count().collect()
    kept = {r["lang"]: r["count"] for r in kept}
    total = docs.groupBy("lang").count().collect()
    total = {r["lang"]: r["count"] for r in total}
    assert kept.get("en", 0) == total["en"]          # rate 1.0 keeps all
    assert "zh" not in kept                           # rate 0.0 drops all
    # rate 0.5 binomial(80, .5): 3-sigma band
    assert 18 <= kept.get("es", 0) <= 62, kept
    # seed changes the surviving set
    other = sampling.stratified_sample(
        docs, "doc_id", "lang", rates, default_rate=0.25, seed=4
    )
    c = {r["doc_id"] for r in other.select("doc_id").collect()}
    assert a != c


def test_shard_pack_contiguous_and_bounded(spark, docs):
    from crawl4ai_spark.operators import sampling

    shard_bytes = 10_000
    out = sampling.shard_pack(
        docs, "doc_id", "n_chars", shard_bytes=shard_bytes, seed=1
    ).select("doc_id", "n_chars", "pack_key", "shard_id", "shard_offset")
    rows = sorted(out.collect(), key=lambda r: (r["pack_key"], r["doc_id"]))
    cum = 0
    for r in rows:
        assert r["shard_id"] == cum // shard_bytes
        assert r["shard_offset"] == cum - r["shard_id"] * shard_bytes
        cum += r["n_chars"]
    # shard ids are dense 0..max
    ids = sorted({r["shard_id"] for r in rows})
    assert ids == list(range(len(ids)))
    # every shard except the last starts within shard_bytes of its boundary
    assert all(r["shard_offset"] < shard_bytes for r in rows)


def test_dup_ngram_stats_plants_duplicates(spark):
    from crawl4ai_spark.operators import dedup

    boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, boiler + f" unique{i} tail{i} end{i}") for i in range(5)]
    rows.append((99, "totally different words " + " ".join(f"w{j}" for j in range(10))))
    rows.append((100, "short text"))  # < n tokens
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in dedup.dup_ngram_stats(df, n=8).collect()}
    assert len(out) == 7
    for i in range(5):  # boilerplate grams shared by 5 docs
        assert out[i]["n_dup"] >= 3, out[i]
        assert out[i]["dup_frac"] > 0
    assert out[99]["n_dup"] == 0
    assert out[100]["n_grams"] == 0 and out[100]["dup_frac"] == 0.0


def test_sessionize_gap_semantics(spark):
    from datetime import datetime, timedelta

    from crawl4ai_spark.operators import sessions

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: three events inside one session, then a 31-min gap
        (0, t0, 1, 1.0),
        (1, t0 + timedelta(minutes=10), 1, 2.0),
        (2, t0 + timedelta(minutes=20), 1, 3.0),
        (3, t0 + timedelta(minutes=51), 1, 4.0),
        # user 2: exactly 30:00.000000 gap is NOT a new session (> not >=)
        (4, t0, 2, 1.5),
        (5, t0 + timedelta(minutes=30), 2, 2.5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )
    tagged = sessions.sessionize(df, gap_s=1800)
    got = {r["event_id"]: r["session_idx"] for r in tagged.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 0, 5: 0}
    stats = {
        (r["user_id"], r["session_idx"]): r
        for r in sessions.session_stats(df, gap_s=1800).collect()
    }
    assert stats[(1, 0)]["n_events"] == 3
    assert stats[(1, 0)]["duration_us"] == 20 * 60 * 1_000_000
    assert stats[(1, 0)]["total_value"] == 6.0
    assert stats[(1, 1)]["n_events"] == 1
    assert stats[(2, 0)]["n_events"] == 2


def test_sessionize_dst_timezone_invariant(spark):
    """timestampdiff on TIMESTAMP_NTZ is wall-clock: a DST session zone
    must not change sessionization (01:59 -> 03:01 across the 2024-03-10
    US spring-forward is a 62-min wall gap -> new session at gap 30 min,
    even though the instants are only 2 min apart in America/New_York)."""
    from datetime import datetime

    from crawl4ai_spark.operators import sessions

    rows = [
        (0, datetime(2024, 3, 10, 1, 59), 1, 1.0),
        (1, datetime(2024, 3, 10, 3, 1), 1, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = {r["event_id"]: r["session_idx"]
               for r in sessions.sessionize(df, gap_s=1800).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    assert got == {0: 0, 1: 1}, got


def test_session_stream_cents_half_up_and_nulls():
    """The stream's cents conversion must twin Spark's double->DECIMAL(18,2)
    cast (HALF_UP on shortest-repr digits), and NULL values contribute 0."""
    import pandas as pd

    from crawl4ai_spark.streaming.sessions import _cents

    vals = pd.Series([0.125, 4.415, 2.675, -0.125, None, 1.0])
    # float*100 + banker's rounding would give 12 / 441 / 267 / -12
    assert _cents(vals) == [13, 442, 268, -13, 0, 100]


def test_pack_sequences_budget_and_determinism(spark, docs):
    from crawl4ai_spark.operators import sampling
    from crawl4ai_spark.operators.text import token_count

    d = docs.select(
        "doc_id", "text", token_count(F.col("text")).cast("long").alias("nt")
    )
    out = sampling.pack_sequences(d, "doc_id", "nt", budget=120,
                                  seed=5, n_shards=8)
    rows = out.select("doc_id", "pack_key", "shard", "seq_id", "seq_off",
                      "nt").collect()
    assert len(rows) == d.count()
    # per (shard, seq): offsets are the next-fit prefix sums and the
    # sequence respects the budget unless it is a single oversized doc
    by_seq = {}
    for r in rows:
        by_seq.setdefault((r["shard"], r["seq_id"]), []).append(r)
    for (_s, _q), members in by_seq.items():
        members.sort(key=lambda r: (r["pack_key"], r["doc_id"]))
        fill = 0
        for m in members:
            assert m["seq_off"] == fill
            fill += m["nt"]
        assert fill <= 120 or len(members) == 1
    # sequence ids are dense per shard
    for s in {r["shard"] for r in rows}:
        ids = sorted({r["seq_id"] for r in rows if r["shard"] == s})
        assert ids == list(range(len(ids)))
    # deterministic under re-partitioning
    again = {
        (r["doc_id"], r["shard"], r["seq_id"], r["seq_off"])
        for r in sampling.pack_sequences(
            d.repartition(13), "doc_id", "nt", budget=120, seed=5, n_shards=8
        ).collect()
    }
    assert again == {(r["doc_id"], r["shard"], r["seq_id"], r["seq_off"])
                     for r in rows}


def test_recrawl_schedule_policy(spark):
    from datetime import datetime

    from crawl4ai_spark.operators.recrawl import recrawl_schedule

    t = lambda d, h=0: datetime(2024, 1, d, h)
    rows = [
        # static page: 3 fetches, no change -> base TTL (7d), last 2024-01-05
        ("s", t(1), "A"), ("s", t(3), "A"), ("s", t(5), "A"),
        # churner: changes every fetch -> TTL clamped up from base/(1+16)
        ("c", t(1), "A"), ("c", t(2), "B"), ("c", t(3), "C"),
        # single fetch: rate 0 -> base TTL
        ("one", t(6), "X"),
    ]
    df = spark.createDataFrame(
        rows, "url string, fetch_ts timestamp_ntz, content_hash string"
    )
    out = {r["url"]: r for r in
           recrawl_schedule(df, now="2024-01-08 00:00:00").collect()}
    assert out["s"]["change_rate"] == 0.0
    assert out["s"]["ttl_s"] == 604_800.0
    assert out["s"]["due"] is False  # age 3d < 7d
    assert out["c"]["change_rate"] == 1.0
    assert out["c"]["ttl_s"] == 604_800.0 / 17.0  # ~9.9h, above the 1h floor
    assert out["c"]["due"] is True  # age 5d >> 9.9h
    assert out["one"]["n_fetches"] == 1 and out["one"]["change_rate"] == 0.0
    assert out["one"]["ttl_s"] == 604_800.0


def test_stratified_topn_exact_counts(spark, docs):
    from crawl4ai_spark.operators import sampling

    out = sampling.stratified_topn(docs, "doc_id", "lang", 10, seed=2)
    counts = {r["lang"]: r["count"]
              for r in out.groupBy("lang").count().collect()}
    totals = {r["lang"]: r["count"]
              for r in docs.groupBy("lang").count().collect()}
    for lang, total in totals.items():
        assert counts[lang] == min(10, total), lang
    # deterministic under re-partitioning
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in sampling.stratified_topn(
        docs.repartition(9), "doc_id", "lang", 10, seed=2).collect()}
    assert a == b


def test_heavy_hitters_df_semantics(spark):
    from crawl4ai_spark.operators.text import heavy_hitters

    rows = [
        (0, "spark spark spark rare"),   # 'spark' repeats IN-doc: df 1
        (1, "spark table"),
        (2, "spark table"),
        (3, "unique"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["term"], r["df"]) for r in heavy_hitters(df, k=3).collect()]
    # document frequency, not term frequency; ties break lexicographically
    assert got == [("spark", 3), ("table", 2), ("rare", 1)]


# --------------------------------------------------------------------------
# remove_dup_spans — independent sequential twin (pure Python)
# --------------------------------------------------------------------------

def _twin_remove_spans(docs, n=8, min_count=2):
    import re

    def norm_toks(t):
        return [w for w in re.sub(r"\s+", " ", t).strip().lower().split(" ")
                if w]

    posting = []  # (doc, pos, gram)
    toks = {}
    for did, t in docs:
        ws = norm_toks(t)
        toks[did] = ws
        for i in range(len(ws) - n + 1):
            posting.append((did, i, " ".join(ws[i:i + n])))
    occ = {}
    for _, _, g in posting:
        occ[g] = occ.get(g, 0) + 1
    out = {}
    for did, ws in toks.items():
        covered = set()
        for d2, i, g in posting:
            if d2 == did and occ[g] >= min_count:
                covered.update(range(i, i + n))
        kept = [w for i, w in enumerate(ws) if i not in covered]
        out[did] = (" ".join(kept), len(ws), len(ws) - len(kept))
    return out


def test_remove_dup_spans_matches_twin(spark):
    from crawl4ai_spark.operators import dedup

    boiler = "subscribe to our newsletter for all the latest updates today"
    rows = [
        (0, f"unique prose alpha beta gamma delta epsilon zeta eta theta. {boiler}"),
        (1, f"{boiler} and then some totally different trailing words here"),
        (2, "short doc"),                                # < n tokens
        (3, "Entirely   Unique\ncontent with MIXED case and  spaces kept"),
        (4, f"{boiler} {boiler} middle words {boiler}"),  # within-doc repeats
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
        for r in dedup.remove_dup_spans(df, n=8).collect()
    }
    want = _twin_remove_spans(rows, n=8)
    assert got == want
    # the boilerplate run must actually be excised from both carriers
    assert boiler not in got[0][0] and boiler not in got[1][0]
    assert got[2] == ("short doc", 2, 0)       # too short to gram: untouched
    assert got[4][2] > 0                        # self-repeats removed too


def test_remove_dup_spans_partition_invariance(spark):
    from crawl4ai_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog every single day"
    rows = [(i, base + f" variant {i % 4}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dedup.remove_dup_spans(df).collect()))
    b = sorted(map(tuple, dedup.remove_dup_spans(df.repartition(11)).collect()))
    assert a == b == sorted(
        (k,) + v for k, v in _twin_remove_spans(rows).items()
    )


def test_remove_dup_spans_null_text(spark):
    # NULL text must behave as '' (n_tokens 0, nothing removed) — not the
    # F.size(NULL) = -1 nonsense row ADVICE r4 flagged
    from crawl4ai_spark.operators import dedup

    rows = [(0, "a b c d e f g h a b c d e f g h"), (1, None), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
           for r in dedup.remove_dup_spans(df, n=8, min_count=2).collect()}
    assert got[1] == ("", 0, 0)
    assert got[2] == ("", 0, 0)
    assert got[0][1] == 16


def test_ccnet_and_quality_null_text(spark):
    from crawl4ai_spark.operators.quality import (
        ccnet_perplexity, dsir_feature_stats, gopher_quality,
    )

    rows = [(0, "the cat sat on the mat with the hat"), (1, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = docs.where("doc_id = 0")
    cc = {r["doc_id"]: (r["n_tokens"], r["n_bigrams"], r["bucket"])
          for r in ccnet_perplexity(docs, tgt).collect()}
    assert cc[1] == (0, 0, "tail")  # never n_tokens = -1
    st = {r["doc_id"]: r["n_feats"] for r in dsir_feature_stats(docs, tgt).collect()}
    assert st[1] == 0
    gq = {r["doc_id"]: (r["n_words"], r["drop_reason"])
          for r in gopher_quality(docs).collect()}
    assert gq[1] == (0, "too_few_words")


# --------------------------------------------------------------------------
# semdedup — independent sequential twin (numpy only)
# --------------------------------------------------------------------------

def test_semdedup_matches_twin_and_plants(spark):
    import numpy as np
    from crawl4ai_spark.operators.similarity import semdedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant near-dups: ids 100+i are scaled copies of ids 0..9 (cosine 1)
    for i in range(10):
        rows.append((100 + i, [float(x * 1.7) for x in base[i]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {r["vec_id"]: (r["centroid"], r["keep"], r["dup_of"])
           for r in semdedup(df, threshold=0.95, n_centroids=4).collect()}

    # twin: same fixed-point k-means + per-cluster keep-lowest-id prune
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    scale = 1 << 20
    fx = np.round(unit * scale).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    cent_fx = fx[order[:4]].copy()
    for _ in range(3):
        cent_f = cent_fx.astype(np.float64) / scale
        cid = np.argmax(unit @ cent_f.T, axis=1)
        sums = np.zeros_like(cent_fx)
        cnts = np.zeros(4, dtype=np.int64)
        np.add.at(sums, cid, fx)
        np.add.at(cnts, cid, 1)
        live = cnts > 0
        cent_fx[live] = np.floor_divide(sums[live], cnts[live, None])
    cent_f = cent_fx.astype(np.float64) / scale
    cid = np.argmax(unit @ cent_f.T, axis=1)
    want = {}
    for c in sorted(set(int(x) for x in cid)):
        sel = np.nonzero(cid == c)[0]
        sel = sel[np.argsort(ids[sel], kind="stable")]
        u, cids = unit[sel], ids[sel]
        sim = u @ u.T
        for j in range(len(sel)):
            over = np.nonzero(sim[:j, j] > 0.95)[0]
            want[int(cids[j])] = (
                c, not len(over),
                int(cids[over[0]]) if len(over) else -1)
    assert got == want
    # every planted copy must be dropped as a dup of its original
    for i in range(10):
        assert got[100 + i] == (got[i][0], False, i)


def test_semdedup_giant_cluster_blocked(spark):
    """Planted skew: every vector lands in ONE cluster (n_centroids=1).
    With block_elems tiny the pairwise pass must tile into many small
    buffers (peak ≤ block_elems floats, here 64 — vs m²=22.5k unblocked)
    and return exactly the unblocked result."""
    import numpy as np
    from crawl4ai_spark.operators.similarity import semdedup

    rng = np.random.default_rng(11)
    base = rng.normal(size=(120, 6))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for i in range(20):  # planted dups across the whole id range
        rows.append((500 + i, [float(x * 0.3) for x in base[i * 5]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def run(cap):
        return sorted(
            tuple(r) for r in semdedup(
                df, threshold=0.95, n_centroids=1, block_elems=cap
            ).collect())

    blocked = run(64)            # B = 64 // 140 -> 1 column at a time
    unblocked = run(1 << 24)
    assert blocked == unblocked
    by_id = {t[0]: t for t in blocked}
    unit = base / np.linalg.norm(base, axis=1, keepdims=True)
    for i in range(20):
        # each planted copy is dropped onto its LOWEST above-threshold
        # lower-id neighbor (usually i*5; occasionally an even lower id
        # that happens to sit within 0.95 of base[i*5])
        _, _, keep, dup = by_id[500 + i]
        assert keep is False and 0 <= dup < 500
        assert dup == i * 5 or float(unit[dup] @ unit[i * 5]) > 0.95


def test_corpus_stats_rollup(spark):
    from crawl4ai_spark.operators.text import corpus_stats

    rows = [
        (0, "one two three", "en"),
        (1, "uno dos", "es"),
        (2, "four five six seven", "en"),
        (3, "", "en"),
        (4, "solo", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["lang"]: (r["n_docs"], r["n_tokens"], r["n_chars"],
                       r["max_tokens"], r["min_tokens"], r["mean_tokens"])
           for r in corpus_stats(df).collect()}
    assert got["en"] == (3, 7, 32, 4, 0, round(7 / 3, 6))
    assert got["es"] == (1, 2, 7, 2, 2, 2.0)
    assert got["?"] == (1, 1, 4, 1, 1, 1.0)
    assert got["*"] == (5, 10, 43, 4, 0, 2.0)


def test_importance_resample_deterministic(spark):
    import hashlib
    import math
    from crawl4ai_spark.operators.sampling import importance_resample

    rows = [(i, (i % 7) * 250_000 - 500_000) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, llr_micro long")
    got = [(r["doc_id"], r["race_micro"], r["draw_rank"])
           for r in importance_resample(df, n=25, seed=11).collect()]
    # twin: identical race arithmetic in pure python
    want = []
    for did, s in rows:
        u = (int(hashlib.md5(f"{did}#11".encode()).hexdigest()[:12], 16)
             + 1.0) / 16 ** 12
        race = int(round(float(s) + 1e6 * (-math.log(-math.log(u)))))
        want.append((did, race))
    want = sorted(want, key=lambda t: (-t[1], t[0]))[:25]
    want = [(d, r, k + 1) for k, (d, r) in enumerate(want)]
    assert got == want
    # partitioning invariance
    got2 = [(r["doc_id"], r["race_micro"], r["draw_rank"])
            for r in importance_resample(df.repartition(13), n=25,
                                         seed=11).collect()]
    assert got2 == want
    # higher-weight docs dominate the draw: mean weight of the drawn set
    # must exceed the corpus mean
    drawn = {d for d, _, _ in got}
    mean_drawn = sum(s for d, s in rows if d in drawn) / len(drawn)
    mean_all = sum(s for _, s in rows) / len(rows)
    assert mean_drawn > mean_all


def test_ann_eval_hand_case(spark):
    from crawl4ai_spark.operators.similarity import ann_eval

    # exact: q0 -> {1,2,3}, q1 -> {4,5}; approx: q0 -> {2,3,9},
    # q1 -> {} (missing entirely — empty LSH bucket), q2 -> {7} (approx
    # finds a query the exact table lacks: full-join edge)
    exact = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3), (0, 7, 4), (1, 4, 1), (1, 5, 2),
         (2, 9, 4)],  # rank-4 rows ignored at k=3
        "query_id long, vec_id long, rank long")
    approx = spark.createDataFrame(
        [(0, 2, 1), (0, 3, 2), (0, 9, 3), (2, 7, 1)],
        "query_id long, vec_id long, rank long")
    got = {r["query_id"]: r for r in ann_eval(approx, exact, k=3).collect()}
    assert set(got) == {0, 1, 2}
    q0 = got[0]
    assert (q0["n_exact"], q0["n_approx"], q0["n_hits"]) == (3, 3, 2)
    assert (q0["recall_bp"], q0["precision_bp"]) == (6666, 6666)
    q1 = got[1]  # empty approx side: zero hits, precision denominator 0
    assert (q1["n_exact"], q1["n_approx"], q1["n_hits"]) == (2, 0, 0)
    assert (q1["recall_bp"], q1["precision_bp"]) == (0, 0)
    q2 = got[2]  # empty exact side at k
    assert (q2["n_exact"], q2["n_approx"], q2["n_hits"]) == (0, 1, 0)
    assert (q2["recall_bp"], q2["precision_bp"]) == (0, 0)
    assert all(r["k"] == 3 for r in got.values())


def test_ann_eval_lsh_vs_brute(spark):
    import numpy as np
    from crawl4ai_spark.operators.similarity import (
        ann_eval, brute_force_topk, lsh_ann_topk)

    rng = np.random.RandomState(7)
    vecs = rng.randn(300, 16).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = vecs[:3].astype(np.float64)  # queries ARE corpus members
    exact = brute_force_topk(emb, qs, k=10)
    approx = lsh_ann_topk(emb, qs, k=10, n_planes=6)
    got = {r["query_id"]: r for r in ann_eval(approx, exact, 10).collect()}
    assert set(got) == {0, 1, 2}
    for qid, r in got.items():
        # the query's own vector hashes to the query's own bucket:
        # recall is always > 0, and rank-1 self-hit bounds it below
        assert r["n_hits"] >= 1
        assert 0 < r["recall_bp"] <= 10000
        assert r["precision_bp"] == (10000 * r["n_hits"]) // r["n_approx"]


def test_incremental_dedup_statuses(spark):
    from crawl4ai_spark.operators.dedup import (
        fingerprint_store, incremental_dedup, updated_fingerprint_store)

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "Alpha   beta"), (3, "gamma")],
        "doc_id long, text string")
    store = fingerprint_store(corpus)
    assert {(r["keep_id"]) for r in store.collect()} == {1, 3}  # 2 folds to 1

    batch = spark.createDataFrame(
        [(10, "ALPHA BETA"),      # dup_in_store (normalizes to alpha beta)
         (11, "delta"),           # new
         (12, "delta "),          # dup_in_batch of 11 (store wins never fires)
         (13, "epsilon")],        # new
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in incremental_dedup(batch, store).collect()}
    assert got[10]["status"] == "dup_in_store" and got[10]["dup_of"] == 1
    assert got[11]["status"] == "new" and got[11]["dup_of"] == -1
    assert got[12]["status"] == "dup_in_batch" and got[12]["dup_of"] == 11
    assert got[13]["status"] == "new"
    assert {d for d, r in got.items() if r["keep"]} == {11, 13}

    # the updated store: old fingerprints + the two kept batch rows
    st2 = updated_fingerprint_store(store, incremental_dedup(batch, store))
    assert {r["keep_id"] for r in st2.collect()} == {1, 3, 11, 13}
    # idempotence: replaying the same batch against the updated store
    # finds everything already released
    replay = incremental_dedup(batch, st2)
    assert replay.filter("keep").count() == 0
    assert {r["status"] for r in replay.collect()} == {"dup_in_store"}


def test_incremental_dedup_partition_invariance(spark):
    from crawl4ai_spark.operators.dedup import (
        fingerprint_store, incremental_dedup)

    corpus = spark.createDataFrame(
        [(i, f"doc {i % 11}") for i in range(0, 120, 3)],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(i, f"doc {i % 17}") for i in range(1, 120, 2)],
        "doc_id long, text string")
    store = fingerprint_store(corpus)
    a = sorted(map(tuple, incremental_dedup(
        batch, store).select("doc_id", "status", "dup_of").collect()))
    b = sorted(map(tuple, incremental_dedup(
        batch.repartition(13), store.repartition(7))
        .select("doc_id", "status", "dup_of").collect()))
    assert a == b and len(a) == 60


def test_revalidation_plan_actions(spark):
    from crawl4ai_spark.operators.recrawl import revalidation_plan

    from datetime import datetime

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # (url, fetched_at, ttl_s, etag, last_modified, page_bytes)
        ("fresh", t0, 86400, None, None, 100),
        ("etag", t0, 3600, 'W/"abc"', "Mon", 200),
        ("lm", t0, 3600, "", "Mon, 01 Jan", 300),
        ("bare", t0, 3600, None, "", 400),
        ("edge", t0, 7200, None, None, 500),  # age==ttl
    ]
    df = spark.createDataFrame(
        rows, "url string, fetched_at timestamp_ntz, ttl_s long, "
              "etag string, last_modified string, page_bytes long")
    got = {r["url"]: r for r in revalidation_plan(
        df, now="2024-01-01 02:00:00").collect()}
    assert got["fresh"]["action"] == "serve_cache"
    assert got["fresh"]["cond_header"] is None
    assert got["fresh"]["reval_bytes"] == 0
    # ETag wins over Last-Modified (RFC 9110 precedence)
    assert (got["etag"]["action"], got["etag"]["cond_header"]) == (
        "revalidate", "if-none-match")
    assert got["etag"]["reval_bytes"] == 200
    assert (got["lm"]["action"], got["lm"]["cond_header"]) == (
        "revalidate", "if-modified-since")
    assert got["bare"]["action"] == "refetch"
    assert got["bare"]["reval_bytes"] == 0
    # age == ttl is stale (>=)
    assert got["edge"]["action"] == "refetch"
    assert all(r["age_s"] == 7200 for r in got.values())


def test_incremental_dedup_string_ids_keep_lineage(spark):
    from crawl4ai_spark.operators.dedup import (
        fingerprint_store, incremental_dedup)

    corpus = spark.createDataFrame(
        [("docA", "released text")], "doc_id string, text string")
    store = fingerprint_store(corpus)
    batch = spark.createDataFrame(
        [("doc7", "released text"),      # dup_in_store → docA
         ("doc9", "fresh text"), ("doc8", "fresh text"),  # batch twins
         ("docZ", "unique")],
        "doc_id string, text string")
    got = {r["doc_id"]: r for r in
           incremental_dedup(batch, store).collect()}
    assert got["doc7"]["status"] == "dup_in_store"
    assert got["doc7"]["dup_of"] == "docA"     # NOT NULL
    assert got["doc9"]["status"] == "dup_in_batch"
    assert got["doc9"]["dup_of"] == "doc8"     # min string id wins
    assert got["docZ"]["dup_of"] == "-1"
