"""End-to-end image+caption corpus pipeline: the full release path a
training-data build runs over the payload table, composed from the
individually-verified operators — ingest hygiene (sniff) → curation gate →
pHash-from-pixels → Hamming near-dup clusters → canonical survivors →
alignment gate → aspect buckets + crop plans → WebDataset shard plan.

Asserts the cross-stage conservation invariants the per-operator tests
cannot see: counts flow without loss, dedup clusters cover exactly the
curated survivors, every canonical row gets a crop plan that fits its
bucket, and the export plan accounts for every sample byte."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.dedup import dedup_clusters, phash_pairs
from crawl4ai_spark.operators.export import webdataset_plan, webdataset_shards
from crawl4ai_spark.operators.multimodal import (
    aspect_buckets,
    crop_plan,
    curate_image_captions,
    dct_phash_stage,
    feature_stage,
    sniff_format,
)
from crawl4ai_spark.operators.similarity import clip_alignment_gate
from crawl4ai_spark.sources import synth


@pytest.fixture(scope="module")
def corpus(spark):
    p = synth.GraphParams(n_pages=140, img_min=16, img_max=64)
    _, _, images = synth.synth_tables(spark, p)
    images = images.cache()
    images.count()
    yield images
    images.unpersist()


def test_image_corpus_pipeline_end_to_end(spark, corpus):
    n_total = corpus.count()

    # 1. ingest hygiene: every fixture payload sniffs clean
    sniffed = sniff_format(corpus)
    assert sniffed.filter(~F.col("fmt_match")).count() == 0
    assert sniffed.filter(F.col("header_ok") == False).count() == 0  # noqa: E712

    # 2. curation gate: keep + drop partition the corpus
    curated = curate_image_captions(corpus)
    kept = curated.filter(F.col("keep"))
    n_kept = kept.count()
    assert n_kept + curated.filter(~F.col("keep")).count() == n_total
    assert 0 < n_kept < n_total  # fixture exercises both sides

    # 3. pHash from pixels over the survivors, then Hamming clusters
    hashed = dct_phash_stage(kept).withColumnRenamed("dct_phash", "phash")
    pairs = phash_pairs(hashed, max_hamming=10)
    clusters = dedup_clusters(hashed, pairs, "image_id")
    assert clusters.count() == n_kept  # every survivor labeled
    n_canonical = clusters.filter(F.col("canonical")).count()
    assert 0 < n_canonical <= n_kept
    # at least one fixture near-dup group survived curation -> a real merge
    if pairs.count() > 0:
        assert n_canonical < n_kept

    reps = kept.join(
        clusters.filter(F.col("canonical")).select("image_id"), "image_id")
    assert reps.count() == n_canonical

    # 4. alignment gate: self-aligned quantized features always pass
    feats = feature_stage(reps, grid=2)
    qvec = F.transform(
        "features", lambda x: F.round(x * 16384).cast("int"))
    pairs_df = feats.select(
        "image_id", qvec.alias("img_vec"), qvec.alias("txt_vec"))
    gated = clip_alignment_gate(pairs_df, tau2_num=81, tau2_den=100)
    assert gated.filter(~F.col("keep")).count() == 0
    assert gated.filter(F.col("cos2_bp") != 10_000).count() == 0

    # 5. batch shaping: every canonical row gets a bucket and a crop plan
    #    that covers its target exactly
    planned = crop_plan(aspect_buckets(reps))
    assert planned.count() == n_canonical
    bad = planned.filter(
        (F.col("fit_w") < F.col("target_w"))
        | (F.col("fit_h") < F.col("target_h"))
        | (F.col("crop_x") < 0) | (F.col("crop_y") < 0)
        | (F.col("crop_x") + F.col("target_w") > F.col("fit_w"))
        | (F.col("crop_y") + F.col("target_h") > F.col("fit_h")))
    assert bad.count() == 0

    # 6. export plan: every canonical sample lands in exactly one shard,
    #    offsets are within-shard consistent, bytes conserve
    sized = reps.select(
        "image_id",
        F.length("bytes").cast("long").alias("img_size"),
        F.length("caption").cast("long").alias("txt_size"))
    plan = webdataset_plan(sized, shard_bytes=65_536, seed=3)
    assert plan.count() == n_canonical
    shards = webdataset_shards(plan)
    agg = shards.agg(
        F.sum("n_samples").alias("n"), F.sum("data_bytes").alias("b")
    ).collect()[0]
    total_bytes = plan.agg(F.sum("sample_bytes")).collect()[0][0]
    assert agg["n"] == n_canonical and agg["b"] == total_bytes
    # member offsets are disjoint and ordered within each sample
    bad_off = plan.filter(
        (F.col("off_img") != F.col("sample_off"))
        | (F.col("off_txt") <= F.col("off_img")))
    assert bad_off.count() == 0
