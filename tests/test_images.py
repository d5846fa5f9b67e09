"""Codec round-trips, per-row invariants (north_rule: exact for lossless,
PSNR ≥ 40 dB for the lossy path, captions byte-equal end-to-end), and the
G4 image-score golden table (content_scraping_strategy.py:320-362)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark import codecs
from crawl4ai_spark.functions.images import (
    decode_stage,
    fetch_payload,
    image_keep,
    image_score,
)
from crawl4ai_spark.sources.synth import GraphParams, image_pixels, synth_local


def test_codec_roundtrip_lossless():
    px = image_pixels("img_x", 33, 17, 42)
    for fmt in ("raw", "ppm", "png"):
        data = codecs.encode(px, fmt)
        back = codecs.decode(data, fmt, 33, 17)
        assert (back == px).all(), fmt


def test_codec_qlossy_psnr():
    px = image_pixels("img_y", 64, 48, 42)
    back = codecs.decode(codecs.encode(px, "qlossy"), "qlossy", 64, 48)
    p = codecs.psnr(px, back)
    assert 40.0 <= p < 45.0, p  # genuinely lossy AND within budget


def test_phash_deterministic_and_sensitive():
    px = image_pixels("img_z", 32, 32, 42)
    h1 = codecs.phash64(px)
    assert h1 == codecs.phash64(px.copy())
    other = image_pixels("img_other", 32, 32, 42)
    assert h1 != codecs.phash64(other)


def test_decode_stage_invariants(spark):
    p = GraphParams(n_pages=40, n_domains=4)
    _, _, images_pdf = synth_local(p, images=True)
    assert set(images_pdf["fmt"]) == {"raw", "ppm", "png", "qlossy"}
    df = spark.createDataFrame(images_pdf)
    out = decode_stage(df, seed=p.seed).collect()
    assert len(out) == 40
    for r in out:
        assert r["decoded_w"] == r["w"] and r["decoded_h"] == r["h"]
        assert r["phash_match"], r["image_id"]
        if r["fmt"] == "qlossy":
            assert r["psnr"] >= 40.0, (r["image_id"], r["psnr"])
            assert not r["pixel_exact"]
        else:
            assert r["pixel_exact"], (r["image_id"], r["fmt"])
    # captions byte-equal through the Spark round-trip
    got = {r["image_id"]: r["caption"] for r in out}
    want = dict(zip(images_pdf["image_id"], images_pdf["caption"]))
    assert got == want


def test_payload_join_caption_passthrough(spark):
    from crawl4ai_spark.plans.frontier import CrawlConfig, deep_crawl
    from crawl4ai_spark.sources.synth import url_of

    p = GraphParams(n_pages=40, n_domains=4)
    pages_pdf, links_pdf, images_pdf = synth_local(p, images=True)
    pages_df = spark.createDataFrame(pages_pdf)
    links_df = spark.createDataFrame(links_pdf)
    images_df = spark.createDataFrame(images_pdf)
    run = deep_crawl(spark, [url_of(0, p)], pages_df, links_df,
                     CrawlConfig(strategy="bfs", max_depth=2))
    payload = fetch_payload(run.results, images_df)
    rows = payload.select("image_id", "caption").collect()
    assert rows, "payload join produced no rows"
    want = dict(zip(images_pdf["image_id"], images_pdf["caption"]))
    for r in rows:
        assert r["caption"] == want[r["image_id"]]


# G4 golden table: (w,h,alt,index,total,src,data_src,srcset,data_srcset,in_picture) -> score
G4_CASES = [
    ((200, 200, "desc", 0, 10, "a.jpg", "", "", "", False), 5),  # w,h,alt,early,fmt
    ((100, 100, "", 9, 10, "a.bin", "", "", "", False), 0),
    ((151, 150, "x", 4, 10, "a.png", "", "b.png 2x", "", True), 7 - 1),  # h not >150
    ((None, None, "", 0, 2, "", "", "", "", False), 1),  # only early-position
    ((200, 200, "alt", 5, 10, "photo.webp", "", "", "", False), 4),
]


def test_image_score_golden(spark):
    rows = [tuple(c[0]) for c in G4_CASES]
    df = spark.createDataFrame(
        rows,
        "w int, h int, alt string, idx int, total int, src string, data_src string, "
        "srcset string, data_srcset string, in_picture boolean",
    )
    col = image_score(
        F.col("w"), F.col("h"), F.col("alt"), F.col("idx"), F.col("total"),
        F.col("src"), F.col("data_src"), F.col("srcset"), F.col("data_srcset"),
        F.col("in_picture"),
    )
    got = [r["s"] for r in df.select(col.alias("s")).collect()]
    want = [c[1] for c in G4_CASES]
    assert got == want
    kept = [r["k"] for r in df.select(image_keep(col).alias("k")).collect()]
    assert kept == [s > 2 for s in want]


def test_image_curation_rules(spark):
    from crawl4ai_spark.operators.multimodal import curate_image_captions

    rows = [
        ("ok", 32, 32, "one small brown fox jumps"),
        ("tiny", 8, 200, "one small brown fox jumps"),      # too_small wins over aspect
        ("wide", 64, 24, "one small brown fox jumps"),       # 64 > 2*24
        ("short", 32, 32, "hi there"),
        ("long", 32, 32, " ".join(f"w{i}" for i in range(31))),
        ("repeat", 32, 32, "spam spam spam spam eggs"),      # 2/5 distinct
        ("digits", 32, 32, "123 456 789 000 111"),           # alpha ratio 0
    ]
    df = spark.createDataFrame(rows, "image_id string, w int, h int, caption string")
    got = {r["image_id"]: r["drop_reason"]
           for r in curate_image_captions(df).collect()}
    assert got == {
        "ok": None, "tiny": "too_small", "wide": "bad_aspect",
        "short": "caption_short", "long": "caption_long",
        "repeat": "repetitive", "digits": "low_alpha",
    }


def test_aspect_buckets_rational_boundaries(spark):
    from crawl4ai_spark.operators.multimodal import aspect_buckets

    rows = [
        ("a", 2000, 1000),  # w/h == 2 exactly -> wide2 (>= boundary)
        ("b", 1999, 1000),  # just under 2 -> wide
        ("c", 4000, 3000),  # w/h == 4/3 exactly -> wide
        ("d", 1000, 1000),  # square
        ("e", 3000, 4000),  # w/h == 3/4 exactly -> square
        ("f", 2999, 4000),  # just under 3/4 -> tall
        ("g", 1000, 2000),  # w/h == 1/2 exactly -> tall
        ("h", 999, 2000),   # under 1/2 -> tall2
        ("i", 1024, 1024),  # exactly 1 MP -> xl tier
        ("j", 1023, 1024),  # just under -> large tier
        ("k", 100, 100),    # small tier
    ]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    out = {r["image_id"]: r for r in aspect_buckets(df).collect()}
    assert out["a"]["bucket"] == "wide2" and out["a"]["target_w"] == 1408
    assert out["b"]["bucket"] == "wide"
    assert out["c"]["bucket"] == "wide"
    assert out["d"]["bucket"] == "square" and out["d"]["target_h"] == 1024
    assert out["e"]["bucket"] == "square"
    assert out["f"]["bucket"] == "tall"
    assert out["g"]["bucket"] == "tall" and out["g"]["target_h"] == 1152
    assert out["h"]["bucket"] == "tall2" and out["h"]["target_w"] == 704
    assert out["i"]["res_tier"] == "xl"
    assert out["j"]["res_tier"] == "large"
    assert out["k"]["res_tier"] == "small"


def test_crop_plan_hand_cases(spark):
    from crawl4ai_spark.operators.multimodal import aspect_buckets, crop_plan

    rows = [
        ("sq", 1000, 1000),   # square bucket 1024x1024, symmetric upscale
        ("pt", 700, 1000),    # tall bucket 896x1152: fit (896,1280), crop_y 64
        ("ls", 2000, 1000),   # wide2 bucket 1408x704: equality -> width binds
        ("od", 999, 1000),    # square bucket, odd remainder centering
    ]
    df = spark.createDataFrame(rows, ["image_id", "w", "h"])
    got = {r["image_id"]: (r["fit_w"], r["fit_h"], r["crop_x"], r["crop_y"])
           for r in crop_plan(aspect_buckets(df)).collect()}
    assert got["sq"] == (1024, 1024, 0, 0)
    assert got["pt"] == (896, 1280, 0, 64)
    # 2000x1000 = exactly 2:1 -> wide2 (1408x704); w*th=1408000 <= h*tw=1408000
    # -> width binds: fit=(1408, round(1000*1408/2000)=704) -> no crop
    assert got["ls"] == (1408, 704, 0, 0)
    # 999x1000 -> square (3/4 <= r < 4/3): w*th=999*1024 <= h*tw=1000*1024
    # -> fit_w=1024, fit_h=round(1000*1024/999)=round(1025.02)=1025 -> crop_y 0
    assert got["od"] == (1024, 1025, 0, 0)
    # invariant: the crop window always fits inside the resized image
    big = spark.range(1, 400).select(
        F.concat(F.lit("i"), F.col("id")).alias("image_id"),
        (F.col("id") % 37 * 53 + 24).cast("int").alias("w"),
        (F.col("id") % 29 * 67 + 24).cast("int").alias("h"))
    chk = crop_plan(aspect_buckets(big)).where(
        (F.col("crop_x") < 0) | (F.col("crop_y") < 0)
        | (F.col("crop_x") + F.col("target_w") > F.col("fit_w"))
        | (F.col("crop_y") + F.col("target_h") > F.col("fit_h"))
    ).count()
    assert chk == 0


def test_image_corpus_stats_rollup(spark):
    from crawl4ai_spark.operators.multimodal import image_corpus_stats

    rows = [
        ("a", b"12345678", 2, 3, "png", "cap one", 7),
        ("b", b"123", 4, 5, "png", None, 7),          # NULL caption, dup phash
        ("c", b"12", 10, 10, "raw", "xy", 9),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    got = {r["fmt"]: r for r in image_corpus_stats(df).collect()}
    assert set(got) == {"png", "raw", "*"}
    png = got["png"]
    assert (png["n_images"], png["n_bytes"], png["n_pixels"]) == (2, 11, 26)
    assert (png["min_pixels"], png["max_pixels"]) == (6, 20)
    assert png["n_distinct_phash"] == 1         # dup phash collapses
    assert png["caption_chars"] == 7            # NULL caption counts 0
    assert png["mean_caption_chars"] == 3.5
    tot = got["*"]
    assert (tot["n_images"], tot["n_distinct_phash"]) == (3, 2)
    assert tot["n_pixels"] == 126


def test_png_walk_hand_cases():
    import zlib

    import numpy as np

    from crawl4ai_spark import codecs
    from crawl4ai_spark.operators.multimodal import png_walk

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    clean = codecs.encode_png(px)
    r = png_walk(clean)
    assert r["is_png"] and r["n_chunks"] == 3 and r["has_iend"]
    assert (r["ihdr_w"], r["ihdr_h"]) == (8, 8)
    assert r["n_crc_bad"] == 0 and not r["truncated"]
    assert r["trailing_bytes"] == 0 and r["idat_bytes"] > 0

    # flip a byte inside the IDAT payload: exactly one CRC goes bad
    pos = 33 + 8 + 2
    bad = clean[:pos] + bytes([clean[pos] ^ 0xFF]) + clean[pos + 1:]
    r = png_walk(bad)
    assert r["n_crc_bad"] == 1 and r["first_bad_tag"] == "IDAT"
    assert r["has_iend"]  # structure is intact, only the checksum lies

    # truncated mid-IEND
    r = png_walk(clean[:-5])
    assert r["truncated"] and not r["has_iend"]

    # trailing garbage after IEND
    r = png_walk(clean + b"xyz")
    assert r["trailing_bytes"] == 3 and r["has_iend"] and not r["truncated"]

    # not a PNG at all
    r = png_walk(b"P6\n8 8\n255\n" + b"\x00" * 192)
    assert r["is_png"] is False and r["n_chunks"] is None

    # engine CRC path == independent twin CRC
    from crawl4ai_spark.oracle.expected import _crc32_twin
    blob = b"IDAT" + bytes(range(256))
    assert _crc32_twin(blob) == zlib.crc32(blob) & 0xFFFFFFFF


def test_png_chunk_audit_stage(spark):
    import numpy as np

    from crawl4ai_spark import codecs
    from crawl4ai_spark.operators.multimodal import png_chunk_audit

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    clean = codecs.encode_png(px)
    rows = [("ok", bytearray(clean)),
            ("cut", bytearray(clean[:-6])),
            ("raw", bytearray(b"\x00" * 48)),
            ("null", None)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r for r in png_chunk_audit(df).collect()}
    assert got["ok"]["has_iend"] and got["ok"]["n_chunks"] == 3
    assert got["cut"]["truncated"] and not got["cut"]["has_iend"]
    assert got["raw"]["is_png"] is False
    assert got["null"]["is_png"] is False
    # partitioning invariance
    again = {r["image_id"]: r
             for r in png_chunk_audit(df.repartition(3)).collect()}
    assert {k: tuple(v) for k, v in got.items()} == {
        k: tuple(v) for k, v in again.items()}


def test_caption_quality_gate(spark):
    from crawl4ai_spark.operators.multimodal import caption_quality_gate

    rows = [
        ("good", "a scenic view of the harbor at dusk"),
        ("ph", "  Photo "),                    # placeholder (trim+case)
        ("fn1", "IMG_1234"),
        ("fn2", "dsc-0042"),
        ("fn3", "sunset over the bay.jpeg"),   # extension suffix
        ("short", "x"),
        ("nullcap", None),
        ("url", "check https://ex.test/full for more"),
        ("www", "see www.example.com gallery"),
        ("soup", "!!! ### 123 456 789 000"),
        ("digits ok", "room 12 with 3 windows and a view"),
    ]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    got = {r["image_id"]: r for r in caption_quality_gate(df).collect()}
    assert got["good"]["keep"] and got["good"]["drop_reason"] is None
    assert got["ph"]["drop_reason"] == "placeholder"
    assert got["fn1"]["drop_reason"] == "filename_like"
    assert got["fn2"]["drop_reason"] == "filename_like"
    assert got["fn3"]["drop_reason"] == "filename_like"
    assert got["short"]["drop_reason"] == "too_short"
    assert got["nullcap"]["drop_reason"] == "too_short"
    assert got["nullcap"]["caption_chars"] == 0
    assert got["url"]["drop_reason"] == "has_url"
    assert got["www"]["drop_reason"] == "has_url"
    assert got["soup"]["drop_reason"] == "low_alpha"
    assert got["digits ok"]["keep"]  # digits fine while alpha >= 50%
