"""Round-5 image-payload tier: format sniffing, CLIP-style alignment
gating, WebDataset export planning, DCT pHash from pixels."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark import codecs
from crawl4ai_spark.operators.export import (
    tar_member_bytes,
    webdataset_plan,
    webdataset_shards,
)
from crawl4ai_spark.operators.multimodal import dct_phash_stage, sniff_format
from crawl4ai_spark.operators.similarity import clip_alignment_gate
from crawl4ai_spark.sources import synth


# ------------------------------------------------------------- sniff_format

def _px(w, h, seed=3):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _images_df(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_sniff_detects_each_codec(spark):
    px = _px(12, 9)
    rows = [
        ("a", codecs.encode(px, "png"), 12, 9, "png"),
        ("b", codecs.encode(px, "ppm"), 12, 9, "ppm"),
        ("c", codecs.encode(px, "qlossy"), 12, 9, "qlossy"),
        ("d", codecs.encode(px, "raw"), 12, 9, "raw"),
    ]
    out = {r["image_id"]: r for r in sniff_format(_images_df(spark, rows)).collect()}
    for iid, fmt in (("a", "png"), ("b", "ppm"), ("c", "qlossy"), ("d", "raw")):
        assert out[iid]["sniffed_fmt"] == fmt
        assert out[iid]["fmt_match"] is True
    assert out["a"]["header_ok"] is True
    assert out["b"]["header_ok"] is True
    assert out["c"]["header_ok"] is None  # needs a decompress — decode_stage's job
    assert out["d"]["header_ok"] is True


def test_sniff_flags_mislabel_and_bad_header(spark):
    px = _px(12, 9)
    rows = [
        # declared raw, actually png
        ("m1", codecs.encode(px, "png"), 12, 9, "raw"),
        # declared dims disagree with the PNG IHDR
        ("m2", codecs.encode(px, "png"), 20, 9, "png"),
        # ppm header dims disagree with declared
        ("m3", codecs.encode(px, "ppm"), 12, 10, "ppm"),
        # raw with a truncated payload
        ("m4", codecs.encode(px, "raw")[:-5], 12, 9, "raw"),
    ]
    out = {r["image_id"]: r for r in sniff_format(_images_df(spark, rows)).collect()}
    assert out["m1"]["sniffed_fmt"] == "png" and out["m1"]["fmt_match"] is False
    assert out["m1"]["header_ok"] is True  # IHDR matches declared w/h
    assert out["m2"]["header_ok"] is False
    assert out["m3"]["header_ok"] is False
    assert out["m4"]["sniffed_fmt"] == "raw" and out["m4"]["header_ok"] is False


def test_sniff_matches_fixture_corpus(spark):
    # every fixture row sniffs back to its declared fmt with a valid
    # header (qlossy: NULL by contract)
    p = synth.GraphParams(n_pages=60)
    _, _, images = synth.synth_tables(spark, p)
    out = sniff_format(images).collect()
    assert len(out) == 60
    for r in out:
        assert r["fmt_match"] is True, r
        assert r["header_ok"] is (None if r["fmt"] == "qlossy" else True), r


# ------------------------------------------------------ clip_alignment_gate

def _pairs_df(spark):
    rows = [
        # identical vectors: cos = 1
        (0, [1, 2, 3], [1, 2, 3]),
        # orthogonal: cos = 0
        (1, [1, 0, 0], [0, 5, 0]),
        # opposite: cos = -1
        (2, [1, 2, 0], [-1, -2, 0]),
        # cos = 0.6 exactly: (3,4)·(1,0) = 3, |a|=5, |b|=1
        (3, [3, 4, 0], [1, 0, 0]),
        # zero vector
        (4, [0, 0, 0], [1, 2, 3]),
    ]
    return spark.createDataFrame(
        rows, "pair_id long, img_vec array<int>, txt_vec array<int>"
    )


def test_clip_gate_exact_decisions(spark):
    # tau^2 = 0.36 exactly — the cos=0.6 row sits ON the boundary (kept:
    # the decision is >=, exact integers, no float wobble)
    out = {r["pair_id"]: r for r in clip_alignment_gate(
        _pairs_df(spark), tau2_num=36, tau2_den=100).collect()}
    assert out[0]["keep"] is True and out[0]["cos2_bp"] == 10_000
    assert out[1]["keep"] is False and out[1]["cos2_bp"] == 0
    assert out[2]["keep"] is False and out[2]["cos2_bp"] == -10_000
    assert out[3]["keep"] is True and out[3]["cos2_bp"] == 3_600
    assert out[4]["keep"] is False and out[4]["cos2_bp"] is None
    assert (out[3]["dot"], out[3]["na2"], out[3]["nb2"]) == (3, 25, 1)


def test_clip_gate_null_vector_never_kept(spark):
    df = spark.createDataFrame(
        [(0, None, [1, 2, 3]), (1, [1, 2, 3], None), (2, None, None)],
        "pair_id long, img_vec array<int>, txt_vec array<int>",
    )
    out = clip_alignment_gate(df).collect()
    assert all(r["keep"] is False for r in out)
    assert all(r["cos2_bp"] is None for r in out)


def test_clip_gate_boundary_is_exact(spark):
    # one unit above the rational boundary flips the decision
    df = spark.createDataFrame(
        [(0, [3, 4, 0], [1, 0, 0])],
        "pair_id long, img_vec array<int>, txt_vec array<int>",
    )
    kept = clip_alignment_gate(df, tau2_num=36, tau2_den=100).collect()[0]["keep"]
    dropped = clip_alignment_gate(df, tau2_num=3601, tau2_den=10_000).collect()[0]["keep"]
    assert kept is True and dropped is False


# ------------------------------------------------------------ webdataset

def test_tar_member_geometry(spark):
    df = spark.range(1).select(
        F.lit(0).alias("z"), F.lit(0).cast("long").alias("s0"),
        F.lit(1).cast("long").alias("s1"), F.lit(512).cast("long").alias("s512"),
        F.lit(513).cast("long").alias("s513"),
    )
    r = df.select(
        tar_member_bytes("s0").alias("b0"), tar_member_bytes("s1").alias("b1"),
        tar_member_bytes("s512").alias("b512"),
        tar_member_bytes("s513").alias("b513"),
    ).collect()[0]
    assert (r["b0"], r["b1"], r["b512"], r["b513"]) == (512, 1024, 1024, 1536)


def _wds_input(spark, n=40):
    rows = [(f"k{i:04d}", 100 + 37 * i, 10 + i) for i in range(n)]
    return spark.createDataFrame(rows, "image_id string, img_size long, txt_size long")


def _seq_twin(rows, shard_bytes, seed):
    """Sequential hashlib twin of the plan (independent of the operator)."""
    import hashlib

    def member(sz):
        return 512 + ((sz + 511) // 512) * 512

    order = sorted(
        rows, key=lambda r: (hashlib.md5(f"{r[0]}#{seed}".encode()).hexdigest(), r[0])
    )
    cum = 0
    out = {}
    shard_base = {}
    for key, img, txt in order:
        sb = member(img) + member(txt)
        shard = cum // shard_bytes
        if shard not in shard_base:
            shard_base[shard] = cum
        off = cum - shard_base[shard]
        out[key] = (shard, off, off, off + member(img), sb)
        cum += sb
    return out


def test_webdataset_plan_matches_sequential_twin(spark):
    rows = [(f"k{i:04d}", 100 + 37 * i, 10 + i) for i in range(40)]
    twin = _seq_twin(rows, shard_bytes=16_384, seed=5)
    plan = webdataset_plan(
        _wds_input(spark), shard_bytes=16_384, seed=5
    ).collect()
    assert len(plan) == 40
    for r in plan:
        shard, s_off, o_img, o_txt, sb = twin[r["image_id"]]
        assert (r["shard"], r["sample_off"], r["off_img"], r["off_txt"],
                r["sample_bytes"]) == (shard, s_off, o_img, o_txt, sb), r


def test_webdataset_plan_partitioning_invariant(spark):
    a = webdataset_plan(_wds_input(spark), shard_bytes=16_384, seed=5)
    b = webdataset_plan(
        _wds_input(spark).repartition(7), shard_bytes=16_384, seed=5
    )
    ka = sorted(map(tuple, a.select(
        "image_id", "shard", "sample_off", "off_img", "off_txt").collect()))
    kb = sorted(map(tuple, b.select(
        "image_id", "shard", "sample_off", "off_img", "off_txt").collect()))
    assert ka == kb


def test_webdataset_shards_summary(spark):
    plan = webdataset_plan(_wds_input(spark), shard_bytes=16_384, seed=5)
    shards = {r["shard"]: r for r in webdataset_shards(plan).collect()}
    # every sample accounted for, archive padded to the 10240 blocking factor
    assert sum(r["n_samples"] for r in shards.values()) == 40
    for r in shards.values():
        assert r["archive_bytes"] % 10_240 == 0
        assert r["archive_bytes"] >= r["data_bytes"] + 1024
        assert r["archive_bytes"] - (r["data_bytes"] + 1024) < 10_240
    # shard data runs end at most one sample past the budget
    plan_rows = plan.collect()
    max_sample = max(r["sample_bytes"] for r in plan_rows)
    for r in plan_rows:
        assert r["sample_off"] < 16_384 or r["sample_off"] == 0
        assert r["sample_off"] + r["sample_bytes"] <= 16_384 + max_sample


# -------------------------------------------------------------- dct_phash

def test_dct_phash_stage_matches_direct(spark):
    p = synth.GraphParams(n_pages=30)
    _, _, images = synth.synth_tables(spark, p)
    got = {r["image_id"]: r["dct_phash"]
           for r in dct_phash_stage(images).collect()}
    assert len(got) == 30
    for i in range(30):
        image_id, w, h, fmt = synth.image_meta_of(i, p)
        px = synth.image_pixels(image_id, w, h, p.seed)
        # the stage hashes what it DECODES — round-trip through the
        # declared codec (identity except qlossy, which is lossy)
        rt = codecs.decode(codecs.encode(px, fmt), fmt, w, h)
        assert got[image_id] == codecs.dct_phash64(rt), image_id
        if fmt == "qlossy":
            # lossy round-trip stays perceptually close to the truth hash
            d = bin((got[image_id] ^ codecs.dct_phash64(px))
                    & ((1 << 64) - 1)).count("1")
            assert d <= 12, (image_id, d)


def test_dct_phash_perceptual_property(spark):
    # near-dup fixture pairs (i % 7 == 6 perturbs base i-6) land at small
    # Hamming distance; unrelated pairs center near 32
    p = synth.GraphParams(n_pages=70, img_min=16, img_max=64)
    hashes = {}
    for i in range(70):
        image_id, w, h, fmt = synth.image_meta_of(i, p)
        px = synth.image_pixels(image_id, w, h, p.seed)
        hashes[i] = codecs.dct_phash64(px)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    dup = [ham(hashes[i], hashes[i - 6]) for i in range(6, 70, 7)]
    rand = [ham(hashes[i], hashes[i + 1]) for i in range(0, 60) if i % 7 != 6
            and (i + 1) % 7 != 6]
    assert max(dup) <= 16, dup
    assert 20 <= sum(rand) / len(rand) <= 44, sum(rand) / len(rand)


def test_dct_phash_scale_invariance_of_duplicate_pixels(spark):
    # the hash is a pure function of pixels: identical pixels at different
    # encodings give the same hash
    px = _px(33, 47, seed=9)
    df = _images_df(spark, [
        ("x1", codecs.encode(px, "png"), 33, 47, "png"),
        ("x2", codecs.encode(px, "ppm"), 33, 47, "ppm"),
        ("x3", codecs.encode(px, "raw"), 33, 47, "raw"),
    ])
    got = {r["image_id"]: r["dct_phash"] for r in dct_phash_stage(df).collect()}
    assert got["x1"] == got["x2"] == got["x3"]


# --------------------------------------------------------- write_webdataset

def test_write_webdataset_produces_valid_tars(spark, tmp_path):
    import tarfile

    from crawl4ai_spark.operators.export import write_webdataset

    p = synth.GraphParams(n_pages=40)
    _, _, images = synth.synth_tables(spark, p)
    images = images.cache()
    sized = images.select(
        "image_id",
        F.length("bytes").cast("long").alias("img_size"),
        F.length("caption").cast("long").alias("txt_size"))
    plan = webdataset_plan(sized, shard_bytes=65_536, seed=3)
    payload = plan.join(
        images.select(
            "image_id", F.col("bytes").alias("img_bytes"),
            F.encode("caption", "UTF-8").alias("txt_bytes")),
        "image_id")
    outdir = str(tmp_path / "wds")
    manifest = {r["shard"]: r for r in
                write_webdataset(payload, outdir).collect()}
    shards = {r["shard"]: r for r in
              webdataset_shards(plan).collect()}
    assert set(manifest) == set(shards)

    truth = {r["image_id"]: r for r in images.collect()}
    plan_rows = {r["image_id"]: r for r in plan.collect()}
    n_seen = 0
    for shard, m in manifest.items():
        # manifest sizes match the PLANNED archive geometry exactly
        assert m["archive_bytes"] == shards[shard]["archive_bytes"]
        assert m["data_bytes"] == shards[shard]["data_bytes"]
        import os
        assert os.path.getsize(m["path"]) == m["archive_bytes"]
        with tarfile.open(m["path"]) as tf:
            for ti in tf.getmembers():
                stem, ext = ti.name.rsplit(".", 1)
                pr = plan_rows[stem]
                # stdlib tarfile's view of the member offset equals the plan
                assert ti.offset == pr[f"off_{ext}"], ti.name
                data = tf.extractfile(ti).read()
                if ext == "img":
                    assert data == bytes(truth[stem]["bytes"])
                else:
                    # captions byte-equal through the whole pipeline
                    assert data.decode() == truth[stem]["caption"]
                    n_seen += 1
    assert n_seen == 40
    images.unpersist()


def test_write_webdataset_rejects_plan_payload_mismatch(spark, tmp_path):
    from crawl4ai_spark.operators.export import write_webdataset

    rows = [("k1", 100, 10), ("k2", 200, 20)]
    sized = spark.createDataFrame(
        rows, "image_id string, img_size long, txt_size long")
    plan = webdataset_plan(sized, shard_bytes=65_536, seed=3)
    # payload bytes disagree with the planned sizes -> offsets drift -> loud
    bad = plan.withColumn("img_bytes", F.lit(b"\x00" * 9999)).withColumn(
        "txt_bytes", F.lit(b"t"))
    with pytest.raises(Exception):
        write_webdataset(bad, str(tmp_path / "bad")).collect()


# ---------------------------------------------------------- read_webdataset

def _write_fixture_shards(spark, tmp_path, n_pages=40, shard_bytes=65_536):
    from crawl4ai_spark.operators.export import write_webdataset

    p = synth.GraphParams(n_pages=n_pages)
    _, _, images = synth.synth_tables(spark, p)
    images = images.cache()
    sized = images.select(
        "image_id",
        F.length("bytes").cast("long").alias("img_size"),
        F.length("caption").cast("long").alias("txt_size"))
    plan = webdataset_plan(sized, shard_bytes=shard_bytes, seed=3)
    payload = plan.join(
        images.select(
            "image_id", F.col("bytes").alias("img_bytes"),
            F.encode("caption", "UTF-8").alias("txt_bytes")),
        "image_id")
    outdir = str(tmp_path / "wds")
    write_webdataset(payload, outdir).collect()
    return images, plan, outdir


def test_read_webdataset_roundtrip(spark, tmp_path):
    from crawl4ai_spark.sources.webdataset import read_webdataset

    images, plan, outdir = _write_fixture_shards(spark, tmp_path)
    # stray non-tar file is pruned by the default pathGlobFilter
    with open(outdir + "/_manifest.json", "w") as fh:
        fh.write("{}")
    back = read_webdataset(spark, outdir).collect()
    assert all(r["error"] is None for r in back)
    got = {r["key"]: r for r in back}
    truth = {r["image_id"]: r for r in images.collect()}
    offs = {r["image_id"]: r["sample_off"] for r in plan.collect()}
    assert set(got) == set(truth)
    for k, r in got.items():
        assert bytes(r["img"]) == bytes(truth[k]["bytes"])
        assert bytes(r["txt"]).decode() == truth[k]["caption"]
        # reader's observed offset == planner's planned offset (lineage)
        assert r["sample_off"] == offs[k]
    images.unpersist()


def test_read_webdataset_foreign_writer(spark, tmp_path):
    """Interop: archives produced by stdlib tarfile (USTAR format, real
    mtimes/uids, extra sidecar + directory members) parse correctly."""
    import io
    import tarfile

    path = str(tmp_path / "foreign.tar")
    samples = {f"s{i:03d}": (bytes([i]) * (100 + i), f"caption {i}".encode())
               for i in range(7)}
    with tarfile.open(path, "w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("adir"); d.type = tarfile.DIRTYPE
        tf.addfile(d)
        for k, (img, txt) in samples.items():
            for ext, data in (("img", img), ("json", b"{}"), ("txt", txt)):
                ti = tarfile.TarInfo(f"{k}.{ext}")
                ti.size = len(data)
                ti.mtime = 1_700_000_000
                ti.uid = ti.gid = 1000
                tf.addfile(ti, io.BytesIO(data))

    from crawl4ai_spark.sources.webdataset import read_webdataset

    rows = read_webdataset(spark, path).collect()
    assert all(r["error"] is None for r in rows)
    got = {r["key"]: r for r in rows}
    assert set(got) == set(samples)          # directory member ignored
    for k, (img, txt) in samples.items():
        assert bytes(got[k]["img"]) == img
        assert bytes(got[k]["txt"]) == txt   # .json sidecar ignored


def test_read_webdataset_corrupt_shard_isolated(spark, tmp_path):
    import glob
    import os

    from crawl4ai_spark.sources.webdataset import read_webdataset

    images, _, outdir = _write_fixture_shards(spark, tmp_path)
    n_total = images.count()
    images.unpersist()
    tars = sorted(glob.glob(outdir + "/*.tar"))
    assert len(tars) >= 2
    # flip a byte inside the first member's size field of one shard
    with open(tars[0], "r+b") as fh:
        fh.seek(125)
        fh.write(b"zz")
    rows = read_webdataset(spark, outdir + "/*.tar").collect()
    bad = [r for r in rows if r["error"] is not None]
    ok = [r for r in rows if r["error"] is None]
    assert len(bad) == 1 and os.path.basename(tars[0]) in bad[0]["shard_path"]
    # every sample from the healthy shards still lands
    healthy_names = {os.path.basename(t) for t in tars[1:]}
    assert {os.path.basename(r["shard_path"]) for r in ok} == healthy_names
    assert 0 < len(ok) < n_total


def test_parse_tar_members_rejects_truncation_and_bad_checksum():
    from crawl4ai_spark.operators.export import tar_member
    from crawl4ai_spark.sources.webdataset import parse_tar_members

    member = tar_member("k.img", b"x" * 700)
    # truncated payload
    with pytest.raises(ValueError, match="truncated"):
        list(parse_tar_members(member[:600]))
    # corrupted checksum field
    bad = bytearray(member + b"\x00" * 1024)
    bad[148] = ord("7") if bad[148] != ord("7") else ord("5")
    with pytest.raises(ValueError, match="checksum"):
        list(parse_tar_members(bytes(bad)))
    # verify_checksums=False tolerates it (salvage mode)
    got = list(parse_tar_members(bytes(bad), verify_checksums=False))
    assert got[0][0] == "k.img" and got[0][2] == b"x" * 700


# ------------------------------------------------------------ aesthetic_gate

def _emb_df(spark, rows):
    from pyspark.sql import Row
    return spark.createDataFrame(
        [Row(id=i, img_vec=v) for i, v in rows],
        "id long, img_vec array<int>")


def test_aesthetic_gate_exact_decisions(spark):
    from crawl4ai_spark.operators.similarity import aesthetic_gate

    w = (3, 4)
    rows = [
        (1, [3, 4]),     # parallel to w -> cos = 1, keep
        (2, [-3, -4]),   # anti-parallel -> dot < 0, never keep
        (3, [4, -3]),    # orthogonal -> dot = 0, never keep
        (4, [0, 0]),     # zero norm -> never keep, NULL score
        (5, None),       # NULL embedding -> never keep
    ]
    got = {r["id"]: r for r in aesthetic_gate(
        _emb_df(spark, rows), weights=w, tau2_num=1, tau2_den=2).collect()}
    assert got[1]["aest_keep"] and got[1]["aest_bp"] == 10_000
    assert not got[2]["aest_keep"] and got[2]["aest_bp"] == -10_000
    assert not got[3]["aest_keep"] and got[3]["aest_bp"] == 0
    assert not got[4]["aest_keep"] and got[4]["aest_bp"] is None
    assert not got[5]["aest_keep"] and got[5]["aest_bp"] is None


def test_aesthetic_gate_boundary_is_exact(spark):
    from crawl4ai_spark.operators.similarity import aesthetic_gate

    # w=(1,0), e=(1,1): cos^2 = 1/2 exactly -> keep at tau^2 = 1/2 (>=)
    on = _emb_df(spark, [(1, [1, 1])])
    r = aesthetic_gate(on, weights=(1, 0), tau2_num=1, tau2_den=2).collect()[0]
    assert r["aest_keep"] and r["aest_bp"] == 5_000
    # one integer unit past the boundary flips it: e=(1000, 1001)
    off = _emb_df(spark, [(1, [1000, 1001])])
    r = aesthetic_gate(off, weights=(1, 0), tau2_num=1, tau2_den=2).collect()[0]
    assert not r["aest_keep"]


def test_aesthetic_gate_rejects_bad_weights(spark):
    from crawl4ai_spark.operators.similarity import aesthetic_gate

    df = _emb_df(spark, [(1, [1, 2])])
    with pytest.raises(ValueError):
        aesthetic_gate(df, weights=())
    with pytest.raises(ValueError):
        aesthetic_gate(df, weights=(0, 0))


def test_group_samples_ignores_foreign_sidecars():
    from crawl4ai_spark.sources.webdataset import group_samples

    members = [("k0.img", 0, b"A"), ("metadata.json", 512, b"{}"),
               ("k0.txt", 1024, b"cap"), ("k1.img", 2048, b"B")]
    got = list(group_samples(members, ("img", "txt")))
    # metadata.json neither splits k0 nor mints a phantom sample
    assert [g[0] for g in got] == ["k0", "k1"]
    assert got[0][2] == {"img": b"A", "txt": b"cap"}


def test_tar_header_rejects_oversized_member():
    import pytest

    from crawl4ai_spark.operators.export import _tar_header

    _tar_header("ok.bin", 8 ** 11 - 1)  # max representable
    with pytest.raises(ValueError):
        _tar_header("big.bin", 8 ** 11)
    with pytest.raises(ValueError):
        _tar_header("neg.bin", -1)
