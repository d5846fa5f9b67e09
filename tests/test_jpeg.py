"""JPEG/JFIF marker-segment walk (dims, Exif orientation, scan
geometry, truncation)."""

import pandas as pd

from crawl4ai_spark.operators.multimodal import jpeg_segment_audit, jpeg_walk
from crawl4ai_spark.oracle import expected as oracle_expected


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def _app0(vmaj=1, vmin=2, dx=96, dy=120) -> bytes:
    return _seg(0xE0, b"JFIF\x00" + bytes([vmaj, vmin, 1])
                + dx.to_bytes(2, "big") + dy.to_bytes(2, "big")
                + b"\x00\x00")


def _sof(marker=0xC0, w=33, h=47, ncomp=3) -> bytes:
    body = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for c in range(ncomp):
        body += bytes([c + 1, 0x11, 0])
    return _seg(marker, body)


def _sos(ncomp=3) -> bytes:
    body = bytes([ncomp])
    for c in range(ncomp):
        body += bytes([c + 1, 0x00])
    return _seg(0xDA, body + bytes([0, 63, 0]))


def _exif(little: bool, orientation: int) -> bytes:
    endian = "little" if little else "big"

    def u(v, nb):
        return v.to_bytes(nb, endian)

    ifd = u(1, 2) + u(0x0112, 2) + u(3, 2) + u(1, 4) \
        + u(orientation, 2) + u(0, 2) + u(0, 4)
    tiff = (b"II" if little else b"MM") + u(42, 2) + u(8, 4) + ifd
    return _seg(0xE1, b"Exif\x00\x00" + tiff)


def test_baseline_full_walk():
    data = b"\xff\xd8" + _app0() + _seg(0xDB, bytes(65)) + _sof() \
        + _seg(0xC4, bytes(19)) + _sos() + b"\x01\x02\x03" + b"\xff\xd9"
    out = jpeg_walk(data)
    assert out["is_jpeg"] is True
    assert (out["w"], out["h"], out["n_components"]) == (33, 47, 3)
    assert out["progressive"] is False
    assert (out["jfif_vmaj"], out["jfif_vmin"]) == (1, 2)
    assert (out["density_x"], out["density_y"]) == (96, 120)
    assert out["n_segments"] == 5  # APP0 DQT SOF DHT SOS
    assert out["scan_bytes"] == 3
    assert out["has_eoi"] is True and out["truncated"] is False
    assert out["trailing_bytes"] == 0


def test_progressive_and_trailing():
    data = b"\xff\xd8" + _app0() + _sof(marker=0xC2, ncomp=1) \
        + _sos(ncomp=1) + b"\x00" + b"\xff\xd9" + b"junk!"
    out = jpeg_walk(data)
    assert out["progressive"] is True
    assert out["n_components"] == 1
    assert out["trailing_bytes"] == 5


def test_scan_stuffing_and_restart_markers_counted():
    scan = b"\x10\x20" + b"\xff\x00" + b"\x30" + b"\xff\xd3" + b"\x40\x50"
    data = b"\xff\xd8" + _app0() + _sof() + _sos() + scan + b"\xff\xd9"
    out = jpeg_walk(data)
    assert out["scan_bytes"] == len(scan)
    assert out["has_eoi"] is True


def test_missing_eoi_is_not_truncation():
    data = b"\xff\xd8" + _app0() + _sof() + _sos() + b"\x01\x02"
    out = jpeg_walk(data)
    assert out["has_eoi"] is False and out["truncated"] is False
    assert out["scan_bytes"] == 2


def test_truncated_mid_segment():
    data = b"\xff\xd8" + _app0() + _seg(0xDB, bytes(65))[:5]
    out = jpeg_walk(data)
    assert out["truncated"] is True
    assert out["n_dqt"] == 0 and out["n_segments"] == 1
    # dims never reached
    assert out["w"] == -1 and out["h"] == -1


def test_exif_both_endians_and_skipped_ascii_tag():
    for little in (True, False):
        data = b"\xff\xd8" + _app0() + _exif(little, 6) + _sof() \
            + _sos() + b"\xff\xd9"
        out = jpeg_walk(data)
        assert out["exif_orientation"] == 6
        assert out["exif_endian"] == ("II" if little else "MM")
    # non-Exif APP1 is counted but not parsed
    data = b"\xff\xd8" + _app0() + _seg(0xE1, b"XMP\x00data") + _sof() \
        + _sos() + b"\xff\xd9"
    out = jpeg_walk(data)
    assert out["exif_orientation"] is None and out["n_app"] == 2


def test_non_jpeg_total():
    assert jpeg_walk(b"\x89PNG\r\n\x1a\n rest")["is_jpeg"] is False
    assert jpeg_walk(b"")["is_jpeg"] is False
    assert jpeg_walk(None)["is_jpeg"] is False
    # SOI alone: a valid-but-empty walk
    out = jpeg_walk(b"\xff\xd8")
    assert out["is_jpeg"] is True and out["n_segments"] == 0


def test_stage_matches_recipe_expected(spark):
    oracle_expected.ensure_jpeg_meta(n_pages=120)
    inp = spark.read.parquet(
        oracle_expected.expected_path("jpeg_meta_input"))
    got = (jpeg_segment_audit(inp).toPandas()
           .sort_values("image_id").reset_index(drop=True))
    exp = (pd.read_parquet(oracle_expected.expected_path("jpeg_meta"))
           .sort_values("image_id").reset_index(drop=True))
    assert list(got.columns) == list(exp.columns)
    for col in exp.columns:
        g = [None if pd.isna(v) else v for v in got[col].tolist()]
        e = [None if pd.isna(v) else v for v in exp[col].tolist()]
        assert g == e, col


def test_walk_total_on_arbitrary_bytes():
    # the walk must be total for ANY byte string (crawl payloads are
    # adversarial); deterministic pseudo-random corpus, no hypothesis
    # needed for a pure function
    import hashlib

    for i in range(200):
        data = hashlib.sha256(f"fuzz{i}".encode()).digest() * (i % 7 + 1)
        out = jpeg_walk(data)
        assert out["is_jpeg"] in (True, False)
        # prefix with SOI so the walker enters the marker loop
        out2 = jpeg_walk(b"\xff\xd8" + data)
        assert out2["is_jpeg"] is True
        assert isinstance(out2["n_segments"], int)


def test_walk_fill_bytes_before_marker():
    data = b"\xff\xd8" + b"\xff\xff\xff" + b"\xd9"  # fill run then EOI
    out = jpeg_walk(data)
    assert out["has_eoi"] is True and out["truncated"] is False
