"""PNG ancillary-metadata extraction (tEXt / pHYs / gAMA)."""

import numpy as np

from crawl4ai_spark.codecs import _png_chunk, encode_png
from crawl4ai_spark.operators.multimodal import png_meta_walk


def _png_with(extra: bytes) -> bytes:
    base = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    return base[:33] + extra + base[33:]


def _text(k: str, v: str) -> bytes:
    return _png_chunk(b"tEXt", k.encode() + b"\x00" + v.encode())


def test_all_fields():
    data = _png_with(
        _text("Title", "hello")
        + _text("Author", "me")
        + _text("Software", "synth 1.0")
        + _text("Description", "a test")
        + _png_chunk(b"pHYs", (2835).to_bytes(4, "big")
                     + (5670).to_bytes(4, "big") + b"\x01")
        + _png_chunk(b"gAMA", (45455).to_bytes(4, "big")))
    out = png_meta_walk(data)
    assert out["is_png"] is True
    assert (out["title"], out["author"], out["software"],
            out["description"]) == ("hello", "me", "synth 1.0", "a test")
    assert (out["phys_x"], out["phys_y"], out["phys_unit"]) == (2835, 5670, 1)
    assert out["gamma"] == 45455
    assert out["n_text"] == 4


def test_unknown_keyword_and_private_chunk_skipped():
    data = _png_with(_text("Comment", "ignored")
                     + _png_chunk(b"prVt", b"\xff\x00\xff"))
    out = png_meta_walk(data)
    assert out["title"] is None
    assert out["n_text"] == 1  # counted, not surfaced


def test_first_occurrence_wins():
    data = _png_with(_text("Title", "first") + _text("Title", "second"))
    out = png_meta_walk(data)
    assert out["title"] == "first"
    assert out["n_text"] == 2


def test_non_png_and_bare():
    assert png_meta_walk(b"JFIF whatever")["is_png"] is False
    assert png_meta_walk(b"")["is_png"] is False
    bare = png_meta_walk(encode_png(np.zeros((2, 2, 3), dtype=np.uint8)))
    assert bare["is_png"] is True and bare["n_text"] == 0
    assert bare["phys_x"] is None and bare["gamma"] is None


def test_truncated_mid_chunk_is_total():
    data = _png_with(_text("Title", "kept"))
    out = png_meta_walk(data[:40])  # cut inside the spliced region
    assert out["is_png"] is True  # signature intact; walk just ends
