"""HTTP payload decode: dechunk, inflate, charset precedence."""

import zlib

from pyspark.sql import functions as F

from crawl4ai_spark.operators.httpdecode import (
    dechunk, decode_http_payload, decode_payload, sniff_charset)
from crawl4ai_spark.sources.httpsynth import (
    META_PREFIX, http_corpus, http_fields_of)


def test_dechunk_roundtrip():
    body = b"hello world, this is a longer body for chunking"
    wire = b"10\r\n" + body[:16] + b"\r\n" + \
           format(len(body) - 16, "x").encode() + b"\r\n" + body[16:] + \
           b"\r\n0\r\n\r\n"
    out, err = dechunk(wire)
    assert (out, err) == (body, None)


def test_dechunk_extension_and_errors():
    out, err = dechunk(b"5;ext=1\r\nabcde\r\n0\r\n\r\n")
    assert (out, err) == (b"abcde", None)
    out, err = dechunk(b"5\r\nab")
    assert out == b"ab" and err == "truncated chunk"
    out, err = dechunk(b"zz\r\nrest")
    assert out == b"" and "bad chunk size" in err
    out, err = dechunk(b"no crlf here")
    assert err == "truncated chunk-size line"


def test_charset_precedence():
    # header beats BOM beats meta
    assert sniff_charset("Content-Type: text/html; charset=ISO-8859-1",
                         b"\xef\xbb\xbfx") == "iso-8859-1"
    assert sniff_charset("Content-Type: text/html",
                         b"\xff\xfex\x00") == "utf-16-le"
    assert sniff_charset("", b"<meta charset=windows-1252>") == \
        "windows-1252"
    assert sniff_charset("", b"plain") == "utf-8"


def test_decode_payload_classes():
    text = "sample document text for the decoder " * 3
    for d in range(7):
        f = http_fields_of(d, text)
        out = decode_payload(f["headers"], f["payload"])
        cls = d % 7
        if cls == 5:
            assert out["was_chunked"] and not out["decode_ok"]
            assert out["text"] == text[:16]
            assert "bad chunk size" in out["error"]
        elif cls == 3:
            assert out["charset"] == "latin-1"
            assert out["text"] == META_PREFIX + text
            assert out["decode_ok"]
        else:
            assert out["text"] == text, cls
            assert out["decode_ok"], cls
    assert decode_payload(
        "Content-Type: x; charset=utf-8",
        http_fields_of(2, text)["payload"])["decode_ok"] is False


def test_deflate_both_conventions():
    body = b"deflate me " * 8
    for wbits in (15, -15):
        co = zlib.compressobj(6, zlib.DEFLATED, wbits)
        wire = co.compress(body) + co.flush()
        out = decode_payload("Content-Encoding: deflate", wire)
        assert out["text"] == body.decode() and out["decode_ok"]


def test_stage_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, f"document body {i} with words " * 4) for i in range(21)],
        "doc_id long, text string")
    resp = http_corpus(docs).select(
        F.col("doc_id").cast("string").alias("url"), "headers", "payload")
    rows = {int(r["url"]): r
            for r in decode_http_payload(resp).collect()}
    assert len(rows) == 21
    ok = [r for r in rows.values() if r["decode_ok"]]
    assert len(ok) == 18  # 3 of 21 are the broken-chunk class
    assert rows[4]["content_encoding"] == "gzip"
    assert rows[1]["was_chunked"] and rows[1]["decode_ok"]
    assert rows[2]["charset"] == "utf-16-le"


def test_bom_stripped_for_charset_alias():
    from crawl4ai_spark.operators.httpdecode import decode_payload

    hdrs = "Content-Type: text/html; charset=utf8"
    body = b"\xef\xbb\xbfhello"
    out = decode_payload(hdrs, body)
    assert out["charset"] == "utf-8"
    assert out["text"] == "hello"  # no leading U+FEFF
    assert out["decode_ok"] is True
