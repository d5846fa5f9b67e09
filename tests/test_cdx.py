"""SURT canonicalization + CDX index generation."""

import hashlib

from pyspark.sql import functions as F

from crawl4ai_spark.functions.surt import surt_key
from crawl4ai_spark.operators.cdx import cdx_index, revisit_stats
from crawl4ai_spark.sources.warc import parse_warc, warc_records_stage
from crawl4ai_spark.sources.warcsynth import build_warc, record_fields_of


def _surt(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", surt_key(F.col("url")).alias("s")).collect()
    return {r["url"]: r["s"] for r in rows}


SURT_TRUTH = {
    # (url, expected) — the standard archival canonicalization rules
    "https://www.example.com/a?b=2&a=1": "com,example)/a?a=1&b=2",
    "HTTP://Example.COM/Path": "com,example)/path",
    "https://example.com": "com,example)/",
    "https://example.com/": "com,example)/",
    "https://example.com:443/x": "com,example)/x",
    "http://example.com:80/x": "com,example)/x",
    "http://example.com:8080/x": "com,example:8080)/x",
    "https://user:pw@example.com/x": "com,example)/x",
    "https://www2.sub.example.com/x": "com,example,sub)/x",
    "https://example.com/x#frag?notquery": "com,example)/x",
    "https://example.com/x?jsessionid=abc&z=9&&a=1": "com,example)/x?a=1&z=9",
    "https://example.com/x?utm_source=tw&utm_medium=s&id=7":
        "com,example)/x?id=7",
    "https://example.com/x?fbclid=123": "com,example)/x",
    "//cdn.example.com/lib.js": "com,example,cdn)/lib.js",
    "example.com/plain": "com,example)/plain",
}


def test_surt_truth_table(spark):
    out = _surt(spark, list(SURT_TRUTH))
    for url, want in SURT_TRUTH.items():
        assert out[url] == want, (url, out[url], want)


def test_surt_collation_groups_domain(spark):
    # the POINT of SURT: one registrable domain's URLs collate adjacently
    urls = ["https://a.example.com/1", "https://example.com/2",
            "https://z.example.com/3", "https://examplf.com/x",
            "https://exampld.com/x"]
    keys = sorted(_surt(spark, urls).values())
    ex = [k for k in keys if k.startswith("com,example")]
    assert keys.index(ex[-1]) - keys.index(ex[0]) == len(ex) - 1


def test_reader_offsets_roundtrip():
    # rec_offset/rec_length must let a consumer seek and re-slice the
    # exact record bytes out of the raw stream
    recs = [record_fields_of(i, f"some words for doc {i} " * 3)
            for i in range(4)]
    data = build_warc(recs)
    rows = parse_warc(9, data)
    assert [r["error"] for r in rows] == [None] * 4
    for r in rows:
        sl = data[r["rec_offset"]:r["rec_offset"] + r["rec_length"]]
        assert sl.startswith(b"WARC/1.0\r\n")
        assert r["body"].encode() in sl
    # records abut with exactly the 4-byte separator between them
    for a, b in zip(rows, rows[1:]):
        assert b["rec_offset"] == a["rec_offset"] + a["rec_length"] + 4


def test_cdx_index_fields_and_sort(spark):
    docs = spark.createDataFrame(
        [(i, f"words of document {i} body") for i in range(25)],
        "doc_id long, text string")
    from crawl4ai_spark.sources.warcsynth import warc_corpus
    cdx = cdx_index(warc_records_stage(warc_corpus(docs))).collect()
    assert len(cdx) == 25
    # sorted by (surt, ts)
    keys = [(r["surt"], r["ts"]) for r in cdx]
    assert keys == sorted(keys)
    by_url = {r["url"]: r for r in cdx}
    r7 = by_url["https://w0.test/doc/7"]
    assert r7["surt"] == "test,w0)/doc/7"
    assert r7["ts"] == "20240101000007"
    assert r7["mime"] == "text/html"
    assert r7["status"] == 200
    assert by_url["https://w0.test/doc/0"]["status"] == 404
    body = record_fields_of(7, "words of document 7 body")["body"]
    assert r7["digest"] == hashlib.md5(body.encode()).hexdigest()
    assert r7["filename"] == "crawl-00000.warc"


def test_cdx_offsets_match_file_bytes(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string")
    from crawl4ai_spark.sources.warcsynth import warc_corpus
    files = {r["file_id"]: bytes(r["data"])
             for r in warc_corpus(docs).collect()}
    cdx = cdx_index(warc_records_stage(warc_corpus(docs))).collect()
    for r in cdx:
        fid = int(r["filename"].split("-")[1].split(".")[0])
        sl = files[fid][r["offset"]:r["offset"] + r["length"]]
        assert sl.startswith(b"WARC/1.0\r\n")
        assert f"WARC-Target-URI: {r['url']}".encode() in sl


def test_revisit_stats(spark):
    rows = [
        # surt, ts, digest, length, filename, offset
        ("com,a)/x", "20240101000000", "d1", 100, "f0", 0),
        ("com,a)/x", "20240102000000", "d1", 107, "f1", 0),   # revisit
        ("com,a)/x", "20240103000000", "d2", 90,  "f2", 0),   # new version
        ("com,b)/y", "20240101000000", "d3", 50,  "f0", 200),
    ]
    cdx = spark.createDataFrame(
        rows, "surt string, ts string, digest string, length long, "
              "filename string, offset long")
    out = {r["surt"]: r for r in revisit_stats(cdx).collect()}
    a = out["com,a)/x"]
    assert (a["captures"], a["versions"], a["revisits"]) == (3, 2, 1)
    assert a["dup_bytes"] == 107  # the second d1 capture's bytes
    assert (a["first_ts"], a["last_ts"]) == ("20240101000000",
                                             "20240103000000")
    b = out["com,b)/y"]
    assert (b["captures"], b["versions"], b["revisits"], b["dup_bytes"]) \
        == (1, 1, 0, 0)
