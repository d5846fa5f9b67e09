"""WARC ingestion: builder↔parser roundtrip, non-response records, and
malformed-frame isolation (the cases the builder-inputs oracle cannot
exercise, since it only ever sees well-formed output)."""

from crawl4ai_spark.sources.warc import parse_warc, warc_records_stage
from crawl4ai_spark.sources.warcsynth import (
    build_warc,
    record_fields_of,
    warc_corpus,
)


def _file_bytes(doc_ids):
    return build_warc([record_fields_of(i, f"alpha beta gamma doc {i}")
                       for i in doc_ids])


def test_roundtrip_fields():
    data = _file_bytes([0, 13, 7])
    rows = parse_warc(1, data)
    assert [r["record_idx"] for r in rows] == [0, 1, 2]
    assert all(r["error"] is None for r in rows)
    assert all(r["warc_type"] == "response" for r in rows)
    want = record_fields_of(13, "alpha beta gamma doc 13")
    got = rows[1]
    assert got["target_uri"] == want["target_uri"]
    assert got["warc_date"] == want["warc_date"]
    assert got["http_status"] == 404  # 13 % 13 == 0
    assert got["content_type"] == want["content_type"]
    assert got["body"] == want["body"]


def test_non_response_records_pass_through():
    info = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n"
        b"\r\n"
        b"robots: x"
        b"\r\n\r\n"
    )
    rows = parse_warc(0, info + _file_bytes([1]))
    assert rows[0]["warc_type"] == "warcinfo"
    assert rows[0]["http_status"] is None and rows[0]["error"] is None
    assert rows[1]["warc_type"] == "response" and rows[1]["http_status"] == 200


def test_truncated_payload_isolated():
    data = _file_bytes([1, 2])
    rows = parse_warc(3, data[: len(data) - 40])  # cut into record 2
    assert rows[0]["error"] is None
    assert "truncated" in rows[-1]["error"]


def test_desynced_garbage_isolated():
    rows = parse_warc(4, b"not a warc at all")
    assert len(rows) == 1 and "desynced" in rows[0]["error"]
    # garbage AFTER a good record: the good one survives
    rows = parse_warc(5, _file_bytes([1]) + b"garbage tail")
    assert rows[0]["error"] is None and "desynced" in rows[1]["error"]


def test_missing_content_length():
    bad = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"\r\n"
        b"whatever"
    )
    rows = parse_warc(6, bad)
    assert "Content-Length" in rows[0]["error"]


def test_stage_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} text body {i}") for i in range(25)],
        "doc_id long, text string",
    )
    out = warc_records_stage(warc_corpus(docs)).collect()
    ok = [r for r in out if r["error"] is None]
    assert len(ok) == 25
    assert {r["file_id"] for r in ok} == {0, 1, 2}
    # record order inside a file is ascending doc_id
    by_file = {}
    for r in sorted(ok, key=lambda r: (r["file_id"], r["record_idx"])):
        by_file.setdefault(r["file_id"], []).append(r["target_uri"])
    assert by_file[1] == [f"https://w{i % 7}.test/doc/{i}"
                          for i in range(10, 20)]


def test_parse_warc_never_crashes_fuzz():
    """parse_warc must terminate with rows (never raise, never loop) on
    arbitrary bytes — including bytes that start like a real record."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    good = _file_bytes([3, 4])

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=400), st.integers(0, len(good)))
    def run(blob, cut):
        for data in (blob, good[:cut] + blob, blob + good[:cut]):
            rows = parse_warc(0, data)
            assert isinstance(rows, list)
            for r in rows:
                assert set(r) == {
                    "file_id", "record_idx", "warc_type", "target_uri",
                    "warc_date", "http_status", "content_type", "body",
                    "rec_offset", "rec_length", "error",
                }

    run()


def test_gzip_members_roundtrip():
    """Common Crawl shape: one gzip member PER RECORD, concatenated; a
    whole-file single member must also work; truncated tail is isolated."""
    import gzip

    recs = [record_fields_of(i, f"gz doc {i} body words") for i in (1, 2, 3)]
    per_record = b"".join(gzip.compress(build_warc([r])) for r in recs)
    rows = parse_warc(9, per_record)
    assert [r["error"] for r in rows] == [None] * 3
    assert [r["target_uri"] for r in rows] == [r["target_uri"] for r in recs]

    whole = gzip.compress(build_warc(recs))
    assert [r["target_uri"] for r in parse_warc(9, whole)] == \
        [r["target_uri"] for r in recs]

    # truncated final member: earlier records survive AND the truncation
    # is reported (never silent)
    cut = per_record[:-20]
    rows = parse_warc(9, cut)
    assert rows[0]["error"] is None and rows[0]["target_uri"] == recs[0]["target_uri"]
    assert "gzip" in (rows[-1]["error"] or "")


def test_gzip_corrupted_mid_member_is_reported():
    """A flipped bit in a mid-file member's magic must NOT silently drop
    every later record."""
    import gzip

    recs = [record_fields_of(i, f"gz doc {i} body words") for i in (1, 2, 3)]
    members = [gzip.compress(build_warc([r])) for r in recs]
    corrupted = members[0] + b"XX" + members[1][2:] + members[2]
    rows = parse_warc(9, corrupted)
    assert rows[0]["error"] is None  # first record decoded
    assert any("trailing bytes" in (r["error"] or "") for r in rows)


def test_negative_content_length_terminates():
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: -33\r\n\r\n" + b"x" * 50)
    rows = parse_warc(7, bad)
    assert len(rows) == 1 and "negative Content-Length" in rows[0]["error"]


# ------------------------------------------------------------- WET / WAT

def test_wet_conversion_records_roundtrip():
    from crawl4ai_spark.sources.warc import parse_warc
    from crawl4ai_spark.sources.warcsynth import build_wet, wet_fields_of

    recs = [wet_fields_of(i, f"text body {i} with words") for i in (0, 7, 13)]
    rows = parse_warc(5, build_wet(recs))
    assert [r["error"] for r in rows] == [None] * 3
    for r, src in zip(rows, recs):
        assert r["warc_type"] == "conversion"
        assert r["target_uri"] == src["target_uri"]
        assert r["content_type"] == "text/plain"
        assert r["body"] == src["body"]
        assert r["http_status"] is None  # no HTTP framing in WET


def test_wat_metadata_record_body():
    from crawl4ai_spark.sources.warc import parse_warc

    payload = b'{"Envelope":{"WARC-Header-Length":"259"}}'
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Target-URI: https://x.test/a\r\n"
        b"Content-Type: application/json\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )
    rows = parse_warc(0, raw)
    assert len(rows) == 1 and rows[0]["error"] is None
    assert rows[0]["warc_type"] == "metadata"
    assert rows[0]["content_type"] == "application/json"
    assert rows[0]["body"] == payload.decode()


def test_wet_gzip_members_roundtrip():
    import gzip

    from crawl4ai_spark.sources.warc import parse_warc
    from crawl4ai_spark.sources.warcsynth import build_wet, wet_fields_of

    recs = [wet_fields_of(i, f"t{i}") for i in range(4)]
    plain = build_wet(recs)
    # one gzip member per record, Common-Crawl style: rebuild per record
    parts = [build_wet([r]) for r in recs]
    gz = b"".join(gzip.compress(p) for p in parts)
    assert [r["body"] for r in parse_warc(1, gz)] == \
        [r["body"] for r in parse_warc(1, plain)]


def test_wet_framing_is_content_length_robust():
    """Property: WET bodies round-trip through build/parse even when they
    contain CRLF-CRLF separators, 'WARC/1.0' header lookalikes, or
    record-trailer byte sequences — the reader must trust Content-Length
    framing, never scan for separators inside a payload."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawl4ai_spark.sources.warc import parse_warc
    from crawl4ai_spark.sources.warcsynth import build_wet

    adversarial = st.sampled_from([
        "\r\n\r\n", "WARC/1.0\r\nWARC-Type: response\r\n\r\n",
        "Content-Length: 0", "\r\n", "…", "", "a",
    ])
    body = st.lists(
        st.one_of(adversarial, st.text(max_size=20)), max_size=6
    ).map("".join)

    @given(st.lists(body, min_size=1, max_size=4))
    @settings(max_examples=60, deadline=None)
    def run(bodies):
        recs = [{"target_uri": f"https://x.test/{i}",
                 "warc_date": "2024-01-01T00:00:00Z",
                 "content_type": "text/plain", "body": b}
                for i, b in enumerate(bodies)]
        rows = parse_warc(0, build_wet(recs))
        assert [r["error"] for r in rows] == [None] * len(recs)
        assert [r["body"] for r in rows] == [r2["body"] for r2 in recs]
        assert [r["record_idx"] for r in rows] == list(range(len(recs)))

    run()
