"""Column twins of the reference's scalar utils (utils.py:716-2662).

Expectations hand-derived (no engine imports on the expected side).
"""

from pyspark.sql import functions as F

from crawl4ai_spark.functions.textutils import (
    clean_tokens_col,
    escape_json_string_col,
    extract_xml_data_cols,
    extract_xml_tags_col,
    fast_format_html_col,
    normalize_text_col,
    sanitize_html_col,
    sanitize_input_encode_col,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "c string")
    return df.select(col(F.col("c")).alias("o")).collect()[0]["o"]


def test_normalize_text(spark):
    # collapse + strip + lower + strip non-word (unicode letters survive)
    assert _one(spark, "  Héllo,  Wörld!\tit's X_1  ",
                normalize_text_col) == "héllo wörld its x_1"
    assert _one(spark, "", normalize_text_col) == ""
    assert _one(spark, None, normalize_text_col) == ""


def test_clean_tokens(spark):
    df = spark.createDataFrame(
        [(["the", "spark", "up", "↑top", "ab", "engine", "their", "n't"],)],
        "t array<string>")
    got = df.select(clean_tokens_col(F.col("t")).alias("o")).collect()[0]["o"]
    # len>2, not noise/stop, no arrow prefixes: spark + engine survive
    assert got == ["spark", "engine"]


def test_sanitize_and_encode(spark):
    assert _one(spark, 'a "b" \'c\'', sanitize_html_col) == 'a \\"b\\" \\\'c\\\''
    assert _one(spark, None, sanitize_input_encode_col) == ""
    assert _one(spark, "ok", sanitize_input_encode_col) == "ok"


def test_escape_json_string(spark):
    s = 'a\\b "q" \n\t\r\b\f \x01 \x9f end'
    want = ('a\\\\b \\"q\\" \\n\\t\\r\\b\\f \\u0001 \\u009f end')
    assert _one(spark, s, escape_json_string_col) == want


def test_extract_xml_tags_and_data(spark):
    s = "<title>  T1 </title><body>B\nmore</body><title>T2</title>"
    tags = _one(spark, s, extract_xml_tags_col)
    assert tags == ["title", "body"]  # first-occurrence order (documented)
    df = spark.createDataFrame([(s,)], "c string")
    got = df.select(extract_xml_data_cols(
        F.col("c"), ["title", "body", "missing"]).alias("m")).collect()[0]["m"]
    # first match per tag, DOTALL, trimmed; absent tag -> ''
    assert got == {"title": "T1", "body": "B\nmore", "missing": ""}


def test_fast_format_html(spark):
    html = "<div><p>Hello</p><br/><span>x</span></div>"
    want = ("<div>\n  <p>\n    Hello\n  </p>\n  <br/>\n"
            "  <span>\n    x\n  </span>\n</div>")
    assert _one(spark, html, fast_format_html_col) == want
    # stray closing tag drives indent to -1 and the offset STICKS (the
    # reference's "  "*-1 == ''): <b> reopens at column 0, its content
    # prints at the still-offset level 0, not 1
    assert _one(spark, "</a><b>x</b>", fast_format_html_col) == \
        "</a>\n<b>\nx\n</b>"
