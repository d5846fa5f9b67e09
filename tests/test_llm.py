"""LLM extraction / content-filter plumbing (operators/llm.py) against
hand-derived truth and the independent oracle twins — the 'model' is a
deterministic fake; merge/prompt/parse/explode is what's under test."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators import llm
from crawl4ai_spark.oracle import expected as oe


# ----------------------------------------------------------- merge_chunks

def test_merge_chunks_hand_derived():
    # 8+3 tokens, target 4, overlap 1 → ceil(11/4)=3 chunks, overlap carry
    got = llm.merge_chunks(["a b c d e f g h", "i j k"], 4, overlap=1)
    assert got == ["a b c d", "d e f g", "g h i j k"]


def test_merge_chunks_zero_scaled_docs_skipped():
    # reference quirk (utils.py:151-156): int(4 * 0.2) == 0 → doc dropped
    got = llm.merge_chunks(["one two three four", "w x y z a b"], 100,
                           word_token_ratio=0.2)
    assert got == ["w x y z a b"]


def test_merge_chunks_ceiling_blocks_roll():
    # word_token_ratio < 1 shrinks the chunk ceiling: 8 raw tokens scale
    # to 4 → ceil(4/4) = 1 chunk, so no roll ever happens
    got = llm.merge_chunks(["a b c d e f g h"], 4, overlap=0,
                           word_token_ratio=0.5)
    assert got == ["a b c d e f g h"]


def test_merge_chunks_matches_oracle_twin():
    texts = ["", "   ", "x " * 7, "lorem ipsum dolor " * 40]
    for t in texts:
        eng = llm.merge_chunks([t], 16, overlap=4, word_token_ratio=1.3)
        twin = oe._merge_twin(t, 16, 4, 1.3)
        assert eng == twin, t[:30]


# ---------------------------------------------------------------- parsing

def test_parse_blocks_xml_path():
    b = llm.parse_blocks('<blocks>[{"index": 2, "tags": ["p"], '
                         '"content": ["hi"]}]</blocks>')
    assert b == [{"index": 2, "tags": ["p"], "content": ["hi"],
                  "error": False}]


def test_parse_blocks_fallback_and_error_block():
    b = llm.parse_blocks('noise {"index": 0, "content": "y"} mid {broken')
    assert b[0] == {"index": 0, "content": "y", "error": False}
    assert len(b) == 1  # '{broken' never closes → no unparsed segment
    b2 = llm.parse_blocks('[{"a": 1}, {"b": }]')
    assert b2[0] == {"a": 1, "error": False}
    assert b2[-1]["error"] is True and b2[-1]["tags"] == ["error"]


def test_extract_tag():
    assert llm.extract_tag("content", "x<content> hi\nthere </content>y") \
        == "hi\nthere"
    assert llm.extract_tag("content", "nothing") == ""


# ----------------------------------------------------------------- stages

def test_llm_extract_stage_requires_model(spark):
    df = spark.createDataFrame([("u", "t")], "url string, text string")
    with pytest.raises(NotImplementedError):
        llm.llm_extract_stage(df, complete_fn=None)
    with pytest.raises(NotImplementedError):
        llm.llm_content_filter_stage(df, complete_fn=None)


def test_llm_extract_stage_vs_twin(spark):
    rows = [(f"doc://{i}", ("tok%d " % i) * (5 + 13 * i)) for i in range(6)]
    rows.append(("doc://empty", ""))
    df = spark.createDataFrame(rows, "url string, text string")
    out = llm.llm_extract_stage(
        df, complete_fn=oe.fake_llm_extract,
        chunk_token_threshold=16, overlap_rate=0.25,
    ).collect()
    want = []
    for url, text in rows:
        for ix, sec in enumerate(oe._merge_twin(text, 16, 4, 1.3)):
            toks = oe._prompt_escape_twin(sec).split()
            want.append((url, ix, 0, ("head",), " ".join(toks[:5]), False))
            want.append((url, ix, 1, ("stats",), str(len(toks)), False))
    got = sorted((r["url"], r["section_idx"], r["block_idx"],
                  tuple(r["tags"]), r["content"], r["error"]) for r in out)
    assert got == sorted(want)
    assert any(ix > 0 for (_, ix, *_rest) in got)  # multi-section pages hit


def test_llm_filter_stage_vs_twin(spark):
    rows = [("doc://0", "Hello world\nfrom \"quoted\" text"),
            ("doc://1", None), ("doc://2", "solo")]
    df = spark.createDataFrame(rows, "url string, text string")
    out = llm.llm_content_filter_stage(
        df, complete_fn=oe.fake_llm_filter).collect()
    got = {(r["url"], r["section_idx"]): r["markdown"] for r in out}
    assert set(got) == {("doc://0", 0), ("doc://2", 0)}
    sec = oe._merge_twin(rows[0][1], int(1e9), int(1e9 * 0.1), 1.3)[0]
    assert got[("doc://0", 0)] == "# KEPT\n" + oe._prompt_escape_twin(sec).upper()


def test_llm_extract_stage_response_count_mismatch(spark):
    df = spark.createDataFrame([("u", "a b c")], "url string, text string")
    out = llm.llm_extract_stage(df, complete_fn=lambda ps: [])
    with pytest.raises(Exception, match="responses"):
        out.collect()
