"""Corpus-hygiene tier: Gopher quality rules, repetition signals,
decontamination, cross-corpus line dedup.

Expectations are hand-derived in this file (no engine imports in the
expected side), per the round-2 verdict's independence requirement.
"""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.quality import (
    decontaminate,
    gopher_quality,
    line_dedup,
    repetition_signals,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back to "
    "the barn because it must have dinner with all of its friends tonight "
    "and that is why we tell this story again every single evening before "
    "bed so everyone remembers that good dogs deserve long walks daily too"
)  # 50 words, mean len ~4, has the/and/that/have/with/of/to


def test_gopher_rules_first_fail(spark):
    rows = [
        (0, GOOD),                                     # keep
        (1, "short doc"),                              # too_few_words
        (2, " ".join(["ab"] * 60)),                    # short_words (mean 2)
        (3, " ".join(["abcdefghijklmno"] * 60)),       # long_words (mean 15)
        (4, " ".join(["absolute"] * 25 + ["#"] * 25)),  # symbol_heavy (25/50)
        (5, "\n".join(["- item " + GOOD[:0] for _ in range(10)]) + "\n" + GOOD),
        (6, " ".join(["123"] * 60)),                   # nonalpha before stopwords
        (7, " ".join(["zzz"] * 60)),                   # nonalpha_words? all alpha -> no_stopwords
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["keep"], r["drop_reason"])
        for r in gopher_quality(df).collect()
    }
    assert got[0] == (True, None)
    assert got[1] == (False, "too_few_words")
    assert got[2] == (False, "short_words")
    assert got[3] == (False, "long_words")
    assert got[4] == (False, "symbol_heavy")
    # doc 5: 10 bullet lines of 2 words + the 50-word line = 11 lines,
    # 10/11 = 0.909 > 0.9 -> bullet_heavy
    assert got[5] == (False, "bullet_heavy")
    assert got[6] == (False, "nonalpha_words")
    assert got[7] == (False, "no_stopwords")


def test_gopher_ellipsis_and_stats(spark):
    # 4 lines, 2 ending with ellipsis (one unicode) -> frac 0.5 > 0.3;
    # pad words so earlier rules pass.
    body = GOOD
    text = "first line trails off...\nsecond stays\nthird one dies…\n" + body
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    row = gopher_quality(df).collect()[0]
    assert row["drop_reason"] == "ellipsis_heavy"
    assert row["ellipsis_frac"] == pytest.approx(0.5)
    # the ellipsis run counter: '...' once + one unicode ellipsis = 2
    assert row["symbol_ratio"] == pytest.approx(2 / row["n_words"], abs=1e-6)


def test_repetition_signals_hand_case(spark):
    # lines: a, b, a, a  -> dup_line_frac = (4-2)/4 = 0.5
    # chars: a=5 ("alpha"), b=4 ("beta"); total=5+4+5+5=19, distinct-once=9
    # dup_line_char_frac = 10/19
    text = "alpha\nbeta\nalpha\nalpha"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    row = repetition_signals(df).collect()[0]
    assert row["dup_line_frac"] == pytest.approx(0.5)
    assert row["dup_line_char_frac"] == pytest.approx(round(10 / 19, 6))

    # top-2-gram: "x y x y x" -> grams: "x y","y x","x y","y x" sorted ->
    # ["x y","x y","y x","y x"]; first max run = "x y" count 2, len 3
    # text len = 9 -> frac = 2*3/9
    df2 = spark.createDataFrame([(0, "x y x y x")], ["doc_id", "text"])
    r2 = repetition_signals(df2).collect()[0]
    assert r2["top2gram_char_frac"] == pytest.approx(round(6 / 9, 6))
    # 5 words -> one 4-gram window of len 2: grams "x y x y","y x y x"
    # each count 1 -> smallest wins ("x y x y", len 7) -> 7/9
    assert r2["top4gram_char_frac"] == pytest.approx(round(7 / 9, 6))


def test_repetition_short_doc_zero(spark):
    df = spark.createDataFrame([(0, "solo")], ["doc_id", "text"])
    row = repetition_signals(df).collect()[0]
    assert row["top2gram_char_frac"] == 0.0
    assert row["dup_line_frac"] == 0.0


def test_decontaminate_overlap(spark):
    bench = spark.createDataFrame(
        [(0, "one two three four five six seven eight nine ten")],
        ["bid", "text"],
    )
    corpus = spark.createDataFrame(
        [
            # shares the 8-gram "one ... eight" (and two more shifted ones)
            (0, "zz one two three four five six seven eight nine yy"),
            (1, "totally different words with no overlap at all here ok"),
            (2, "one two three four five six seven"),  # < 8 words of overlap
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"], r["contaminated"])
        for r in decontaminate(corpus, bench, n=8).collect()
    }
    # doc0 has 11 words -> 4 distinct 8-grams; 2 of them ("one..eight",
    # "two..nine") appear in bench (bench's "three..ten" ends differently)
    assert got[0] == (4, 2, True)
    assert got[1] == (3, 0, False)
    assert got[2] == (0, 0, False)


def test_line_dedup_cross_corpus(spark):
    docs = spark.createDataFrame(
        [
            (0, "cookie banner\nunique zero\ncookie banner"),
            (1, "unique one\ncookie banner\n\n  \nunique tail"),
            (2, "unique two only"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in line_dedup(docs, min_df=2).collect()}
    # "cookie banner" occurs 3x corpus-wide -> dropped everywhere
    assert got[0]["text_clean"] == "unique zero"
    assert (got[0]["n_lines"], got[0]["n_kept"]) == (3, 1)
    assert got[1]["text_clean"] == "unique one\nunique tail"
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 2)  # blanks dropped
    assert got[2]["text_clean"] == "unique two only"


def test_line_dedup_order_preserved(spark):
    text = "\n".join(f"line {i}" for i in range(20)) + "\ndup\ndup2"
    other = "dup\ndup2"
    docs = spark.createDataFrame([(0, text), (1, other)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in line_dedup(docs, min_df=2).collect()}
    assert got[0]["text_clean"] == "\n".join(f"line {i}" for i in range(20))


def test_dsir_weights_match_independent_twin(spark):
    import hashlib
    import math

    from crawl4ai_spark.operators.quality import dsir_weights

    raw_rows = [
        (0, "spark shuffles the big table"),
        (1, "the quick dog naps"),
        (2, "quantum flux capacitor hums"),
        (3, ""),
    ]
    tgt_rows = [(100, "the quick dog runs fast"), (101, "the dog barks")]

    def feats(text):
        ws = [w for w in text.lower().split() if w]
        grams = ws + [" ".join(ws[i:i + 2]) for i in range(len(ws) - 1)]
        return [hashlib.md5(g.encode()).hexdigest()[:4] for g in grams]

    B, a = 65536, 1.0
    rc, tc = {}, {}
    for _, t in raw_rows:
        for b in feats(t):
            rc[b] = rc.get(b, 0) + 1
    for _, t in tgt_rows:
        for b in feats(t):
            tc[b] = tc.get(b, 0) + 1
    Tt, Tr = sum(tc.values()), sum(rc.values())

    def llr(b):
        p = (tc.get(b, 0) + a) / (Tt + a * B)
        q = (rc.get(b, 0) + a) / (Tr + a * B)
        x = 1_000_000.0 * math.log(p / q)
        # HALF_UP (away from zero), matching Spark round(double, 0)
        return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

    expected = {}
    for i, t in raw_rows:
        fs = feats(t)
        expected[i] = (len(fs), sum(llr(b) for b in fs))

    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    tgt = spark.createDataFrame(tgt_rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_feats"], r["llr_micro"])
        for r in dsir_weights(raw, tgt).collect()
    }
    assert got == expected
    # target-like doc must outrank the off-target ones
    assert got[1][1] > got[0][1] and got[1][1] > got[2][1]
    assert got[3] == (0, 0)


def test_dsir_feature_stats_match_independent_twin(spark):
    import hashlib

    from crawl4ai_spark.operators.quality import dsir_feature_stats

    raw_rows = [
        (0, "spark shuffles the big table"),
        (1, "the quick dog naps"),
        (2, "quantum flux capacitor hums"),
        (3, ""),
    ]
    tgt_rows = [(100, "the quick dog runs fast"), (101, "the dog barks")]

    def feats(text):
        ws = [w for w in text.lower().split() if w]
        grams = ws + [" ".join(ws[i:i + 2]) for i in range(len(ws) - 1)]
        return [hashlib.md5(g.encode()).hexdigest()[:4] for g in grams]

    rc, tc = {}, {}
    for _, t in raw_rows:
        for b in feats(t):
            rc[b] = rc.get(b, 0) + 1
    for _, t in tgt_rows:
        for b in feats(t):
            tc[b] = tc.get(b, 0) + 1

    expected = {}
    for i, t in raw_rows:
        fs = feats(t)
        expected[i] = (len(fs), sum(tc.get(b, 0) for b in fs),
                       sum(rc[b] for b in fs))

    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    tgt = spark.createDataFrame(tgt_rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_feats"], r["tct_sum"], r["rcr_sum"])
        for r in dsir_feature_stats(raw, tgt).collect()
    }
    assert got == expected
    # target-overlapping doc carries target mass; disjoint doc carries none
    assert got[1][1] > 0 and got[2][1] == 0
    assert got[3] == (0, 0, 0)


def test_dedup_lines_within(spark):
    from crawl4ai_spark.operators.quality import dedup_lines_within

    docs = spark.createDataFrame(
        [(0, "a\nb\na\n\nc\nb\na"),    # repeats dropped, blanks dropped
         (1, "only one line"),
         (2, "x\n  x  \nx")],          # trimmed comparison: all same
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_kept"])
           for r in dedup_lines_within(docs).collect()}
    assert got[0] == ("a\nb\nc", 6, 3)
    assert got[1] == ("only one line", 1, 1)
    assert got[2] == ("x", 3, 1)


def test_repetition_lines_are_trimmed(spark):
    # regression: F.transform(…, F.trim) silently bound trim's optional
    # 2nd param as the index and left lines untrimmed; '  a' and 'a'
    # must count as duplicates
    df = spark.createDataFrame([(0, "  alpha\nalpha \nbeta")],
                               ["doc_id", "text"])
    row = repetition_signals(df).collect()[0]
    assert row["dup_line_frac"] == pytest.approx(round(1 / 3, 6))


def test_line_dedup_keeps_blank_docs(spark):
    """Documents with no non-blank lines still emit a row (text_clean='',
    counts 0) — they must not vanish from downstream joins."""
    docs = spark.createDataFrame(
        [(0, "keep me\nnav bar\n"), (1, "nav bar\nother\n"),
         # "blank" = empty after trim; trim strips spaces (both engines)
         (2, "   \n\n  \n"), (3, "")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in line_dedup(docs, min_df=2).collect()}
    assert set(got) == {0, 1, 2, 3}
    for d in (2, 3):
        assert got[d]["text_clean"] == ""
        assert got[d]["n_lines"] == 0 and got[d]["n_kept"] == 0
    assert got[0]["text_clean"] == "keep me"


# --------------------------------------------------------------------------
# ccnet_perplexity — independent sequential twin (hashlib/math only)
# --------------------------------------------------------------------------

def _twin_ccnet(corpus, target, a=1.0):
    """Sequential bigram-LM twin: dict counts + math.log, no engine code."""
    import math

    def toks(t):
        return [w for w in t.lower().split() if w]

    c12, c1, vocab = {}, {}, set()
    for t in target:
        ws = toks(t)
        vocab.update(ws)
        for i in range(len(ws) - 1):
            b = (ws[i], ws[i + 1])
            c12[b] = c12.get(b, 0) + 1
            c1[ws[i]] = c1.get(ws[i], 0) + 1
    v = float(len(vocab) + 1)

    out = {}
    for did, t in corpus:
        ws = toks(t)
        nll = 0
        nb = 0
        for i in range(len(ws) - 1):
            b = (ws[i], ws[i + 1])
            p = (c12.get(b, 0) + a) / (c1.get(ws[i], 0) + a * v)
            nll += int(round(-1e6 * math.log(p)))
            nb += 1
        per = nll // nb if nb else 0
        out[did] = (len(ws), nb, nll, per)
    # terciles over scoreable docs, ties by doc id
    sc = sorted((p, d) for d, (_, nb, _, p) in out.items() if nb > 0)
    k1, k2 = -(-len(sc) // 3), -(-2 * len(sc) // 3)
    cut1 = sc[k1 - 1][0] if sc else None
    cut2 = sc[k2 - 1][0] if sc else None
    res = {}
    for did, (nt, nb, nll, per) in out.items():
        if nb == 0:
            b = "tail"
        elif per <= cut1:
            b = "head"
        elif per <= cut2:
            b = "middle"
        else:
            b = "tail"
        res[did] = (nt, nb, nll, per, b)
    return res


def test_ccnet_perplexity_matches_twin(spark):
    from crawl4ai_spark.operators.quality import ccnet_perplexity

    target = [
        "the cat sat on the mat and the dog sat on the rug",
        "a cat and a dog sat by the door of the house",
        "the house has a door and the door has a mat",
    ]
    corpus = [
        (0, "the cat sat on the mat"),           # very target-like
        (1, "the dog sat by the door"),          # target-like
        (2, "quantum flux capacitors oscillate wildly"),  # OOV-heavy
        (3, "a dog and a cat"),                  # target-like
        (4, "zzz"),                              # 1 token -> no bigrams
        (5, ""),                                 # empty
        (6, "the the the the the the"),          # seen history, odd bigram
    ]
    cdf = spark.createDataFrame(corpus, ["doc_id", "text"])
    tdf = spark.createDataFrame([(t,) for t in target], ["text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bigrams"], r["nll_micro"],
                      r["nll_per"], r["bucket"])
        for r in ccnet_perplexity(cdf, tdf).collect()
    }
    want = _twin_ccnet(corpus, target)
    assert got == want
    # sanity: the OOV-heavy doc must be strictly worse than target-like docs
    assert got[2][3] > got[0][3]
    assert got[4][4] == "tail" and got[5][4] == "tail"


def test_ccnet_partitioning_invariance(spark):
    from crawl4ai_spark.operators.quality import ccnet_perplexity

    target = ["the cat sat on the mat", "a dog by the door"]
    corpus = [(i, f"the cat sat near door number {i} " * (1 + i % 3))
              for i in range(40)]
    cdf = spark.createDataFrame(corpus, ["doc_id", "text"])
    tdf = spark.createDataFrame([(t,) for t in target], ["text"])
    a = sorted(map(tuple, ccnet_perplexity(cdf, tdf).collect()))
    b = sorted(map(tuple, ccnet_perplexity(
        cdf.repartition(13), tdf.repartition(3)).collect()))
    assert a == b


# ------------------------------------------------------------ fineweb_filters

def test_fineweb_filters_truth_table(spark):
    from crawl4ai_spark.operators.quality import fineweb_filters

    good = [f"Planted fineweb line number {k} stays long enough here." for k in range(8)]
    rows = [
        (0, "\n".join(good)),                                   # keep
        (1, "\n".join(l[:-1] + " no end" for l in good)),       # no terminal punct
        (2, "\n".join(f"Ln {k}." for k in range(8))),           # all short
        (3, "\n".join([good[0]] * 4 + good[4:])),               # dup chars
        (4, ""),                                                # empty -> line_punct
        (5, None),                                              # NULL text
        # exactly at the punct boundary: 1 of 8 lines punctuated
        # (12.5% > 12% -> passes rule 1), all long, no dups -> keep
        (6, "\n".join([good[0]] + [l[:-1] + " x" for l in good[1:]])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in fineweb_filters(df).collect()}
    assert out[0]["keep"] is True and out[0]["drop_reason"] == ""
    assert out[1]["drop_reason"] == "line_punct"
    assert out[2]["drop_reason"] == "short_lines"
    assert out[2]["punct_lines"] == 8  # short lines still end in '.'
    assert out[3]["drop_reason"] == "dup_line_chars"
    assert out[3]["dup_line_chars"] == 3 * len(good[0])
    assert out[4]["drop_reason"] == "line_punct" and out[4]["n_lines"] == 0
    assert out[5]["drop_reason"] == "line_punct"
    assert out[6]["keep"] is True


def test_fineweb_boundaries_are_exact(spark):
    from crawl4ai_spark.operators.quality import fineweb_filters

    long_p = "This is a planted line that is long enough to clear thirty."
    # 25 lines, 3 punctuated = 12% exactly -> <= 0.12 -> drop;
    # 4 of 25 = 16% -> keep (other rules pass)
    mk = lambda npunct: "\n".join(
        (long_p if k < npunct else long_p[:-1] + f" v{k}")
        for k in range(25))
    # avoid dup lines: suffix each punctuated copy differently
    mk = lambda npunct: "\n".join(
        (f"Planted punctuated line number {k} is long enough here v." if k < npunct
         else f"Planted bare line number {k} is long enough here vv")
        for k in range(25))
    df = spark.createDataFrame(
        [(0, mk(3)), (1, mk(4))], "doc_id long, text string")
    out = {r["doc_id"]: r for r in fineweb_filters(df).collect()}
    assert out[0]["drop_reason"] == "line_punct"
    assert out[1]["keep"] is True
