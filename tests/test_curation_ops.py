"""Round-5 curation tier: PII redaction, URL category blocklist,
token-budget mixture sampling."""

import hashlib

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.blocklist import blocklist_gate
from crawl4ai_spark.operators.quality import pii_redact
from crawl4ai_spark.operators.sampling import mixture_sample


# ---------------------------------------------------------------- pii_redact

def _pii_df(spark):
    rows = [
        (0, "write to alice@example.com or bob.smith+x@sub.domain.org now"),
        (1, "server at 10.0.0.1, backup 192.168.300.999"),  # naive ipv4: both match
        (2, "call +14155550100 or 415-555-0100 or 415.555.0100"),
        (3, "email host is not an ip: user@1.2.3.4 done"),
        (4, None),
        (5, "no pii here, just text with 1.2 and a@b and @x.com"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_and_masking(spark):
    out = {r["doc_id"]: r for r in pii_redact(_pii_df(spark)).collect()}
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (2, 0, 0)
    assert out[0]["text_redacted"] == "write to <EMAIL> or <EMAIL> now"
    assert (out[1]["n_ipv4"], out[1]["n_email"]) == (2, 0)
    assert out[2]["n_phone"] == 3
    assert "<PHONE>" in out[2]["text_redacted"]
    # an ip-shaped mail host has no alphabetic TLD, so the email pattern
    # skips it and the ipv4 stage picks it up
    assert (out[3]["n_email"], out[3]["n_ipv4"]) == (0, 1)
    assert out[3]["text_redacted"] == "email host is not an ip: user@<IP> done"
    # NULL text -> zero counts, empty redaction (no F.size(NULL) = -1 hole)
    assert (out[4]["n_pii"], out[4]["text_redacted"]) == (0, "")
    assert out[5]["n_pii"] == 0
    assert out[5]["text_redacted"] == out[5]["text"]


def test_pii_total_is_sum(spark):
    out = pii_redact(_pii_df(spark)).select(
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")
         - F.col("n_pii")).alias("d")).agg(F.sum("d")).collect()[0][0]
    assert out == 0


# ------------------------------------------------------------ blocklist_gate

def _bl(spark):
    return spark.createDataFrame(
        [
            ("site0.com", "domain", "ads"),
            ("site3.com", "domain", "adult"),
            ("h5.site1.com", "host", "phishing"),
            ("h5.site1.com", "host", "aaa-dup"),  # min(category) wins
            ("site1.com", "domain", "zzz-domain"),
        ],
        "pattern string, kind string, category string",
    )


def test_blocklist_matching(spark):
    urls = spark.createDataFrame(
        [
            (0, "https://h9.site0.com/p/0"),       # subdomain of blocked domain
            (1, "https://www.site0.com/p/1"),      # www stripped in base domain
            (2, "https://h5.site1.com/p/2"),       # exact host beats domain entry
            (3, "https://h6.site1.com/p/3"),       # domain entry only
            (4, "https://h1.site2.com/p/4"),       # unblocked
        ],
        "id long, url string",
    )
    out = {r["id"]: r for r in blocklist_gate(urls, _bl(spark)).collect()}
    assert (out[0]["category"], out[0]["blocked"]) == ("ads", True)
    assert out[1]["category"] == "ads" and out[1]["base_dom"] == "site0.com"
    assert out[2]["category"] == "aaa-dup"  # host entry, min category
    assert out[3]["category"] == "zzz-domain"
    assert out[4]["category"] is None and out[4]["blocked"] is False
    assert out[0]["host"] == "h9.site0.com"


def test_blocklist_is_broadcast(spark):
    urls = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("https://h"), F.col("id") % 7,
                 F.lit(".site"), F.col("id") % 3, F.lit(".com/p/"),
                 F.col("id")).alias("url"))
    plan = blocklist_gate(urls, _bl(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------ mixture_sample

def _docs(spark, n=400):
    langs = ["en", "fr", "de", "zh"]
    rows = [(i, langs[i % 4], 10 + (i * 7) % 90) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, sz long")


WEIGHTS = {"en": 5, "fr": 2, "de": 1}


def _expected_ids(rows, total_budget):
    wsum = sum(WEIGHTS.values())
    budgets = {d: WEIGHTS[d] * total_budget // wsum for d in WEIGHTS}
    by_dom = {}
    for i, lang, sz in rows:
        by_dom.setdefault(lang, []).append(
            (hashlib.md5(f"{i}#7".encode()).hexdigest(), i, sz))
    keep = set()
    for d, items in by_dom.items():
        if d not in budgets:
            continue
        run = 0
        for _, i, sz in sorted(items):
            run += sz
            if run > budgets[d]:
                break
            keep.add(i)
    return keep


def test_mixture_matches_independent_twin(spark):
    docs = _docs(spark)
    rows = [(r["doc_id"], r["lang"], r["sz"]) for r in docs.collect()]
    out = mixture_sample(docs, "doc_id", "lang", WEIGHTS, 8000, "sz", seed=7)
    got = {r["doc_id"] for r in out.collect()}
    assert got == _expected_ids(rows, 8000)
    # zh has no weight -> dropped entirely
    assert out.where(F.col("lang") == "zh").count() == 0


def test_mixture_budgets_respected(spark):
    docs = _docs(spark)
    out = mixture_sample(docs, "doc_id", "lang", WEIGHTS, 5000, "sz", seed=3)
    budgets = {d: WEIGHTS[d] * 5000 // 8 for d in WEIGHTS}
    for r in out.groupBy("lang").agg(F.sum("sz").alias("s"),
                                     F.max("cum_size").alias("m")).collect():
        assert r["s"] <= budgets[r["lang"]]
        assert r["m"] == r["s"]  # cum_size is the per-domain inclusive cumsum


def test_mixture_partitioning_invariant(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in
         mixture_sample(docs, "doc_id", "lang", WEIGHTS, 6000, "sz").collect()}
    b = {r["doc_id"] for r in
         mixture_sample(docs.repartition(13), "doc_id", "lang", WEIGHTS,
                        6000, "sz", num_partitions=5).collect()}
    assert a == b


def test_mixture_zero_budget_empty(spark):
    docs = _docs(spark, 40)
    assert mixture_sample(docs, "doc_id", "lang", WEIGHTS, 0, "sz").count() == 0


def test_output_column_clash_raises(spark):
    docs = spark.createDataFrame([(0, "x", 1)], "doc_id long, text string, n_pii long")
    with pytest.raises(ValueError, match="n_pii"):
        pii_redact(docs)
    urls = spark.createDataFrame([(0, "https://a.b/c", "x")],
                                 "id long, url string, host string")
    with pytest.raises(ValueError, match="host"):
        blocklist_gate(urls, _bl(spark))


# --------------------------------------------------------------- c4_filters

def test_c4_rules_truth_table(spark):
    from crawl4ai_spark.operators.quality import c4_filters
    rows = [
        # kept: 3 terminal-punct lines of >=5 words -> >=3 sentences
        (0, "this line has five good words.\n"
            "another proper sentence sits right here!\n"
            "and a third one finishes the page?"),
        (1, "short line.\nno terminal punctuation here at all\n"
            "enable javascript to view this page."),   # all 3 lines drop
        (2, "lorem ipsum dolor sit amet is here.\n"
            "a perfectly fine second sentence follows.\n"
            "and a third sentence closes it."),         # page gate: lorem
        (3, "var x = { a: 1 };\nthis otherwise fine sentence stays here."),
        (4, "contains badword1 somewhere in the text.\n"
            "plus two more fully valid sentences here.\n"
            "and yet another one right here."),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_filters(df).collect()}
    assert out[0]["keep"] and out[0]["n_kept"] == 3 and out[0]["n_sentences"] == 3
    assert out[0]["drop_reason"] == ""
    # line screens: <5 words, no terminal punct, javascript token
    assert out[1]["n_kept"] == 0 and not out[1]["keep"]
    assert out[1]["drop_reason"] == "too_few_sentences"
    assert out[2]["drop_reason"] == "lorem_ipsum" and not out[2]["keep"]
    assert out[2]["n_kept"] == 3  # line screens still ran
    assert out[3]["drop_reason"] == "brace"
    assert out[4]["drop_reason"] == "bad_word"
    assert out[5]["n_kept"] == 0 and out[5]["text_clean"] == ""


def test_c4_quote_terminal_and_word_floor(spark):
    from crawl4ai_spark.operators.quality import c4_filters
    df = spark.createDataFrame(
        [(0, 'he said "this is a fine quote."\n'
             'she replied "indeed it truly is."\n'
             'four word line here.\n'
             "a closing sentence with enough words.")],
        "doc_id long, text string")
    r = c4_filters(df).collect()[0]
    # the 4-word line drops; quote-terminated lines count
    assert r["n_kept"] == 3 and r["keep"]
