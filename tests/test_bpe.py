"""BPE trainer + segmenter vs an independent sequential twin.

The twin re-derives word counts, pair statistics, and greedy merges with
dicts and loops only — no engine imports on the expected side.
"""

from crawl4ai_spark.operators.bpe import bpe_segment, bpe_train

END = "</w>"


def _twin_train(texts, num_merges, min_pair_freq=2):
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    syms = {w: list(w) + [END] for w in wc}
    merges = []
    for rank in range(num_merges):
        pf: dict[tuple[str, str], int] = {}
        for w, ss in syms.items():
            for a, b in zip(ss, ss[1:]):
                pf[(a, b)] = pf.get((a, b), 0) + wc[w]
        if not pf:
            break
        # (freq desc, left asc, right asc)
        (l, r), freq = min(pf.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < min_pair_freq:
            break
        merges.append((rank, l, r, freq))
        for w, ss in syms.items():
            out = []
            for s in ss:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            syms[w] = out
    return merges


def _twin_encode(word, ranks):
    syms = list(word) + [END]
    while len(syms) >= 2:
        cands = [(ranks[(a, b)], (a, b)) for a, b in zip(syms, syms[1:])
                 if (a, b) in ranks]
        if not cands:
            break
        _, (l, r) = min(cands)
        out = []
        for s in syms:
            if out and out[-1] == l and s == r:
                out[-1] = l + r
            else:
                out.append(s)
        syms = out
    return syms


CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "the lower the newer the better",
    "low and lower and newest",
]


def test_bpe_train_matches_twin(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id long, text string")
    got = [(r["rank"], r["left"], r["right"], r["freq"])
           for r in bpe_train(df, num_merges=12).orderBy("rank").collect()]
    want = _twin_train(CORPUS, 12)
    assert got == want
    assert len(got) == 12  # corpus is rich enough to sustain 12 merges
    # the most frequent pair in this corpus is ('l','o') or ('o','w'-ish);
    # whatever it is, rank 0 must have the global max frequency
    assert got[0][3] == max(m[3] for m in want)


def test_bpe_train_early_stop_and_partition_invariance(spark):
    df = spark.createDataFrame([(0, "ab ab"), (1, "ab cd")],
                               "doc_id long, text string")
    got = [(r["rank"], r["left"], r["right"], r["freq"])
           for r in bpe_train(df, num_merges=50).orderBy("rank").collect()]
    assert got == _twin_train(["ab ab", "ab cd"], 50)
    # invariance: 13-way repartition learns the identical sequence
    df2 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)],
        "doc_id long, text string").repartition(13)
    a = [(r["rank"], r["left"], r["right"], r["freq"])
         for r in bpe_train(df2, num_merges=8).orderBy("rank").collect()]
    assert a == _twin_train(CORPUS, 8)


def test_bpe_segment_matches_twin(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id long, text string")
    merges = bpe_train(df, num_merges=10)
    ranks = {(r["left"], r["right"]): r["rank"] for r in merges.collect()}
    got = {r["doc_id"]: (r["n_tokens"], r["n_pieces"])
           for r in bpe_segment(df, merges).collect()}
    want = {}
    for i, t in enumerate(CORPUS):
        ws = t.lower().split()
        want[i] = (len(ws), sum(len(_twin_encode(w, ranks)) for w in ws))
    assert got == want
    # merges actually compress: fewer pieces than raw chars+markers
    raw = {i: sum(len(w) + 1 for w in t.lower().split())
           for i, t in enumerate(CORPUS)}
    assert all(got[i][1] < raw[i] for i in got)


def test_bpe_train_batched_rounds(spark):
    from crawl4ai_spark.operators.bpe import _select_disjoint, bpe_train

    # _select_disjoint drops any pair sharing a symbol with an earlier pick
    cands = [
        {"l": "a", "r": "b", "freq": 9},
        {"l": "b", "r": "c", "freq": 8},   # shares 'b' -> skipped
        {"l": "c", "r": "d", "freq": 7},
        {"l": "ab", "r": "e", "freq": 6},  # 'ab' is a minted symbol -> skipped
        {"l": "x", "r": "y", "freq": 5},
    ]
    picked = [(r["l"], r["r"]) for r in _select_disjoint(cands, 4)]
    assert picked == [("a", "b"), ("c", "d"), ("x", "y")]

    # a corpus whose top pairs are symbol-disjoint learns the SAME table
    # batched as classic (the batch is exact when no interaction exists):
    # (a,a) (b,b) (c,c) (d,d) all at freq 12, every other pair ≤ 6
    corpus = ["aaa bbb ccc ddd"] * 6
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)],
                               "doc_id long, text string")
    classic = [(r["rank"], r["left"], r["right"], r["freq"])
               for r in bpe_train(df, num_merges=4).orderBy("rank").collect()]
    batched = [(r["rank"], r["left"], r["right"], r["freq"])
               for r in bpe_train(df, num_merges=4, merges_per_round=4)
               .orderBy("rank").collect()]
    assert classic == batched
    assert len(batched) == 4

    # batched training still early-stops under min_pair_freq
    tiny = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    got = bpe_train(tiny, num_merges=8, min_pair_freq=2,
                    merges_per_round=4).collect()
    assert got == []
