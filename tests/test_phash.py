"""phash near-dup image dedup: the pigeonhole Hamming join on the payload
table's 64-bit perceptual-hash column must equal a brute-force O(n²)
popcount (exactness of the blocking, not just recall)."""

import numpy as np
from pyspark.sql import functions as F

from crawl4ai_spark.operators import dedup
from crawl4ai_spark.sources import synth


def _brute(hashes, k):
    h = np.array([np.uint64(x % (1 << 64)) for x in hashes], dtype=np.uint64)
    x = h[:, None] ^ h[None, :]
    pop = np.unpackbits(x.view(np.uint8).reshape(len(h), len(h), 8), axis=2).sum(
        axis=2, dtype=np.int64)
    return {(a, b): int(pop[a, b])
            for a, b in zip(*np.nonzero(np.triu(pop <= k, k=1)))}


def test_phash_pairs_exact_vs_bruteforce(spark):
    p = synth.GraphParams(n_pages=140, n_domains=12, seed=42)
    _, _, images = synth.synth_tables(spark, p)
    rows = images.select("image_id", "phash").orderBy("image_id").collect()
    ids = [r["image_id"] for r in rows]
    want = {(ids[a], ids[b]): h
            for (a, b), h in _brute([r["phash"] for r in rows], 4).items()}
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.phash_pairs(images, max_hamming=4).collect()}
    assert got == want
    assert len(want) > 0  # synth injects near-dup images — corpus not trivial


def test_synth_injects_near_dup_images(spark):
    """Every 7th image is a perturbed copy of its group base: phash within
    a few bits, pixels NOT byte-identical (near-dup, not exact)."""
    p = synth.GraphParams(n_pages=70, n_domains=12, seed=42)
    hams, exact = [], 0
    for i in range(6, 70, 7):
        j = synth.image_dup_base(i)
        assert j == i - 6
        iid, w, h, _ = synth.image_meta_of(i, p)
        jid, wj, hj, _ = synth.image_meta_of(j, p)
        assert (w, h) == (wj, hj)  # dup inherits base dims
        a = synth.image_pixels(iid, w, h, p.seed)
        b = synth.image_pixels(jid, w, h, p.seed)
        assert not (a == b).all()
        ha = synth.codecs.phash64(a)
        hb = synth.codecs.phash64(b)
        hams.append(bin((ha ^ hb) % (1 << 64)).count("1"))
    assert max(hams) <= 12 and np.mean(hams) <= 5  # near, not random (~32)


def test_hamming_pairs_threshold_is_exact(spark):
    """Pairs straddling the threshold: k and k+1 distances split exactly."""
    base = 0x0123456789ABCDEF
    vals = [("a", base), ("b", base ^ 0b111), ("c", base ^ 0b11111),
            ("d", base ^ (1 << 63))]
    df = spark.createDataFrame(
        [(i, v - (1 << 64) if v >= (1 << 63) else v) for i, v in vals],
        "image_id string, phash long")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.phash_pairs(df, max_hamming=3).collect()}
    # a-b: 3 bits (kept), a-c: 5 (dropped), a-d: 1 (kept, sign bit),
    # b-c: 2 (kept), b-d: 4 (dropped), c-d: 6 (dropped)
    assert got == {("a", "b"): 3, ("a", "d"): 1, ("b", "c"): 2}


# ------------------------------------------------------ cluster formation

def _uf(ids, edges):
    """Independent union-find twin."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_connected_components_transitive(spark):
    # a-b, b-c, plus isolated pair x-y: a,b,c collapse via transitivity
    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string")
    got = {r["id"]: r["comp"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_chain_converges(spark):
    # worst-case shape for hash-min: a 30-node path (diameter 29)
    ids = [f"n{i:02d}" for i in range(30)]
    pairs = spark.createDataFrame(
        list(zip(ids, ids[1:])), "id_a string, id_b string")
    got = {r["id"]: r["comp"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {i: "n00" for i in ids}


def test_dedup_clusters_matches_union_find(spark):
    p = synth.GraphParams(n_pages=105, n_domains=12, seed=42)
    _, _, images = synth.synth_tables(spark, p)
    pairs = dedup.phash_pairs(images, max_hamming=4)
    got = {r["image_id"]: (r["component"], r["canonical"])
           for r in dedup.dedup_clusters(images, pairs, "image_id").collect()}
    ids = [r["image_id"]
           for r in images.select("image_id").orderBy("image_id").collect()]
    edges = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    want = _uf(ids, edges)
    assert len(got) == len(ids)
    for i in ids:
        assert got[i] == (want[i], want[i] == i), i
    # most planted dups (every 7th image) land within the k=4 gate —
    # those groups must come out non-singleton
    assert sum(1 for i in ids if got[i][0] != i) >= len(ids) // 10


def test_caption_dedup_groups_dup_alt_text(spark):
    """Dup images inherit their base caption (half reformatted) — the
    normalized-caption groups must contain exactly the planted dup pairs,
    keep the lowest image_id, and count distinct phashes per group."""
    p = synth.GraphParams(n_pages=70, n_domains=12, seed=42)
    _, _, images = synth.synth_tables(spark, p)
    got = {r["keep_id"]: (r["n_rows"], r["n_phash"])
           for r in dedup.caption_dedup(images).collect()}
    # pure-Python twin over the same generator
    import collections
    norm = lambda s: " ".join(s.split()).lower()
    groups = collections.defaultdict(list)
    for i in range(70):
        iid, w, h, _ = synth.image_meta_of(i, p)
        ph = synth.codecs.phash64(synth.image_pixels(iid, w, h, p.seed))
        groups[norm(synth._caption_of(i, p))].append((iid, ph))
    want = {min(x[0] for x in g): (len(g), len({x[1] for x in g}))
            for g in groups.values()}
    assert got == want
    # planted: every 7th image shares its base's normalized caption
    assert any(n == 2 for n, _ in got.values())


def test_image_joint_neardup_is_caption_gated_subset(spark):
    p = synth.GraphParams(n_pages=105, n_domains=12, seed=42)
    _, _, images = synth.synth_tables(spark, p)
    all_pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in dedup.phash_pairs(images, max_hamming=8).collect()}
    joint = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dedup.image_joint_neardup(images, max_hamming=8).collect()}
    assert set(joint) <= set(all_pairs)
    assert all(joint[k] == all_pairs[k] for k in joint)
    # the caption gate keeps only same-alt-text pairs
    caps = {r["image_id"]: r["caption"]
            for r in images.select("image_id", "caption").collect()}
    norm = lambda s: " ".join(s.split()).lower()
    for (a, b), _ in all_pairs.items():
        assert ((a, b) in joint) == (norm(caps[a]) == norm(caps[b]))
    assert len(joint) > 0  # planted dups carry their base caption
