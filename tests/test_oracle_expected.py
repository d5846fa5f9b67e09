"""sf-tagged expected-table cache: gating two sfs in one process must keep
two distinct parquet files (round-3 verdict: every sf used to share
EXPECTED_DIR/<name>.parquet, so interleaved sfs served stale tables)."""

import os

import pandas as pd

from crawl4ai_spark.oracle import expected as oe

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_sf_tagged_paths_distinct():
    p1 = oe.expected_path("minhash_lsh", SFS[0])
    p2 = oe.expected_path("minhash_lsh", SFS[1])
    assert p1 != p2
    assert os.path.basename(p1) == "sf0.001__minhash_lsh.parquet"
    assert oe.expected_path("bfs_crawl") == oe.expected_path("bfs_crawl", None)


def test_two_sfs_in_one_process():
    for sf in SFS:
        if not os.path.isdir(sf):
            return  # machine lacks one sf: nothing to cross-contaminate
    for sf in SFS:
        oe.ensure_simhash_expected(sf)
    tables = {sf: pd.read_parquet(oe.expected_path("simhash_pairs", sf))
              for sf in SFS}
    # regenerating the first sf again must be a memo no-op (file unchanged)
    mtime = os.path.getmtime(oe.expected_path("simhash_pairs", SFS[0]))
    oe.ensure_simhash_expected(SFS[0])
    assert os.path.getmtime(oe.expected_path("simhash_pairs", SFS[0])) == mtime
    # and both files still hold their own sf's rows (different doc counts)
    assert not tables[SFS[0]].equals(tables[SFS[1]])
