"""Streaming document-frequency: the stateful term counter must converge
to the batch heavy_hitters counts for ANY micro-batch partitioning of the
corpus (the last emitted df per term is the batch df)."""

import os

import pytest
from pyspark.sql import functions as F

DOCS = [
    (0, "the quick fox the fox"),          # distinct: the, quick, fox
    (1, "fox jumps over the dog"),
    (2, "quick quick dog"),
    (3, "entirely new words here"),
    (4, "the dog sleeps"),
    (5, "fox den"),
]


@pytest.fixture(scope="module")
def doc_store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_hitters")
    path = str(root / "docs")
    slices = [DOCS[:2], DOCS[2:4], DOCS[4:]]
    for i, sl in enumerate(slices):
        df = spark.createDataFrame(sl, "doc_id long, text string")
        out = os.path.join(path, f"slice={i}")
        df.coalesce(1).write.mode("overwrite").parquet(out)
        for dirpath, _dirs, files in os.walk(out):
            for f in files:
                fp = os.path.join(dirpath, f)
                os.utime(fp, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return path


def test_term_df_stream_converges_to_batch(spark, doc_store):
    from crawl4ai_spark.operators.text import heavy_hitters
    from crawl4ai_spark.streaming.hitters import term_df_stream

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(doc_store)
    )
    q = (
        term_df_stream(stream)
        .writeStream.format("memory").queryName("term_df")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # the LAST emitted df per term is the converged count
    finals = {
        r["term"]: r["df"]
        for r in spark.sql(
            "select term, max(df) as df from term_df group by term"
        ).collect()
    }

    batch = spark.createDataFrame(DOCS, "doc_id long, text string")
    expected = {
        r["term"]: r["df"]
        for r in heavy_hitters(batch, k=100).collect()
    }
    assert finals == expected
    # hand-check a few: df counts DOCUMENTS, not occurrences
    assert finals["the"] == 3      # docs 0, 1, 4
    assert finals["fox"] == 3      # docs 0, 1, 5
    assert finals["quick"] == 2    # docs 0, 2 (doc 2's repeat counts once)
    # intermediate emissions are monotone running values
    fox_hist = [
        r["df"] for r in spark.sql(
            "select df from term_df where term = 'fox'").collect()
    ]
    assert sorted(fox_hist) == fox_hist and fox_hist[-1] == 3
