"""Hot-key skew diagnostics: the measurement half of D7 salting.

The engine already *acts* on skew (``politeness.salt_hot_hosts`` fans hot
hosts across salted sub-keys; AQE re-splits skewed joins at runtime), but
deciding WHICH keys to salt — and proving a partitioning would straggle
before burning cluster-hours — needs a diagnostic: the per-key histogram
head plus an imbalance factor.  At 10^10 rows the full histogram is
host-dimension sized (fine); only the report's head ships to the driver.

``hot_key_report`` returns the top-k keys by count, each row carrying the
corpus-level context so the report is self-contained:

  - ``n_rows``      — this key's row count,
  - ``rank``        — 1-based, count desc / key asc (deterministic ties),
  - ``share_bp``    — 10000·n_rows DIV total_rows,
  - ``total_rows`` / ``n_keys`` — corpus totals,
  - ``imbalance_bp``— 10000·n_rows·n_keys DIV total_rows: this key's
    count as basis points of the MEAN key count (10000 = perfectly
    even; a key at 50000 does 5× the average partition's work — salt it).

All integer, engine-exact.  Scale shape: ONE partial-agg groupBy on the
key; totals aggregate the key-sized counted frame (no second pass over
the data); the rank window sorts the KEY-SIZED counts frame — one
reducer over #keys rows, never the corpus — and totals join back as a
broadcast one-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hot_key_report(df: DataFrame, key_col: str, k: int = 20) -> DataFrame:
    counts = (df.groupBy(F.col(key_col).alias("key"))
              .agg(F.count("*").cast("long").alias("n_rows")))
    totals = counts.agg(
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("n_keys"))
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key"))
    top = (counts
           .withColumn("rank", F.row_number().over(w).cast("long"))
           .filter(F.col("rank") <= k))
    return (top.crossJoin(F.broadcast(totals))
            .withColumn("share_bp",
                        F.expr("10000 * n_rows DIV total_rows"))
            # DECIMAL(38,0) product: 10000·n_rows·n_keys overflows int64
            # at the 10^10-row / 10^8-key scale this module documents
            .withColumn("imbalance_bp", F.expr(
                "CAST(CAST(10000 AS DECIMAL(38,0))"
                " * CAST(n_rows AS DECIMAL(38,0))"
                " * CAST(n_keys AS DECIMAL(38,0))"
                " DIV CAST(total_rows AS DECIMAL(38,0)) AS BIGINT)"))
            .select("key", "n_rows", "rank", "share_bp",
                    "total_rows", "n_keys", "imbalance_bp"))
