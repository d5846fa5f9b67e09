"""Table maintenance planning: small-file compaction over a file manifest.

A checkpointed crawl writes thousands of snapshot/delta files per round
(``plans/checkpoint.py``); at 100 TB the results table's partition dirs
accumulate small parquet files that tax every subsequent scan (driver
listing, row-group overhead, task-per-file scheduling).  Iceberg calls
the fix ``rewriteDataFiles`` (bin-pack strategy); this operator emits the
same plan from a plain file manifest so the rewrite job knows exactly
which files fold into which output — without a catalog.

Contract (mirrors the greedy first-byte slicing every packer here uses —
``sampling.shard_pack``, ``export.webdataset_plan``): within each table
partition, files smaller than ``small_bytes`` are laid out in path order
and assigned to the compaction group where their first byte falls
(``cum_before DIV target_bytes``); files ≥ ``small_bytes`` are already
compact and emit ``action='keep'`` with no group.  A group's data run
ends at most one file past the budget; files never split.  Singleton
groups (one small file alone in its partition/group) are still emitted —
the executor may skip them, but the plan records them deterministically.

Adds per file: ``action`` ('compact' | 'keep'), ``grp`` (long, -1 for
keeps), ``grp_off`` (first byte of this file inside its group's rewrite,
-1 for keeps).  All integer, engine-exact under any partitioning.

Scale shape: ONE shuffle on the table-partition key (the window) — the
natural compaction unit; no global order exists, so no single-reducer
cumsum.  The manifest is file-dimension sized, microscopic next to the
data it describes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(manifest: DataFrame, target_bytes: int,
                    small_bytes: int | None = None,
                    part_col: str = "part", path_col: str = "path",
                    size_col: str = "bytes") -> DataFrame:
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    if small_bytes is None:
        small_bytes = target_bytes
    small = F.col(size_col) < F.lit(int(small_bytes))
    w = (Window.partitionBy(part_col)
         .orderBy(path_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(
        F.sum(F.when(small, F.col(size_col)).otherwise(F.lit(0))).over(w),
        F.lit(0)).cast("long")
    df = manifest.withColumn("__cum", F.when(small, cum_before))
    grp = F.expr(f"__cum DIV {int(target_bytes)}")
    return (df
            .withColumn("action",
                        F.when(small, F.lit("compact")).otherwise("keep"))
            .withColumn("grp",
                        F.when(small, grp).otherwise(F.lit(-1)).cast("long"))
            .withColumn(
                "grp_off",
                F.when(small, F.col("__cum") - grp * F.lit(int(target_bytes)))
                .otherwise(F.lit(-1)).cast("long"))
            .drop("__cum"))


def compaction_summary(plan: DataFrame,
                       part_col: str = "part",
                       size_col: str = "bytes") -> DataFrame:
    """One row per compaction group: file count and total bytes — the
    rewrite job's work list.  One partial-agg groupBy over the plan."""
    return (plan.filter(F.col("action") == "compact")
            .groupBy(F.col(part_col).alias("part"), "grp")
            .agg(F.count("*").cast("long").alias("n_files"),
                 F.sum(size_col).cast("long").alias("grp_bytes")))
