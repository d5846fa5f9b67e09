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


def snapshot_retention(snapshots: DataFrame, retain_last: int,
                       min_ts: int | None = None,
                       id_col: str = "snapshot_id",
                       ts_col: str = "ts") -> DataFrame:
    """Classify snapshots under Iceberg's ``expireSnapshots`` policy:
    a snapshot is retained iff it is one of the newest ``retain_last``
    (by ``ts``, snapshot id breaking ties) OR at least as new as
    ``min_ts`` (the time-travel window).  Adds ``rank`` (1 = newest)
    and ``retained``.

    Scale shape: the snapshots table is commit-dimension sized (one row
    per checkpoint commit — thousands, not billions), so the single
    global rank window is over a tiny frame; downstream joins against
    it broadcast.
    """
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    w = Window.orderBy(F.col(ts_col).desc(), F.col(id_col).desc())
    ranked = snapshots.withColumn(
        "rank", F.row_number().over(w).cast("long"))
    keep = F.col("rank") <= F.lit(int(retain_last))
    if min_ts is not None:
        keep = keep | (F.col(ts_col) >= F.lit(int(min_ts)))
    return ranked.withColumn("retained", keep)


def expire_snapshots(refs: DataFrame, snapshots: DataFrame,
                     retain_last: int, min_ts: int | None = None,
                     id_col: str = "snapshot_id", ts_col: str = "ts",
                     path_col: str = "path",
                     size_col: str = "bytes") -> DataFrame:
    """File-level expiry plan: which data files become unreachable when
    the non-retained snapshots are expired — Iceberg's
    ``expireSnapshots().cleanExpiredFiles()`` decision, computed from a
    plain (snapshot_id, path, bytes) reference manifest so a
    checkpointed crawl (``plans/checkpoint.py`` writes one snapshot per
    superstep) can garbage-collect without a catalog.

    A file is ``removable`` iff every snapshot referencing it is
    expired; a single retained reference keeps it (time travel to any
    retained snapshot must still resolve every file it listed).

    Dangling references — rows whose ``snapshot_id`` is absent from the
    ``snapshots`` frame (a manifest written by a commit the snapshots
    table hasn't caught up to) — are treated as RETAINED: for a
    deletion decision, unknown provenance must fail safe toward keeping
    the file, never toward deleting it.

    Emits one row per file: ``n_refs``, ``n_retained_refs``,
    ``removable``, ``bytes``.  All integer/boolean — engine-exact.

    Scale shape: the snapshot classification is broadcast
    (commit-dimension sized); the reference manifest pays ONE
    partial-agg groupBy on ``path``.  No window over the manifest, no
    corpus-sized shuffle beyond the one aggregation.
    """
    from pyspark.sql.functions import broadcast

    ret = snapshot_retention(snapshots, retain_last, min_ts,
                             id_col=id_col, ts_col=ts_col)
    joined = refs.join(
        broadcast(ret.select(id_col, "retained")), id_col, "left")
    # NULL retained = dangling ref = fail-safe retained
    retained = F.coalesce(F.col("retained"), F.lit(True))
    return (joined.groupBy(path_col)
            .agg(F.count("*").cast("long").alias("n_refs"),
                 F.sum(retained.cast("long")).cast("long")
                 .alias("n_retained_refs"),
                 F.max(size_col).cast("long").alias("bytes"))
            .withColumn("removable", F.col("n_retained_refs") == 0))


def expire_summary(plan: DataFrame) -> DataFrame:
    """One row per removability class: file count + bytes — the GC
    job's work estimate (reclaimable = the removable row's bytes).
    One partial-agg over the file-dimension plan."""
    return (plan.groupBy("removable")
            .agg(F.count("*").cast("long").alias("n_files"),
                 F.sum("bytes").cast("long").alias("total_bytes")))
