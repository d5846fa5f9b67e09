"""Snapshot store: parquet-per-superstep tables + an atomic JSON manifest.

Iceberg-shaped commit/resume semantics without the Iceberg runtime jar
(unavailable offline — SURVEY §7 plan B): each engine table (frontier,
seen, results, metrics, queue) writes one immutable directory per
superstep; a single ``_manifest.json`` (written atomically via
tmp+rename) is the commit point recording the latest durable superstep and
its counters.  Resume reads the manifest, loads the committed frontier and
the union of committed deltas, and deletes orphan directories from a
crashed superstep — exactly Iceberg's snapshot-isolation contract
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics").  The TableIO surface (write/read_upto/commit/last_commit) is
narrow enough to drop Iceberg in later.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    MANIFEST = "_manifest.json"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- paths
    def _dir(self, table: str, superstep: int) -> str:
        return os.path.join(self.root, table, f"{superstep:06d}")

    # ------------------------------------------------------------- write
    def write(self, table: str, df: DataFrame, superstep: int) -> str:
        path = self._dir(table, superstep)
        df.write.mode("overwrite").parquet(path)
        return path

    # -------------------------------------------------------------- read
    def read_one(self, spark: SparkSession, table: str, superstep: int) -> DataFrame | None:
        path = self._dir(table, superstep)
        if not os.path.isdir(path):
            return None
        return spark.read.parquet(path)

    def read_upto(self, spark: SparkSession, table: str, superstep: int) -> DataFrame | None:
        base = os.path.join(self.root, table)
        if not os.path.isdir(base):
            return None
        paths = [
            os.path.join(base, d)
            for d in sorted(os.listdir(base))
            if d.isdigit() and int(d) <= superstep
        ]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    # ------------------------------------------------------------ commit
    def commit(self, superstep: int, counters: dict[str, Any]) -> None:
        manifest = {"superstep": superstep, "counters": counters}
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.root, self.MANIFEST))

    def partition_lineage(self, table: str, superstep: int) -> list[dict[str, Any]]:
        """Per-partition lineage of a committed table snapshot: one record
        per written part file (= one write partition) with its row count and
        byte size, read from the parquet footers on the driver — no Spark
        job.  Footers are O(KB) each, so this stays cheap even when the
        snapshot has thousands of partitions (north_rule: "resumable from
        checkpoint with per-partition lineage + metrics")."""
        import pyarrow.parquet as pq

        path = self._dir(table, superstep)
        if not os.path.isdir(path):
            return []
        out = []
        for name in sorted(os.listdir(path)):
            if not name.endswith(".parquet") or name.startswith("_"):
                continue
            fp = os.path.join(path, name)
            out.append({
                "file": name,
                "rows": pq.read_metadata(fp).num_rows,
                "bytes": os.path.getsize(fp),
            })
        return out

    def write_json(self, table: str, superstep: int, obj: Any) -> None:
        path = self._dir(table, superstep)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "data.json"), "w") as f:
            json.dump(obj, f)

    def last_commit(self) -> dict[str, Any] | None:
        path = os.path.join(self.root, self.MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    # ----------------------------------------------------------- recover
    def clean_orphans(self, committed_superstep: int) -> list[str]:
        """Delete table dirs newer than the committed superstep (partial
        writes from a crash after data write but before manifest commit)."""
        removed = []
        for table in os.listdir(self.root):
            base = os.path.join(self.root, table)
            if not os.path.isdir(base):
                continue
            for d in os.listdir(base):
                if d.isdigit() and int(d) > committed_superstep:
                    shutil.rmtree(os.path.join(base, d))
                    removed.append(f"{table}/{d}")
        return removed
