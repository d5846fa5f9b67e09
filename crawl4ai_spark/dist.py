"""Distributed helpers that avoid single-partition bottlenecks."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def with_global_seq(df: DataFrame, order_cols: list[Column | str],
                    out_col: str = "seq", start: int = 0,
                    num_partitions: int | None = None) -> DataFrame:
    """Dense global 0-based rank by ``order_cols`` WITHOUT a
    single-partition window: range-partition on the sort key, persist (so
    both passes see identical partitions), collect per-partition counts,
    then assign offset + local index in one Arrow pass.

    This is the scale-safe replacement for
    ``row_number().over(Window.orderBy(...))`` — the naive form funnels the
    whole superstep through one task.
    """
    if not df.take(1):
        return df.withColumn(out_col, F.lit(start).cast("long"))
    rng = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    d = (
        rng
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = {r["__pid"]: r["count"] for r in d.groupBy("__pid").count().collect()}
    offsets = {}
    acc = start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    bc = d.sparkSession.sparkContext.broadcast(offsets)
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        off = None
        for b in batches:
            if off is None and len(b):
                off = bc.value[int(b["__pid"].iloc[0])]
            b = b.copy()
            b[out_col] = off + local + pd.RangeIndex(len(b))
            local += len(b)
            yield b.drop(columns=["__pid"])

    out = d.mapInPandas(assign, f"{fields}, {out_col} long")
    return out
