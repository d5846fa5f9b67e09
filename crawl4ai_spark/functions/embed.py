"""Deterministic hash embeddings — the model-free embedding column.

The reference CosineStrategy embeds chunks with a sentence-transformer
(extraction_strategy.py:281-334), a model binary this environment doesn't
ship.  The engine therefore treats the embedding as a PLUGGABLE COLUMN;
for tests/probes both sides derive it from the text with this spec:

    component c of embed(text, dim) = xxh64(f"emb|{c}|{text}") / 2^63 - 1.0

i.e. dim pseudo-random components in [-1, 1), reproducible anywhere (the
oracle twin re-implements the same one-line spec without importing this
module).  Real deployments swap in a model-backed column; everything
downstream (clustering, ANN, near-dup) only sees `array<double>`.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..hashing import xxh64


def py_hash_embedding(text: str, dim: int) -> np.ndarray:
    return np.array(
        [xxh64(f"emb|{c}|{text}".encode()) / 2.0**63 - 1.0 for c in range(dim)],
        dtype=np.float64,
    )


def with_hash_embedding(df: DataFrame, text_col: str, dim: int,
                        out_col: str = "embedding") -> DataFrame:
    """Arrow-batched embedding stage (no per-row Python crossings: one
    pandas batch in, one out)."""
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b.copy()
            b[out_col] = [
                py_hash_embedding(t if t is not None else "", dim).tolist()
                for t in b[text_col]
            ]
            yield b

    return df.mapInPandas(run, f"{fields}, {out_col} array<double>")
