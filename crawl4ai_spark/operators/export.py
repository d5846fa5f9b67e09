"""WebDataset-style shard export planning for image+caption pairs.

The standard delivery format for multimodal training corpora is a set of
POSIX tar shards where each sample is a group of same-stem members
(``{key}.img`` + ``{key}.txt`` — the WebDataset convention used by the
LAION releases and ``webdataset.ShardWriter``).  Writing the tars is
trivially parallel ONCE every sample knows its shard and byte offset; the
hard part at 10^10 samples is computing that placement without a
single-reducer scan.  That is what this module does: an exact, fully
distributed PLAN — (shard, per-member byte offsets, shard sizes) — that a
writer stage (or an external archiver) can execute independently per
shard.

Tar geometry is fixed by the format and therefore exactly computable from
member sizes alone: every member costs a 512-byte header plus its payload
zero-padded to a 512-byte boundary; an archive ends with two 512-byte
zero blocks and is padded to a 10240-byte blocking factor (GNU tar
defaults, ``webdataset`` writes the same).  All of it is 64-bit integer
arithmetic — the plan is byte-identical on any engine/partitioning.

Scale shape: sample order is the deterministic md5 corpus shuffle
(``sampling.shard_pack``'s contract); the single global running sum rides
``dist.hex_bucketed_cumsum`` (uniform md5 keys → bucket boundaries known
a priori: one eager checkpoint, one tiny bucket agg, ONE shuffle); shard
base offsets come back as a broadcast #shards-sized dim.  No window over
the corpus, no driver-side loop.

Reference anchor: crawl4ai stops at per-page media lists
(models.py:302-329); packing the corpus for a training loader is the
post-crawl stage a 100 TB image+caption pipeline needs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dist import hex_bucketed_cumsum
from .sampling import hash_uniform_hex

__all__ = ["tar_member_bytes", "tar_member", "webdataset_plan",
           "webdataset_shards", "write_webdataset"]

TAR_BLOCK = 512
TAR_EOF_BYTES = 2 * TAR_BLOCK          # two zero blocks end the archive
TAR_BLOCKING_FACTOR = 20               # records of 20 blocks = 10240 bytes
TAR_RECORD = TAR_BLOCK * TAR_BLOCKING_FACTOR


def tar_member_bytes(size_col: str):
    """Bytes a payload of ``size_col`` occupies as one tar member:
    512-byte header + payload padded to the next 512 boundary."""
    return F.expr(
        f"512 + ((CAST({size_col} AS BIGINT) + 511) DIV 512) * 512"
    )


def webdataset_plan(
    df: DataFrame,
    key_col: str = "image_id",
    members: tuple[tuple[str, str], ...] = (("img", "img_size"),
                                            ("txt", "txt_size")),
    shard_bytes: int = 1 << 28,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Plan the WebDataset tar layout for every sample.

    ``members`` is the ordered (ext, size_col) list of the sample's tar
    members (the WebDataset same-stem group, written consecutively).
    Samples are laid out in the deterministic md5-shuffled corpus order
    (``pack_key`` ties broken by ``key_col``), assigned to the shard
    where their first byte falls (``cum_before DIV shard_bytes`` — greedy
    slicing, samples never split: a shard's data run ends at most one
    sample past the budget, the same contract as ``sampling.shard_pack``),
    and given exact member offsets relative to their shard's start.

    Adds per row: ``pack_key``, ``sample_bytes`` (total tar bytes of the
    group), ``shard`` (long), ``sample_off`` (byte offset of the sample's
    first header within its shard), and ``off_{ext}`` per member (offset
    of that member's 512-byte header; its payload starts 512 later).

    Exactly ONE corpus shuffle (the bucketed cumsum) plus one partial-agg
    groupBy over its output for the per-shard base (broadcast back —
    #shards rows).  Everything else is codegen integer arithmetic.

    Cost note: the base aggregate and the output projection both consume
    the cumsum fold, so the per-bucket Arrow sort+cumsum executes twice
    over the SAME checkpointed, already-shuffled input (Spark's
    ReuseExchange dedups the exchange; only the cheap post-shuffle fold
    repeats) — measured cheaper than a second corpus-sized checkpoint of
    the fold output, the same tradeoff ``dist.hex_bucketed_cumsum``
    documents for its totals pass.
    """
    if shard_bytes <= 0:
        raise ValueError("shard_bytes must be positive")
    if not members:
        raise ValueError("members must be non-empty")
    keyed = df.withColumn("pack_key", hash_uniform_hex(F.col(key_col), seed))
    total = None
    for _ext, size_col in members:
        mb = tar_member_bytes(size_col)
        total = mb if total is None else total + mb
    keyed = keyed.withColumn("sample_bytes", total.cast("long"))
    packed = hex_bucketed_cumsum(
        keyed, "pack_key", key_col, "sample_bytes",
        out_col="__cum", n_buckets=num_partitions,
    )
    before = F.col("__cum") - F.col("sample_bytes")
    packed = packed.withColumn("__before", before).withColumn(
        # integer DIV, not float floor(/): at multi-PB cumulative
        # offsets a double quotient's ulp exceeds 1/shard_bytes and a
        # boundary sample could round into the wrong shard
        "shard", F.expr(f"__before DIV {int(shard_bytes)}").cast("long")
    )
    # per-shard base = cum_before of the shard's first sample (broadcast dim)
    base = packed.groupBy("shard").agg(F.min("__before").alias("__base"))
    planned = packed.join(F.broadcast(base), "shard")
    planned = planned.withColumn(
        "sample_off", (F.col("__before") - F.col("__base")).cast("long")
    )
    off = F.col("sample_off")
    for ext, size_col in members:
        planned = planned.withColumn(f"off_{ext}", off.cast("long"))
        off = off + tar_member_bytes(size_col)
    return planned.drop("__cum", "__before", "__base")


def webdataset_shards(plan: DataFrame) -> DataFrame:
    """Per-shard summary of a ``webdataset_plan`` output: sample count,
    data bytes, and the exact on-disk archive size (data + two zero EOF
    blocks, padded to the 10240-byte tar blocking factor) — the numbers a
    writer pre-allocates and a manifest records.  ONE partial-agg groupBy
    over the plan (#shards result rows)."""
    return (
        plan.groupBy("shard")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum("sample_bytes").alias("data_bytes"),
        )
        .withColumn(
            "archive_bytes",
            F.expr(
                f"((data_bytes + {TAR_EOF_BYTES} + {TAR_RECORD - 1})"
                f" DIV {TAR_RECORD}) * {TAR_RECORD}"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Plan execution: write the actual tar shards
# ---------------------------------------------------------------------------

def _tar_header(name: str, size: int) -> bytes:
    """Deterministic USTAR member header: mode 0644, uid/gid 0, mtime 0 —
    every field fixed so shard bytes are identical on any writer task."""
    if len(name.encode()) > 100:
        raise ValueError(f"tar member name too long: {name!r}")
    if size < 0 or size >= 8 ** 11:  # 12-char octal field holds < 8 GiB
        raise ValueError(f"tar member size out of range: {size}")
    buf = bytearray(512)
    buf[0:len(name.encode())] = name.encode()
    buf[100:108] = b"0000644\x00"
    buf[108:116] = b"0000000\x00"          # uid
    buf[116:124] = b"0000000\x00"          # gid
    buf[124:136] = ("%011o" % size).encode() + b"\x00"
    buf[136:148] = b"00000000000\x00"      # mtime 0
    buf[148:156] = b" " * 8                # checksum placeholder
    buf[156] = 0x30                        # typeflag '0' regular file
    buf[257:263] = b"ustar\x00"            # POSIX magic
    buf[263:265] = b"00"                   # version
    chksum = sum(buf)
    buf[148:156] = ("%06o" % chksum).encode() + b"\x00 "
    return bytes(buf)


def tar_member(name: str, payload: bytes) -> bytes:
    pad = (-len(payload)) % TAR_BLOCK
    return _tar_header(name, len(payload)) + payload + b"\x00" * pad


def write_webdataset(plan: DataFrame, outdir: str,
                     key_col: str = "image_id",
                     members: tuple[tuple[str, str], ...] = (
                         ("img", "img_bytes"), ("txt", "txt_bytes")),
                     prefix: str = "shard") -> DataFrame:
    """EXECUTE a ``webdataset_plan``: build each tar shard and write it to
    ``outdir`` (a shared filesystem / object-store mount at cluster scale
    — the standard WebDataset export pattern: each shard is produced by
    exactly one task, shards are embarrassingly parallel).

    ``plan`` must carry the planner's columns plus the payload bytes named
    by ``members`` (ext, bytes_col) — join the planner output back to the
    payload table on ``key_col``; member payload sizes MUST be the sizes
    the plan was computed from.  Every member's actual byte offset is
    asserted against the planner's ``off_{ext}`` as the archive is built,
    so a plan/payload mismatch fails loudly instead of shipping a
    corrupted shard.  Headers are fully deterministic (mode 0644, uid/gid
    0, mtime 0), so shard bytes are identical under any partitioning,
    retry, or cluster size.

    Returns the shard manifest ``(shard, path, n_samples, data_bytes,
    archive_bytes)`` — ONE shuffle on the shard key (each shard folds in
    one Arrow task, the same shape as ``pack_sequences``)."""
    import os

    os.makedirs(outdir, exist_ok=True)
    fields = ("shard long, path string, n_samples long, data_bytes long, "
              "archive_bytes long")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_off").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0])
        buf = bytearray()
        for r in pdf.itertuples():
            for ext, bytes_col in members:
                off = int(getattr(r, f"off_{ext}"))
                if off != len(buf):
                    raise ValueError(
                        f"shard {shard}: member {getattr(r, key_col)}.{ext} "
                        f"planned at {off}, building at {len(buf)}")
                payload = getattr(r, bytes_col)
                payload = bytes(payload) if payload is not None else b""
                buf += tar_member(f"{getattr(r, key_col)}.{ext}", payload)
        data_bytes = len(buf)
        buf += b"\x00" * TAR_EOF_BYTES
        buf += b"\x00" * ((-len(buf)) % TAR_RECORD)
        path = os.path.join(outdir, f"{prefix}-{shard:06d}.tar")
        with open(path, "wb") as fh:
            fh.write(bytes(buf))
        return pd.DataFrame([{
            "shard": shard, "path": path, "n_samples": len(pdf),
            "data_bytes": data_bytes, "archive_bytes": len(buf)}])

    # no explicit repartition: groupBy("shard") already requires (and
    # installs) hash partitioning on the key — a second exchange of the
    # payload-sized table would be pure waste
    return plan.groupBy("shard").applyInPandas(
        fold, fields)
