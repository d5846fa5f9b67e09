"""Shuffle-identity evidence for the N vs 4N scaling claim (BASELINE.md):
the SAME physical plan shape — operators, join strategies, exchange keys —
must come out of both parallelism levels, so any efficiency drop is
hardware, not a re-plan.

Runs the two headline pipelines' .explain("formatted") in a fresh
subprocess per level (local[8] and local[32], shuffle partitions scaled),
normalizes away the only legitimately level-dependent numbers (partition
counts, plan/codegen ids, stats), and diffs.

Usage: python tools/plan_identity.py [n_pages] [lo] [hi]
Prints one JSON line {"identical": bool, "lo": N, "hi": N, "ops": K,
"diff": [...]}.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import io, os, re, sys
from contextlib import redirect_stdout
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bench import bench_spark, _ensure_graph
from crawl4ai_spark.functions.canonical import canonical_col, url_hash_col
from crawl4ai_spark.functions.scorers import freshness_score
from crawl4ai_spark.functions.urlparts import host_of
from crawl4ai_spark.operators.politeness import with_salted_host_slots
from crawl4ai_spark.functions.images import decode_stage
from crawl4ai_spark.sources import synth

spark = bench_spark(app_name="plan-id")
spark.sparkContext.setLogLevel("ERROR")
p, gdir = _ensure_graph(spark, {n_pages}, with_images=False)
links = spark.read.parquet(f"{{gdir}}/links.parquet")
seen = (
    spark.read.parquet(f"{{gdir}}/pages.parquet")
    .withColumn("pid", F.regexp_extract("url", r"p(\d{{8}})", 1).cast("long"))
    .filter(F.col("pid") % 2 == 0)
    .select(url_hash_col(F.col("url")).alias("url_hash"))
)
politeness = spark.createDataFrame(synth.gen_politeness(p))
cand = links.select(canonical_col(F.col("href"), F.col("src_url")).alias("url"), "pos")
cand = cand.withColumn("url_hash", url_hash_col(F.col("url"))).withColumn(
    "host", F.lower(host_of(F.col("url"))))
cand = cand.groupBy("url_hash").agg(
    F.first("url").alias("url"), F.first("host").alias("host"),
    F.min("pos").alias("pos"))
fresh = cand.join(seen, "url_hash", "left_anti")
fresh = fresh.withColumn("score", freshness_score(F.col("url"), current_year=2024))
scheduled = with_salted_host_slots(
    fresh, politeness, order_cols=[F.col("score").desc(), "url_hash"],
    hot_hosts=["ex0.test"], salt_buckets=32)
buf = io.StringIO()
with redirect_stdout(buf):
    scheduled.explain("formatted")
print("PLAN_BEGIN")
print(buf.getvalue())
print("PLAN_END")
"""


def normalized_ops(plan: str) -> list[str]:
    """Operator skeleton: the tree section lines of the formatted plan with
    ids, partition counts and stats stripped."""
    ops = []
    for line in plan.splitlines():
        m = re.match(r"^[\s:+\-*]*\((\d+)\)\s+(.*)$", line)
        if not m:
            continue
        op = m.group(2)
        op = re.sub(r"\[plan_id=\d+\]", "", op)
        ops.append(op.strip())
    # the detail section: keep Exchange arguments (partitioning KEYS) with
    # counts masked
    for line in plan.splitlines():
        if "Arguments: hashpartitioning" in line or "Arguments: rangepartitioning" in line:
            a = re.sub(r"#\d+", "#c", line.strip())
            a = re.sub(r", \d+\)", ", N)", a)
            a = re.sub(r"\[plan_id=\d+\]", "", a)
            ops.append(a)
    return ops


def run_level(cpus: int, n_pages: int) -> list[str]:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    code = CHILD.format(repo=REPO, n_pages=n_pages)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=900, cwd=REPO)
    m = re.search(r"PLAN_BEGIN\n(.*)\nPLAN_END", out.stdout, re.S)
    if not m:
        raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])
    return normalized_ops(m.group(1))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    a = run_level(lo, n_pages)
    b = run_level(hi, n_pages)
    diff = [f"-{x}" for x in a if x not in b] + [f"+{x}" for x in b if x not in a]
    print(json.dumps({
        "identical": a == b, "lo": lo, "hi": hi, "ops": len(a), "diff": diff,
    }))


if __name__ == "__main__":
    main()
