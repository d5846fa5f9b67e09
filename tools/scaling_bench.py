"""N vs 4N scaling evidence (north_rule: efficiency >= 0.8 from N to 4N).

No real cluster exists in this sandbox, so the two "cluster sizes" are the
same job at two parallelism levels — ``local[8]`` vs ``local[32]`` — on the
SAME materialized input (BASELINE.json sanctions exactly this evidence
form). Each level runs in a fresh subprocess (its own JVM + python worker
pool); inputs are pre-materialized so generation cost is outside the
timers.

Usage: python tools/scaling_bench.py [n_pages] [n_images] [--update-md]
Prints one JSON line; --update-md appends/refreshes the scaling section in
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from crawl4ai_spark.session import get_spark
from bench import frontier_schedule, fetch_decode
from bench import bench_spark, warm_python_workers
spark = bench_spark(app_name="scaling-n" + os.environ["SPARK_GRAFT_CPUS"])
spark.sparkContext.setLogLevel("ERROR")
warm_python_workers(spark)
# steady-state: warmup run, then best of 3 (cold worker spawn is a
# per-executor fixed cost, excluded like input generation; min damps
# virtualized-host noise)
fs_cold, _ = frontier_schedule(spark, {n_pages})
fs_runs = [frontier_schedule(spark, {n_pages}) for _ in range(3)]
fs_s = min(s for s, _ in fs_runs); fs_n = fs_runs[0][1]
fd_cold, _ = fetch_decode(spark, {n_images})
fd_runs = [fetch_decode(spark, {n_images}) for _ in range(3)]
fd_s = min(s for s, _ in fd_runs); fd_n = fd_runs[0][1]
from bench import training_prep_bench
tp_cold = training_prep_bench(spark, {n_images} * 25)["sec"]
tp_runs = [training_prep_bench(spark, {n_images} * 25)["sec"] for _ in range(3)]
tp_s = min(tp_runs)
# same-JVM pure-codegen machine-ceiling control (zero shuffle, zero
# Python): how fast THIS window's host scales ANY code 8->32
from pyspark.sql import functions as _F
def _ctl():
    t0 = time.time()
    spark.range(0, 2_000_000_000, 1, int(os.environ["SPARK_GRAFT_CPUS"])) \
        .select(_F.xxhash64("id").alias("h")) \
        .agg(_F.sum(_F.col("h") / 1e18)).collect()
    return time.time() - t0
_ctl()
ctl_runs = [_ctl() for _ in range(3)]
ctl_s = min(ctl_runs)
print("CHILD_RESULT " + json.dumps({{
    "cpus": int(os.environ["SPARK_GRAFT_CPUS"]),
    "frontier_sec": round(fs_s, 2), "frontier_links": fs_n,
    "frontier_cold_sec": round(fs_cold, 2),
    "frontier_runs": [round(s, 2) for s, _ in fs_runs],
    "decode_sec": round(fd_s, 2), "decode_images": fd_n,
    "decode_cold_sec": round(fd_cold, 2),
    "decode_runs": [round(s, 2) for s, _ in fd_runs],
    "training_sec": round(tp_s, 2), "training_rows": {n_images} * 25,
    "training_cold_sec": round(tp_cold, 2),
    "training_runs": [round(s, 2) for s in tp_runs],
    "control_sec": round(ctl_s, 3),
    "control_runs": [round(s, 2) for s in ctl_runs],
}}))
"""


def run_level(cpus: int, n_pages: int, n_images: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    code = CHILD.format(repo=REPO, n_pages=n_pages, n_images=n_images)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=1800, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"child cpus={cpus} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_pages = int(args[0]) if args else 400_000
    n_images = int(args[1]) if len(args) > 1 else 40_000
    n_lo = int(args[2]) if len(args) > 2 else 8
    n_hi = int(args[3]) if len(args) > 3 else n_lo * 4

    # Materialize inputs once at full parallelism (excluded from timing).
    warm = run_level(32, n_pages, n_images)

    lo = run_level(n_lo, n_pages, n_images)
    hi = run_level(n_hi, n_pages, n_images)

    ratio = n_hi / n_lo

    def eff(metric: str) -> float:
        return round(lo[metric] / hi[metric] / ratio, 3)

    result = {
        "n_pages": n_pages,
        "n_images": n_images,
        "low": lo,
        "high": hi,
        "frontier_urls_per_sec": {
            f"local[{n_lo}]": round(lo["frontier_links"] / lo["frontier_sec"], 1),
            f"local[{n_hi}]": round(hi["frontier_links"] / hi["frontier_sec"], 1),
        },
        "decode_images_per_sec": {
            f"local[{n_lo}]": round(lo["decode_images"] / lo["decode_sec"], 1),
            f"local[{n_hi}]": round(hi["decode_images"] / hi["decode_sec"], 1),
        },
        "training_rows_per_sec": {
            f"local[{n_lo}]": round(lo["training_rows"] / lo["training_sec"], 1),
            f"local[{n_hi}]": round(hi["training_rows"] / hi["training_sec"], 1),
        },
        "scaling_efficiency": {
            "frontier": eff("frontier_sec"),
            "decode": eff("decode_sec"),
            "training_prep": eff("training_sec"),
        },
        # same-JVM pure-codegen ceiling: what THIS window's host gives ANY
        # code from N to 4N — normalize pipeline efficiencies against it
        "control_ceiling": eff("control_sec"),
        "efficiency_vs_ceiling": {
            "frontier": round(eff("frontier_sec") / eff("control_sec"), 3),
            "decode": round(eff("decode_sec") / eff("control_sec"), 3),
            "training_prep": round(
                eff("training_sec") / eff("control_sec"), 3),
        },
    }
    print(json.dumps(result))

    if "--update-md" in sys.argv:
        md = os.path.join(REPO, "BASELINE.md")
        with open(md) as fh:
            text = fh.read()
        marker = f"\n## Measured scaling (local[{n_lo}] vs local[{n_hi}])\n"
        lo_k, hi_k = f"local[{n_lo}]", f"local[{n_hi}]"
        section = (
            f"{marker}\n"
            f"Same job, same materialized input ({n_pages:,}-page graph → "
            f"{lo['frontier_links']:,} raw links; {n_images:,} image payloads), "
            f"fresh JVM per level (tools/scaling_bench.py):\n\n"
            f"| pipeline | {lo_k} | {hi_k} | speedup | efficiency (N→4N) |\n"
            f"|---|---|---|---|---|\n"
            f"| frontier schedule+dedup | {result['frontier_urls_per_sec'][lo_k]:,.0f} urls/s "
            f"({lo['frontier_sec']}s) | {result['frontier_urls_per_sec'][hi_k]:,.0f} urls/s "
            f"({hi['frontier_sec']}s) | {lo['frontier_sec']/hi['frontier_sec']:.2f}x "
            f"| **{result['scaling_efficiency']['frontier']}** |\n"
            f"| fetch+decode (PSNR-verified) | {result['decode_images_per_sec'][lo_k]:,.0f} img/s "
            f"({lo['decode_sec']}s) | {result['decode_images_per_sec'][hi_k]:,.0f} img/s "
            f"({hi['decode_sec']}s) | {lo['decode_sec']/hi['decode_sec']:.2f}x "
            f"| **{result['scaling_efficiency']['decode']}** |\n"
            f"| training prep (curate→bucket→sample→pack) | "
            f"{result['training_rows_per_sec'][lo_k]:,.0f} rows/s "
            f"({lo['training_sec']}s) | {result['training_rows_per_sec'][hi_k]:,.0f} rows/s "
            f"({hi['training_sec']}s) | {lo['training_sec']/hi['training_sec']:.2f}x "
            f"| **{result['scaling_efficiency']['training_prep']}** |\n"
        )
        if marker in text:
            text = text[: text.index(marker)]
        with open(md, "w") as fh:
            fh.write(text + section)


if __name__ == "__main__":
    main()
