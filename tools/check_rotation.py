"""Rotation-health check: every registered probe's newest green driver row
must be <= 2 rounds old.

The correctness gate checks only the first 50 registered probes per round;
``__spark_entry__.queries()`` orders registration least-recently-green so the
windows of consecutive rounds are complementary.  This check makes that
contract auditable: parse the tracked CORRECTNESS_r*.json files, compute each
probe's newest green round, and FAIL (exit 1) if any probe's newest green row
is more than 2 rounds older than the newest recorded round — i.e. the
rotation let a probe's evidence go stale — or has never been green at all.

Probes registered after the newest recorded round obviously cannot have a
row yet; they are reported as NEW and do not fail the check (they sort first
in the next window by construction).

Usage: python tools/check_rotation.py [--max-age 2]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")


def load_history(repo: str) -> tuple[dict[str, int], dict[str, int], int]:
    """(newest green round per probe, newest GATED round per probe, max round)."""
    green: dict[str, int] = {}
    gated: dict[str, int] = {}
    max_round = -1
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except Exception:
            continue
        max_round = max(max_round, rnd)
        for k, v in data.items():
            if not isinstance(v, dict):
                continue
            gated[k] = max(gated.get(k, -1), rnd)
            if (v.get("rows_match") and v.get("schema_match")
                    and v.get("hash_match")):
                green[k] = max(green.get(k, -1), rnd)
    return green, gated, max_round


def main() -> int:
    max_age = 2
    if "--max-age" in sys.argv:
        max_age = int(sys.argv[sys.argv.index("--max-age") + 1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    import __spark_entry__ as entrymod

    registry = list(entrymod.queries())
    green, gated, max_round = load_history(repo)
    if max_round < 0:
        print("FAIL: no CORRECTNESS_r*.json history found")
        return 1

    new, stale, red = [], [], []
    for name in registry:
        g = green.get(name, -1)
        if g >= max_round - max_age:
            continue
        if name not in gated:
            new.append(name)          # registered after every recorded gate
        elif g == -1:
            red.append(name)          # gated at least once, never green
        else:
            stale.append((name, g))   # green once, evidence now stale

    print(f"registry={len(registry)} probes; history through round {max_round}; "
          f"max-age={max_age}")
    if new:
        print(f"NEW (never gated, will sort first next window): {', '.join(new)}")
    if stale:
        print("STALE: " + ", ".join(f"{n}(last green r{g})" for n, g in stale))
    if red:
        print("NEVER-GREEN (gated but no green row): " + ", ".join(red))
    if stale or red:
        print("FAIL")
        return 1
    print("OK: every gated probe's newest green row is within the age bound")
    return 0


if __name__ == "__main__":
    sys.exit(main())
