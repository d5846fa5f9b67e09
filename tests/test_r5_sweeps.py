"""Seeded randomized equivalence sweeps for the round-5 crawl-ops tier:
each operator vs an independent pure-Python reference."""

import random

from pyspark.sql import functions as F


def test_expire_snapshots_matches_python_reference(spark):
    from crawl4ai_spark.operators.maintenance import expire_snapshots

    rng = random.Random(42)
    for trial in range(4):
        n_snaps = rng.randint(3, 12)
        snaps = [(s, 100 + 10 * s) for s in range(n_snaps)]
        refs = []
        for j in range(40):
            lo = rng.randrange(n_snaps)
            hi = min(n_snaps - 1, lo + rng.randrange(3))
            for s in range(lo, hi + 1):
                refs.append((s, f"f{j}", (j * 7) % 100 + 1))
        retain = rng.randint(1, n_snaps)
        min_ts = rng.choice([None, 100 + 10 * rng.randrange(n_snaps)])

        # python reference
        by_ts = sorted(snaps, key=lambda r: (-r[1], -r[0]))
        retained = {s for s, _ in by_ts[:retain]}
        if min_ts is not None:
            retained |= {s for s, ts in snaps if ts >= min_ts}
        want = {}
        for s, path, b in refs:
            keep, nref = want.get(path, (0, 0))
            want[path] = (keep + (1 if s in retained else 0), nref + 1)

        sdf = spark.createDataFrame(snaps, "snapshot_id long, ts long")
        rdf = spark.createDataFrame(
            refs, "snapshot_id long, path string, bytes long")
        got = {r["path"]: r for r in
               expire_snapshots(rdf, sdf, retain, min_ts).collect()}
        assert set(got) == set(want), trial
        for path, (nret, nref) in want.items():
            assert got[path]["n_retained_refs"] == nret, (trial, path)
            assert got[path]["n_refs"] == nref, (trial, path)
            assert got[path]["removable"] == (nret == 0), (trial, path)


def test_ip_budget_split_matches_python_reference(spark):
    from crawl4ai_spark.operators.politeness import ip_budget_split

    rng = random.Random(7)
    for trial in range(3):
        n_hosts = rng.randint(10, 40)
        hosts = [f"h{i:02d}.test" for i in range(n_hosts)]
        dns = [(h, f"ip{rng.randrange(5)}") for h in hosts
               if rng.random() < 0.8]
        budget = rng.randint(1, 9)

        # python reference (dedup to first ip per host = min)
        primary = {}
        for h, ip in dns:
            primary[h] = min(primary.get(h, ip), ip)
        groups: dict = {}
        for h in hosts:
            groups.setdefault(primary.get(h, h), []).append(h)
        want = {}
        for ip, members in groups.items():
            members = sorted(members)
            n = len(members)
            for rank, h in enumerate(members, start=1):
                want[h] = budget // n + (1 if rank <= budget % n else 0)

        hdf = spark.createDataFrame([(h,) for h in hosts], "host string")
        ddf = spark.createDataFrame(dns, "host string, ip string") \
            if dns else None
        got = {r["host"]: r for r in
               ip_budget_split(hdf, ddf, ip_budget=budget).collect()}
        assert {h: r["granted"] for h, r in got.items()} == want, trial
        # per-ip totals are exactly the budget
        per_ip: dict = {}
        for r in got.values():
            per_ip[r["ip"]] = per_ip.get(r["ip"], 0) + r["granted"]
        assert all(v == budget for v in per_ip.values()), trial


def test_age_priorities_rank_matches_python_sort(spark):
    from crawl4ai_spark.operators.aging import age_priorities

    rng = random.Random(3)
    rows = [(f"h{rng.randrange(4)}", f"u{i:03d}", rng.randrange(100),
             rng.randrange(30)) for i in range(120)]
    df = spark.createDataFrame(
        rows, "host string, url string, priority long, enq_superstep long")
    got = age_priorities(df, current_superstep=40, boost_per_step=2,
                         starve_after=25).collect()
    by_host: dict = {}
    for h, u, p, e in rows:
        age = max(40 - e, 0)
        by_host.setdefault(h, []).append((p - 2 * age, u))
    want_rank = {}
    for h, lst in by_host.items():
        for rank, (_, u) in enumerate(sorted(lst), start=1):
            want_rank[u] = rank
    for r in got:
        assert r["host_rank"] == want_rank[r["url"]], r["url"]
        assert r["starved"] == (max(40 - r["enq_superstep"], 0) >= 25)
