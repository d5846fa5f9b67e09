"""Robots.txt gating, vectorized (P8, SURVEY §2.2).

Reference semantics (crawl4ai/utils.py:215-339 RobotsParser.can_fetch +
async_webcrawler.py:361-370 gate):
  - rules parsed with stdlib ``urllib.robotparser.RobotFileParser`` —
    identical parser here, so allow/deny parity is by construction;
  - ANY failure path allows: missing host row, fetch error (status != 200),
    empty rules, unparseable rules;
  - stale cache (> 7-day TTL, utils.py:216-217) triggers refetch — in the
    synthetic world a refetch returns the same current rules, so staleness
    only matters when the refetch would fail (status != 200 → allow);
  - a disallowed URL becomes CrawlResult(success=False, status_code=403,
    error="Access denied by robots.txt") and is NOT fetched
    (async_webcrawler.py:361-370).

Execution shape: rules tables are per-host (small dimension, thousands of
hosts per crawl) → evaluated inside one Arrow ``mapInPandas`` pass with the
parsed RobotFileParser objects memoized per host within each batch. At
100 TB the frontier arrives partitioned by host (politeness already groups
it), so each batch touches few distinct hosts and the memo hit-rate is ≈1.
"""

from __future__ import annotations

from typing import Iterator
from urllib.robotparser import RobotFileParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_TTL = 7 * 24 * 60 * 60  # utils.py:216-217


def effective_rules(rules: str | None, fetch_time: int, status: int,
                    now: int, ttl: int = ROBOTS_TTL) -> str | None:
    """Collapse the cache/refetch state machine to the rules text that
    applies *now*; None ⇒ allow-all."""
    if status != 200 or rules is None:
        return None
    # fresh or successfully refetchable → same content either way
    return rules


def allowed_for(urls: list[str], rules: str | None, user_agent: str = "*") -> list[bool]:
    """RobotsParser.can_fetch tail (utils.py:318-328): parse once, evaluate
    each URL; unparseable/empty → allow."""
    if not rules:
        return [True] * len(urls)
    parser = RobotFileParser()
    try:
        parser.parse(rules.splitlines())
    except Exception:
        return [True] * len(urls)
    if not parser.mtime():
        return [True] * len(urls)
    out = []
    for u in urls:
        try:
            out.append(parser.can_fetch(user_agent, u))
        except Exception:
            out.append(True)
    return out


def robots_gate(df: DataFrame, robots_pdf: pd.DataFrame | None,
                url_col: str = "fetch_key", host_col: str = "host",
                now: int = 1_700_000_000, user_agent: str = "*") -> DataFrame:
    """Add boolean ``robots_allowed`` to ``df``.

    ``robots_pdf`` is the per-host rules table (host, rules, fetch_time,
    status); None ⇒ gate disabled (check_robots_txt defaults False,
    async_configs.py:713) and every row is allowed.
    """
    if robots_pdf is None:
        return df.withColumn("robots_allowed", F.lit(True))
    rules_by_host: dict[str, str | None] = {}
    for r in robots_pdf.itertuples():
        rules_by_host[r.host] = effective_rules(
            r.rules, int(r.fetch_time), int(r.status), now
        )
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(rules_by_host)
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, robots_allowed boolean"

    def gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rules_map = bc.value
        parsers: dict[str, RobotFileParser | None] = {}
        for b in batches:
            allowed = pd.Series(True, index=b.index)
            for host, idx in b.groupby(host_col, sort=False).groups.items():
                rules = rules_map.get(host)
                if not rules:
                    continue
                if host not in parsers:
                    rp = RobotFileParser()
                    try:
                        rp.parse(rules.splitlines())
                        parsers[host] = rp if rp.mtime() else None
                    except Exception:
                        parsers[host] = None
                rp = parsers[host]
                if rp is None:
                    continue
                urls = b.loc[idx, url_col]
                allowed.loc[idx] = [
                    _safe_can_fetch(rp, user_agent, u) for u in urls.tolist()
                ]
            b = b.copy()
            b["robots_allowed"] = allowed
            yield b

    return df.mapInPandas(gate, out_schema)


def _safe_can_fetch(rp: RobotFileParser, agent: str, url: str) -> bool:
    try:
        return rp.can_fetch(agent, url)
    except Exception:
        return True


def robots_gate_df(df: DataFrame, rules_df: DataFrame | None,
                   url_col: str = "fetch_key", host_col: str = "host",
                   now: int = 1_700_000_000, user_agent: str = "*",
                   broadcast_rules: bool = True) -> DataFrame:
    """Scale-path robots gate: the rules table is a DataFrame joined on
    host, never materialized on the driver.

    ``robots_gate`` broadcasts a driver dict — fine at thousands of hosts,
    a driver OOM at millions.  Here the (host, rules, fetch_time, status)
    table left-joins the frontier (broadcast hash join while the rules
    table is small; set ``broadcast_rules=False`` to shuffle-join on host,
    which co-locates with the engine's repartition-by-host exchange), and
    one Arrow pass parses each batch's rules with a per-host memo — the
    frontier arrives host-partitioned, so each task touches few distinct
    hosts and the memo hit-rate is ≈1.  Same allow-on-error truth table as
    ``robots_gate`` (verified side-by-side in tests)."""
    if rules_df is None:
        return df.withColumn("robots_allowed", F.lit(True))
    # one row per host, or the left join would duplicate frontier rows
    # (the dict-based robots_gate can't — its dict keys are unique)
    r = rules_df.select(
        F.col("host").alias("__r_host"),
        F.col("rules").alias("__r_rules"),
        F.col("fetch_time").alias("__r_ftime"),
        F.col("status").alias("__r_status"),
    ).dropDuplicates(["__r_host"])
    if broadcast_rules:
        r = F.broadcast(r)
    j = df.join(r, df[host_col] == r["__r_host"], "left").drop("__r_host")
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parsers: dict[str, RobotFileParser | None] = {}
        for b in batches:
            allowed = pd.Series(True, index=b.index)
            for host, idx in b.groupby(host_col, sort=False).groups.items():
                sub = b.loc[idx]
                raw = sub["__r_rules"].iloc[0]
                status = sub["__r_status"].iloc[0]
                rules = effective_rules(
                    None if pd.isna(raw) else raw,
                    0 if pd.isna(sub["__r_ftime"].iloc[0]) else int(sub["__r_ftime"].iloc[0]),
                    599 if pd.isna(status) else int(status),
                    now,
                )
                if not rules:
                    continue
                if host not in parsers:
                    rp = RobotFileParser()
                    try:
                        rp.parse(rules.splitlines())
                        parsers[host] = rp if rp.mtime() else None
                    except Exception:
                        parsers[host] = None
                rp = parsers[host]
                if rp is None:
                    continue
                allowed.loc[idx] = [
                    _safe_can_fetch(rp, user_agent, u)
                    for u in sub[url_col].tolist()
                ]
            out = b.drop(columns=["__r_rules", "__r_ftime", "__r_status"]).copy()
            out["robots_allowed"] = allowed
            yield out

    return j.mapInPandas(gate, f"{fields}, robots_allowed boolean")


def crawl_delay_stage(rules_df: DataFrame, user_agent: str = "*",
                      window_s: float | None = None,
                      rules_col: str = "rules",
                      host_col: str = "host") -> DataFrame:
    """Parse per-host ``Crawl-delay`` (and ``Request-rate``) from robots
    rules — the RobotFileParser surface the reference caches but never
    reads (utils.py:326-328 only calls can_fetch; real crawlers honor the
    delay).  Adds ``crawl_delay double`` (NULL when the directive is
    absent or the rules are missing/unparseable — allow-fast, matching the
    gate's allow-on-error posture; Request-rate collapses to
    seconds-per-request = duration/requests, and the stricter of the two
    wins) and, when ``window_s`` is given, the D1 throttle pair for
    ``politeness.split_per_host_budget``:

    - ``delay_budget int`` = max(1, floor(window_s / delay)) — fetches
      allowed in an ELIGIBLE superstep window;
    - ``delay_period int`` = max(1, ceil(delay / window_s)) — the host is
      eligible once every ``delay_period`` supersteps.

    Together these encode "at most one fetch every delay seconds" for ANY
    delay: delay ≤ window gives (floor(window/delay), 1); delay > window
    gives (1, ceil(delay/window)) — one fetch every N windows.  The
    budget floor of 1 matters: an unclamped floor(window/delay) is 0 for
    large published delays (Crawl-delay: 3600 against a 60 s window),
    which would defer the host on EVERY superstep — permanent starvation
    instead of a slow crawl.

    One Arrow pass over the per-host rules dimension (thousands of rows —
    never the frontier side); zero shuffle.
    """
    import math

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in rules_df.schema.fields)
    out_schema = f"{fields}, crawl_delay double" + (
        ", delay_budget int, delay_period int" if window_s is not None
        else "")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            delays: list[float | None] = []
            for rules in b[rules_col].tolist():
                d: float | None = None
                if rules:
                    rp = RobotFileParser()
                    try:
                        rp.parse(rules.splitlines())
                        if rp.mtime():
                            cd = rp.crawl_delay(user_agent)
                            rr = rp.request_rate(user_agent)
                            if cd is not None:
                                d = float(cd)
                            if rr is not None and rr.requests:
                                per = rr.seconds / rr.requests
                                d = per if d is None else max(d, per)
                    except Exception:
                        d = None
                delays.append(d)
            out = b.copy()
            out["crawl_delay"] = pd.Series(delays, index=b.index, dtype="float64")
            if window_s is not None:
                out["delay_budget"] = out["crawl_delay"].map(
                    lambda x: None if pd.isna(x) or x <= 0
                    else max(1, int(window_s // x))).astype("Int32")
                out["delay_period"] = out["crawl_delay"].map(
                    lambda x: None if pd.isna(x) or x <= 0
                    else max(1, math.ceil(x / window_s))).astype("Int32")
            yield out

    return rules_df.mapInPandas(parse, out_schema)
