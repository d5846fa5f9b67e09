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
