"""Fleet identity: UA assignment, client hints, proxy round-robin.

The sequential twin below re-implements the reference's assembly rules
(user_agent_generator.py:300-345, :388-417; proxy_strategy.py:20-44)
directly with hashlib — it shares only the constant component tables
with the engine, never its expression builders, so a bug in the
Catalyst decision tree cannot self-verify.
"""

import hashlib
import itertools

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.identity import (
    BROWSER_COMBINATIONS,
    CHROME_VERSIONS,
    CHROME_WEBKIT,
    DESKTOP_PLATFORMS,
    EDGE_VERSIONS,
    FIREFOX_VERSIONS,
    GECKO_VERSIONS,
    MOBILE_PLATFORMS,
    SAFARI_VERSIONS,
    SAFARI_WEBKIT,
    assign_proxy,
    assign_proxy_sql,
    assign_user_agent,
    assign_user_agent_sql,
    client_hints_col,
    client_hints_sql,
)

_TABLES = {
    "chrome": CHROME_VERSIONS,
    "firefox": FIREFOX_VERSIONS,
    "safari": SAFARI_VERSIONS,
    "edge": EDGE_VERSIONS,
}


def _twin_pick(key, tag, n):
    """#{16-hex-digit thresholds i/n at or below the md5 draw} — plain
    Python string comparison, same ordering as Spark/DuckDB."""
    if n <= 1:
        return 0
    d = hashlib.md5(f"{key}#{tag}".encode()).hexdigest()
    picks = 0
    for i in range(1, n):
        t = format((i * (16 ** 16)) // n, "016x")
        if d >= t:
            picks += 1
    return picks


def _twin_ua(key, device_type=None, os_type=None, device_brand=None,
             browser_type=None, num_browsers=3):
    """Reference generate() (user_agent_generator.py:300-345) with each
    random.choice replaced by the deterministic pick."""
    if device_type == "desktop":
        groups = list(DESKTOP_PLATFORMS)
    elif device_type == "mobile":
        groups = list(MOBILE_PLATFORMS)
    else:
        groups = list(DESKTOP_PLATFORMS) + list(MOBILE_PLATFORMS)
    if os_type:
        for g in (DESKTOP_PLATFORMS, MOBILE_PLATFORMS):
            hit = [(k, v) for k, v in g if k == os_type]
            if hit:
                groups = hit
                break

    os_i = _twin_pick(key, "ua.os", len(groups))
    _os_key, variants = groups[os_i]
    brand_hit = [v for b, v in variants if b == device_brand]
    if device_brand and brand_hit:
        platform = brand_hit[0]
    else:
        platform = [v for _b, v in variants][
            _twin_pick(key, f"ua.var{os_i}", len(variants))]

    combos = BROWSER_COMBINATIONS[num_browsers]
    combo = combos[_twin_pick(key, "ua.combo", len(combos))]
    stack = []
    for j, b in enumerate(combo):
        if b == "webkit":
            stack.append(CHROME_WEBKIT)
        elif b == "gecko":
            stack.append(GECKO_VERSIONS[
                _twin_pick(key, f"ua.stack{j}.gecko", len(GECKO_VERSIONS))])
        else:
            tbl = _TABLES[b]
            stack.append(tbl[_twin_pick(key, f"ua.stack{j}.{b}", len(tbl))])

    components = ["Mozilla/5.0", platform]
    s = str(stack)
    if "Firefox" in s or browser_type == "firefox":
        components.append(GECKO_VERSIONS[_twin_pick(key, "ua.gecko", 3)])
    elif "Chrome" in s or "Safari" in s or browser_type == "chrome":
        components += [CHROME_WEBKIT, "(KHTML, like Gecko)"]
    elif "Edge" in s or browser_type == "edge":
        components += [SAFARI_WEBKIT, "(KHTML, like Gecko)"]
    elif browser_type == "safari":
        components += [CHROME_WEBKIT, "(KHTML, like Gecko)"]
    components.extend(stack)
    return " ".join(components)


_PARAM_SETS = [
    dict(),
    dict(device_type="desktop"),
    dict(device_type="mobile"),
    dict(os_type="linux"),
    dict(device_type="mobile", device_brand="pixel"),
    dict(num_browsers=1),
    dict(num_browsers=2),
    dict(num_browsers=1, browser_type="firefox"),
    dict(num_browsers=1, browser_type="edge"),
]


@pytest.mark.parametrize("params", _PARAM_SETS,
                         ids=[str(sorted(p.items())) for p in _PARAM_SETS])
def test_ua_matches_sequential_twin(spark, params):
    keys = list(range(60))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["user_agent"]
        for r in assign_user_agent(df, "k", **params).collect()
    }
    for k in keys:
        assert got[k] == _twin_ua(k, **params), (k, params)


def test_ua_covers_both_combos_and_all_platforms(spark):
    # sanity on the hash-pick distribution: 512 keys hit every os group
    # and both 3-browser combinations
    df = spark.createDataFrame([(k,) for k in range(512)], "k long")
    uas = [r["user_agent"] for r in assign_user_agent(df, "k").collect()]
    assert any("Windows NT" in u for u in uas)
    assert any("Macintosh" in u for u in uas)
    assert any("X11" in u for u in uas)
    assert any("Android" in u for u in uas)
    assert any("iPhone" in u or "iPad" in u for u in uas)
    assert any("Edg/" in u for u in uas)          # combo 0
    assert any(u.count("AppleWebKit/537.36") == 2 for u in uas)  # combo 1


_HINTS_TRUTH = [
    # chrome-style UA: Safari/537.36 suffix does NOT trigger the Safari
    # branch (it keys off Version/)
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
     "(KHTML, like Gecko) Chrome/119.0.6045.199 Safari/537.36",
     '"Chromium";v="119", "Not_A Brand";v="8", "Google Chrome";v="119"'),
    # edge UA carries both Chrome/ and Edg/
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
     "(KHTML, like Gecko) Chrome/118.0.5993.117 Safari/537.36 Edg/118.0.2088.76",
     '"Chromium";v="118", "Not_A Brand";v="8", "Microsoft Edge";v="118"'),
    # firefox -> literal '""'
    ("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/119.0",
     '""'),
    # real Safari (Version/ token)
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) Version/16.5 Safari/605.1.15",
     '"Safari";v="16", "Not_A Brand";v="8"'),
    # edge-only stack (engine quirk): Edg/ but no Chrome/ -> no branch
    ("Mozilla/5.0 (Windows NT 10.0; WOW64) Edg/119.0.2151.97", ""),
    # non-browser agent
    ("curl/8.4.0", ""),
]


def test_client_hints_truth_table(spark):
    df = spark.createDataFrame([(i, ua) for i, (ua, _) in enumerate(_HINTS_TRUTH)],
                               "i long, ua string")
    got = {r["i"]: r["h"]
           for r in df.select("i", client_hints_col(F.col("ua")).alias("h")).collect()}
    for i, (_ua, want) in enumerate(_HINTS_TRUTH):
        assert got[i] == want, _ua


def test_proxy_round_robin_matches_cycle(spark):
    proxies = ["http://p0:1", "http://p1:1", "http://p2:1"]
    df = spark.createDataFrame([(s,) for s in range(20)], "seq long")
    got = assign_proxy(df, proxies, "seq").orderBy("seq").collect()
    cyc = itertools.cycle(proxies)
    for row, want in zip(got, itertools.islice(cyc, 20)):
        assert row["proxy_server"] == want
        assert row["proxy_idx"] == row["seq"] % 3
    # stable under re-partitioning (pure function of the row)
    re = assign_proxy(df.repartition(7), proxies, "seq").orderBy("seq").collect()
    assert [r["proxy_server"] for r in re] == [r["proxy_server"] for r in got]


def test_sql_twins_agree_with_spark(spark):
    """The generated DuckDB SQL reproduces the Spark columns exactly."""
    duckdb = pytest.importorskip("duckdb")
    keys = list(range(200))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = assign_user_agent(df, "k")
    out = out.withColumn("h", client_hints_col(F.col("user_agent")))
    out = assign_proxy(out, ["a", "b", "c", "d"], "k")
    got = {r["k"]: (r["user_agent"], r["h"], r["proxy_idx"], r["proxy_server"])
           for r in out.collect()}

    ua_sql = assign_user_agent_sql("k")
    idx_sql, server_sql = assign_proxy_sql("k", ["a", "b", "c", "d"])
    q = f"""
        WITH src AS (SELECT unnest(range(200)) AS k),
        u AS (SELECT k, {ua_sql} AS ua FROM src)
        SELECT k, ua, {client_hints_sql('ua')} AS h,
               {idx_sql} AS pi, {server_sql} AS ps
        FROM u ORDER BY k
    """
    for k, ua, h, pi, ps in duckdb.sql(q).fetchall():
        assert (ua, h, pi, ps) == got[k], k
