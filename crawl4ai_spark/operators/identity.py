"""Deterministic fleet identity: user agents, client hints, proxy rotation.

Reference anchors (semantics, not code):

- ``crawl4ai/user_agent_generator.py:176-259`` — the platform / browser
  combination / version tables of ``UserAgentGenerator`` (public UA
  strings, reproduced verbatim as constants below);
- ``user_agent_generator.py:300-345`` — the ``generate()`` assembly
  rules: Mozilla/5.0 + platform + legacy rendering-engine token +
  browser stack, including the quirks we preserve exactly (the
  ``"Edge" in str(stack)`` test never matches because Edge version
  strings spell ``Edg/``, so an edge-only stack gets NO legacy token;
  a gecko+firefox stack gets the Gecko token twice);
- ``user_agent_generator.py:373-417`` (dup ``utils``) —
  ``generate_client_hints``: Sec-CH-UA synthesis from the UA string,
  with Safari keying off ``Version/(\\d+)`` so Chrome-style UAs ending
  in ``Safari/537.36`` do NOT parse as Safari;
- ``crawl4ai/proxy_strategy.py:20-44`` — ``RoundRobinProxyStrategy``:
  ``itertools.cycle`` over the proxy pool in task arrival order.

The reference draws every component with ``random.choice`` per call.  A
distributed crawler needs the opposite: a *stable* identity per fetch
key — the same URL must present the same User-Agent across retries,
re-partitioning and cluster sizes, or politeness-sensitive hosts see a
browser that "changes fingerprint" between attempts.  So every
``random.choice(options)`` becomes a deterministic md5 hash-pick keyed
by ``(key, decision-tag)``: draw = ``md5(key '#uaN')`` (a uniform
128-bit lowercase-hex string), pick = the number of ladder thresholds
``i/n`` (in hex space) at or below the draw — the same portable
engine-exact trick as ``sampling.py`` (lowercase-hex order IS numeric
order; DuckDB evaluates the identical expression).  Distribution over
keys matches the reference's uniform choice; the *sequence* semantics
(per-call randomness) is deliberately replaced by per-key determinism.

Everything here is pure Catalyst column arithmetic — whole-stage
codegen, ZERO shuffle, no Python in the task path.  ``*_sql`` twins
emit the equivalent DuckDB SQL from the same constant tables so the
driver's oracle can replay the assembly independently.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DESKTOP_PLATFORMS",
    "MOBILE_PLATFORMS",
    "BROWSER_COMBINATIONS",
    "hash_pick",
    "hash_pick_sql",
    "assign_user_agent",
    "assign_user_agent_sql",
    "client_hints_col",
    "client_hints_sql",
    "assign_proxy",
    "assign_proxy_sql",
]

_HEX_DIGITS = 16  # 64-bit prefix of the md5, same as sampling.py

# ---------------------------------------------------------------------------
# Constant tables — verbatim from user_agent_generator.py:176-259 (public
# UA component strings).  Order matters: picks index into these lists.
# ---------------------------------------------------------------------------

DESKTOP_PLATFORMS: List[tuple] = [
    ("windows", [
        ("10_64", "(Windows NT 10.0; Win64; x64)"),
        ("10_32", "(Windows NT 10.0; WOW64)"),
    ]),
    ("macos", [
        ("intel", "(Macintosh; Intel Mac OS X 10_15_7)"),
        ("newer", "(Macintosh; Intel Mac OS X 10.15; rv:109.0)"),
    ]),
    ("linux", [
        ("generic", "(X11; Linux x86_64)"),
        ("ubuntu", "(X11; Ubuntu; Linux x86_64)"),
        ("chrome_os", "(X11; CrOS x86_64 14541.0.0)"),
    ]),
]

MOBILE_PLATFORMS: List[tuple] = [
    ("android", [
        ("samsung", "(Linux; Android 13; SM-S901B)"),
        ("pixel", "(Linux; Android 12; Pixel 6)"),
        ("oneplus", "(Linux; Android 13; OnePlus 9 Pro)"),
        ("xiaomi", "(Linux; Android 12; M2102J20SG)"),
    ]),
    ("ios", [
        ("iphone", "(iPhone; CPU iPhone OS 16_5 like Mac OS X)"),
        ("ipad", "(iPad; CPU OS 16_5 like Mac OS X)"),
    ]),
]

# user_agent_generator.py:210-215
BROWSER_COMBINATIONS: Dict[int, List[List[str]]] = {
    1: [["chrome"], ["firefox"], ["safari"], ["edge"]],
    2: [["gecko", "firefox"], ["chrome", "safari"], ["webkit", "safari"]],
    3: [["chrome", "safari", "edge"], ["webkit", "chrome", "safari"]],
}

CHROME_WEBKIT = "AppleWebKit/537.36"
SAFARI_WEBKIT = "AppleWebKit/605.1.15"
# user_agent_generator.py:221-226 — the duplicate entry and the
# truncated "Gecko/2010010" typo are the reference's; kept for
# distribution parity.
GECKO_VERSIONS = ["Gecko/20100101", "Gecko/20100101", "Gecko/2010010"]

CHROME_VERSIONS = [
    "Chrome/119.0.6045.199", "Chrome/118.0.5993.117", "Chrome/117.0.5938.149",
    "Chrome/116.0.5845.187", "Chrome/115.0.5790.171",
]
EDGE_VERSIONS = [
    "Edg/119.0.2151.97", "Edg/118.0.2088.76", "Edg/117.0.2045.47",
    "Edg/116.0.1938.81", "Edg/115.0.1901.203",
]
SAFARI_VERSIONS = [
    "Safari/537.36", "Safari/605.1.15", "Safari/604.1",
    "Safari/602.1", "Safari/601.5.17",
]
FIREFOX_VERSIONS = [
    "Firefox/119.0", "Firefox/118.0.2", "Firefox/117.0.1", "Firefox/116.0",
    "Firefox/115.0.3", "Firefox/114.0.2", "Firefox/113.0.1", "Firefox/112.0",
    "Firefox/111.0.1", "Firefox/110.0",
]

_VERSION_TABLES = {
    "chrome": CHROME_VERSIONS,
    "firefox": FIREFOX_VERSIONS,
    "safari": SAFARI_VERSIONS,
    "edge": EDGE_VERSIONS,
    "gecko": GECKO_VERSIONS,
}


# ---------------------------------------------------------------------------
# The portable hash-pick (Spark Column + SQL-text twins)
# ---------------------------------------------------------------------------

def _ladder(n: int) -> List[str]:
    """Hex thresholds t_1..t_{n-1} splitting the 64-bit hex space into n
    equal slices (pick = #{t_i <= draw})."""
    return [
        format((i * (16 ** _HEX_DIGITS)) // n, f"0{_HEX_DIGITS}x")
        for i in range(1, n)
    ]


def _draw(key: Column, tag: str) -> Column:
    return F.md5(F.concat(key.cast("string"), F.lit(f"#{tag}")))


def hash_pick(key: Column, tag: str, n: int) -> Column:
    """Deterministic uniform index in [0, n) from md5(key '#' tag)."""
    if n <= 1:
        return F.lit(0)
    d = _draw(key, tag)
    out = F.lit(0)
    for t in _ladder(n):
        out = out + (d >= F.lit(t)).cast("int")
    return out


def _draw_sql(key_sql: str, tag: str) -> str:
    return f"md5(CAST({key_sql} AS VARCHAR) || '#{tag}')"


def hash_pick_sql(key_sql: str, tag: str, n: int) -> str:
    if n <= 1:
        return "0"
    d = _draw_sql(key_sql, tag)
    terms = " + ".join(
        f"(CASE WHEN {d} >= '{t}' THEN 1 ELSE 0 END)" for t in _ladder(n)
    )
    return f"({terms})"


def _pick_literal(key: Column, tag: str, options: Sequence[str]) -> Column:
    """Pick one literal string from ``options`` (Spark side)."""
    if len(options) == 1:
        return F.lit(options[0])
    idx = hash_pick(key, tag, len(options))
    expr = F.lit(options[-1])
    for i in range(len(options) - 2, -1, -1):
        expr = F.when(idx == i, F.lit(options[i])).otherwise(expr)
    return expr


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _pick_literal_sql(key_sql: str, tag: str, options: Sequence[str]) -> str:
    if len(options) == 1:
        return _sq(options[0])
    idx = hash_pick_sql(key_sql, tag, len(options))
    whens = " ".join(
        f"WHEN {idx} = {i} THEN {_sq(o)}" for i, o in enumerate(options[:-1])
    )
    return f"(CASE {whens} ELSE {_sq(options[-1])} END)"


# ---------------------------------------------------------------------------
# Shared decision-tree enumeration (drives both backends)
# ---------------------------------------------------------------------------

def _platform_groups(device_type: Optional[str], os_type: Optional[str]):
    """Mirror get_random_platform's platform-dict construction
    (user_agent_generator.py:352-370)."""
    if device_type == "desktop":
        platforms = list(DESKTOP_PLATFORMS)
    elif device_type == "mobile":
        platforms = list(MOBILE_PLATFORMS)
    else:
        platforms = list(DESKTOP_PLATFORMS) + list(MOBILE_PLATFORMS)
    if os_type:
        for group in (DESKTOP_PLATFORMS, MOBILE_PLATFORMS):
            hit = [(k, v) for k, v in group if k == os_type]
            if hit:
                platforms = hit
                break
    return platforms


def _stack_spec(combo: List[str]) -> List[tuple]:
    """Per-element (tag, options) for one browser combination.  Decision
    tags are per stack position so two combos' picks are independent,
    mirroring the reference's independent sequential draws
    (user_agent_generator.py:284-296)."""
    out = []
    for j, browser in enumerate(combo):
        if browser == "webkit":
            out.append((None, [CHROME_WEBKIT]))
        else:
            out.append((f"ua.stack{j}.{browser}", _VERSION_TABLES[browser]))
    return out


def _legacy_tokens(combo: List[str], browser_type: Optional[str]):
    """Statically evaluate generate()'s legacy-token rules
    (user_agent_generator.py:308-321) for one combination.  The
    membership tests run on ``str(browser_stack)``, so they reduce to
    which version-string families the combo contains:

    - chrome  -> "Chrome/" substrings
    - firefox -> "Firefox/" substrings (GECKO elements don't contain it)
    - safari  -> "Safari/" substrings
    - edge    -> "Edg/" — which never contains "Edge": the reference's
      edge test can only be reached via browser_type == "edge".

    Returns ("gecko",) for the Gecko pick branch, or a tuple of literal
    tokens, possibly empty (the edge-only fall-through quirk).
    """
    has_firefox = "firefox" in combo
    has_chrome = "chrome" in combo
    has_safari = "safari" in combo
    if has_firefox or browser_type == "firefox":
        return ("gecko",)
    if has_chrome or has_safari or browser_type == "chrome":
        return (CHROME_WEBKIT, "(KHTML, like Gecko)")
    if browser_type == "edge":  # "Edge" in str(stack) is never true
        return (SAFARI_WEBKIT, "(KHTML, like Gecko)")
    if browser_type == "safari":
        return (CHROME_WEBKIT, "(KHTML, like Gecko)")
    return ()


# ---------------------------------------------------------------------------
# User-agent assignment
# ---------------------------------------------------------------------------

def assign_user_agent(
    df: DataFrame,
    key_col: str,
    device_type: Optional[str] = None,
    os_type: Optional[str] = None,
    device_brand: Optional[str] = None,
    browser_type: Optional[str] = None,
    num_browsers: int = 3,
    out_col: str = "user_agent",
) -> DataFrame:
    """Stable per-key User-Agent reproducing UserAgentGenerator.generate's
    assembly rules (user_agent_generator.py:300-345) with hash-picks.

    Pure Catalyst: md5 + string comparisons + concat — codegen, zero
    shuffle, no Python.
    """
    if num_browsers not in BROWSER_COMBINATIONS:
        raise ValueError(f"Unsupported number of browsers: {num_browsers}")
    key = F.col(key_col)

    # platform: pick the OS group, then the variant inside it (stitched
    # back-to-front so the last branch is the otherwise-default)
    groups = _platform_groups(device_type, os_type)
    os_idx = hash_pick(key, "ua.os", len(groups))
    platform = None
    for i in range(len(groups) - 1, -1, -1):
        _os_key, variants = groups[i]
        brand_hit = [v for b, v in variants if b == device_brand]
        if device_brand and brand_hit:
            var_expr = F.lit(brand_hit[0])
        else:
            var_expr = _pick_literal(key, f"ua.var{i}", [v for _b, v in variants])
        platform = var_expr if platform is None else F.when(os_idx == i, var_expr).otherwise(platform)

    # browser stack + legacy tokens, per combination
    combos = BROWSER_COMBINATIONS[num_browsers]
    combo_idx = hash_pick(key, "ua.combo", len(combos))
    tail = None
    for c in range(len(combos) - 1, -1, -1):
        combo = combos[c]
        parts: List[Column] = []
        legacy = _legacy_tokens(combo, browser_type)
        if legacy == ("gecko",):
            parts.append(_pick_literal(key, "ua.gecko", GECKO_VERSIONS))
        else:
            parts.extend(F.lit(t) for t in legacy)
        for tag, options in _stack_spec(combo):
            parts.append(
                F.lit(options[0]) if tag is None
                else _pick_literal(key, tag, options)
            )
        combo_expr = F.concat_ws(" ", *parts)
        tail = combo_expr if tail is None else F.when(combo_idx == c, combo_expr).otherwise(tail)

    ua = F.concat_ws(" ", F.lit("Mozilla/5.0"), platform, tail)
    return df.withColumn(out_col, ua)


def assign_user_agent_sql(
    key_sql: str,
    device_type: Optional[str] = None,
    os_type: Optional[str] = None,
    device_brand: Optional[str] = None,
    browser_type: Optional[str] = None,
    num_browsers: int = 3,
) -> str:
    """DuckDB SQL expression equal to assign_user_agent's column.

    Shares only the constant tables and the threshold arithmetic with
    the Spark path — the expression text is generated independently and
    executes in DuckDB with no Spark involved.
    """
    if num_browsers not in BROWSER_COMBINATIONS:
        raise ValueError(f"Unsupported number of browsers: {num_browsers}")

    groups = _platform_groups(device_type, os_type)
    os_idx = hash_pick_sql(key_sql, "ua.os", len(groups))
    branches = []
    for i, (_os_key, variants) in enumerate(groups):
        brand_hit = [v for b, v in variants if b == device_brand]
        if device_brand and brand_hit:
            var_sql = _sq(brand_hit[0])
        else:
            var_sql = _pick_literal_sql(key_sql, f"ua.var{i}", [v for _b, v in variants])
        branches.append((i, var_sql))
    if len(branches) == 1:
        platform_sql = branches[0][1]
    else:
        whens = " ".join(f"WHEN {os_idx} = {i} THEN {v}" for i, v in branches[:-1])
        platform_sql = f"(CASE {whens} ELSE {branches[-1][1]} END)"

    combos = BROWSER_COMBINATIONS[num_browsers]
    combo_idx = hash_pick_sql(key_sql, "ua.combo", len(combos))
    combo_exprs = []
    for combo in combos:
        parts: List[str] = []
        legacy = _legacy_tokens(combo, browser_type)
        if legacy == ("gecko",):
            parts.append(_pick_literal_sql(key_sql, "ua.gecko", GECKO_VERSIONS))
        else:
            parts.extend(_sq(t) for t in legacy)
        for tag, options in _stack_spec(combo):
            parts.append(
                _sq(options[0]) if tag is None
                else _pick_literal_sql(key_sql, tag, options)
            )
        combo_exprs.append("concat_ws(' ', " + ", ".join(parts) + ")")
    if len(combo_exprs) == 1:
        tail_sql = combo_exprs[0]
    else:
        whens = " ".join(
            f"WHEN {combo_idx} = {c} THEN {e}" for c, e in enumerate(combo_exprs[:-1])
        )
        tail_sql = f"(CASE {whens} ELSE {combo_exprs[-1]} END)"

    return f"concat_ws(' ', 'Mozilla/5.0', {platform_sql}, {tail_sql})"


# ---------------------------------------------------------------------------
# Sec-CH-UA client hints
# ---------------------------------------------------------------------------

def client_hints_col(ua: Column) -> Column:
    """Sec-CH-UA header from a UA string — generate_client_hints
    (user_agent_generator.py:388-417) as a when/otherwise chain.

    Branch order and quirks preserved: Chrome first (Edge UAs also
    carry Chrome/ so they land here, adding "Microsoft Edge"); Firefox
    returns the literal '""'; Safari keys off Version/(d+), so
    Chrome-style "... Safari/537.36" UAs do NOT reach the Safari
    branch; no match -> '' (the reference's ", ".join([])).
    """
    chrome = F.regexp_extract(ua, r"Chrome/(\d+)", 1)
    edge = F.regexp_extract(ua, r"Edg/(\d+)", 1)
    safari = F.regexp_extract(ua, r"Version/(\d+)", 1)
    firefox = F.regexp_extract(ua, r"Firefox/(\d+)", 1)
    chrome_tail = F.when(
        edge != "", F.concat(F.lit('"Microsoft Edge";v="'), edge, F.lit('"'))
    ).otherwise(F.concat(F.lit('"Google Chrome";v="'), chrome, F.lit('"')))
    return (
        F.when(chrome != "", F.concat(
            F.lit('"Chromium";v="'), chrome,
            F.lit('", "Not_A Brand";v="8", '), chrome_tail))
        .when(firefox != "", F.lit('""'))
        .when(safari != "", F.concat(
            F.lit('"Safari";v="'), safari, F.lit('", "Not_A Brand";v="8"')))
        .otherwise(F.lit(""))
    )


def client_hints_sql(ua_sql: str) -> str:
    """DuckDB twin of client_hints_col."""
    chrome = f"regexp_extract({ua_sql}, 'Chrome/(\\d+)', 1)"
    edge = f"regexp_extract({ua_sql}, 'Edg/(\\d+)', 1)"
    safari = f"regexp_extract({ua_sql}, 'Version/(\\d+)', 1)"
    firefox = f"regexp_extract({ua_sql}, 'Firefox/(\\d+)', 1)"
    chrome_tail = (
        f"(CASE WHEN {edge} <> '' THEN '\"Microsoft Edge\";v=\"' || {edge} || '\"' "
        f"ELSE '\"Google Chrome\";v=\"' || {chrome} || '\"' END)"
    )
    return (
        f"(CASE WHEN {chrome} <> '' THEN "
        f"'\"Chromium\";v=\"' || {chrome} || '\", \"Not_A Brand\";v=\"8\", ' || {chrome_tail} "
        f"WHEN {firefox} <> '' THEN '\"\"' "
        f"WHEN {safari} <> '' THEN '\"Safari\";v=\"' || {safari} || '\", \"Not_A Brand\";v=\"8\"' "
        f"ELSE '' END)"
    )


# ---------------------------------------------------------------------------
# Round-robin proxy rotation
# ---------------------------------------------------------------------------

def assign_proxy(
    df: DataFrame,
    proxies: Sequence[str],
    seq_col: str,
    out_col: str = "proxy_server",
    idx_col: str = "proxy_idx",
) -> DataFrame:
    """RoundRobinProxyStrategy (proxy_strategy.py:20-44) as a column.

    The reference cycles the pool in task-arrival order; the set-oriented
    equivalent is ``proxies[seq % n]`` over the frontier's dense global
    push sequence (``with_global_seq``) — identical assignment, but a
    pure function of the row, so it is stable under re-partitioning,
    retries and cluster size.  Zero shuffle.
    """
    if not proxies:
        return df.withColumn(idx_col, F.lit(None).cast("int")) \
                 .withColumn(out_col, F.lit(None).cast("string"))
    n = len(proxies)
    idx = F.pmod(F.col(seq_col).cast("long"), F.lit(n)).cast("int")
    return df.withColumn(idx_col, idx).withColumn(
        out_col, F.element_at(F.array(*[F.lit(p) for p in proxies]), idx + 1)
    )


def assign_proxy_sql(seq_sql: str, proxies: Sequence[str]) -> tuple:
    """(idx_sql, server_sql) DuckDB twins of assign_proxy."""
    n = len(proxies)
    idx = f"CAST(((({seq_sql}) % {n}) + {n}) % {n} AS INTEGER)"
    whens = " ".join(
        f"WHEN {idx} = {i} THEN {_sq(p)}" for i, p in enumerate(proxies[:-1])
    )
    server = f"(CASE {whens} ELSE {_sq(proxies[-1])} END)"
    return idx, server
