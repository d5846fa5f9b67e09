"""SURT (Sort-friendly URI Reordering Transform) as pure Catalyst exprs.

SURT is the canonical key web-archive indexes sort on (Common Crawl's
CDX index, pywb, OpenWayback): host labels reversed and comma-joined so
all URLs under one registrable domain collate together, then ``)`` and
the path — ``https://www.example.com/a?b=2&a=1`` →
``com,example)/a?a=1&b=2``.  A 100 TB crawl's index is range-sorted on
this key (binary-searchable shards), and prefix scans over it answer
"everything under *.example.com" without a join.

Canonicalization rules implemented (the standard archival subset —
lowercase, scheme/fragment/userinfo dropped, default ports dropped,
leading ``www\\d*.`` stripped, query params sorted with session/tracking
params removed).  Everything is built from string/regex/array intrinsics
plus higher-order ``filter`` — no Python on the hot path, so the key
derivation stays JVM-side inside the scan projection.

Reference anchor: crawl4ai canonicalizes URLs for dedup/visited-set use
(utils.py normalize_url / url_canonicalize twins in
functions/canonical.py); SURT is the complementary ARCHIVE-side key the
reference never needs because it doesn't build an index over its crawl
output.  Public spec: the Heritrix/IIPC SURT definition and pywb's
canonicalizer semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["SESSION_PARAMS", "surt_key"]

# Query-param names dropped by archival canonicalizers (session ids and
# click-tracking noise — they fragment otherwise-identical captures).
# ``utm_*`` is matched as a prefix.
SESSION_PARAMS = [
    "jsessionid", "phpsessid", "aspsessionid", "sessionid", "sid",
    "cfid", "cftoken", "fbclid", "gclid", "msclkid",
]


def surt_key(url: Column, keep_session_params: bool = False) -> Column:
    """Canonical SURT key for an absolute http(s)-style URL.

    ``host[:port])path[?sorted_query]`` with the host reversed into
    comma-joined label order.  Scheme is optional (``//host/…`` and bare
    ``host/…`` are accepted); fragment and userinfo are dropped; ports
    80/443 are dropped (others kept — distinct origins); an empty path
    becomes ``/``; empty query tokens and (unless
    ``keep_session_params``) session/tracking params are removed and the
    survivors sorted byte-wise so param order never splits a key.
    """
    u = F.substring_index(F.lower(F.trim(url)), "#", 1)  # drop fragment
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"^//", "")  # scheme-relative
    auth = F.regexp_extract(rest, r"^([^/?]*)", 1)
    tail = F.substring(rest, F.length(auth) + F.lit(1), F.length(rest))
    hostport = F.regexp_replace(auth, r"^[^@]*@", "")  # drop userinfo
    host = F.regexp_replace(hostport, r":[0-9]*$", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    host = F.regexp_replace(host, r"^www[0-9]*\.", "")
    rhost = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    port_sfx = F.when(
        (port == "") | port.isin("80", "443"), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    qpos = F.instr(tail, "?")
    path = F.when(qpos > 0, F.substring(tail, F.lit(1), qpos - F.lit(1))) \
            .otherwise(tail)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q_raw = F.when(
        qpos > 0, F.substring(tail, qpos + F.lit(1), F.length(tail))
    ).otherwise(F.lit(""))

    def _keep(p: Column) -> Column:
        name = F.substring_index(p, "=", 1)
        dropped = name.isin(*SESSION_PARAMS) | name.startswith("utm_")
        live = p != ""
        return live if keep_session_params else (live & ~dropped)

    params = F.array_sort(F.filter(F.split(q_raw, "&"), _keep))
    qs = F.array_join(params, "&")
    return F.concat(
        rhost, port_sfx, F.lit(")"), path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
