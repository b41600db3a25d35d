"""URL parsing / canonicalization as pure Catalyst expressions — the
crawl-side keys every web-corpus pipeline groups and dedups on.

A 100 TB crawl is keyed by URL three ways: per-page identity (the
canonical URL — scheme/host case, default ports, fragments and
tracking parameters must not split one page into many), per-site
quotas (the host), and per-publisher quotas (the registrable domain).
All three are string surgery, so they stay JVM-side: every function
here is a composition of built-in ``pyspark.sql.functions`` (regexp,
split, higher-order array ops) with an exactly-equivalent ANSI-SQL
formulation in plans/text_queries.py — zero Python in the row path,
map-only at any scale.

Canonicalization rules (the conservative, loss-free subset of RFC
3986 §6 normalization every crawler applies):
- scheme and host lowercase; path/query case preserved;
- the fragment (``#…``) dropped — never sent to the server;
- default ports stripped (``:80`` for http, ``:443`` for https);
- tracking parameters dropped from the query: ``utm_*``, ``gclid``,
  ``fbclid``, ``msclkid``, ``mc_eid``, ``igshid`` (the public
  list every pipeline scrubs); remaining parameters KEPT IN ORDER
  (reordering changes semantics on some endpoints);
- empty path normalizes to ``/``.

Registrable domain uses a deterministic suffix heuristic (last two
labels, or last three when the TLD-2 is a known second-level public
suffix like ``co.uk`` / ``com.au``) — a bundled snapshot of the
public-suffix idea; the full Mozilla PSL is a data file a deployment
can swap in without changing the plan shape.

Reference parity: the reference repo has no web layer; this extends
the LLM-pipeline layer per SURVEY §7.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never change page content (tracking IDs)
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "utm_id", "gclid", "fbclid", "msclkid", "mc_eid",
    "igshid",
)

#: second-level public suffixes where the registrable domain is three
#: labels (snapshot of the high-traffic PSL entries)
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tw", "com.sg", "co.za", "com.ar",
)

_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?"


def _c(url: Column | str) -> Column:
    return F.col(url) if isinstance(url, str) else url


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(url), _URL_RE, 1))


def url_authority(url: Column | str) -> Column:
    """host[:port], lowercased, userinfo stripped."""
    auth = F.lower(F.regexp_extract(_c(url), _URL_RE, 2))
    return F.element_at(F.split(auth, "@"), -1)


def url_host(url: Column | str) -> Column:
    """Host from the authority. Bracketed IPv6 literals (RFC 3986
    §3.2.2, ``[::1]:8080``) keep their brackets and never split on
    the colons inside them."""
    auth = url_authority(url)
    bracket = F.regexp_extract(auth, r"^(\[[^\]]*\])", 1)
    return F.when(bracket != "", bracket).otherwise(
        F.element_at(F.split(auth, ":"), 1)
    )


def url_port(url: Column | str) -> Column:
    """Explicit port as a string, NULL when absent; IPv6-bracket
    aware."""
    auth = url_authority(url)
    port = F.regexp_extract(auth, r"^(?:\[[^\]]*\]|[^:]*):(\d+)$", 1)
    return F.when(port == "", F.lit(None)).otherwise(port)


def url_path(url: Column | str) -> Column:
    p = F.regexp_extract(_c(url), _URL_RE, 3)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query(url: Column | str) -> Column:
    return F.regexp_extract(_c(url), _URL_RE, 4)


def clean_query(url: Column | str) -> Column:
    """Query with tracking parameters removed, ORDER PRESERVED;
    empty string when nothing survives."""
    q = url_query(url)
    parts = F.split(q, "&")
    keep = F.filter(
        parts,
        lambda kv: (kv != "")
        & ~F.array_contains(
            F.array(*[F.lit(t) for t in TRACKING_PARAMS]),
            F.element_at(F.split(kv, "="), 1),
        ),
    )
    return F.when(q == "", F.lit("")).otherwise(F.array_join(keep, "&"))


def canonical_url(url: Column | str) -> Column:
    """The dedup identity key: lowercased scheme/host, default port
    stripped, fragment gone, tracking params scrubbed, empty path →
    '/'. Non-URL strings canonicalize to NULL (no scheme match)."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    netloc = F.when(port.isNull() | default, host).otherwise(
        F.concat(host, F.lit(":"), port)
    )
    q = clean_query(url)
    out = F.concat(
        scheme, F.lit("://"), netloc, url_path(url),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme == "", F.lit(None)).otherwise(out)


def registrable_domain(url: Column | str) -> Column:
    """eTLD+1 under the bundled suffix snapshot: last two host labels,
    three when the 2-label tail is a known second-level suffix; bare
    or single-label hosts pass through."""
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tail2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    is_sls = F.array_contains(
        F.array(*[F.lit(s) for s in SECOND_LEVEL_SUFFIXES]), tail2
    )
    take = F.when(is_sls & (n >= 3), 3).when(n >= 2, 2).otherwise(n)
    return F.when(n <= 1, host).otherwise(
        F.array_join(F.slice(labels, n - take + 1, take), ".")
    )
