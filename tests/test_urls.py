"""URL canonicalization (operators/urls.py) — pure-Catalyst crawl
keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from dolphinbeat_spark.operators import urls as U


def _run(spark, url_list, col):
    df = spark.createDataFrame([(u,) for u in url_list], "url string")
    return [r[0] for r in df.select(col("url")).collect()]


def test_canonical_url_rules(spark):
    cases = {
        # scheme/host lower, default port, fragment, tracking scrub
        "HTTP://WWW.Ex.COM:80/A/b?utm_source=x&q=1&fbclid=z&k=2#f":
            "http://www.ex.com/A/b?q=1&k=2",
        # empty path -> '/', all-tracking query drops entirely
        "https://Ex.com:443?gclid=1": "https://ex.com/",
        # userinfo stripped, non-default port kept, param order kept
        "https://u:p@CDN.Ex.io:8443/x%20y?b=2&a=1":
            "https://cdn.ex.io:8443/x%20y?b=2&a=1",
        # path case preserved, no query
        "http://ex.com/CaseKept": "http://ex.com/CaseKept",
        # https on :80 is NOT default -> kept
        "https://ex.com:80/": "https://ex.com:80/",
        # non-URL -> NULL
        "not a url at all": None,
    }
    got = _run(spark, list(cases), U.canonical_url)
    assert got == list(cases.values())


def test_registrable_domain(spark):
    cases = {
        "http://www.bbc.co.uk/news": "bbc.co.uk",
        "http://a.b.example.com.au/": "example.com.au",
        "http://deep.sub.example.com/": "example.com",
        "http://example.com/": "example.com",
        "http://localhost/": "localhost",
        "http://ex.io:8080/": "ex.io",
    }
    got = _run(spark, list(cases), U.registrable_domain)
    assert got == list(cases.values())


def test_ipv6_literal_hosts(spark):
    """Bracketed IPv6 authorities keep the brackets and never split on
    the colons inside (RFC 3986 §3.2.2) — r10 ADVICE finding."""
    host_cases = {
        "http://[::1]:8080/p": "[::1]",
        "http://[2001:db8::1]/x": "[2001:db8::1]",
        "HTTP://[2001:DB8::A]:80/y": "[2001:db8::a]",
        "https://u@[::1]:444/z": "[::1]",
    }
    got = _run(spark, list(host_cases), U.url_host)
    assert got == list(host_cases.values())
    canon_cases = {
        # non-default port kept
        "http://[::1]:8080/p?a=1": "http://[::1]:8080/p?a=1",
        # default port stripped even behind brackets
        "HTTP://[2001:DB8::A]:80/y": "http://[2001:db8::a]/y",
        # no port, empty path
        "https://[::1]?utm_source=x": "https://[::1]/",
    }
    got = _run(spark, list(canon_cases), U.canonical_url)
    assert got == list(canon_cases.values())
    # registrable_domain passes IPv6 literals through unchanged
    assert _run(spark, ["http://[::1]:8080/"], U.registrable_domain) \
        == ["[::1]"]


def test_url_parts(spark):
    url = "HTTPS://u@WWW.Ex.org:444/p/q?a=1&utm_id=9#frag"
    df = spark.createDataFrame([(url,)], "url string")
    (row,) = df.select(
        U.url_scheme("url").alias("s"), U.url_host("url").alias("h"),
        U.url_path("url").alias("p"), U.url_query("url").alias("q"),
        U.clean_query("url").alias("cq"),
    ).collect()
    assert (row.s, row.h, row.p) == ("https", "www.ex.org", "/p/q")
    assert row.q == "a=1&utm_id=9" and row.cq == "a=1"
    # plan stays whole-stage codegen: no Python in the row path
    plan = df.select(U.canonical_url("url"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
