from __future__ import annotations

import pytest


@pytest.mark.smoke
def test_canonical_url_rules(spark):
    from pyspark.sql import functions as F

    from datalakeingestion_spark.functions.urls import (
        canonical_url,
        registrable_domain,
        url_host,
        url_scheme,
    )

    rows = [
        # scheme/host case, www, default port, trailing slash, tracking
        # params dropped, survivors sorted, fragment dropped
        (1, "HTTPS://WWW.Ex.Co.UK:443/a/b/?z=2&utm_source=x&a=1#frag"),
        # non-default port kept; root path; ref dropped
        (2, "http://ex.com:8080/?ref=tw"),
        # no query, no port, no www
        (3, "https://sub.ex.com/path"),
        # bare host, single label
        (4, "https://localhost/"),
        # not a URL at all
        (5, "plain text"),
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    got = {
        r["id"]: (r["s"], r["h"], r["d"], r["c"])
        for r in df.select(
            "id",
            url_scheme("url").alias("s"),
            url_host("url").alias("h"),
            registrable_domain("url").alias("d"),
            canonical_url("url").alias("c"),
        ).collect()
    }
    assert got[1] == (
        "https",
        "www.ex.co.uk",
        "ex.co.uk",
        "https://ex.co.uk/a/b?a=1&z=2",
    )
    assert got[2] == ("http", "ex.com", "ex.com", "http://ex.com:8080")
    assert got[3] == (
        "https",
        "sub.ex.com",
        "ex.com",
        "https://sub.ex.com/path",
    )
    assert got[4] == ("https", "localhost", "localhost", "https://localhost")
    # non-URLs degrade to empty parts, never to an exception
    assert got[5] == ("", "", "", "://")


def test_domain_rollup_counts_and_blocklist(spark):
    from datalakeingestion_spark.operators.web import domain_rollup

    rows = [
        # same canonical page twice (tracking param noise) + one more page
        (1, "https://a.com/p1?utm_source=x", 10.0),
        (2, "https://www.a.com/p1", 20.0),
        (3, "https://a.com/p2", 30.0),
        (4, "https://b.co.uk/", 40.0),
    ]
    df = spark.createDataFrame(rows, "id int, url string, q double")
    got = {
        r["domain"]: (
            r["n_docs"],
            r["n_urls"],
            r["avg_quality"],
            r["share"],
            r["blocked"],
        )
        for r in domain_rollup(
            df, "url", quality_col="q", blocked_domains=("b.co.uk",)
        ).collect()
    }
    assert got["a.com"] == (3, 2, 20.0, 0.75, False)
    assert got["b.co.uk"] == (1, 1, 40.0, 0.25, True)


def test_url_query_ignores_fragment_content(spark):
    from datalakeingestion_spark.functions.urls import canonical_url, url_query

    df = spark.createDataFrame(
        [(1, "https://x.com/p#sec?a=1"), (2, "https://x.com/p")],
        "id int, url string",
    )
    got = {
        r["id"]: (r["q"], r["c"])
        for r in df.select(
            "id",
            url_query("url").alias("q"),
            canonical_url("url").alias("c"),
        ).collect()
    }
    # a '?' inside the fragment is NOT a query string: both URLs
    # canonicalize identically
    assert got[1] == ("", "https://x.com/p")
    assert got[2] == ("", "https://x.com/p")
