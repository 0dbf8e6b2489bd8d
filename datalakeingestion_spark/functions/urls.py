"""URL parsing / canonicalization column expressions.

Greenfield (no reference pendant): web-corpus curation keys almost
everything on the URL — per-domain quality rollups, domain blocklists,
and URL-level dedup all need the host, the registrable domain and a
canonical form that collapses the tracking-parameter/fragment/
trailing-slash noise crawlers accumulate. Everything here is a pure
column expression (JVM regex + higher-order array functions, no Python
UDFs) written to be bit-identical to the ANSI-SQL fragments in the
DuckDB oracles (plans/round10.py keeps the SQL twins next to the
queries).

Scope notes (documented heuristics, not a full WHATWG parser):
- authority parsing assumes no userinfo and no IPv6 bracket hosts;
- the registrable domain uses a PUBLIC-SUFFIX-LITE rule — the last two
  labels, or the last three when the second-to-last label is a common
  second-level suffix (co/com/net/org/gov/ac/edu) under a two-letter
  country TLD (covers co.uk/com.au/ac.jp-style suffixes). A production
  deployment would swap in the Mozilla public-suffix list as a
  broadcast table; the EXPRESSION shape (label slicing) is the same.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters dropped by canonicalization: pure click-tracking,
#: never content-addressing (the C4/CCNet canonicalization convention).
TRACKING_PARAM_REGEX = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="

#: second-level labels that form a compound public suffix under a
#: two-letter country TLD (public-suffix-lite; see module docstring).
SECOND_LEVEL_SUFFIXES = ("ac", "co", "com", "edu", "gov", "net", "org")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    """Lower-cased scheme ('' when the value isn't an absolute URL)."""
    return F.lower(
        F.regexp_extract(_c(col), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )


def url_host(col: Column | str) -> Column:
    """Lower-cased host: authority minus any ``:port`` suffix."""
    auth = F.regexp_extract(
        _c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    return F.lower(F.regexp_replace(auth, r":[0-9]+$", ""))


def url_port(col: Column | str) -> Column:
    """Explicit port as a string ('' when none is present)."""
    auth = F.regexp_extract(
        _c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    return F.regexp_extract(auth, r":([0-9]+)$", 1)


def url_path(col: Column | str) -> Column:
    """Path component (may be '')."""
    return F.regexp_extract(
        _c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )


def url_query(col: Column | str) -> Column:
    """Raw query string without the '?' ('' when none).

    The fragment is stripped FIRST: a '?' inside the fragment
    (``/p#sec?a=1``) is fragment content, not a query string — an
    unanchored ``\\?`` extract would promote it and split canonical
    groups that differ only in fragment."""
    defragged = F.regexp_replace(_c(col), r"#.*$", "")
    return F.regexp_extract(defragged, r"\?(.*)$", 1)


def registrable_domain(col: Column | str) -> Column:
    """Public-suffix-lite registrable domain of the URL's host.

    ``www.`` is stripped first (it is never a registrable label). The
    rule: last two labels, or last three when the second-to-last is in
    :data:`SECOND_LEVEL_SUFFIXES` and the TLD has two letters.
    """
    host = F.regexp_replace(url_host(col), r"^www\.", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    compound = (
        (n >= F.lit(3))
        & second.isin(*SECOND_LEVEL_SUFFIXES)
        & (F.length(tld) == 2)
    )
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    return (
        F.when(n <= 1, host).when(compound, last3).otherwise(last2)
    )


def canonical_url(col: Column | str) -> Column:
    """Canonical form for URL-level dedup / grouping.

    Lower-cases scheme and host, strips ``www.``, drops default ports
    (80/http, 443/https), strips the trailing slash from ALL paths
    including the root (``https://x.com/`` and ``https://x.com``
    collapse into one canonical group — oracle parity pins this),
    drops the fragment, drops tracking parameters
    (:data:`TRACKING_PARAM_REGEX`) and sorts the surviving query
    parameters so param order never splits a group.
    """
    scheme = url_scheme(col)
    host = F.regexp_replace(url_host(col), r"^www\.", "")
    port = url_port(col)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(url_path(col), r"/$", "")
    params = F.array_sort(
        F.filter(
            F.split(url_query(col), "&"),
            lambda p: (p != F.lit(""))
            & (F.regexp_extract(p, TRACKING_PARAM_REGEX, 0) == F.lit("")),
        )
    )
    query_part = F.when(F.size(params) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(params, "&"))
    )
    return F.concat(
        scheme, F.lit("://"), host, port_part, path, query_part
    )
