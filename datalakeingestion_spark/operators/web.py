"""Web-corpus URL/domain operators.

Greenfield (no reference pendant): the one curation input every
web-scale corpus shares is the URL. These operators key the corpus on
the registrable domain (``functions/urls.py``) — the unit at which
crawl quality, spam and licensing decisions are actually made (C4's
badwords domains, RefinedWeb's URL filtering, Gopher's domain mixes).

Scale shape: everything reduces to one zero-shuffle projection over
the corpus plus one groupBy on the registrable domain — domain
cardinality is web-host sized (millions), orders of magnitude under
document cardinality, and the blocklist is a broadcast-sized list.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import canonical_url, registrable_domain


def domain_rollup(
    docs: DataFrame,
    url_col: str,
    quality_col: str | None = None,
    blocked_domains: Sequence[str] = (),
) -> DataFrame:
    """Per-registrable-domain corpus profile — the decision table a
    web-curation pass reads before sampling: how much of the corpus
    each domain contributes, how many distinct pages (canonical URLs,
    so tracking-param noise doesn't inflate the count), its mean
    quality, and whether it is blocklisted.

    Output: (domain, n_docs, n_urls, share, blocked[, avg_quality]).
    ``share`` is the domain's fraction of the corpus (6 dp);
    ``avg_quality`` (present when ``quality_col`` is given) is the
    decimal-exact mean of the quality column, 6 dp.

    Scale shape: one projection + one domain-keyed groupBy; the corpus
    total is a 1-row broadcast; the blocklist is an ``isin`` literal
    (swap for a broadcast-table left-semi join past ~10k entries).
    """
    base = docs.select(
        registrable_domain(url_col).alias("domain"),
        canonical_url(url_col).alias("__canon"),
        *(
            [F.col(quality_col).cast("decimal(28,9)").alias("__q")]
            if quality_col
            else []
        ),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__canon").alias("n_urls"),
    ]
    if quality_col:
        aggs.append(
            F.round(
                (F.sum("__q") / F.count(F.lit(1))).cast("double"), 6
            ).alias("avg_quality")
        )
    per = base.groupBy("domain").agg(*aggs)
    total = docs.agg(F.count(F.lit(1)).cast("double").alias("__total"))
    out = (
        per.join(F.broadcast(total))
        .withColumn(
            "share",
            F.round(F.col("n_docs").cast("double") / F.col("__total"), 6),
        )
        .drop("__total")
    )
    blocked = (
        F.col("domain").isin(list(blocked_domains))
        if blocked_domains
        else F.lit(False)
    )
    return out.withColumn("blocked", blocked)
