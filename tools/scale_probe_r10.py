"""Round-10 scale probes (results recorded in SCALE.md).

Adversarial measurements for the round-10 operators:

1. **Bloom door check** (operators/bloom.py): build over 1M docs into a
   6.3M-bit filter (100k BIGINT words — still broadcast-sized), then
   probe a 10k batch. Build must be one projection + one bounded
   groupBy; probe must be broadcast-join shaped (per-batch cost
   O(batch*k), independent of lake size after the build).

2. **URL canonicalization throughput** (functions/urls.py): 1M URLs
   through parse + registrable domain + canonical form. Must be one
   zero-shuffle codegen projection — wall time is scan-bound.

3. **Golden-record MERGE** (operators/linkage.py::resolve_increment):
   10k batch vs a 100k-entity golden table across 1000 blocks — the
   production increment. Anti-join + block-keyed match + entity-keyed
   fold; the mint window sorts only the unmatched slice.

4. **MaxMatch encode** (operators/packing.py::maxmatch_encode_words):
   1M docs -> distinct-word aggregate + zero-shuffle regex projection.
   Corpus work must be the ONE word shuffle.

Run on an otherwise idle box:  python tools/scale_probe_r10.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _spark():
    from datalakeingestion_spark.session import get_spark

    return get_spark(app_name="scale-probe-r10", cpus=32)


def _timeit(fn, warmup=True):
    if warmup:
        fn()
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def probe_bloom(spark):
    from datalakeingestion_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    print("== bloom door check ==")
    m, k = 63 * 100_000, 7
    docs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body number "), F.col("id").cast("string")).alias(
            "text"
        ),
    ).localCheckpoint()
    dt = _timeit(lambda: bloom_build(docs, m, k).count())
    bloom = bloom_build(docs, m, k).localCheckpoint()
    print(f"  build 1M docs -> {m:,}-bit filter: {dt:6.2f} s "
          f"({bloom.count():,} words)")
    batch = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body number "), (F.col("id") * 97).cast("string")).alias(
            "text"
        ),
    ).localCheckpoint()
    dt = _timeit(lambda: bloom_probe(batch, bloom, m, k).count())
    print(f"  probe 10k batch: {dt:6.2f} s")


def probe_urls(spark):
    from datalakeingestion_spark.functions.urls import (
        canonical_url,
        registrable_domain,
    )

    print("== url canonicalization throughput ==")
    urls = spark.range(1_000_000).select(
        F.concat(
            F.lit("HTTPS://WWW.site-"),
            F.pmod(F.col("id"), 5000).cast("string"),
            F.when(F.pmod(F.col("id"), 4) == 0, F.lit(".co.uk")).otherwise(
                F.lit(".com")
            ),
            F.lit("/p/"),
            F.col("id").cast("string"),
            F.lit("/?utm_source=x&b=2&a=1#f"),
        ).alias("url")
    ).localCheckpoint()
    dt = _timeit(
        lambda: urls.select(
            registrable_domain("url").alias("d"),
            canonical_url("url").alias("c"),
        ).write.format("noop").mode("overwrite").save()
    )
    plan = (
        urls.select(canonical_url("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    print(f"  1M URLs parse+canonicalize: {dt:6.2f} s "
          f"(exchanges in plan: {plan.count('Exchange')})")


def probe_merge(spark):
    from datalakeingestion_spark.operators.linkage import (
        FieldWeight,
        resolve_increment,
    )

    print("== golden-record merge (10k batch vs 100k golden) ==")
    golden = spark.range(100_000).select(
        F.col("id").alias("entity_id"),
        F.pmod(F.col("id"), 1000).cast("string").alias("blk"),
        F.concat(F.lit("entity name "), F.col("id").cast("string")).alias("name"),
        (F.col("id") % 997).cast("double").alias("bal"),
        F.lit(1).cast("long").alias("n_members"),
    ).localCheckpoint()
    crosswalk = spark.range(100_000).select(
        F.col("id").alias("rec"), F.col("id").alias("entity_id")
    ).localCheckpoint()
    batch = spark.range(200_000, 210_000).select(
        F.col("id").alias("rec"),
        F.pmod(F.col("id"), 1000).cast("string").alias("blk"),
        # half the batch matches an existing entity name exactly
        F.when(
            F.pmod(F.col("id"), 2) == 0,
            F.concat(F.lit("entity name "), F.pmod(F.col("id"), 100_000).cast("string")),
        )
        .otherwise(F.concat(F.lit("fresh name "), F.col("id").cast("string")))
        .alias("name"),
        (F.col("id") % 991).cast("double").alias("bal"),
    ).localCheckpoint()
    fields = [FieldWeight("name", 0, 20, -5)]

    def run():
        g2, cw2 = resolve_increment(
            batch, golden, crosswalk,
            record_id="rec", entity_col="entity_id", block_cols=["blk"],
            fields=fields, min_score=15, name_col="name",
            max_cols=("bal",),
        )
        return g2.count(), cw2.count()

    dt = _timeit(run)
    g2n, cw2n = run()
    print(f"  merge: {dt:6.2f} s (golden' {g2n:,} entities, "
          f"crosswalk' {cw2n:,} rows)")


def probe_maxmatch(spark):
    from datalakeingestion_spark.operators.packing import (
        maxmatch_encode_words,
    )

    print("== maxmatch encode (1M docs) ==")
    docs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the rate of data inter change in this system is word"),
            F.pmod(F.col("id"), 50_000).cast("string"),
        ).alias("text"),
    ).localCheckpoint()
    vocab = ("the", "ing", "er", "te", "in", "is", "of", "at", "an",
             "a", "b", "c", "d", "e", "f", "g", "h", "i", "m", "n",
             "o", "r", "s", "t", "w", "y")
    dt = _timeit(
        lambda: maxmatch_encode_words(docs, vocab)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    n = maxmatch_encode_words(docs, vocab).count()
    print(f"  1M docs -> {n:,} distinct words encoded: {dt:6.2f} s")


if __name__ == "__main__":
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    probe_bloom(spark)
    probe_urls(spark)
    probe_merge(spark)
    probe_maxmatch(spark)
