"""Round-5 scale probes (results recorded in SCALE.md).

Adversarial LSH band skew: a corpus where ONE band bucket holds >50% of
documents (mass-duplicated boilerplate — the shape a crawl corpus
actually has). Three measurements:

1. the hot band join with AQE skew-join ON (the shipped config),
2. the same join with AQE OFF (what a naive config would do),
3. the structural mitigation: exact-dedup FIRST (curation stage 1),
   which collapses the hot group to one keeper before any band join.

Run on an otherwise idle box:  python tools/scale_probe_r5.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from datalakeingestion_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-r5")
    spark.sparkContext.setLogLevel("ERROR")

    from datalakeingestion_spark.operators import dedup as dd

    n_hot, n_cold = 5_000, 95_000
    # hot docs: byte-identical boilerplate → identical signatures → one
    # band bucket with n_hot members in EVERY band. cold docs: unique
    # random-ish text from the doc id.
    docs = (
        spark.range(n_hot + n_cold)
        .select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") < n_hot,
                F.lit("mass duplicated boilerplate paragraph that every "
                      "scraped page carries verbatim"),
            )
            .otherwise(
                F.concat(
                    F.lit("unique document "),
                    F.conv(F.abs(F.xxhash64("id")).cast("string"), 10, 36),
                    F.lit(" body "),
                    F.conv(
                        F.abs(F.xxhash64("id", F.lit(1))).cast("string"),
                        10, 36,
                    ),
                )
            )
            .alias("text"),
        )
    )
    docs = docs.persist()
    docs.count()

    hot_pairs = n_hot * (n_hot - 1) // 2

    def cand_count(label: str) -> None:
        t0 = time.time()
        n = dd.lsh_candidate_pairs(dd.minhash_signatures(docs)).count()
        print(
            f"{label}: {n} candidates ({n - hot_pairs} beyond the hot "
            f"quadratic) in {time.time() - t0:.1f}s",
            flush=True,
        )

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    cand_count(f"hot-band {n_hot}/{n_hot + n_cold} AQE+skewJoin ON ")
    cand_count("  (warm repeat)                          ")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    cand_count(f"hot-band {n_hot}/{n_hot + n_cold} AQE OFF        ")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # structural mitigation: exact dedup first (curation stage 1)
    t0 = time.time()
    keepers = (
        dd.exact_duplicates(docs)
        .select(F.col("keep_doc_id").alias("doc_id"))
        .join(docs, "doc_id")
    )
    n = dd.lsh_candidate_pairs(dd.minhash_signatures(keepers)).count()
    print(
        f"exact-dedup-first: {n} candidates in {time.time() - t0:.1f}s "
        f"(hot group collapsed to 1 keeper)",
        flush=True,
    )
    docs.unpersist()




def image_probe() -> None:
    """Throughput of the Arrow-batched real image decode: 10k synthetic
    256x256 PPMs (~197 KB each, ~1.9 GB total) through image_stats."""
    from datalakeingestion_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-r5-image")
    spark.sparkContext.setLogLevel("ERROR")

    from datalakeingestion_spark.operators.multimodal import image_stats

    w = h = 256
    n = 10_000
    header = F.encode(F.lit("P6\n%d %d\n255\n" % (w, h)), "UTF-8")
    # deterministic pseudo-random raster: repeat a 32-byte md5-derived
    # seed to w*h*3 bytes (content differs per id via the hash)
    body = F.expr(
        f"repeat(unhex(md5(cast(id AS STRING)) || md5(cast(id+1 AS STRING))), "
        f"{(w * h * 3) // 32 + 1})"
    )
    media = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.concat(
            header, F.substring(body, 1, w * h * 3).cast("binary")
        ).alias("content"),
    )
    t0 = time.time()
    out = image_stats(media)
    cnt = out.filter(F.col("decode_error").isNull()).count()
    dt = time.time() - t0
    gb = n * (w * h * 3 + 15) / 1e9
    print(
        f"image_stats {n} x {w}x{h} PPM ({gb:.2f} GB): {cnt} decoded in "
        f"{dt:.1f}s = {gb / dt:.2f} GB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
    image_probe()
    funnel_probe()


def funnel_probe() -> None:
    """session_funnel_stages shape at 20M events / 500k users: the whole
    funnel (sessionize + two stacked stage windows + session aggregate)
    must run as ONE hash(user_id) exchange."""
    from datalakeingestion_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-r5-funnel")
    spark.sparkContext.setLogLevel("ERROR")

    n, users = 20_000_000, 500_000
    ev = spark.range(n).select(
        (F.abs(F.xxhash64("id")) % users).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + F.col("id") * 37_000_000
            % (86_400_000_000 * 30)
        ).alias("ts"),
        F.element_at(
            F.array(F.lit("signup"), F.lit("click"), F.lit("view"),
                    F.lit("purchase")),
            (F.abs(F.xxhash64("id", F.lit(1))) % 4 + 1).cast("int"),
        ).alias("event_type"),
    )
    ev = ev.persist()
    ev.count()

    from pyspark.sql.window import Window

    us = F.unix_micros(F.col("ts"))
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(us - F.lag(us).over(wu) > 1_800_000_000, 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy(
        "us", "event_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = (
        ev.select("user_id", "event_id", "event_type", us.alias("us"),
                  brk.alias("brk"))
        .withColumn("sess", F.sum("brk").over(run))
    )
    ws = Window.partitionBy("user_id", "sess").orderBy(
        "us", "event_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p1 = s.withColumn(
        "min_signup",
        F.min(F.when(F.col("event_type") == "signup", F.col("us"))).over(ws),
    )
    p2 = p1.withColumn(
        "min_qclick",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & F.col("min_signup").isNotNull()
                & (F.col("min_signup") < F.col("us")),
                F.col("us"),
            )
        ).over(ws),
    )
    stage = (
        F.when((F.col("event_type") == "purchase")
               & F.col("min_qclick").isNotNull()
               & (F.col("min_qclick") < F.col("us")), 3)
        .when((F.col("event_type") == "click")
              & F.col("min_signup").isNotNull()
              & (F.col("min_signup") < F.col("us")), 2)
        .when(F.col("event_type") == "signup", 1)
        .otherwise(0)
    )
    out = (
        p2.withColumn("stg", stage)
        .groupBy("user_id", "sess")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.max("stg").alias("max_stage"))
        .groupBy("max_stage")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    t0 = time.time()
    rows = {r["max_stage"]: r["n_sessions"] for r in out.collect()}
    dt = time.time() - t0
    # n_ex counts the probe's extra session-count rollup exchange too;
    # the 20M-row DATA path shuffles exactly once, on hash(user_id)
    # (verified: the registry query's own plan shows 1 exchange)
    print(
        f"session funnel 20M events / 500k users: {sum(rows.values())} "
        f"sessions, stages {rows}, {n_ex} exchanges total (1 on the "
        f"20M-row path + the session-count rollup), {dt:.1f}s",
        flush=True,
    )
    ev.unpersist()
