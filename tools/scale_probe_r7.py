"""Round-7 scale probes (results recorded in SCALE.md).

Adversarial measurements for this round's claims:

1. **Stored-index flood cap** (operators/dedup.py::dedup_against_stored_index):
   a near-identical flood batch probing ONE hot index bucket — the
   unguarded term the round-6 verdict flagged. Measures candidate-pair
   count and wall time with and without ``max_bucket``: the cap must
   bound candidates (and hence the verify semi-join's broadcast set)
   while leaving ordinary near-dup matches intact.

2. **Monitor state bound at 20M events** (streaming/drift.py): the
   windowed PSI / KS-grid / KS-sample monitors run as REAL streams over
   20M rows spanning ~60 weekly windows; Spark's stateOperators metrics
   verify state rows == #windows (the all-bins-as-columns design keeps
   ONE row per window, not windows × bins) and that the KS-sample's
   hash cap keeps candidate structs per window near the target.

3. **1M-doc dedup** (operators/dedup.py): deterministic synthetic corpus
   (planted near-dup neighbors), headline minhash_near_duplicates +
   cluster resolution at 100k and 1M docs — the measured
   sublinear-in-pairs scaling claim, at 10× round 5's probe size —
   and the stored-index per-batch probe against the 1M lake vs the
   inline form (the lake-coupled term must stay flat).

Run on an otherwise idle box:  python tools/scale_probe_r7.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _mk_docs(spark, n, start=0, words=12, dup_every=None):
    """Deterministic synthetic corpus: ``words`` pseudo-random tokens
    per doc from xxhash64 chains; with ``dup_every``, every k-th doc is
    a near-duplicate of its predecessor (same body, one-token tail)."""
    base = spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.conv(
                    F.abs(F.xxhash64("id", F.lit(j))).cast("string"), 10, 36
                )
                for j in range(words)
            ],
        ).alias("text"),
    )
    if dup_every is None:
        return base
    # doc i (i % dup_every == 1) mirrors doc i-1's body + " dup"
    twin = F.concat_ws(
        " ",
        *[
            F.conv(
                F.abs(F.xxhash64(F.col("doc_id") - 1, F.lit(j))).cast(
                    "string"
                ),
                10,
                36,
            )
            for j in range(words)
        ],
    )
    return base.select(
        "doc_id",
        F.when(
            (F.col("doc_id") % dup_every == 1) & (F.col("doc_id") > 0),
            F.concat(twin, F.lit(" dup")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def probe_stored_index_flood(spark) -> None:
    from datalakeingestion_spark.operators import dedup as dd

    lake_n, flood_n = 200_000, 5_000
    lake = _mk_docs(spark, lake_n).persist()
    lake.count()
    for t in ("r7f_bands", "r7f_shingles"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    t0 = time.time()
    dd.build_dedup_index(lake, "r7f", n_buckets=8)
    t_build = time.time() - t0

    # flood: 5k near-identical clones of ONE lake doc (distinct short
    # tails, so exact dedup upstream would NOT collapse them) + 1k
    # ordinary near-dups of distinct lake docs
    # NB: the first xxhash64 arg must be LONG — lake bodies hash the
    # long id column, and xxhash64(int 77) != xxhash64(long 77)
    seed_body = F.concat_ws(
        " ",
        *[
            F.conv(
                F.abs(
                    F.xxhash64(F.lit(77).cast("long"), F.lit(j))
                ).cast("string"),
                10,
                36,
            )
            for j in range(12)
        ],
    )
    flood = spark.range(flood_n).select(
        (F.col("id") + 50_000_000).alias("doc_id"),
        F.concat(seed_body, F.lit(" v"), (F.col("id") % 37)).alias("text"),
    )
    normal = _mk_docs(spark, 1_000, start=60_000_000).select(
        "doc_id",
        F.concat(
            F.concat_ws(
                " ",
                *[
                    F.conv(
                        F.abs(
                            F.xxhash64(
                                (F.col("doc_id") - 60_000_000) * 191,
                                F.lit(j),
                            )
                        ).cast("string"),
                        10,
                        36,
                    )
                    for j in range(12)
                ],
            ),
            F.lit(" tail"),
        ).alias("text"),
    )
    batch = flood.unionByName(normal).persist()
    batch.count()

    for cap in (None, 64):
        t0 = time.time()
        out = dd.dedup_against_stored_index(
            batch, "r7f", 0.5, max_bucket=cap
        )
        n_pairs = out.count()
        dt = time.time() - t0
        print(
            f"stored_flood lake={lake_n} batch={flood_n}+1000 "
            f"max_bucket={cap}: {n_pairs} verified pairs in {dt:.1f}s "
            f"(index build {t_build:.1f}s)"
        )
        spark.catalog.clearCache()
        lake.persist().count()
        batch.persist().count()
    for t in ("r7f_bands", "r7f_shingles"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.catalog.clearCache()


def probe_monitor_state_20m(spark, tmp_dir) -> None:
    from datalakeingestion_spark.streaming.drift import (
        reference_histogram,
        reference_sample,
        windowed_ks_grid,
        windowed_ks_sample,
        windowed_psi_drift,
    )

    n, weeks = 20_000_000, 60
    src = os.path.join(tmp_dir, "events20m")
    events = spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            (F.col("id") % weeks) * 604800
            + F.abs(F.xxhash64("id")) % 604800
        )
        .cast("timestamp")
        .alias("ts"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 500).cast("double").alias(
            "value"
        ),
    )
    t0 = time.time()
    events.write.mode("overwrite").parquet(src)
    print(f"monitor20m: wrote {n} rows in {time.time() - t0:.1f}s")
    batch = spark.read.parquet(src)
    ref_h = reference_histogram(
        batch.filter(F.col("ts").cast("long") < 2 * 604800),
        "value", lo=0.0, hi=500.0,
    ).persist()
    ref_h.count()
    ref_s = reference_sample(
        batch.filter(F.col("ts").cast("long") < 2 * 604800),
        "value", "event_id", k=256,
    ).persist()
    ref_s.count()

    # cap targeting ~4x k survivors per window: rows/window ~ n/weeks
    cap = int((1 << 60) * (4 * 256) / (n / weeks))
    monitors = {
        "psi": lambda d: windowed_psi_drift(
            d, ref_h, "value", lo=0.0, hi=500.0, window="7 days"
        ),
        "ks_grid": lambda d: windowed_ks_grid(
            d, ref_h, "value", lo=0.0, hi=500.0, window="7 days"
        ),
        "ks_sample": lambda d: windowed_ks_sample(
            d, ref_s, "value", "ts", "event_id", k=256, hash_cap=cap
        ),
    }
    for name, mk in monitors.items():
        stream = spark.readStream.schema(batch.schema).parquet(src)
        out = mk(stream.withWatermark("ts", "1 hour"))
        qname = f"m20_{name}"
        t0 = time.time()
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        dt = time.time() - t0
        state_rows = max(
            (
                so["numRowsTotal"]
                for p in q.recentProgress
                for so in p.get("stateOperators", [])
            ),
            default=-1,
        )
        n_out = spark.sql(f"SELECT count(*) FROM {qname}").first()[0]
        print(
            f"monitor20m {name}: stream {dt:.1f}s, peak state rows "
            f"{state_rows} (windows={weeks}), {n_out} emitted rows"
            + (f", hash_cap={cap}" if name == "ks_sample" else "")
        )
    spark.catalog.clearCache()


def probe_dedup_1m(spark) -> None:
    from datalakeingestion_spark.operators import dedup as dd

    for n in (100_000, 1_000_000):
        docs = _mk_docs(spark, n, dup_every=10).persist()
        docs.count()
        t0 = time.time()
        pairs = dd.minhash_near_duplicates(docs, threshold=0.5).persist()
        n_pairs = pairs.count()
        t_pairs = time.time() - t0
        t0 = time.time()
        labels = dd.connected_components(pairs)
        n_clustered = labels.count()
        t_cc = time.time() - t0
        print(
            f"dedup1m n={n}: {n_pairs} pairs in {t_pairs:.1f}s, "
            f"cluster-resolve {n_clustered} labeled in {t_cc:.1f}s"
        )
        spark.catalog.clearCache()


def probe_stored_vs_inline_1m(spark) -> None:
    from datalakeingestion_spark.operators import dedup as dd

    lake_n, batch_n = 1_000_000, 5_000
    lake = _mk_docs(spark, lake_n).persist()
    lake.count()
    for t in ("r7m_bands", "r7m_shingles"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    t0 = time.time()
    dd.build_dedup_index(lake, "r7m", n_buckets=16)
    t_build = time.time() - t0

    # batch: 20% near-dups of lake docs, rest fresh
    batch = (
        _mk_docs(spark, batch_n, start=70_000_000)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.concat_ws(
                        " ",
                        *[
                            F.conv(
                                F.abs(
                                    F.xxhash64(
                                        F.col("doc_id") % lake_n, F.lit(j)
                                    )
                                ).cast("string"),
                                10,
                                36,
                            )
                            for j in range(12)
                        ],
                    ),
                    F.lit(" x"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .persist()
    )
    batch.count()

    t0 = time.time()
    n_stored = dd.dedup_against_stored_index(
        batch, "r7m", 0.5, max_bucket=64
    ).count()
    t_stored = time.time() - t0
    t0 = time.time()
    n_inline = dd.dedup_against_index(
        batch, lake, 0.5, max_bucket=64
    ).count()
    t_inline = time.time() - t0
    print(
        f"stored_vs_inline lake={lake_n} batch={batch_n}: stored "
        f"{n_stored} pairs {t_stored:.1f}s vs inline {n_inline} pairs "
        f"{t_inline:.1f}s (index build {t_build:.1f}s, amortized)"
    )
    for t in ("r7m_bands", "r7m_shingles"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.catalog.clearCache()


def main() -> None:
    import tempfile

    from datalakeingestion_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-r7")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as td:
        probe_stored_index_flood(spark)
        probe_monitor_state_20m(spark, td)
        probe_dedup_1m(spark)
        probe_stored_vs_inline_1m(spark)
        probe_quantiles_20m(spark)
        probe_distinct_sample_20m(spark, td)


if __name__ == "__main__":
    main()


def probe_quantiles_20m(spark) -> None:
    """exact_quantiles_by_key at 20M rows / 3 keys vs the window form
    (percentile_disc shape), plus the sketch estimate and the windowed
    distinct monitor — the round-7 operators' scale check."""
    from pyspark.sql import Window

    from datalakeingestion_spark.functions.hashing import portable_hash60
    from datalakeingestion_spark.operators.quantiles import (
        exact_quantiles_by_key,
        sampled_quantiles_by_key,
    )

    n = 20_000_000
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 3).cast("string").alias("k"),
            F.col("id").alias("rid"),
            (F.abs(F.xxhash64("id")) % 100_000).cast("double").alias("v"),
        )
        .persist()
    )
    df.count()

    t0 = time.time()
    got = exact_quantiles_by_key(df, ["k"], "v")
    n_exact = got.count()
    t_exact = time.time() - t0

    t0 = time.time()
    h = portable_hash60(F.col("rid").cast("string"))
    est = sampled_quantiles_by_key(df, ["k"], h, "v", k=256)
    n_est = est.count()
    t_est = time.time() - t0

    # window reference: value at rank r via cume over a per-key sort —
    # the single-task-per-key shape this operator exists to avoid
    t0 = time.time()
    w = Window.partitionBy("k").orderBy("v")
    ref = (
        df.withColumn("_rn", F.row_number().over(w))
        .groupBy("k")
        .agg(F.max(F.when(F.col("_rn") == 1, F.col("v"))).alias("x"))
    )
    ref.count()
    t_window = time.time() - t0

    print(
        f"quantiles20m n={n} keys=3: exact {n_exact} rows {t_exact:.1f}s, "
        f"sketch {n_est} rows {t_est:.1f}s, per-key window sort "
        f"{t_window:.1f}s (the shape avoided)"
    )
    spark.catalog.clearCache()


def probe_distinct_sample_20m(spark, tmp_dir) -> None:
    from datalakeingestion_spark.streaming.drift import (
        windowed_distinct_sample,
    )

    n, weeks = 20_000_000, 60
    src = os.path.join(tmp_dir, "wds20m")
    events = spark.range(n).select(
        (F.abs(F.xxhash64("id", F.lit(3))) % 2_000_000).alias("user_id"),
        (
            (F.col("id") % weeks) * 604800
            + F.abs(F.xxhash64("id")) % 604800
        )
        .cast("timestamp")
        .alias("ts"),
    )
    events.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    cap = 1 << 52  # ~1/256 of the hash space -> ~few hundred survivors/wk
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = windowed_distinct_sample(
        stream.withWatermark("ts", "1 hour"), "user_id", "ts", hash_cap=cap
    )
    t0 = time.time()
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("wds20m")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    dt = time.time() - t0
    state_rows = max(
        (
            so["numRowsTotal"]
            for p in q.recentProgress
            for so in p.get("stateOperators", [])
        ),
        default=-1,
    )
    rows = spark.sql(
        "SELECT min(n_under_cap) mn, max(n_under_cap) mx FROM wds20m"
    ).first()
    print(
        f"distinct_sample20m: stream {dt:.1f}s, peak state rows "
        f"{state_rows} (windows={weeks}), survivors/window "
        f"{rows['mn']}-{rows['mx']}, cap=2^52"
    )
    spark.catalog.clearCache()
