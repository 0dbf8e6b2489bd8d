"""Round-9b scale probes (results recorded in SCALE.md).

Adversarial measurements for the late-round-9 operators:

1. **Classifier training linearity**
   (operators/classifier.py::logistic_train_hard_sigmoid): 3 GD steps
   over 500k and 1M rows x 4 features. Each step must be ONE scan with
   a partial-aggregatable (d+1)-column sum — doubling the corpus should
   roughly double per-step wall time, and the driver holds only d+1
   scalars between steps.

2. **Gap-fill output linearity**
   (operators/timeseries.py::daily_gapfill_ffill): 10k and 20k keys,
   each with a ~100-day span observed at ~30% density. Grid rows =
   sum of spans (linear in OUTPUT), fill is one per-key running window
   — doubling keys should roughly double wall time.

3. **Generalization ladder**
   (operators/privacy.py::generalize_to_k): 1M records, 2 rungs +
   suppression, with class-count-sized size tables broadcast back.
   The record frame must never shuffle — wall time should be a few
   scans, not a sort/exchange pipeline.

Run on an otherwise idle box:  python tools/scale_probe_r9b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _spark():
    from datalakeingestion_spark.session import get_spark

    return get_spark(app_name="scale-probe-r9b", cpus=32)


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


def probe_classifier(spark):
    from datalakeingestion_spark.operators.classifier import (
        logistic_train_hard_sigmoid,
    )

    print("== classifier training linearity ==")
    for n in (500_000, 1_000_000):
        feats = spark.range(n).select(
            (F.pmod(F.col("id"), 7) < 3).cast("double").alias("y"),
            (F.pmod(F.col("id"), 13).cast("double") / 13.0).alias("x1"),
            (F.pmod(F.col("id"), 17).cast("double") / 17.0).alias("x2"),
            (F.pmod(F.col("id"), 19).cast("double") / 19.0).alias("x3"),
            (F.pmod(F.col("id"), 23).cast("double") / 23.0).alias("x4"),
        )
        feats = feats.localCheckpoint()  # isolate training cost from gen
        dt = _timeit(
            lambda: logistic_train_hard_sigmoid(
                feats, ["x1", "x2", "x3", "x4"], steps=3
            )
        )
        print(f"  {n:>9,} rows, 3 steps: {dt:6.2f} s  ({dt / 3:.2f} s/step)")


def probe_gapfill(spark):
    from datalakeingestion_spark.operators.timeseries import (
        daily_gapfill_ffill,
    )

    print("== gap-fill output linearity ==")
    for keys in (10_000, 20_000):
        n = keys * 30  # ~30 observations per key over ~100 days
        ev = spark.range(n).select(
            (F.col("id") % keys).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1704067200)  # 2024-01-01
                + F.pmod(F.hash("id") , 100).cast("long") * 86400
            ).alias("ts"),
            (F.pmod(F.col("id"), 97).cast("double")).alias("value"),
        ).localCheckpoint()
        out = daily_gapfill_ffill(ev)
        rows = out.count()
        dt = _timeit(lambda: out.count())
        print(f"  {keys:>6,} keys -> {rows:>9,} grid rows: {dt:6.2f} s")


def probe_generalize(spark):
    from datalakeingestion_spark.operators.privacy import generalize_to_k

    print("== generalization ladder (1M records, 2 rungs) ==")
    n = 1_000_000
    # ~50k fine classes (most tiny), ~200 coarse classes
    df = spark.range(n).select(
        F.col("id"),
        F.pmod(F.hash("id"), 50_000).cast("string").alias("fine"),
        F.pmod(F.hash("id"), 200).cast("string").alias("coarse"),
    ).localCheckpoint()
    out = generalize_to_k(
        df, [{"qi": "fine"}, {"qi": "coarse"}], k=25
    )
    dt = _timeit(lambda: out.groupBy("lvl").count().collect())
    dist = {r["lvl"]: r["count"] for r in out.groupBy("lvl").count().collect()}
    plan = out._jdf.queryExecution().executedPlan().toString()
    print(f"  wall {dt:6.2f} s; level distribution {dist}; "
          f"record-frame Exchanges in plan: {plan.count('Exchange')}")


def probe_incremental_linkage(spark):
    """4. Incremental entity resolution: 10k-record batch matched
    against a 100k-entity golden table across 1000 blocks — the
    per-batch cost must be batch x entities-per-block, not lake-sized."""
    from datalakeingestion_spark.operators.linkage import (
        FieldWeight,
        match_against,
    )

    print("== incremental linkage (10k batch vs 100k golden, 1000 blocks) ==")
    golden = spark.range(100_000).select(
        F.col("id").alias("eid"),
        F.pmod(F.hash("id"), 1000).cast("string").alias("blk"),
        F.concat(F.lit("name"), (F.col("id") % 5000).cast("string")).alias(
            "name"
        ),
    ).localCheckpoint()
    batch = spark.range(10_000).select(
        (F.col("id") + 1_000_000).alias("bid"),
        F.pmod(F.hash(F.col("id") + 7), 1000).cast("string").alias("blk"),
        F.concat(F.lit("name"), (F.col("id") % 5000).cast("string")).alias(
            "name"
        ),
    ).localCheckpoint()
    out = match_against(
        batch, golden, "bid", "eid", ["blk"],
        [FieldWeight("name", 1, 10, -5)], min_score=10,
    )
    n = out.count()
    dt = _timeit(lambda: out.count())
    print(f"  wall {dt:6.2f} s; {n:,} candidate matches at edit<=1")


if __name__ == "__main__":
    spark = _spark()
    t0 = time.time()
    probe_classifier(spark)
    probe_gapfill(spark)
    probe_generalize(spark)
    probe_incremental_linkage(spark)
    print(f"total {time.time() - t0:.1f} s")
