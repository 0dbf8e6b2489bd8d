"""Synthetic scale probes for the round-4 operators (results recorded in
SCALE.md). Run on an otherwise idle box:  python tools/scale_probe_r4.py
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def timed(label, df):
    t0 = time.time()
    n = df.count()
    print(f"{label}: {n} rows in {time.time() - t0:.1f}s", flush=True)


def main() -> None:
    from datalakeingestion_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-r4")
    spark.sparkContext.setLogLevel("ERROR")

    # --- triangle_counts: 2M-edge skewed graph --------------------------
    from datalakeingestion_spark.operators.graph import triangle_counts

    # hub-skewed synthetic: node ids drawn as id % k with k varying, so a
    # few nodes take large degree — exercises the orientation bound
    edges = (
        spark.range(2_000_000)
        .select(
            (F.xxhash64("id") % 50_000).alias("src"),
            (F.xxhash64("id", F.lit(1)) % F.when(
                F.xxhash64("id", F.lit(2)) % 10 == 0, 500
            ).otherwise(50_000)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    timed("triangle_counts 2M edges (10% hub-directed)", triangle_counts(edges))

    # --- gini_from_values: 20M rows, 20 groups --------------------------
    from datalakeingestion_spark.operators.profiling import gini_from_values

    vals = spark.range(20_000_000).select(
        (F.col("id") % 20).cast("string").alias("grp"),
        (F.abs(F.xxhash64("id")) % 5_000).alias("val"),
    )
    timed("gini 20M rows / 20 groups / 5k domain",
          gini_from_values(vals, "val", ["grp"]))

    # --- ks drift: 20M rows, 20 sources, 2k value domain ----------------
    # (inline: same shape as plans/round4.py::ks_drift_by_source)
    from pyspark.sql.window import Window

    h = (
        spark.range(20_000_000)
        .select(
            (F.col("id") % 20).cast("string").alias("source"),
            (F.abs(F.xxhash64("id", F.lit(3))) % 2_000).alias("v"),
        )
        .groupBy("source", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    vals2 = h.select("v").distinct()
    srcs = h.groupBy("source").agg(F.sum("c").alias("n_s"))
    grid = (
        srcs.crossJoin(vals2)
        .join(h, ["source", "v"], "left")
        .select("source", "n_s", "v", F.coalesce("c", F.lit(0)).alias("c"))
    )
    wsrc = Window.partitionBy("source").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.withColumn("cum", F.sum("c").over(wsrc))
    gh = h.groupBy("v").agg(F.sum("c").alias("c"))
    wg = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    gcum = gh.withColumn("gcum", F.sum("c").over(wg)).select("v", "gcum")
    n_tot = h.agg(F.sum("c").cast("double").alias("n_tot"))
    ks = (
        cum.join(gcum, "v")
        .crossJoin(n_tot)
        .groupBy("source")
        .agg(
            F.max(
                F.round(
                    F.abs(
                        F.col("cum") / F.col("n_s").cast("double")
                        - F.col("gcum") / F.col("n_tot")
                    ),
                    6,
                )
            ).alias("ks")
        )
    )
    timed("ks_drift 20M rows / 20 sources / 2k domain", ks)

    # --- trailing-7d actives: 20M events, 200k users, 365 days ----------
    ud = (
        spark.range(20_000_000)
        .select(
            (F.abs(F.xxhash64("id", F.lit(5))) % 200_000).alias("user_id"),
            (F.abs(F.xxhash64("id", F.lit(6))) % 365).alias("day"),
        )
        .distinct()
    )
    days = ud.select(F.col("day").alias("obs_day")).distinct()
    cover = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + F.lit(6))).alias(
            "cday"
        ),
    )
    act = (
        cover.join(days, cover.cday == days.obs_day)
        .groupBy(F.col("obs_day"))
        .agg(F.count_distinct("user_id").alias("active_7d"))
    )
    timed("trailing_7d 20M events / 200k users / 365 days", act)

    # --- silhouette: 200k x 32-dim vectors, 10 labels -------------------
    from datalakeingestion_spark.operators.similarity import (
        silhouette_by_label,
    )

    emb = spark.range(200_000).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    (F.abs(F.xxhash64("id", F.lit(100 + d))) % 1000)
                    / 500.0
                    - 1.0
                ).cast("float")
                for d in range(32)
            ]
        ).alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label"),
    )
    timed("silhouette 200k x 32d x 10 labels", silhouette_by_label(emb))

    spark.stop()


if __name__ == "__main__":
    main()
