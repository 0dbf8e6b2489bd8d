"""Round-13 measurement probe (guide §1): per-query wall timing for the
run-once registry targets, split into fn() assembly (where eager
checkpoints execute) and the noop-sink action, under the TUNED session.

Usage: python tools/probe_r13.py [sf_dir] name [name ...]
       python tools/probe_r13.py --sweep [sf_dir]   # stage split of
                                                    # lsh_threshold_sweep
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = sys.argv[1:]
    sweep = False
    if args and args[0] == "--sweep":
        sweep = True
        args = args[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded
    from datalakeingestion_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(app_name="dli-probe-r13")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    if sweep:
        _sweep_stages(spark, sf_dir)
        return 0

    for name in args:
        qd = REGISTRY[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        df = qd.fn(spark, sf_dir)
        t1 = time.perf_counter()
        _noop(df)
        t2 = time.perf_counter()
        # warm repeat (persists filled)
        df2 = qd.fn(spark, sf_dir)
        t3 = time.perf_counter()
        _noop(df2)
        t4 = time.perf_counter()
        print(
            f"{name}: assembly={t1 - t0:.3f}s action={t2 - t1:.3f}s "
            f"warm_assembly={t3 - t2:.3f}s warm_action={t4 - t3:.3f}s "
            f"total_cold={t2 - t0:.3f}s"
        )
        spark.sparkContext.setJobDescription(None)
    return 0


def _sweep_stages(spark, sf_dir: str) -> None:
    """Stage-level wall split of lsh_threshold_sweep's current shape."""
    from pyspark.sql import functions as F

    from datalakeingestion_spark.operators import dedup as dd
    from datalakeingestion_spark.plans.round5 import _SWEEP_CONFIGS
    from datalakeingestion_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    sh = dd._shingle_table(docs, "text", "doc_id", 3).persist()
    n_sh = sh.count()
    t1 = time.perf_counter()
    sig = dd._signatures_from_shingles(sh).persist()
    n_sig = sig.count()
    t2 = time.perf_counter()
    frames = []
    for b, r in _SWEEP_CONFIGS:
        for j in range(b):
            cols = [F.col(f"mh{j * r + k}") for k in range(r)]
            frames.append(
                sig.select(
                    F.lit(f"{b}x{r}").alias("config"),
                    "doc_id",
                    F.lit(j).alias("band_id"),
                    F.concat_ws(",", *cols).alias("band_sig"),
                )
            )
    bands = frames[0]
    for fr in frames[1:]:
        bands = bands.unionByName(fr)
    bands = bands.persist()
    b1, b2 = bands.alias("b1"), bands.alias("b2")
    cand = (
        b1.join(
            b2,
            (F.col("b1.config") == F.col("b2.config"))
            & (F.col("b1.band_id") == F.col("b2.band_id"))
            & (F.col("b1.band_sig") == F.col("b2.band_sig"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(
            F.col("b1.config").alias("config"),
            F.col("b1.doc_id").alias("doc_id_a"),
            F.col("b2.doc_id").alias("doc_id_b"),
        )
        .distinct()
        .persist()
    )
    n_cand = cand.count()
    t3 = time.perf_counter()
    upairs = cand.select("doc_id_a", "doc_id_b").distinct().persist()
    n_up = upairs.count()
    t4 = time.perf_counter()
    ver = dd._jaccard_verify(upairs, sh, 0.5).select(
        "doc_id_a", "doc_id_b", F.lit(1).alias("_true")
    ).persist()
    n_ver = ver.count()
    t5 = time.perf_counter()
    out = (
        cand.join(ver, ["doc_id_a", "doc_id_b"], "left")
        .groupBy("config")
        .agg(F.count(F.lit(1)).alias("n_candidates"))
    )
    out.collect()
    t6 = time.perf_counter()
    print(
        f"shingles={n_sh} ({t1 - t0:.2f}s) sig={n_sig} ({t2 - t1:.2f}s) "
        f"cand={n_cand} ({t3 - t2:.2f}s) upairs={n_up} ({t4 - t3:.2f}s) "
        f"verify={n_ver} ({t5 - t4:.2f}s) final ({t6 - t5:.2f}s) "
        f"TOTAL {t6 - t0:.2f}s"
    )


if __name__ == "__main__":
    sys.exit(main())
