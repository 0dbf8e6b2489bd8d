"""Round-11 scale probes (results recorded in SCALE.md).

An order of magnitude past the r9b/r10 probes on the two flagship
stored-index families, with shuffle-byte and task-skew evidence pulled
from the Spark REST API (UI enabled for this probe only):

1. **Stored dedup index at a 10M-doc lake** (operators/dedup.py::
   build_dedup_index / dedup_against_stored_index): build the bucketed
   band+shingle index once over 10M synthetic docs, then probe a 10k
   batch. The per-batch claim under test: probe shuffle volume is
   O(batch), NOT O(lake) — the lake-side tables join on their bucket
   keys without an Exchange, so the probe's shuffle bytes must be
   orders of magnitude below the build's.

2. **Stored IVF index at 10M vectors** (operators/ivf.py::
   build_ivf_index / ivf_topk_stored): persist 10M 64-dim vectors as
   cell-partitioned inverted lists (64 cells, hash-seeded quantizer —
   Lloyd iterations add linear scans and are probed separately by
   ivf_trained_recall_delta), then run a 5-query nprobe=4 probe. The
   claims under test: the probe reads ~nprobe/k of the index files
   (partition pruning) and finishes orders of magnitude faster than
   the inline ivf_topk, which must re-assign the whole corpus per call.

Run on an otherwise idle box:  python tools/scale_probe_r11.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

WORK = "/tmp/scale_probe_r11"
N_DOCS = 10_000_000
N_VECS = 10_000_000
DIM = 64


def _spark():
    from datalakeingestion_spark.session import get_spark

    return get_spark(
        app_name="scale-probe-r11",
        cpus=32,
        extra_conf={
            "spark.ui.enabled": "true",  # REST metrics for this probe
            "spark.sql.warehouse.dir": f"{WORK}/warehouse",
        },
    )


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def _stage_window(spark, fn):
    """Run fn(); return (seconds, completed-stage records created by it)."""
    before = {s["stageId"] for s in _rest(spark, "/stages")}
    t0 = time.time()
    fn()
    dt = time.time() - t0
    stages = [
        s
        for s in _rest(spark, "/stages?status=complete")
        if s["stageId"] not in before
    ]
    return dt, stages


def _summarize(stages):
    sr = sum(s.get("shuffleReadBytes", 0) for s in stages)
    sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    heavy = max(stages, key=lambda s: s.get("executorRunTime", 0), default=None)
    return {"n_stages": len(stages), "shuffle_read_mb": round(sr / 1e6, 1),
            "shuffle_write_mb": round(sw / 1e6, 1),
            "heaviest_stage": heavy and heavy["name"].split("\n")[0]}


def _task_skew(spark, stages):
    """max/median executorRunTime over the heaviest shuffle stage."""
    cands = [s for s in stages if s.get("shuffleReadBytes", 0) > 0]
    if not cands:
        return None
    heavy = max(cands, key=lambda s: s["shuffleReadBytes"])
    q = _rest(
        spark,
        f"/stages/{heavy['stageId']}/{heavy['attemptId']}/taskSummary"
        "?quantiles=0.5,1.0",
    )
    med, mx = q["executorRunTime"]
    return {"stage": heavy["name"].split("\n")[0][:60],
            "runtime_median_ms": med, "runtime_max_ms": mx,
            "skew_ratio": round(mx / max(med, 1.0), 2)}


def probe_stored_dedup(spark):
    from datalakeingestion_spark.operators.dedup import (
        append_dedup_index,
        build_dedup_index,
        dedup_against_stored_index,
    )

    # 10M synthetic 12-token docs over a 5000-word vocab: every doc
    # shares shingles with ~hash-random others, so the band index is
    # realistically loaded. Pure codegen generator (no Python).
    text = (
        "concat_ws(' ', transform(sequence(0, 11), "
        "i -> concat('w', pmod(hash(id * 13 + i), 5000))))"
    )
    lake = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"), F.expr(text).alias("text")
    )
    t_build, st_build = _stage_window(
        spark, lambda: build_dedup_index(lake, "sp11", n_buckets=32)
    )
    print("dedup build 10M docs:", round(t_build, 1), "s",
          _summarize(st_build))

    # 10k probe batch: half re-delivered lake docs (ids shifted so the
    # disjoint-id contract holds), half fresh
    batch = spark.range(N_DOCS, N_DOCS + 10_000).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "CASE WHEN id % 2 = 0 THEN "
            "concat_ws(' ', transform(sequence(0, 11), "
            f"i -> concat('w', pmod(hash((id - {N_DOCS}) * 13 + i), 5000)))) "
            "ELSE concat_ws(' ', transform(sequence(0, 11), "
            "i -> concat('f', pmod(hash(id * 29 + i), 5000)))) END"
        ).alias("text"),
    )
    def probe():
        n = dedup_against_stored_index(batch, "sp11", 0.3).count()
        print("  probe matches:", n)

    probe()  # warm
    t_probe, st_probe = _stage_window(spark, probe)
    print("dedup probe 10k batch:", round(t_probe, 1), "s",
          _summarize(st_probe))
    print("  probe skew:", _task_skew(spark, st_probe))

    t_app, st_app = _stage_window(
        spark, lambda: append_dedup_index(batch, "sp11", n_buckets=32)
    )
    print("dedup append 10k batch:", round(t_app, 1), "s",
          _summarize(st_app))


def probe_stored_ivf(spark):
    from datalakeingestion_spark.operators import similarity as sim
    from datalakeingestion_spark.operators.ivf import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_stored,
    )

    vec = (
        "transform(sequence(0, 63), "
        "i -> cast(pmod(hash(id * (i + 7)), 1000) / 500.0 - 1.0 AS float))"
    )
    emb = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"), F.expr(vec).alias("embedding")
    )
    path = f"{WORK}/ivf"
    t_build, st_build = _stage_window(
        spark,
        lambda: build_ivf_index(
            emb, path, n_centroids=64, iters=0, assign_n=1
        ),
    )
    print("ivf build 10M vecs:", round(t_build, 1), "s", _summarize(st_build))

    # materialize the 5-row query set so probe timings measure PROBE
    # work, not regeneration of the synthetic corpus under the filter
    queries = spark.createDataFrame(
        emb.filter(F.col("vec_id") < 5).collect(), schema=emb.schema
    ).cache()
    queries.count()

    def stored():
        ivf_topk_stored(spark, queries, path, k=10, nprobe=4).count()

    stored()  # warm
    t_stored, st_stored = _stage_window(spark, stored)
    # file-pruning evidence: compare files under the probed cells dirs
    cells = spark.read.parquet(f"{path}/cells")
    n_all = len(cells.inputFiles())
    print("ivf stored probe (5q, nprobe 4/64):", round(t_stored, 1), "s",
          _summarize(st_stored), f"index files total={n_all}")
    print("  probe skew:", _task_skew(spark, st_stored))

    t_inline, _ = _stage_window(
        spark,
        lambda: ivf_topk(
            emb, queries, k=10, n_centroids=64, nprobe=4, iters=0,
            assign_n=1,
        ).count(),
    )
    print("ivf inline (re-assigns corpus):", round(t_inline, 1), "s",
          f"stored speedup x{round(t_inline / max(t_stored, 0.01), 1)}")

    t_bf, _ = _stage_window(
        spark, lambda: sim.cosine_topk(emb, queries, k=10).count()
    )
    print("brute-force cosine_topk:", round(t_bf, 1), "s")


def main():
    os.makedirs(WORK, exist_ok=True)
    print("loadavg:", os.getloadavg())
    spark = _spark()
    try:
        probe_stored_ivf(spark)
        probe_stored_dedup(spark)
    finally:
        for t in ("sp11_bands", "sp11_shingles"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(WORK, ignore_errors=True)
    print("loadavg end:", os.getloadavg())


if __name__ == "__main__":
    main()
