#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Execution is forced with the noop sink (full plan runs, nothing collected
to the driver), which is the closest local analog of a cluster job writing
to a sink.
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded
    from datalakeingestion_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(app_name="dli-bench")
    # repeated fn() builds re-persist structurally identical plans; the
    # resulting "already cached" WARNs are expected here and only noise in
    # the recorded bench log
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session (codegen, filesystem metadata) outside timings.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def run_block(qd) -> float:
        # Clear cache at BLOCK start only (timing independent of other
        # queries, but a query's own persisted intermediates stay warm
        # across its timed runs — same cache semantics as the rounds that
        # established the baseline numbers, so ratios stay comparable).
        # One untimed warmup (codegen compile, broadcast build, FS cache,
        # persist fill), then five timed runs; the block reports the
        # MEDIAN — round-2 showed min-of-2 can't tell a plan regression
        # from a neighbor's GC/compaction stall on this shared box.
        spark.catalog.clearCache()
        qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs: list[float] = []
        for _ in range(5):
            gc.collect()
            df = qd.fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return statistics.median(runs)

    # Contention bursts on this box last seconds and hit CONSECUTIVE
    # samples, so even a median-of-5 block can be swallowed whole by one
    # burst. Run every query's block FOUR times — each pass starts only
    # after the previous pass finishes, so a query's blocks are minutes
    # apart — and report the lowest median. A genuine plan regression
    # slows EVERY block; a burst almost never spans all four (observed:
    # a single burst still poisoned one query's both blocks under the
    # old two-pass form — q4 read 2.0 s in one full run, 0.50 s in the
    # next; r8 measured two full SOLO runs 30 min apart at 5.87 s vs
    # 7.19 s total — ±20% host-level swings the runner cannot control).
    bench_set = {n: qd for n, qd in sorted(REGISTRY.items()) if qd.bench}
    medians: dict[str, list[float]] = {n: [] for n in bench_set}
    floors: list[float] = []

    def floor_block() -> float:
        # per-job scheduling/launch overhead floor: a 1-row noop write
        # (32 empty tasks, no IO, no shuffle). Every query timing below
        # includes one of these by construction; reporting it makes
        # cross-round comparisons interpretable when the shared host
        # slows down (r8: the floor alone measured 0.29 s median — above
        # some r1-era FULL-query baselines, so per-query "creep" at that
        # magnitude is the box, not the plan).
        df = spark.range(1)
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(5):
            df = spark.range(1)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return statistics.median(runs)

    for _pass in range(4):
        floors.append(floor_block())
        for name, qd in bench_set.items():
            medians[name].append(run_block(qd))
    timings = {n: round(min(ms), 4) for n, ms in medians.items()}

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "overhead_floor_sec": round(min(floors), 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
