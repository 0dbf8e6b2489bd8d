"""Per-stage wall/shuffle probe for one registered query.

Runs the query with the Spark UI enabled, executes the noop-sink write
(bench methodology: one untimed warmup that also fills the query's own
persists, then timed runs), and prints per-stage durations + shuffle
bytes from the REST API — the local stand-in for guide §7.1's stage page.

Usage: python tools/probe_stages.py <query> [runs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded
    from datalakeingestion_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(
        app_name=f"probe-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4077"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qd = REGISTRY[name]

    # warmup (fills persists, compiles codegen) — untimed, like bench.py
    spark.catalog.clearCache()
    qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    app_id = sc.applicationId
    base = f"http://localhost:4077/api/v1/applications/{app_id}"

    def stages_after(min_submit_ms: float) -> list[dict]:
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            data = json.load(r)
        out = []
        for s in data:
            sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
            if not sub:
                continue
            t = time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S"))
            if t * 1000 >= min_submit_ms - 1000:
                out.append(s)
        return out

    walls = []
    t_mark = time.time() * 1000
    for i in range(runs):
        sc.setJobDescription(f"{name} timed run {i}")
        df = qd.fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    sc.setJobDescription(None)

    print(f"{name}: walls={[round(w, 4) for w in walls]}")
    per_stage: dict[str, list] = {}
    for s in stages_after(t_mark):
        dur = s.get("executorRunTime", 0)
        key = f"stage {s['stageId']}: {s['name'].splitlines()[0][:70]}"
        per_stage[key] = [
            s.get("numCompleteTasks"),
            round(dur / 1000.0, 3),
            round(s.get("shuffleReadBytes", 0) / 1e6, 2),
            round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
            round(s.get("inputBytes", 0) / 1e6, 2),
        ]
    print("tasks | executorRunTime_s | shufRead_MB | shufWrite_MB | input_MB")
    for k in sorted(
        per_stage, key=lambda k: -per_stage[k][1]
    ):
        print(per_stage[k], k)
    return 0


if __name__ == "__main__":
    sys.exit(main())
