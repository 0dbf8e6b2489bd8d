"""Round-12 scale probes (results recorded in SCALE.md).

The shard-delivery family's O(manifest) driver claims and the two-level
prefix sum were proven at fixture scale in r11; this probe measures them
at a 10M-doc corpus, with shuffle-byte and task-skew evidence from the
Spark REST API (same harness as tools/scale_probe_r11.py):

1. **Full delivery at 10M docs** (operators/shards.py::
   write_training_shards): pack 10M synthetic docs (~145M tokens) into
   512-token sequences and ~1M-token shards, deliver data + manifest.
   Claims: both prefix sums are bounded shuffles (never a
   single-partition window); the manifest diff collects shard-count
   rows, not corpus rows.
2. **Replay**: identical input re-delivered — the digest diff must
   rewrite NOTHING; wall cost is the manifest recompute (O(corpus)
   compute, zero data write — the write was the build's dominant cost).
3. **Tail growth**: +100k docs appended past the stable prefix — only
   tail shards may rewrite (written count << shard count).
4. **Quota-enforced delivery** (write_training_shards_with_quota):
   20-source corpus, 10 sources quota'd — the md5-ordered per-source
   running-sum selection is ONE hash shuffle at corpus scale.
5. **split_hot_cells at a 10M-vector index**: the detect→repair cost —
   2-means inside one hot cell + one directory rewrite — against the
   r11-measured 128.6 s full rebuild at the same scale.

Run on an otherwise idle box:  python tools/scale_probe_r12.py
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

WORK = "/tmp/scale_probe_r12"
N_DOCS = 10_000_000
N_GROW = 100_000
N_VECS = 10_000_000
SEQ_BUDGET = 512
SHARD_BUDGET = 1_000_000  # ~1M tokens/shard -> ~145 shards at 10M docs


def _spark():
    from datalakeingestion_spark.session import get_spark

    return get_spark(
        app_name="scale-probe-r12",
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


_TEXT = (
    "concat_ws(' ', transform(sequence(0, 4 + cast(pmod(hash(id), 20) "
    "AS INT)), i -> concat('w', pmod(hash(id * 13 + i), 5000))))"
)


def _corpus(spark, n, first_id=0):
    """n synthetic docs (doc_id, n_tokens, source, text): 5-24 tokens
    each, 20 sources, pure codegen — no Python in the generator."""
    return spark.range(first_id, first_id + n).select(
        F.col("id").alias("doc_id"),
        (F.lit(5) + F.pmod(F.hash("id"), F.lit(20))).cast("long").alias(
            "n_tokens"
        ),
        F.concat(F.lit("src"), F.pmod(F.col("id"), F.lit(20)).cast("string"))
        .alias("source"),
        F.expr(_TEXT).alias("text"),
    )


def probe_delivery(spark):
    from datalakeingestion_spark.operators.shards import (
        pack_assign_with_payload,
        write_training_shards,
    )

    path = f"{WORK}/delivery"

    def deliver(n_docs):
        sharded = pack_assign_with_payload(
            _corpus(spark, n_docs), SEQ_BUDGET, SHARD_BUDGET
        )
        return write_training_shards(sharded, path)

    t_build, st_build = _stage_window(
        spark, lambda: print("  report:", {
            k: len(v) for k, v in deliver(N_DOCS).items()})
    )
    print("delivery build 10M docs:", round(t_build, 1), "s",
          _summarize(st_build))
    print("  build skew:", _task_skew(spark, st_build))

    t_replay, st_replay = _stage_window(
        spark, lambda: print("  report:", {
            k: len(v) for k, v in deliver(N_DOCS).items()})
    )
    print("delivery replay (must write nothing):", round(t_replay, 1), "s",
          _summarize(st_replay))

    t_grow, st_grow = _stage_window(
        spark, lambda: print("  report:", {
            k: len(v) for k, v in deliver(N_DOCS + N_GROW).items()})
    )
    print(f"delivery grow +{N_GROW} docs:", round(t_grow, 1), "s",
          _summarize(st_grow))


def probe_quota(spark):
    from datalakeingestion_spark.operators.shards import (
        write_training_shards_with_quota,
    )

    quotas = {f"src{i}": 2_000_000 for i in range(10)}  # 10 of 20 sources
    path = f"{WORK}/quota_delivery"
    t, st = _stage_window(
        spark,
        lambda: print("  selected:", {
            s: v["n_tokens"]
            for s, v in sorted(write_training_shards_with_quota(
                _corpus(spark, N_DOCS), quotas, path,
                seq_token_budget=SEQ_BUDGET,
                shard_token_budget=SHARD_BUDGET,
            )["selected"].items())}),
    )
    print("quota delivery 10M docs -> 10x2M-token quotas:", round(t, 1),
          "s", _summarize(st))
    print("  quota skew:", _task_skew(spark, st))


def probe_split(spark):
    from datalakeingestion_spark.operators.ivf import (
        append_ivf_index,
        build_ivf_index,
        split_hot_cells,
    )

    vec = (
        "transform(sequence(0, 63), "
        "i -> cast(pmod(hash(id * (i + 7)), 1000) / 500.0 - 1.0 AS float))"
    )
    emb = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"), F.expr(vec).alias("embedding")
    )
    path = f"{WORK}/ivf"
    t_build, _ = _stage_window(
        spark,
        lambda: build_ivf_index(emb, path, n_centroids=64, iters=0,
                                assign_n=1),
    )
    print("ivf build 10M vecs (the repair's alternative):",
          round(t_build, 1), "s")
    cells = spark.read.option("basePath", f"{path}/cells").parquet(
        f"{path}/cells"
    )
    sizes = {
        r["cell"]: r["n"]
        for r in cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    hot = max(sizes, key=lambda c: (sizes[c], -c))
    append_ivf_index(
        cells.filter(F.col("cell") == hot).select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("c_vec").alias("embedding"),
        ),
        path,
    )
    t_split, st_split = _stage_window(
        spark,
        lambda: print("  report:", {
            k: v for k, v in split_hot_cells(
                spark, path, max_skew=1.5, max_splits=1
            ).items() if k in ("split", "skipped", "recovered")}),
    )
    print(f"split_hot_cells (1 cell of 64, ~{sizes[hot] * 2} rows):",
          round(t_split, 1), "s", _summarize(st_split))


def main():
    # NO os.chdir here: the repo root must stay the working directory or
    # Python workers lose the datalakeingestion_spark import; every
    # probe path below is absolute under WORK
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    spark = _spark()
    try:
        probe_delivery(spark)
        probe_quota(spark)
        probe_split(spark)
    finally:
        spark.stop()
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
