"""Round-6 scale probes (results recorded in SCALE.md).

Two claims this round's code makes get adversarial measurements:

1. **keyed_prefix_sum vs the keyed window** (operators/packing.py):
   a running sum over 20M rows split across just THREE keys — the shape
   where ``SUM() OVER (PARTITION BY key ORDER BY ...)`` degenerates to
   three single-task sorts of ~6.7M rows each, while the two-pass range
   shuffle keeps all 32 cores busy. This is the scale argument for
   ks_drift_time_sliced's reference CDF (one event_type = one window
   partition = one task).

2. **connected-components depth worst case** (operators/dedup.py):
   a pure PATH graph (diameter = node count — the adversarial chain for
   any label-propagation scheme) at 100k and 1M nodes, on both the
   pointer-jumping propagation and large-star/small-star. Validates the
   O(log d) round count claim with measured rounds + wall time, and
   that the non-convergence guard actually fires instead of silently
   returning a half-labeled graph.

Run on an otherwise idle box:  python tools/scale_probe_r6.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def probe_prefix_sum(spark) -> None:
    from pyspark.sql import Window

    from datalakeingestion_spark.operators.packing import keyed_prefix_sum

    n = 20_000_000
    for n_keys in (3, 1):
        df = (
            spark.range(n)
            .select(
                (F.col("id") % n_keys).alias("k"),
                F.col("id").alias("ord"),
                (F.col("id") % 10).alias("w"),
            )
            .persist()
        )
        df.count()  # materialize input outside timings

        t0 = time.time()
        got = keyed_prefix_sum(df, ["k"], ["ord"], "w", out_col="cum")
        total_kps = got.agg(F.sum("cum")).first()[0]
        t_cold = time.time() - t0
        t0 = time.time()
        got.agg(F.sum("cum")).first()  # warm: bucketed frame cached
        t_warm = time.time() - t0

        w = Window.partitionBy("k").orderBy("ord").rowsBetween(
            Window.unboundedPreceding, 0
        )
        t0 = time.time()
        total_win = (
            df.withColumn("cum", F.sum("w").over(w))
            .agg(F.sum("cum"))
            .first()[0]
        )
        t_win = time.time() - t0

        assert total_kps == total_win, (total_kps, total_win)
        print(
            f"prefix_sum n={n} keys={n_keys}: keyed_prefix_sum "
            f"{t_cold:.1f}s cold / {t_warm:.1f}s warm  "
            f"window {t_win:.1f}s  (checksum equal: {total_kps})"
        )
        df.unpersist()
        # keyed_prefix_sum leaves its bucketed frame session-persisted
        # (documented policy); clear between configs so each one is
        # measured against a cold cache, not the previous run's churn
        spark.catalog.clearCache()


def probe_cc_path_graph(spark) -> None:
    from datalakeingestion_spark.operators import dedup as dd

    for n in (100_000, 1_000_000):
        pairs = (
            spark.range(n - 1)
            .select(
                F.col("id").alias("doc_id_a"),
                (F.col("id") + 1).alias("doc_id_b"),
            )
            .persist()
        )
        pairs.count()

        for name, fn, iters in (
            ("pointer-jump", dd.connected_components, 40),
            ("large/small-star", dd.connected_components_star, 40),
        ):
            t0 = time.time()
            labels = fn(pairs, max_iterations=iters)
            n_clusters = labels.select("cluster_id").distinct().count()
            n_nodes = labels.count()
            dt = time.time() - t0
            assert (n_clusters, n_nodes) == (1, n), (n_clusters, n_nodes)
            print(
                f"cc path n={n}: {name} {dt:.1f}s "
                f"(1 component, {n_nodes} nodes)"
            )

        # the guard must FIRE on a too-low round budget, not return a
        # half-labeled graph (path diameter >> 2 rounds)
        try:
            dd.connected_components(pairs, max_iterations=2)
            print(f"cc path n={n}: guard FAILED to fire at 2 rounds")
        except RuntimeError:
            print(f"cc path n={n}: non-convergence guard fired at 2 rounds")
        pairs.unpersist()


def probe_ks_sliced(spark) -> None:
    """End-to-end ks_drift_time_sliced shape at 20M events / 26 weeks /
    4 types: histogram -> two keyed prefix sums -> equi-join -> matrix."""
    from datalakeingestion_spark.operators.packing import keyed_prefix_sum

    n = 20_000_000
    ev = (
        spark.range(n)
        .select(
            F.concat(F.lit("t"), (F.col("id") % 4).cast("string")).alias(
                "event_type"
            ),
            (F.col("id") % 26).alias("wk"),
            # ~40% ties via a coarse lattice, the rest ~continuous
            F.when(
                F.col("id") % 5 < 2, (F.col("id") % 97).cast("double")
            )
            .otherwise(
                (F.xxhash64("id") % 1_000_000_007).cast("double") / 1e6
            )
            .alias("v"),
        )
        .persist()
    )
    ev.count()

    t0 = time.time()
    sh = ev.groupBy("event_type", "wk", "v").agg(
        F.count(F.lit(1)).alias("c")
    ).persist()
    rh = sh.groupBy("event_type", "v").agg(F.sum("c").alias("rc"))
    rcum = keyed_prefix_sum(rh, ["event_type"], ["v"], "rc", out_col="rcum")
    scum = keyed_prefix_sum(
        sh, ["event_type", "wk"], ["v"], "c", out_col="scum"
    )
    nr = rh.groupBy("event_type").agg(F.sum("rc").cast("double").alias("n_r"))
    ns = sh.groupBy("event_type", "wk").agg(
        F.sum("c").cast("double").alias("n_s")
    )
    d = F.greatest(
        F.abs(F.col("scum") / F.col("n_s") - F.col("rcum") / F.col("n_r")),
        F.abs(
            (F.col("scum") - F.col("c")) / F.col("n_s")
            - (F.col("rcum") - F.col("rc")) / F.col("n_r")
        ),
    )
    out = (
        scum.join(rcum.select("event_type", "v", "rc", "rcum"),
                  ["event_type", "v"])
        .join(F.broadcast(ns), ["event_type", "wk"])
        .join(F.broadcast(nr), ["event_type"])
        .groupBy("event_type", "wk")
        .agg(F.max(d).alias("ks"))
        .collect()
    )
    dt = time.time() - t0
    print(
        f"ks_sliced n={n} types=4 weeks=26: end-to-end {dt:.1f}s "
        f"({len(out)} matrix cells)"
    )
    ev.unpersist()
    sh.unpersist()
    spark.catalog.clearCache()


def probe_incremental_dedup(spark) -> None:
    """dedup_against_index cost vs LAKE size at fixed batch size — the
    dedup-at-the-door claim: probing a prebuilt band index is O(batch),
    so doubling the lake must not double per-batch latency. Index build
    (one-time, O(lake)) is timed separately from the per-batch probe."""
    from datalakeingestion_spark.operators import dedup as dd

    def mk_docs(n, start, dup_src=None):
        base = (
            spark.range(start, start + n)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit("document body "),
                    F.conv(F.abs(F.xxhash64("id")).cast("string"), 10, 36),
                    F.lit(" tail "),
                    F.conv(
                        F.abs(F.xxhash64("id", F.lit(7))).cast("string"),
                        10, 36,
                    ),
                )
                .alias("text"),
            )
        )
        if dup_src is None:
            return base
        # 20% of the batch near-duplicates a lake doc (same body + a
        # short suffix), the rest is fresh
        return base.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit("document body "),
                    F.conv(
                        F.abs(
                            F.xxhash64((F.col("doc_id") % dup_src))
                        ).cast("string"),
                        10, 36,
                    ),
                    F.lit(" tail "),
                    F.conv(
                        F.abs(
                            F.xxhash64(
                                (F.col("doc_id") % dup_src), F.lit(7)
                            )
                        ).cast("string"),
                        10, 36,
                    ),
                    F.lit(" x"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )

    batch_n = 5_000
    # first iteration is a discarded warmup: codegen/JIT dominates
    # small-lake index builds otherwise
    for lake_n in (20_000, 100_000, 400_000):
        lake = mk_docs(lake_n, 0).persist()
        lake.count()
        t0 = time.time()
        sh_old = dd._shingle_table(lake, "text", "doc_id", 3).persist()
        bands_old = dd._lsh_bands(
            dd._signatures_from_shingles(sh_old)
        ).persist()
        n_band_rows = bands_old.count()
        sh_old.count()
        t_index = time.time() - t0

        batch = mk_docs(batch_n, 10_000_000, dup_src=lake_n).persist()
        batch.count()
        t0 = time.time()
        sh_new = dd._shingle_table(batch, "text", "doc_id", 3).persist()
        bands_new = dd._lsh_bands(dd._signatures_from_shingles(sh_new))
        cand = (
            bands_new.alias("a")
            .join(
                bands_old.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_sig") == F.col("b.band_sig")),
            )
            .select(
                F.col("a.doc_id").alias("doc_id_a"),
                F.col("b.doc_id").alias("doc_id_b"),
            )
            .distinct()
        )
        matches = dd._jaccard_verify(
            cand, sh_new.unionByName(sh_old), 0.5
        ).count()
        t_probe = time.time() - t0
        if lake_n > 20_000:
            print(
                f"incr_dedup lake={lake_n} batch={batch_n}: index build "
                f"{t_index:.1f}s ({n_band_rows} band rows), batch probe "
                f"{t_probe:.1f}s, {matches} verified matches"
            )
        spark.catalog.clearCache()


def probe_video_decode(spark) -> None:
    """Real AVI decode throughput (mirror of round-5's image probe):
    synthetic 64x64 8-frame uncompressed AVIs through video_stats
    (Arrow-batched mapInPandas, RIFF walk + frombuffer reshapes)."""
    import numpy as np

    from datalakeingestion_spark.operators.multimodal import (
        encode_avi_rgb24,
        video_stats,
    )

    rng = np.random.default_rng(9)
    n_vids, w, h, nf = 500, 256, 256, 8
    blob = encode_avi_rgb24(
        [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
         for _ in range(nf)]
    )
    gb = n_vids * len(blob) / 1e9
    df = (
        spark.range(n_vids)
        .select(
            F.col("id").alias("media_id"),
            F.lit(bytearray(blob)).alias("content"),
        )
        .persist()
    )
    df.count()
    t0 = time.time()
    out = video_stats(df)
    n_ok = out.filter(F.col("decode_error").isNull()).count()
    dt = time.time() - t0
    assert n_ok == n_vids
    print(
        f"video_decode n={n_vids} ({w}x{h}x{nf}f, {gb:.2f} GB): "
        f"{dt:.1f}s = {gb / dt:.2f} GB/s on local[32]"
    )
    df.unpersist()
    spark.catalog.clearCache()


def main() -> None:
    from datalakeingestion_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-r6")
    spark.sparkContext.setLogLevel("ERROR")
    probe_prefix_sum(spark)
    probe_ks_sliced(spark)
    probe_incremental_dedup(spark)
    probe_video_decode(spark)
    probe_cc_path_graph(spark)


if __name__ == "__main__":
    main()
