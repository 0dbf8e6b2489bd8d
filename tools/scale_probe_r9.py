"""Round-9 scale probes (results recorded in SCALE.md).

Adversarial measurements for this round's claims:

1. **Stored gram index for substring dedup at the door**
   (operators/dedup.py::build_substring_index /
   substring_dup_vs_stored_index): a 1M-doc lake, 10k-doc batches.
   The inline form (substring_dup_vs_lake) re-tokenizes and re-shuffles
   the WHOLE lake's grams per batch — its per-batch cost scales with
   the lake; the stored probe pays a one-time build and per-batch cost
   O(batch). Measured at two lake sizes (500k and 1M docs) so the
   lake-coupling of each form is visible, not inferred.

2. **Bounded linkage hot block** (operators/linkage.py::
   blocked_similarity_pairs max_block): 100k records with one block
   holding 8k (C(8k,2) = 32M candidate Levenshtein pairs unbounded);
   bounded via salting to ~256-record groups (~1M pairs + chain).
   Measures wall time and emitted pairs for both; connectivity of the
   flood is pinned in tests/test_dedup.py — here we verify the pair
   COUNT collapse and that cold blocks are identical.

3. **BPE trainer iteration cost** (operators/packing.py::bpe_train):
   5 merges over 1M docs with a 1k-word Zipf-ish vocabulary — the
   corpus-sized word count runs ONCE; each merge iteration runs over
   the vocab-sized table (wall time per merge reported separately from
   the corpus reduction).

4. **DSIR corpus-linearity** (operators/dsir.py::dsir_logratio_weights):
   full weight computation at 500k and 1M docs (39 hashed features
   per doc) — cost must be two linear corpus passes around a 4096-row
   broadcast, so doubling the corpus should roughly double wall time.

Run on an otherwise idle box:  python tools/scale_probe_r9.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _docs(spark, n, words=20, vocab=None, id_offset=0):
    """n docs of ``words`` pseudo-random words; with ``vocab`` set, words
    draw from a w0..w{vocab-1} vocabulary (Zipf-ish via pmod) instead of
    being corpus-unique."""
    if vocab:
        word = lambda j: F.concat(  # noqa: E731
            F.lit("w"),
            F.pmod(F.xxhash64("id", F.lit(j)), F.lit(vocab)).cast("string"),
        )
    else:
        word = lambda j: F.conv(  # noqa: E731
            F.abs(F.xxhash64("id", F.lit(j))).cast("string"), 10, 36
        )
    return spark.range(id_offset, id_offset + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[word(j) for j in range(words)]).alias("text"),
    )


def probe_stored_gram_index(spark, lake_sizes=(500_000, 1_000_000),
                            batch_n=10_000):
    from datalakeingestion_spark.operators.dedup import (
        build_substring_index,
        substring_dup_vs_lake,
        substring_dup_vs_stored_index,
    )

    batch = _docs(spark, batch_n, id_offset=50_000_000).persist()
    batch.count()
    # WARMUP (untimed): first execution pays whole-stage-codegen JIT +
    # shuffle-service spin-up — the initial r9 run misread that as
    # "inline cost shrinks with a bigger lake" (6.0s at 500k measured
    # cold, 0.8s at 1M measured warm)
    warm = _docs(spark, 50_000)
    substring_dup_vs_lake(batch, warm, n=8).agg(F.count(F.lit(1))).first()
    spark.sql("DROP TABLE IF EXISTS r9gix_grams")
    build_substring_index(warm, "r9gix", n=8, n_buckets=32)
    substring_dup_vs_stored_index(batch, "r9gix", n=8).agg(
        F.count(F.lit(1))
    ).first()
    spark.sql("DROP TABLE IF EXISTS r9gix_grams")

    def timed(fn, runs=2):
        best, out = None, None
        for _ in range(runs):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, out

    for lake_n in lake_sizes:
        lake = _docs(spark, lake_n)
        t_inline, r = timed(
            lambda: substring_dup_vs_lake(batch, lake, n=8)
            .agg(F.count(F.lit(1)).alias("rows"))
            .first()
        )
        spark.sql("DROP TABLE IF EXISTS r9gix_grams")
        t0 = time.perf_counter()
        build_substring_index(lake, "r9gix", n=8, n_buckets=32)
        t_build = time.perf_counter() - t0
        t_stored, r2 = timed(
            lambda: substring_dup_vs_stored_index(batch, "r9gix", n=8)
            .agg(F.count(F.lit(1)).alias("rows"))
            .first()
        )
        print(
            f"  lake={lake_n:>9,}: inline/batch {t_inline:6.1f}s | "
            f"build(once) {t_build:6.1f}s probe/batch {t_stored:6.1f}s | "
            f"rows {r['rows']}=={r2['rows']}",
            flush=True,
        )
        spark.sql("DROP TABLE IF EXISTS r9gix_grams")
    batch.unpersist()


def probe_linkage_flood(spark, n=100_000, flood=8_000):
    from datalakeingestion_spark.operators.linkage import (
        blocked_similarity_pairs,
    )

    # 92k records spread over ~1,000 cold blocks + one 8k-record flood
    # block of near-identical names (every pair passes the edit gate)
    cold = spark.range(n - flood).select(
        F.col("id").alias("rid"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).cast("string").alias("blk"),
        F.conv(F.abs(F.xxhash64("id", F.lit(1))).cast("string"), 10, 36
               ).alias("name"),
    )
    hot = spark.range(10_000_000, 10_000_000 + flood).select(
        F.col("id").alias("rid"),
        F.lit("FLOOD").alias("blk"),
        F.concat(F.lit("acme corp "), (F.col("id") % 10).cast("string")
                 ).alias("name"),
    )
    df = cold.unionByName(hot).persist()
    df.count()
    # warmup: codegen for the join + levenshtein pipeline, untimed
    blocked_similarity_pairs(
        df.limit(2_000), "rid", ["blk"], "name", max_edit=2
    ).count()
    for label, kw in [
        ("unbounded", {}),
        ("max_block=512/salt=256", {"max_block": 512, "salt_target": 256}),
    ]:
        t0 = time.perf_counter()
        r = blocked_similarity_pairs(
            df, "rid", ["blk"], "name", max_edit=2, **kw
        ).agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum(F.when(F.col("blk") == "FLOOD", 1).otherwise(0)).alias(
                "flood_pairs"
            ),
        ).first()
        print(
            f"  {label:24s}: {time.perf_counter() - t0:6.1f}s "
            f"pairs={r['pairs']:,} flood_pairs={r['flood_pairs']:,}",
            flush=True,
        )
    df.unpersist()


def probe_bpe(spark, n=1_000_000, vocab=1_000, k=5):
    from datalakeingestion_spark.operators.packing import bpe_train

    docs = _docs(spark, n, words=20, vocab=vocab).persist()
    docs.count()
    t0 = time.perf_counter()
    merges = bpe_train(docs, k=k).collect()
    total = time.perf_counter() - t0
    print(
        f"  {n:,} docs, vocab~{vocab}, k={k}: {total:6.1f}s total "
        f"({total / k:4.1f}s/merge incl. one-time corpus reduction); "
        f"merges={[(m['lhs'], m['rhs']) for m in merges]}",
        flush=True,
    )
    docs.unpersist()


def probe_dsir(spark, sizes=(500_000, 1_000_000), vocab=1_000):
    """DSIR weights over a growing corpus (operators/dsir.py): cost must
    be two linear corpus passes (model build + scoring) with a
    4096-row broadcast in between — doubling the corpus should roughly
    double wall time, never worse."""
    from datalakeingestion_spark.operators.dsir import dsir_logratio_weights

    # warmup (untimed): codegen + shuffle spin-up
    warm = _docs(spark, 50_000, vocab=vocab)
    dsir_logratio_weights(
        warm, F.col("doc_id") % 3 == 0
    ).agg(F.count(F.lit(1))).first()
    for n in sizes:
        docs = _docs(spark, n, vocab=vocab)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            r = dsir_logratio_weights(
                docs, F.col("doc_id") % 3 == 0
            ).agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.when(F.col("weight") > 0, 1).otherwise(0)).alias(
                    "pos"
                ),
            ).first()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(
            f"  docs={n:>9,}: {best:5.1f}s  rows={r['rows']:,} "
            f"positive-weight={r['pos']:,}",
            flush=True,
        )


def main():
    from datalakeingestion_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-r9", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    print("probe 1: stored gram index vs inline (1M-doc lake)", flush=True)
    probe_stored_gram_index(spark)
    print("probe 2: linkage hot-block bound (100k recs, 8k flood)",
          flush=True)
    probe_linkage_flood(spark)
    print("probe 3: BPE trainer (1M docs, 1k vocab, 5 merges)", flush=True)
    probe_bpe(spark)
    print("probe 4: DSIR weights, corpus-linear check (500k vs 1M docs)",
          flush=True)
    probe_dsir(spark)


if __name__ == "__main__":
    main()
