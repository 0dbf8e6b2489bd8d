"""Round-8 scale probes (results recorded in SCALE.md).

Adversarial measurements for this round's claims:

1. **Hot-band salvage cost & recall** (operators/dedup.py::
   lsh_candidate_pairs_salvaged): a 100k-doc corpus with a planted
   5,000-doc near-identical flood (one giant band bucket per matching
   band). Measures candidate pairs + wall time under (a) uncapped
   (quadratic in the flood), (b) drop cap (bounded, flood recall lost),
   (c) salvage (bounded ~linear, flood still ONE connected component).
   The cluster-recall claim is checked in-probe by union-find over the
   verified pairs.

2. **w3_sessionize creep fix**: the max(session_id)+1 form vs the old
   countDistinct form at 20M events — the r5→r7 bench-creep watch item.

3. **Substring-dedup family** (operators/dedup.py::substring_dup_stats /
   substring_dup_vs_lake): 100k docs with a planted shared phrase in
   every 10th doc — the corpus audit and the at-the-door screen, with
   exact expected counts (the SCALE.md numbers' reproduction).

Run on an otherwise idle box:  python tools/scale_probe_r8.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _corpus_with_flood(spark, n, flood, words=40):
    """n ordinary docs (distinct token bodies) + ``flood`` near-identical
    docs sharing a 40-token body with distinct one-token tails."""
    normal = spark.range(n).select(
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
    base = " ".join(f"w{i}" for i in range(words))
    flooded = spark.range(10_000_000, 10_000_000 + flood).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(base + " tail"), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    return normal.unionByName(flooded)


def _components(rows):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return parent, find


def probe_salvage(spark, n=100_000, flood=5_000):
    from datalakeingestion_spark.operators.dedup import (
        _jaccard_verify,
        _shingle_table,
        _signatures_from_shingles,
        lsh_candidate_pairs,
        lsh_candidate_pairs_salvaged,
    )

    docs = _corpus_with_flood(spark, n, flood)
    sh = _shingle_table(docs, "text", "doc_id", 3).persist()
    sig = _signatures_from_shingles(sh).persist()
    sig.count()

    out = {}
    for name, pairs_fn in [
        ("uncapped", lambda: lsh_candidate_pairs(sig)),
        ("drop_cap64", lambda: lsh_candidate_pairs(sig, max_bucket=64)),
        (
            "salvage64",
            lambda: lsh_candidate_pairs_salvaged(sig, max_bucket=64),
        ),
    ]:
        t0 = time.perf_counter()
        cand = pairs_fn().persist()
        n_cand = cand.count()
        t_cand = time.perf_counter() - t0
        t0 = time.perf_counter()
        verified = _jaccard_verify(cand, sh, 0.5)
        flood_pairs = [
            (r["doc_id_a"], r["doc_id_b"])
            for r in verified.filter(
                (F.col("doc_id_a") >= 10_000_000)
                | (F.col("doc_id_b") >= 10_000_000)
            ).collect()
        ]
        t_ver = time.perf_counter() - t0
        parent, find = _components(flood_pairs)
        seen = {d for p in flood_pairs for d in p}
        comps = len({find(d) for d in seen}) if seen else 0
        covered = len(seen)
        out[name] = (n_cand, t_cand, t_ver, covered, comps)
        print(
            f"  {name:10s}: candidates={n_cand:>10,} "
            f"cand {t_cand:6.1f}s verify {t_ver:6.1f}s | flood docs "
            f"covered {covered:>5}/{flood} in {comps} component(s)",
            flush=True,
        )
        cand.unpersist()
    sh.unpersist()
    sig.unpersist()
    return out


def probe_substring(spark, n=100_000, words=40):
    """Substring-dedup family at 100k docs: every 10th doc carries a
    planted 12-token shared phrase (5 duplicated 8-gram positions each).
    Expected: audit finds exactly n/10 docs with dup, 5 spans each;
    vs-lake (10% batch) finds the batch's planted docs."""
    from datalakeingestion_spark.operators.dedup import (
        substring_dup_stats,
        substring_dup_vs_lake,
    )

    base = spark.range(n).select(
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
    phrase = " ".join(f"ph{i}" for i in range(12))
    docs = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.lit(phrase + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    t0 = time.perf_counter()
    r = substring_dup_stats(docs, n=8).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("dup_spans").alias("spans"),
        F.sum(F.when(F.col("dup_fraction") > 0, 1).otherwise(0)).alias("hit"),
    ).first()
    print(
        f"  audit {n} docs: {time.perf_counter() - t0:6.1f}s "
        f"rows={r['rows']} dup_spans={r['spans']} docs_with_dup={r['hit']}",
        flush=True,
    )
    split = n - n // 10
    t0 = time.perf_counter()
    r2 = substring_dup_vs_lake(
        docs.filter(F.col("doc_id") >= split),
        docs.filter(F.col("doc_id") < split),
        n=8,
    ).agg(
        F.count(F.lit(1)).alias("rows"), F.sum("dup_spans").alias("spans")
    ).first()
    print(
        f"  vs-lake {n // 10} batch vs {split} lake: "
        f"{time.perf_counter() - t0:6.1f}s rows={r2['rows']} "
        f"dup_spans={r2['spans']}",
        flush=True,
    )


def probe_sessionize(spark, n=20_000_000, users=200_000):
    from pyspark.sql import Window

    ev = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(users)).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(86400 * 60))
        ).alias("ts"),
    ).persist()
    ev.count()
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_session = F.when(us - F.lag(us).over(w) > 1_800_000_000, 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn("new_session", new_session).withColumn(
        "session_id", F.sum("new_session").over(run)
    )
    for name, agg in [
        (
            "countDistinct (old)",
            [F.countDistinct("session_id").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events")],
        ),
        (
            "max+1 (shipped)",
            [(F.max("session_id") + 1).cast("long").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events")],
        ),
    ]:
        df = sess.groupBy("user_id").agg(*agg)
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"  {name:22s}: {time.perf_counter() - t0:6.2f}s", flush=True)
    ev.unpersist()


def main():
    from datalakeingestion_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-r8", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    print("probe 1: hot-band salvage (100k docs + 5k flood)", flush=True)
    probe_salvage(spark)
    print("probe 2: sessionize aggregate forms (20M events)", flush=True)
    probe_sessionize(spark)
    print("probe 3: substring-dedup family (100k docs)", flush=True)
    probe_substring(spark)


if __name__ == "__main__":
    main()
