"""Stage-split wall probe for curation_pipeline_v3 (guide §1)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from datalakeingestion_spark.operators import dedup as dd
    from datalakeingestion_spark.operators.classifier import score
    from datalakeingestion_spark.plans.round9b import (
        _CLS_FEATURE_SQL,
        _CLS_FEATURES,
        _V3_GATE,
        _cls_trained_weights,
    )
    from datalakeingestion_spark.session import get_spark
    from datalakeingestion_spark.sources.fixtures import load_table

    spark = get_spark(app_name="dli-probe-v3")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    t0 = time.perf_counter()
    docs = load_table(spark, sf_dir, "documents")
    w = _cls_trained_weights(spark, sf_dir)
    t1 = time.perf_counter()
    feats = docs.selectExpr(
        "doc_id",
        "lang",
        "text",
        *[f"{sql} AS {name}" for name, sql in _CLS_FEATURE_SQL.items()],
    )
    gated = feats.filter(score(w, _CLS_FEATURES) >= F.lit(_V3_GATE)).select(
        "doc_id", "lang", "text"
    )
    n_gated = gated.count()
    t2 = time.perf_counter()
    # minhash stage split (mirror minhash_near_duplicates internals)
    sh = dd._shingle_table(gated, "text", "doc_id", 3).persist()
    n_sh = sh.count()
    t3 = time.perf_counter()
    sig = dd._signatures_from_shingles(sh).persist()
    n_sig = sig.count()
    t4 = time.perf_counter()
    pairs = dd.lsh_candidate_pairs(sig).persist()
    n_pairs = pairs.count()
    t5 = time.perf_counter()
    ver = dd._jaccard_verify(pairs, sh, 0.5, prefilter=True).persist()
    n_ver = ver.count()
    t6 = time.perf_counter()
    labels = dd.connected_components(ver)
    t7 = time.perf_counter()
    n_lab = labels.count()
    t8 = time.perf_counter()
    print(
        f"train={t1 - t0:.2f}s gated={n_gated} ({t2 - t1:.2f}s) "
        f"shingles={n_sh} ({t3 - t2:.2f}s) sig={n_sig} ({t4 - t3:.2f}s) "
        f"pairs={n_pairs} ({t5 - t4:.2f}s) verify={n_ver} ({t6 - t5:.2f}s) "
        f"cc_assembly={t7 - t6:.2f}s cc_count={n_lab} ({t8 - t7:.2f}s) "
        f"TOTAL {t8 - t0:.2f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
