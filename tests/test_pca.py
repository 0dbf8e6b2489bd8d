from __future__ import annotations

import numpy as np
import pytest

from datalakeingestion_spark.operators.pca import fit_pca, pca_contract, pca_project
from datalakeingestion_spark.sources.fixtures import load_table

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings").cache()


@pytest.mark.smoke
def test_pca_recovers_planted_dominant_direction(spark):
    """A corpus with one dominant variance direction: the first component
    must align with it and capture most of the variance."""
    rng = np.random.default_rng(7)
    axis = np.zeros(16)
    axis[3] = 1.0
    X = rng.normal(0, 0.05, (400, 16)) + np.outer(rng.normal(0, 3.0, 400), axis)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    mu, comps, ratio = fit_pca(df, k=2)
    assert abs(comps[0, 3]) > 0.99
    assert comps[0, 3] > 0  # sign fixed: largest-|coord| positive
    assert ratio > 0.9


def test_pca_projection_matches_local_numpy(spark, emb):
    """Distributed moments == local numpy moments: projections agree to
    the 6-dp rounding the operator applies."""
    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    X = np.vstack(pdf.embedding.to_numpy()).astype(np.float64)
    mu, comps, _ = fit_pca(emb, k=4)
    want = np.round((X - X.mean(axis=0)) @ comps.T, 5)
    got = (
        pca_project(emb, k=4).select("vec_id", "pca").toPandas()
        .sort_values("vec_id")
    )
    G = np.vstack(got.pca.to_numpy())
    assert np.allclose(G, want, atol=1e-4)


def test_pca_contract_bounds_do_work(spark, emb):
    row = pca_contract(emb, k=8, min_var_ratio=0.15).first()
    assert row.n_vectors == 500 and row.dim == 64 and row.k == 8
    assert row.var_ratio_ok and row.orthonormal_ok
    strict = pca_contract(emb, k=8, min_var_ratio=0.99).first()
    assert not strict.var_ratio_ok


def test_pca_rerank_recall_pinned(spark, emb):
    """Two-stage PCA+rerank recall@10 vs brute force — measured >= 0.8
    per query; the registered bound is 0.7."""
    import pyspark.sql.functions as F

    from datalakeingestion_spark.operators.pca import pca_rerank_topk
    from datalakeingestion_spark.operators.similarity import cosine_topk

    queries = emb.filter(F.col("vec_id") < 5)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pca_rerank_topk(emb, queries, k=10, kdim=32, candidates=50).collect()
    }
    per_q = {}
    for q, n in truth:
        hit, tot = per_q.get(q, (0, 0))
        per_q[q] = (hit + ((q, n) in approx), tot + 1)
    assert min(h / t for h, t in per_q.values()) >= 0.7
