"""KMV set algebra (operators/sketches.py::kmv_set_relation)."""

from __future__ import annotations

import pytest


@pytest.mark.smoke
def test_kmv_set_relation_exact_under_k(spark):
    from pyspark.sql import functions as F

    from datalakeingestion_spark.operators.sketches import kmv_set_relation

    rows = [(i, i % 3 == 0, i % 2 == 0) for i in range(50)]
    df = spark.createDataFrame(rows, "v long, fa boolean, fb boolean")
    r = kmv_set_relation(
        df, "v", in_a=F.col("fa"), in_b=F.col("fb"), k=128
    ).collect()[0]
    in_union = [i for i in range(50) if i % 3 == 0 or i % 2 == 0]
    in_both = [i for i in range(50) if i % 3 == 0 and i % 2 == 0]
    assert r["est_union"] == r["exact_union"] == len(in_union)
    assert r["est_intersection"] == r["exact_intersection"] == len(in_both)


def test_kmv_set_relation_estimation_error_bounded(spark):
    from pyspark.sql import functions as F

    from datalakeingestion_spark.operators.sketches import kmv_set_relation

    n = 5000
    rows = [(i, i < 4000, i >= 2000) for i in range(n)]
    df = spark.createDataFrame(rows, "v long, fa boolean, fb boolean")
    r = kmv_set_relation(
        df, "v", in_a=F.col("fa"), in_b=F.col("fb"), k=256
    ).collect()[0]
    assert r["exact_union"] == 5000
    assert r["exact_intersection"] == 2000
    # std err ~ 1/sqrt(k-2) ~ 6%; allow 4 sigma
    assert abs(r["est_union"] - 5000) / 5000 < 0.25
    assert abs(r["est_intersection"] - 2000) / 2000 < 0.35


def test_kmv_set_relation_random_flags_exact_regime(spark):
    import random

    from pyspark.sql import functions as F

    from datalakeingestion_spark.operators.sketches import kmv_set_relation

    rng = random.Random(21)
    rows = [
        (i, rng.random() < 0.6, rng.random() < 0.4) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "v long, fa boolean, fb boolean")
    r = kmv_set_relation(
        df, "v", in_a=F.col("fa"), in_b=F.col("fb"), k=512
    ).collect()[0]
    union = {v for v, a, b in rows if a or b}
    both = {v for v, a, b in rows if a and b}
    # under k the sketch IS the set: everything exact
    assert r["est_union"] == r["exact_union"] == len(union)
    assert r["est_intersection"] == r["exact_intersection"] == len(both)
