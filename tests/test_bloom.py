from __future__ import annotations

import pytest


@pytest.mark.smoke
def test_bloom_no_false_negatives_and_fpr_bound(spark):
    """The Bloom guarantee: every inserted doc re-flags (no FN); fresh
    docs flag at most at a small multiple of the analytic FPR."""
    import math

    from datalakeingestion_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    n, m, k = 400, 4032, 5
    docs = spark.createDataFrame(
        [(i, f"document body number {i}") for i in range(n)],
        "doc_id long, text string",
    )
    fresh = spark.createDataFrame(
        [(10_000 + i, f"unseen body {i}") for i in range(300)],
        "doc_id long, text string",
    )
    bloom = bloom_build(docs, m, k)
    assert bloom.count() <= m // 63  # bounded footprint

    flags = {
        r["doc_id"]: r["maybe_dup"]
        for r in bloom_probe(docs, bloom, m, k).collect()
    }
    assert all(flags.values())  # no false negatives, ever

    fp = sum(
        r["maybe_dup"]
        for r in bloom_probe(fresh, bloom, m, k).collect()
    )
    expected = (1 - math.exp(-k * n / m)) ** k  # ~0.009 here
    assert fp / 300 <= 4 * expected + 0.01


def test_bloom_validates_geometry(spark):
    from datalakeingestion_spark.operators.bloom import bloom_build

    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with pytest.raises(ValueError, match="multiple of 63"):
        bloom_build(docs, 1000, 5)
    with pytest.raises(ValueError, match="k must be"):
        bloom_build(docs, 630, 0)


def test_bloom_null_text_keeps_no_false_negative_guarantee(spark):
    from datalakeingestion_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "real body")], "doc_id long, text string"
    )
    bloom = bloom_build(docs, 630, 3)
    flags = {
        r["doc_id"]: r["maybe_dup"]
        for r in bloom_probe(docs, bloom, 630, 3).collect()
    }
    # a NULL-text doc that WAS inserted must still flag on re-delivery
    assert flags == {1: True, 2: True}


def test_bloom_merge_equals_union_build(spark):
    from datalakeingestion_spark.operators.bloom import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    a = spark.createDataFrame(
        [(i, f"batch-a {i}") for i in range(50)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(i, f"batch-b {i}") for i in range(50)], "doc_id long, text string"
    )
    m, k = 1260, 4
    merged = bloom_merge(bloom_build(a, m, k), bloom_build(b, m, k))
    whole = bloom_build(a.unionByName(b), m, k)
    assert {
        (r["word"], r["bits"]) for r in merged.collect()
    } == {(r["word"], r["bits"]) for r in whole.collect()}
    # and the merged filter flags members of BOTH batches
    flags = {
        r["doc_id"]: r["maybe_dup"]
        for r in bloom_probe(b, merged, m, k).collect()
    }
    assert all(flags.values())


def test_bloom_door_query_null_text_parity(spark, tmp_path):
    """ADVICE r10: the bloom_dedup_at_door membership check must treat a
    NULL-text probe as a member of a NULL-text lake (COALESCE on both the
    Spark join key and the oracle's IN), mirroring the fingerprint's
    md5(coalesce(text, '')) no-false-negative discipline. Pin it with a
    NULL-text row in BOTH probe slices (doc_id%7==0 re-delivered,
    doc_id%7==3 perturbed) and full Spark-vs-DuckDB parity."""
    import duckdb

    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded

    from .conftest import assert_matches_oracle

    _ensure_loaded()
    rows = [(i, f"doc body {i}") for i in range(40)]
    rows[7] = (7, None)   # %7==0 slice: NULL text re-delivered verbatim
    rows[10] = (10, None)  # %7==3 slice: NULL || ' ##fresh' stays NULL
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(f"{sf}/documents.parquet")

    qd = REGISTRY["bloom_dedup_at_door"]
    got = {
        r["probe_id"]: (r["is_member"], r["maybe_dup"])
        for r in qd.fn(spark, sf).collect()
    }
    # the NULL-text re-delivery: member AND flagged (no false negative)
    assert got[7] == (True, True)
    # the NULL-perturbed probe degenerates to NULL -> fingerprint of ''
    # which IS in the lake (row 7), so both engines must say member+dup
    assert got[10] == (True, True)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    assert_matches_oracle(qd.fn(spark, sf), con, qd.oracle, "bloom_door_null")
