"""Data-contract evaluator (operators/expectations.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.operators.expectations import (
    evaluate_expectations,
)


@pytest.mark.smoke
def test_null_hostile_predicates_and_uniqueness(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "O"),
            (2, -5.0, "F"),      # range violation
            (3, None, "O"),      # NULL price must count as a violation
            (3, 7.0, "X"),       # domain violation + duplicate key
        ],
        "k long, price double, status string",
    )
    out = {
        r["expectation"]: (r["n_violations"], r["n_rows"])
        for r in evaluate_expectations(
            df,
            row_checks=[
                ("price_positive", F.col("price") > 0),
                ("status_in_domain", F.col("status").isin("O", "F")),
            ],
            unique_keys=[("k_unique", ["k"])],
        ).collect()
    }
    assert out["price_positive"] == (2, 4)   # -5 AND the null
    assert out["status_in_domain"] == (1, 4)
    assert out["k_unique"] == (1, 4)


def test_empty_contract_raises(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="empty"):
        evaluate_expectations(df, row_checks=[])


def test_clean_table_passes_everything(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k long, price double"
    )
    rows = evaluate_expectations(
        df,
        row_checks=[("price_positive", F.col("price") > 0)],
        unique_keys=[("k_unique", ["k"])],
    ).collect()
    assert all(r["n_violations"] == 0 for r in rows)
    assert all(r["n_rows"] == 2 for r in rows)


def test_null_key_rows_violate_uniqueness(spark):
    """PK semantics: a null-keyed row violates uniqueness even with no
    duplicates (count_distinct drops null tuples, so n − d counts it)."""
    df = spark.createDataFrame([(None, 1.0)], "k string, price double")
    [r] = evaluate_expectations(
        df, row_checks=[], unique_keys=[("k_unique", ["k"])]
    ).collect()
    assert (r["n_violations"], r["n_rows"]) == (1, 1)


def test_duplicate_check_names_rejected(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="duplicate"):
        evaluate_expectations(
            df,
            row_checks=[
                ("positive", F.col("id") > 0),
                ("positive", F.col("id") < 10),
            ],
        )
