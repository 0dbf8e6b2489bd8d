"""Block-checksum table reconciliation (operators/reconcile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.operators.reconcile import (
    block_checksums,
    checksum_diff,
)


def _tbl(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


@pytest.mark.smoke
def test_identical_tables_have_zero_diff_blocks(spark):
    rows = [(i, f"v{i}") for i in range(500)]
    a, b = _tbl(spark, rows), _tbl(spark, list(reversed(rows)))
    assert checksum_diff(a, b, ["id", "v"], 16).count() == 0


def test_single_changed_row_flags_exactly_its_blocks(spark):
    rows = [(i, f"v{i}") for i in range(500)]
    changed = [(i, "CHANGED" if i == 123 else f"v{i}") for i in range(500)]
    diff = checksum_diff(
        _tbl(spark, rows), _tbl(spark, changed), ["id", "v"], 16
    ).collect()
    # old row leaves one block, new row enters one (may be the same)
    assert 1 <= len(diff) <= 2
    assert all(
        r["n_left"] != r["n_right"] or r["sum_left"] != r["sum_right"]
        for r in diff
    )


def test_duplicated_row_detected_multiset_sensitivity(spark):
    rows = [(i, f"v{i}") for i in range(100)]
    dup = rows + [rows[7]]
    diff = checksum_diff(
        _tbl(spark, rows), _tbl(spark, dup), ["id", "v"], 8
    ).collect()
    assert len(diff) == 1
    assert diff[0]["n_right"] == diff[0]["n_left"] + 1


def test_checksum_partitioning_independent(spark):
    rows = [(i, f"v{i}") for i in range(300)]
    a = _tbl(spark, rows).repartition(13)
    b = _tbl(spark, rows).repartition(2)
    ca = {r["block_id"]: (r["n_rows"], r["checksum"])
          for r in block_checksums(a, ["id", "v"], 8).collect()}
    cb = {r["block_id"]: (r["n_rows"], r["checksum"])
          for r in block_checksums(b, ["id", "v"], 8).collect()}
    assert ca == cb


def test_bad_blocks_rejected(spark):
    with pytest.raises(ValueError):
        block_checksums(_tbl(spark, [(1, "a")]), ["id"], 0)


def test_join_size_profile_predicts_actual_join(spark):
    from datalakeingestion_spark.operators.skew import join_size_profile

    left = spark.createDataFrame(
        [(k,) for k in [1] * 50 + [2] * 3 + [3] * 2], "k long"
    )
    right = spark.createDataFrame(
        [(k,) for k in [1] * 4 + [2] * 10 + [4] * 7], "k long"
    )
    r = join_size_profile(left, right, "k").collect()[0]
    actual = left.join(right, "k").count()
    assert r["join_rows"] == actual == 50 * 4 + 3 * 10
    assert r["n_join_keys"] == 2
    assert r["max_key_rows"] == 200
    # avg = 230 div 2 = 115; 1000*200 div 115 = 1739
    assert r["skew_factor_x1000"] == 1739
