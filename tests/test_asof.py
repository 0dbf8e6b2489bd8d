from __future__ import annotations

from pyspark.sql import functions as F

from datalakeingestion_spark.operators.asof import asof_join


def _ts(spark, rows, cols):
    df = spark.createDataFrame(rows, cols)
    for c in cols:
        if c.endswith("_s"):
            df = df.withColumn(c[:-2], F.to_timestamp(c)).drop(c)
    return df


def test_asof_edges(spark):
    left = _ts(
        spark,
        [
            (1, "k1", "2024-01-05 00:00:00"),  # between r1 and r2
            (2, "k1", "2024-01-01 00:00:00"),  # exactly at r1 → matches r1
            (3, "k1", "2023-12-31 00:00:00"),  # before any right row → nulls
            (4, "k2", "2024-06-01 00:00:00"),  # key with no right rows → nulls
            (5, "k1", "2024-02-01 00:00:00"),  # after all → latest, tie-broken
        ],
        ["event_id", "k", "t_s"],
    )
    right = _ts(
        spark,
        [
            (10, "k1", "2024-01-01 00:00:00", 1.0),
            (11, "k1", "2024-01-10 00:00:00", 2.0),
            # two right rows at the SAME timestamp → max tie_break (13) wins
            (12, "k1", "2024-01-20 00:00:00", 3.0),
            (13, "k1", "2024-01-20 00:00:00", 4.0),
        ],
        ["rid", "k", "t_s", "val"],
    )
    out = asof_join(
        left, right,
        left_key="k", right_key="k",
        left_ts="t", right_ts="t",
        value_cols=["rid", "val"], tie_break="rid",
    )
    got = {r["event_id"]: (r["rid"], r["val"]) for r in out.collect()}
    assert got[1] == (10, 1.0)
    assert got[2] == (10, 1.0)  # equal timestamps match (right sorts first)
    assert got[3] == (None, None)
    assert got[4] == (None, None)
    assert got[5] == (13, 4.0)  # same-ts winner = max tie_break
    assert len(got) == 5  # every left row survives exactly once
