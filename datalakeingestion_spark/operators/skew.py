"""Skew-handling utilities — salting for hot join keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when one build-side key is so
hot that even split shuffle partitions overwhelm a task (the classic
null-key / power-law-id case at 100 TB).

``salted_join`` replicates the small side ``salt_n`` times and scatters
the big side's hot keys across ``salt_n`` sub-keys, turning one
pathological partition into ``salt_n`` even ones. Exact same join result,
one extra narrow map on each side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Supported ``how``: inner / left(_outer) / left_semi / left_anti —
    shapes where every output row is anchored to exactly one big-side row
    (its single salt) or to the existence of a match. right/full outer
    would emit each UNMATCHED small-side row once per salt replica
    (salt_n duplicates), so they are rejected rather than silently wrong.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: an unmatched "
            "small-side row would be duplicated per salt replica"
        )
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_n).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


def join_size_profile(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top_k: int = 10,
) -> DataFrame:
    """Predict an equi-join's output size and its skew WITHOUT executing
    the join: |A ⋈ B| = Σ_key cA(key)·cB(key), computed from the two
    per-key count frames (each distinct-key-sized) — the planning
    primitive behind AQE's skew-join split and any "should this join be
    salted?" decision.  On 100 TB inputs this costs two combinable
    aggregates and a key-frame join instead of the join itself.

    Returns one row: (join_rows, n_join_keys, max_key_rows,
    skew_factor_x1000) where max_key_rows is the largest single key's
    contribution and skew_factor_x1000 = 1000·max/avg rounded down — an
    exact integer skew signal (>> 1000 means one key dominates and the
    executor holding it becomes the straggler).
    """
    ca = left.groupBy(F.col(key)).agg(F.count(F.lit(1)).alias("_ca"))
    cb = right.groupBy(F.col(key)).agg(F.count(F.lit(1)).alias("_cb"))
    per_key = ca.join(cb, key).select(
        (F.col("_ca") * F.col("_cb")).alias("_rows")
    )
    return per_key.agg(
        F.sum("_rows").cast("long").alias("join_rows"),
        F.count(F.lit(1)).cast("long").alias("n_join_keys"),
        F.max("_rows").cast("long").alias("max_key_rows"),
        F.expr(
            "(1000 * max(_rows)) div (sum(_rows) div count(1))"
        ).cast("long").alias("skew_factor_x1000"),
    )
