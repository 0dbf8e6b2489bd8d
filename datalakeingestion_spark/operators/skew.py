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
