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
    """Equi-join with the big side salted and the small side replicated."""
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_n).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")
