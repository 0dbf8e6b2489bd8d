"""As-of join — match each left row to the most recent right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN (SURVEY.md "common OLAP patterns"); the
scalable formulation is the union+window trick:

    union(left tagged 1, right tagged 0)
      → window PARTITION BY key ORDER BY (t, tag, tie) ROWS UNBOUNDED
        PRECEDING → last_value(right_cols IGNORE NULLS)
      → filter tag = 1

ONE shuffle on the key, no range explosion, no per-group python — this is
the 100 TB shape (a naive ``left.join(right, t_left >= t_right)`` is a
quadratic range join). Right rows sort before left rows at equal
timestamps (tag 0 < 1), so an exact-timestamp match is picked up; ties
among right rows at the same timestamp resolve to the largest tie_break
value, deterministically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tie_break: str,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` row with
    ``right_ts <= left_ts`` for the same key (nulls if none yet).

    ``value_cols`` are the right-side columns to carry; ``tie_break`` is a
    right-side column making same-timestamp winners deterministic (max
    wins).
    """
    value_cols = list(value_cols)
    l_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(right.schema[tie_break].dataType).alias("__tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        *[F.col(c) for c in left.columns],
    )
    r_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        F.col(tie_break).alias("__tie"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__t"), F.asc("__tag"), F.asc_nulls_first("__tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.select(
        *left.columns,
        "__tag",
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return matched.filter(F.col("__tag") == 1).drop("__tag")
