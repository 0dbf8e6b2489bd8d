"""Incremental materialized-view maintenance (algebraic aggregate states).

At 100 TB the single most important aggregation optimization is not
running the aggregation at all: an incrementally-maintained view folds
each ingested batch's PARTIAL aggregate into a small per-key state table
instead of rescanning the lake.  This module provides the three pieces:

- :func:`aggregate_state` — compute a batch's partial-aggregate state
  (per-key decimal sums + row count; sums over doubles go through exact
  decimals so the fold is associative AND bit-reproducible);
- :func:`merge_states` — fold any number of states into one (union +
  re-sum, the algebraic-aggregate merge identity);
- :func:`finalize_state` — derive the presentation columns (doubles,
  averages) from a state.

Retractions are first-class: a CDC delete batch is just a state computed
with ``sign=-1`` — counts and sums enter negatively and the merge cancels
the deleted rows, so the view never needs the base table.

Scale shape: each state is distinct-key-sized, not input-sized; the merge
shuffles only states (map-side combinable SUM on the key).  Equivalent to
what Delta/Materialized-View engines do under MERGE; expressed here as
plain DataFrame algebra.  Reference context: the reference recomputes its
Athena views from scratch on every run (README.md:30-36) — this operator
is the scale-path replacement.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: decimal type used for all sum states — exact, order-independent,
#: wide enough for 100-TB-scale totals of DECIMAL(15,2)-ish measures.
STATE_DECIMAL = "decimal(27,6)"


def aggregate_state(
    df: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, Column],
    sign: int = 1,
) -> DataFrame:
    """Partial-aggregate state of ``df``: per-key exact-decimal SUM of each
    measure plus ``n_rows``.  ``sign=-1`` produces a retraction state
    (CDC deletes); measures must be additive (SUM/COUNT family — AVG is
    derived at finalize time from sum+count).
    """
    if sign not in (1, -1):
        raise ValueError(f"sign must be +1 or -1, got {sign}")
    s = F.lit(sign)
    aggs = [
        F.sum(expr.cast(STATE_DECIMAL) * s).alias(name)
        for name, expr in measures.items()
    ]
    aggs.append(F.sum(s).cast("long").alias("n_rows"))
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def merge_states(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Fold partial-aggregate states into one: union + per-key re-SUM.

    Associative and commutative, so batches can arrive in any order and
    the fold can itself be folded (tree merges across days/regions).
    Keys that cancel to zero rows (insert then delete) are dropped — the
    view stays exactly equal to aggregating the live base rows.
    """
    if not states:
        raise ValueError("need at least one state")
    first = states[0]
    val_cols = [c for c in first.columns if c not in keys]
    u = reduce(lambda a, b: a.unionByName(b), states)
    merged = u.groupBy(*[F.col(k) for k in keys]).agg(
        *[F.sum(c).alias(c) for c in val_cols]
    )
    return merged.filter(F.col("n_rows") != 0)


def finalize_state(
    state: DataFrame,
    keys: Sequence[str],
    avg_of: Mapping[str, str] | None = None,
) -> DataFrame:
    """Presentation projection of a state: sums cast back to double, plus
    ``avg_of`` columns (``{"avg_x": "sum_x"}``) as sum/count doubles.
    """
    val_cols = [c for c in state.columns if c not in keys and c != "n_rows"]
    cols: list[Column] = [F.col(k) for k in keys]
    cols += [F.col(c).cast("double").alias(c) for c in val_cols]
    cols.append(F.col("n_rows"))
    for out, src in (avg_of or {}).items():
        cols.append(
            (F.col(src).cast("double") / F.col("n_rows")).alias(out)
        )
    return state.select(*cols)
