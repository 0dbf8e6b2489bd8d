"""Declarative data-contract evaluation — Great-Expectations-style checks
compiled into ONE aggregation pass.

The ingestion-side quality gate the reference approximates with a single
global row-count validation (start_ingestion.py's count reconciliation):
here a contract is a list of named row-level predicates plus optional
uniqueness keys, and the evaluator emits one (expectation, n_violations,
n_rows) row per check.

Scale design: every row-level expectation is a conditional SUM inside the
same aggregate, and the single agg row is unpivoted with inline() — the
table is scanned once regardless of how many checks the contract carries
(structurally, not relying on ReuseExchange), all partials map-side. Uniqueness checks need key
cardinality, so each adds one keyed aggregate over its key (rows minus
distinct keys = violations) — still a single shuffle per unique-key
constraint, and the key frames are group-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def evaluate_expectations(
    df: DataFrame,
    row_checks: Sequence[tuple[str, Column]],
    unique_keys: Sequence[tuple[str, Sequence[str]]] = (),
) -> DataFrame:
    """Evaluate a data contract.

    ``row_checks`` — (name, boolean Column) pairs; a row violates a check
    when the predicate is NOT true (false OR null, so a null in
    ``price > 0`` counts as a violation rather than slipping through
    three-valued logic). ``unique_keys`` — (name, key columns) pairs
    with PRIMARY-KEY semantics: violations = surplus rows among
    fully-non-null keys PLUS every row whose key has any null component
    (a null key can't be unique, same null-hostile stance as the row
    checks).

    Returns (expectation, n_violations, n_rows) with one row per check,
    in contract order semantics (row order itself is unordered — sort on
    read).
    """
    if not row_checks and not unique_keys:
        raise ValueError("contract is empty: no checks given")
    names = [n for n, _ in row_checks] + [n for n, _ in unique_keys]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        raise ValueError(f"duplicate expectation name(s): {dupes}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in row_checks:
        aggs.append(
            F.sum(
                F.when(pred, F.lit(0)).otherwise(F.lit(1))
            ).alias(f"__v_{name}")
        )
    stacked = None
    if row_checks:
        # ONE aggregate row, unpivoted via inline() — not a union of N
        # re-selects of the same agg subplan, which would rescan the
        # table per check whenever ReuseExchange doesn't kick in.
        base = df.agg(*aggs)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(name).alias("expectation"),
                    F.coalesce(F.col(f"__v_{name}"), F.lit(0))
                    .cast("long")
                    .alias("n_violations"),
                )
                for name, _ in row_checks
            ]
        )
        stacked = base.select(
            F.inline(pairs), F.col("__n").cast("long").alias("n_rows")
        )
    for name, keys in unique_keys:
        # count_distinct drops tuples with any null key component, so
        # n − d = surplus among fully-non-null keys + every null-keyed
        # row — exactly the PK semantics the docstring states
        uniq = df.agg(
            F.count(F.lit(1)).alias("__n"),
            F.count_distinct(*[F.col(k) for k in keys]).alias("__d"),
        ).select(
            F.lit(name).alias("expectation"),
            (F.col("__n") - F.col("__d")).cast("long").alias("n_violations"),
            F.col("__n").cast("long").alias("n_rows"),
        )
        stacked = uniq if stacked is None else stacked.unionByName(uniq)
    return stacked
