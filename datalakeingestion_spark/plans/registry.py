"""Query registry backing ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 (and every greenfield
LLM-pipeline operator) registers a ``QueryDef``: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible, an equivalent
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.

Contract (see repo README / driver docs): column names must match between
the Spark result and the oracle result; all aggregates are aliased on both
sides. Aggregates over doubles are computed via exact decimal sums (order-
independent) and cast back to double so the value-hash comparison is
deterministic regardless of partitioning / summation order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None,
    bench: bool = False,
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, bench=bench, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_map() -> dict[str, str]:
    _ensure_loaded()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: qd.fn for name, qd in REGISTRY.items() if qd.bench}


_LOADED = False


def _ensure_loaded() -> None:
    """Import all query modules (they self-register on import)."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        extended,
        extended2,
        llm,
        llm2,
        llm3,
        relational,
        tpch_joins,
        tpch_joins2,
        tpch_joins3,
        tpch_joins4,
    )

    _LOADED = True
