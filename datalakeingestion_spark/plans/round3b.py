"""Round-3 continuation plans: incremental view maintenance, graph
ranking, storage layout, LM scoring, and corpus mixing.

Same contract as every other plan module: the oracle SQL is generated
from the same constants as the Spark plan; every computed column is
aliased identically on both sides; float-bearing results go through
exact-decimal or bit-identical single-op double math (see NOTES_r3/r4
determinism playbook).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .registry import register

# Split date for the incremental-maintenance demos: rows strictly before
# are the "already ingested" base; the rest are the new batch.
_MV_SPLIT = "1997-01-01"

_DEC = "DECIMAL(18,4)"

_MV_ORACLE_BODY = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {_DEC})
                    * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE)
               AS sum_revenue,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) / COUNT(*)
               AS avg_qty
    FROM lineitem
"""


def _mv_measures():
    return {
        "sum_qty": F.col("l_quantity").cast(_DEC),
        "sum_revenue": (
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
        ),
    }


def _mv_keys():
    return ["l_returnflag", "l_linestatus"]


@register(
    "mv_incremental_revenue",
    oracle=_MV_ORACLE_BODY + " GROUP BY l_returnflag, l_linestatus",
    doc="Incrementally-maintained revenue view (operators/mv.py): the "
    "lake's already-ingested base and the new batch each produce a "
    "per-key partial-aggregate STATE (exact-decimal sums + row count); "
    "the view is the merge of the two states — never a rescan of the "
    "base. The oracle is the from-scratch aggregate over everything, "
    "pinning the algebraic-merge identity the incremental path relies "
    "on. At 100 TB each state is distinct-key-sized and the merge "
    "shuffles states only; the reference recomputes its Athena views "
    "from scratch every run (README.md:30-36) — this is the scale-path "
    "replacement.",
)
def mv_incremental_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mv import aggregate_state, finalize_state, merge_states

    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_shipdate") < F.lit(_MV_SPLIT))
    batch = li.filter(F.col("l_shipdate") >= F.lit(_MV_SPLIT))
    keys, meas = _mv_keys(), _mv_measures()
    state = merge_states(
        [aggregate_state(base, keys, meas), aggregate_state(batch, keys, meas)],
        keys,
    )
    return finalize_state(state, keys, avg_of={"avg_qty": "sum_qty"})


@register(
    "mv_retraction_consistency",
    oracle=_MV_ORACLE_BODY
    + f" WHERE l_shipdate < DATE '{_MV_SPLIT}'"
    + " GROUP BY l_returnflag, l_linestatus",
    doc="CDC-delete path of the incremental view (operators/mv.py): the "
    "full-corpus state merged with a sign=-1 RETRACTION state of the "
    "post-split rows must equal the from-scratch aggregate of the "
    "surviving rows (the oracle). Pins that deletes fold through the "
    "same merge as inserts — the view never needs the base table to "
    "process a delete batch.",
)
def mv_retraction_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mv import aggregate_state, finalize_state, merge_states

    li = load_table(spark, sf_dir, "lineitem")
    deleted = li.filter(F.col("l_shipdate") >= F.lit(_MV_SPLIT))
    keys, meas = _mv_keys(), _mv_measures()
    state = merge_states(
        [
            aggregate_state(li, keys, meas),
            aggregate_state(deleted, keys, meas, sign=-1),
        ],
        keys,
    )
    return finalize_state(state, keys, avg_of={"avg_qty": "sum_qty"})
