"""Multi-dimensional storage layout (Z-order) and data-skipping stats.

At 100 TB the scan you skip is the fastest scan: lakehouse engines keep
per-file min/max column stats and prune files whose range cannot match
the predicate.  Pruning quality is a LAYOUT property — a sort on one
column gives perfect skipping on that column and none on any other;
interleaving the bits of two (bucketed) columns into a Morton / Z-order
key gives good skipping on BOTH.  This module provides:

- :func:`morton_code` — exact integer bit-interleave of two bucketed
  dimensions (pure bigint shifts/masks, so an ANSI-SQL oracle reproduces
  it bit-for-bit);
- :func:`file_minmax_stats` — assign rows to fixed-size "files" by rank
  in a chosen layout order and compute per-file min/max stats.  The rank
  is the distributed prefix-sum (`packing.global_positions`), never a
  single-partition window, so the layout step itself scales;
- :func:`pruning_stats` — files/rows a min-max-pruning scan would touch
  for a box predicate, the effectiveness number that justifies (or not)
  rewriting a table's layout.

Rank over a total order is partition-independent, so results are
deterministic on any cluster.  Delta's OPTIMIZE ZORDER BY is the
production analog; here the mechanism is exposed as plain DataFrame
algebra with a checkable oracle.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.zorder import z_value, z_value_sql
from .packing import global_positions


def morton_code(x: Column, y: Column, bits: int = 6) -> Column:
    """Interleave the low ``bits`` bits of non-negative ints ``x`` and
    ``y`` into a 2·bits-bit Z-order key (x takes the odd bit positions).
    Callers clamp inputs to [0, 2^bits) — out-of-range bits are ignored
    by the masks, which silently folds distant values together.

    Thin wrapper over ``functions.zorder.z_value`` (the write-path
    clustering key) with the (x, y) argument convention of this module.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    return z_value(y, x, bits)  # z_value puts its FIRST arg at even bits


def morton_code_sql(x: str, y: str, bits: int = 6) -> str:
    """ANSI-SQL twin of :func:`morton_code` (DuckDB bit operators).
    Every term is fully parenthesized — SQL shift operators bind LOOSER
    than ``+``, so a bare ``a << 1 + b << 2`` would misparse."""
    return z_value_sql(y, x, bits)


def file_minmax_stats(
    df: DataFrame,
    id_col: str,
    order_cols: Sequence[str],
    stat_cols: Sequence[str],
    rows_per_file: int,
) -> DataFrame:
    """Simulate writing ``df`` in ``order_cols`` order into files of
    ``rows_per_file`` rows and return per-file skipping stats:
    (file_id, n_rows, min_<c>/max_<c> for each stat col).

    ``id_col`` must be unique (it keys the rank join).  The rank comes
    from the distributed prefix-sum, so no single-partition window
    appears at any size.
    """
    if rows_per_file <= 0:
        raise ValueError("rows_per_file must be positive")
    pos = global_positions(
        df.select(id_col, *[c for c in order_cols if c != id_col]),
        order_cols=list(order_cols),
        id_col=id_col,
    )
    rows = df.select(id_col, *stat_cols).join(pos, id_col)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        rows.withColumn(
            "file_id", F.expr(f"global_pos div {int(rows_per_file)}")
        )
        .groupBy("file_id")
        .agg(*aggs)
    )


def pruning_stats(
    stats: DataFrame, box: Mapping[str, tuple[int, int]], layout: str
) -> DataFrame:
    """One-row skipping report for a box predicate over ``stats`` from
    :func:`file_minmax_stats`: total files, files a min-max pruner must
    scan (range overlap on every dimension), and rows inside them."""
    cond = F.lit(True)
    for c, (lo, hi) in box.items():
        cond = (
            cond
            & (F.col(f"min_{c}") <= F.lit(hi))
            & (F.col(f"max_{c}") >= F.lit(lo))
        )
    return stats.agg(
        F.lit(layout).alias("layout"),
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(cond.cast("long")).alias("files_scanned"),
        F.sum(F.when(cond, F.col("n_rows")).otherwise(0)).alias(
            "rows_in_scanned"
        ),
    )


def compaction_plan(
    files: DataFrame,
    order_cols: Sequence[str],
    bytes_col: str,
    target_bytes: int,
    id_col: str,
) -> DataFrame:
    """Small-file compaction planning: assign files (in ``order_cols``
    order, so merged files stay range-clustered) to merge groups of
    ≈ ``target_bytes`` via the distributed exclusive-prefix-sum bucketing
    of ``packing.pack_sequences`` — group = floor(prefix_bytes/target).
    A file whose tail crosses the target stays whole in its group
    (pack-with-overflow), so every group except possibly the last is
    ≥ target once it closes.

    Returns (id_col, ``bytes_col``, merge_group).  The input is a
    file-level stats frame (one row per file), so this plans a 100 TB
    lake's compaction from metadata only — the data itself is never
    read until the rewrite executes.
    """
    from .packing import pack_sequences

    planned = pack_sequences(
        files.select(id_col, bytes_col, *[
            c for c in order_cols if c not in (id_col, bytes_col)
        ]),
        token_budget=int(target_bytes),
        id_col=id_col,
        tokens_col=bytes_col,
        order_cols=list(order_cols),
    )
    return planned.select(
        id_col, bytes_col, F.col("seq_id").alias("merge_group")
    )
