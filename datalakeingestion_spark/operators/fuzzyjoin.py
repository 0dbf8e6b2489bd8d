"""Segment-blocked fuzzy (hamming) join — record linkage at scale.

The reference has no fuzzy matching (its joins are exact key loops);
this is a greenfield operator for entity resolution / near-key linkage
("the same customer keyed twice with a typo'd id", dedup across systems
with OCR'd keys).

Exactness argument (pigeonhole, PassJoin-style): split each key into
``s ≥ k+1`` aligned segments. Two equal-length strings with hamming
distance ≤ k have at most k mismatched positions, so at least ``s - k``
segments match EXACTLY — in particular at least one. Generating
candidates as "pairs sharing segment i for some i" (an equi join on
(length, i, segment_text)) therefore finds every true pair; the exact
hamming residual then removes false candidates. No all-pairs comparison
ever happens.

Scale shape: each row explodes to ``s`` block rows; the candidate join
is a plain shuffled equi join on (length, segment_id, segment_text);
the residual is per-candidate column arithmetic. Cost is driven by
block sizes, i.e. by how well segments DISCRIMINATE: for keys with a
long shared constant prefix, the prefix segments collapse into one
giant block and candidate volume degenerates toward all-pairs. The fix
is in the caller's hands and preserves exactness FOR THE EXPRESSION
MATCHED: pass the variable region (e.g. ``F.col("k").substr(-6, 6)``)
as the key expression, or raise ``n_segments`` so segments are shorter
and more selective (any ``s ≥ k+1`` keeps the guarantee). AQE's skew
split handles residual hot blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hamming(a: Column, b: Column) -> Column:
    """Exact hamming distance between two equal-length strings (count of
    positions whose chars differ) — JVM-side, zip of char arrays."""
    return F.aggregate(
        F.zip_with(
            F.split(a, ""), F.split(b, ""),
            lambda x, y: F.when(x != y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def _segmented(
    df: DataFrame, id_col: str, key: Column, side: str, s: int
) -> DataFrame:
    """(id, key, length, segment_id, segment_text) block rows — s aligned
    segments with boundaries floor(i·L/s), covering the string exactly."""
    L = F.length(key)
    segs = F.array(*[
        F.struct(
            F.lit(i).alias("seg_id"),
            key.substr(
                (F.floor(L * i / s) + 1).cast("int"),
                (F.floor(L * (i + 1) / s) - F.floor(L * i / s)).cast("int"),
            ).alias("seg"),
        )
        for i in range(s)
    ])
    return df.select(
        F.col(id_col).alias(f"{side}_id"),
        key.alias(f"{side}_key"),
        L.alias(f"{side}_len"),
        F.explode(segs).alias("sg"),
    ).select(
        f"{side}_id", f"{side}_key", f"{side}_len",
        F.col("sg.seg_id").alias("seg_id"),
        F.col("sg.seg").alias("seg"),
    )


def fuzzy_join_hamming(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_key: Column,
    right_key: Column,
    k: int,
    n_segments: int | None = None,
) -> DataFrame:
    """All (left_id, right_id, distance) pairs whose keys are the same
    length and within hamming distance ``k`` — exact (guaranteed recall
    via segment pigeonhole), candidates bounded by block sizes, never
    all-pairs.

    ``left_key``/``right_key`` are expressions over the respective
    frames (pass the discriminative substring for shared-prefix keys).
    Output columns: (left_id, right_id, hamming) — self-join callers
    filter ``left_id < right_id`` to halve the mirror pairs.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    s = n_segments if n_segments is not None else k + 1
    if s < k + 1:
        raise ValueError(f"n_segments must be >= k+1 (= {k + 1})")

    lb = _segmented(left, left_id, left_key, "l", s)
    rb = _segmented(right, right_id, right_key, "r", s)
    cand = (
        lb.join(
            rb,
            (lb["seg_id"] == rb["seg_id"])
            & (lb["seg"] == rb["seg"])
            & (lb["l_len"] == rb["r_len"]),
        )
        # a pair can collide in several segments — score each pair once
        .groupBy("l_id", "r_id")
        .agg(
            F.first("l_key").alias("l_key"),
            F.first("r_key").alias("r_key"),
        )
    )
    return (
        cand.withColumn("hamming", hamming(F.col("l_key"), F.col("r_key")))
        .filter(F.col("hamming") <= k)
        .select(
            F.col("l_id").alias("left_id"),
            F.col("r_id").alias("right_id"),
            F.col("hamming").cast("long").alias("hamming"),
        )
    )
