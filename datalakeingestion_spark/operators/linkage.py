"""Record linkage / entity resolution with blocking.

Structured-entity deduplication (customer/org/address records) is the
other half of a curation pipeline's dedup surface — the document
operators in ``operators/dedup.py`` key on text content; these key on
typed FIELDS with per-field similarity. The scale discipline is
BLOCKING (Fellegi-Sunter practice): never all-pairs — candidates are
generated only WITHIN blocks keyed by cheap deterministic functions of
the record (exact country, name prefix, zip, phonetic code), then each
candidate pair pays the expensive per-field similarity. Cost is
Σ C(|block|, 2); block keys are chosen so blocks stay bounded, and a
skewed block is the same hot-bucket problem LSH bands have — cap or
salt it (``operators/dedup.py::lsh_candidate_pairs_salvaged`` is the
pattern).

Similarity here is Levenshtein edit distance — built into both Spark
(`F.levenshtein`, JVM codegen) and DuckDB (`levenshtein`), with
identical unit-cost semantics, so the oracle comparison is exact.

Reference pendant: none — greenfield curation operator (SURVEY.md §2
beyond-reference set).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_similarity_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: Sequence[str],
    string_col: str,
    max_edit: int = 2,
) -> DataFrame:
    """Entity-resolution candidate pairs: records sharing every
    ``block_cols`` value, paired within the block (id_a < id_b), kept
    when ``levenshtein(string_col)`` ≤ ``max_edit``.

    One shuffle on the block key; the join is an ordinary equi hash
    join AQE can skew-split, and the Levenshtein gate runs in codegen
    on the joined pairs. Returns (id_a, id_b, edit_dist, block values).
    """
    if not block_cols:
        raise ValueError("blocking requires at least one block column")
    if max_edit < 0:
        raise ValueError("max_edit must be >= 0")
    a, b = df.alias("a"), df.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in block_cols:
        cond = cond & F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    dist = F.levenshtein(
        F.col(f"a.{string_col}"), F.col(f"b.{string_col}")
    )
    return (
        a.join(b, cond)
        .filter(dist <= max_edit)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            dist.alias("edit_dist"),
            *[F.col(f"a.{c}").alias(c) for c in block_cols],
        )
    )
