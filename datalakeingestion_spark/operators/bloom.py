"""Bloom-filter dedup-at-the-door.

The SPACE-BOUNDED alternative to the stored indexes in
``operators/dedup.py``: the exact-hash index and the stored gram index
keep per-document state (index size grows with the lake), while a Bloom
filter answers "have we ingested this exact document before?" in a
FIXED ``m``-bit footprint — the right trade when the door check only
needs a fast probabilistic no/maybe (a "maybe" can always fall through
to the exact index) or when the lake-side state must fit in memory on
every executor.

Properties (classic Bloom):
- **No false negatives** — a re-delivered document is ALWAYS flagged
  (every one of its ``k`` bit positions was set when it was ingested).
- **False positives at a known rate** — ``(1 - e^(-k*n/m))^k`` for
  ``n`` inserted documents; the FPR contract is pinned in
  tests/test_bloom.py and the registered query.

Determinism: positions come from the md5-portable 32-bit hash of the
document fingerprint salted by the hash index (the same convention as
every sampler/sketch in this repo), so the filter is bit-identical
across engines, partitionings and reruns — the DuckDB oracle rebuilds
the exact same bitmap.

Representation: 63 set bits per BIGINT word (bit 63 left clear so the
mask arithmetic never touches the sign bit on either engine); the
filter DataFrame is at most ``ceil(m/63)`` rows of (word, bits) — KBs
for millions of bits, always broadcastable.

Scale shape: the build is one projection (k positions per doc) + one
word-keyed groupBy into a bounded bitmap; the probe is a broadcast
join of the batch's positions against the bitmap + one per-doc
all-bits-set aggregate. The lake is touched once at build; per batch
cost is O(batch * k).

Reference pendant: none — greenfield curation operator (SURVEY.md §2
beyond-reference set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32

#: bits packed per BIGINT word (sign bit left clear — see module doc)
WORD_BITS = 63


def _positions(
    df: DataFrame,
    fp_col: str,
    m_bits: int,
    k: int,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """k salted bit positions per row: (*keep, ``__pos``)."""
    if m_bits < WORD_BITS or m_bits % WORD_BITS:
        raise ValueError(f"m_bits must be a positive multiple of {WORD_BITS}")
    if not 1 <= k <= 16:
        raise ValueError("k must be in 1..16")
    pos = F.explode(
        F.array(
            *[
                F.pmod(
                    portable_hash32(
                        F.concat(F.col(fp_col), F.lit(f"#b{j}"))
                    ),
                    F.lit(m_bits),
                )
                for j in range(k)
            ]
        )
    )
    return df.select(*keep, pos.alias("__pos"))


def _word_mask(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """(word, __mask) of a ``__pos`` frame — the packing arithmetic
    lives ONCE so build and probe can never address different bits."""
    return df.select(
        *keep,
        (F.col("__pos") / WORD_BITS).cast("long").alias("word"),
        F.expr(
            f"shiftleft(1L, cast(__pos % {WORD_BITS} as int))"
        ).alias("__mask"),
    )


def _fingerprint(text_col: str) -> Column:
    """md5 of the raw text, with NULL folded to '' on BOTH build and
    probe — md5(NULL) is NULL, which would silently break the no-false-
    negative guarantee (NULL positions never join back to set bits).
    NULL and empty text therefore share one fingerprint; a source that
    must distinguish them should pre-fill a sentinel."""
    return F.md5(F.coalesce(F.col(text_col), F.lit("")))


def bloom_build(
    docs: DataFrame,
    m_bits: int,
    k: int,
    text_col: str = "text",
) -> DataFrame:
    """Build the filter over the exact-dedup fingerprint (md5 of the
    raw text — the same identity ``dedup_exact`` groups on). Returns
    the bitmap DataFrame (word BIGINT, bits BIGINT), ≤ m/63 rows."""
    fps = docs.select(_fingerprint(text_col).alias("__fp"))
    return (
        _word_mask(_positions(fps, "__fp", m_bits, k))
        .groupBy("word")
        .agg(F.expr("bit_or(__mask)").alias("bits"))
    )


def bloom_probe(
    batch: DataFrame,
    bloom: DataFrame,
    m_bits: int,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Probe a batch against a built filter: (``id_col``, maybe_dup).

    ``maybe_dup`` is TRUE iff ALL k positions are set — never false for
    a document whose exact text was inserted (no false negatives);
    true for a fresh document only on a k-way collision (the FPR).
    ``m_bits``/``k`` must match the build or the answer is undefined.
    """
    probes = batch.select(
        F.col(id_col), _fingerprint(text_col).alias("__fp")
    )
    pos = _positions(probes, "__fp", m_bits, k, keep=(id_col,))
    checked = (
        _word_mask(pos, keep=(id_col,))
        .join(F.broadcast(bloom), "word", "left")
        .withColumn(
            "__hit",
            F.coalesce(
                (F.col("bits").bitwiseAND(F.col("__mask")) == F.col("__mask")),
                F.lit(False),
            ),
        )
    )
    return checked.groupBy(id_col).agg(
        F.expr("bool_and(__hit)").alias("maybe_dup")
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """OR several filters built with the SAME (m_bits, k) geometry into
    one — the append path as the lake grows (build a filter per ingest
    batch, merge into the door filter; Bloom union is exact: the merged
    filter answers exactly as one built over the union corpus).
    Geometry mismatches are the caller's contract, as in
    :func:`bloom_probe`."""
    if not blooms:
        raise ValueError("bloom_merge requires at least one filter")
    merged = blooms[0]
    for b in blooms[1:]:
        merged = merged.unionByName(b)
    return merged.groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))
