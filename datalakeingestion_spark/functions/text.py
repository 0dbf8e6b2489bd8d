"""Text normalization / tokenization column expressions.

Greenfield (no reference pendant — the reference keeps text opaque): these
are the building blocks for the LLM-data-pipeline operators (dedup,
language-id, quality scoring). Everything is a pure column expression
(JVM-side higher-order functions, no Python UDFs) and is written to be
bit-identical to the ANSI-SQL fragments used in the DuckDB oracles
(plans/llm.py keeps the SQL twins next to the queries).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized_text(col: Column | str) -> Column:
    """lower → collapse non-alphanumeric runs to single spaces → trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>, no empties)."""
    return F.filter(F.split(normalized_text(col), " "), lambda t: t != F.lit(""))


def distinct_tokens(col: Column | str) -> Column:
    return F.array_distinct(tokens(col))


def n_tokens_of(col: Column | str) -> Column:
    """Token count with NULL text counting as 0 (long) — the one
    boundary expression every packing/delivery plan sizes documents
    with. NOT ``coalesce(size(tokens(c)), 0)``: under
    ``spark.sql.legacy.sizeOfNull`` (the 3.5 default) ``size(NULL)``
    returns -1, not NULL, and a -1 count would silently corrupt every
    downstream prefix sum while the DuckDB twin (COALESCE(len(..), 0))
    says 0. The explicit NULL branch is version- and conf-independent."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isNull(), F.lit(0)).otherwise(F.size(tokens(c))).cast("long")
    )


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles of a token array (array<string>, with duplicates).

    Built by zipping n shifted copies of the array (`concat` propagates the
    null padding past the end, which the final filter drops). This keeps
    every lambda body free of references to the token expression itself —
    expressions inside higher-order-function lambdas are re-evaluated PER
    ELEMENT (no common-subexpression elimination there), so a naive
    `transform(sequence(...), i -> slice(toks, i, n))` re-tokenizes the
    document once per shingle position (~50× slower at bench scale).
    """
    sz = F.size(toks)
    shingle = F.slice(toks, 1, sz)
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, sz)
        shingle = F.zip_with(
            shingle, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.filter(shingle, lambda s: s.isNotNull())


def distinct_shingles(col: Column | str, n: int = 3) -> Column:
    return F.array_distinct(word_shingles(tokens(col), n))
