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


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles of a token array (array<string>, with duplicates).

    ``slice`` is 1-based; a doc shorter than ``n`` tokens yields [].
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def distinct_shingles(col: Column | str, n: int = 3) -> Column:
    return F.array_distinct(word_shingles(tokens(col), n))
