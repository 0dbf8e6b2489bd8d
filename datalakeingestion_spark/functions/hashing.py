"""Portable deterministic hashes.

Two families:

- ``portable_hash32`` / ``portable_hash60`` — md5-prefix hashes that produce
  IDENTICAL values in Spark SQL and DuckDB (and any engine with md5 +
  hex parsing). Used wherever an operator's output must be checkable
  against the ANSI-SQL oracle (MinHash, SimHash, fingerprints).
- For pure-Spark production paths where cross-engine parity doesn't matter,
  prefer ``F.xxhash64`` (cheaper than md5; same 64-bit space).

DuckDB equivalents (used in oracle SQL):
    portable_hash32(x) == ('0x' || substr(md5(x), 1, 8))::BIGINT
    portable_hash60(x) == ('0x' || substr(md5(x), 1, 15))::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash32(col: Column | str) -> Column:
    """First 32 bits of md5 as a non-negative BIGINT in [0, 2^32)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def portable_hash60(col: Column | str) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT in [0, 2^60)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
