"""User-defined escape hatches — the full UDx surface (SURVEY.md §2.11).

The reference's only "UDF" is a row-wise ``df.apply`` (D1, replaced by
native expressions — functions/buckets.py) and its dynamic dispatch is
``eval`` (D2, replaced by literal parsing). D3 notes it has no UDAF/UDTF
at all; this module completes the Spark-side surface so every extension
point a user might need is demonstrated and tested:

- scalar: Arrow-batched ``pandas_udf`` (operators/similarity.py uses these
  for the BLAS kernels);
- aggregate: GROUPED_AGG ``pandas_udf`` (``geometric_mean_udaf``);
- table: Python UDTF (``chunk_text_udtf``) — one input row, many output
  rows, via SQL ``LATERAL``.

Scale guidance baked into the docstrings: a GROUPED_AGG UDAF materializes
each WHOLE group in one python worker (no partial aggregation) — use it
only when the algebraic form doesn't exist; a UDTF runs row-at-a-time in
python — prefer the pure-expression twin when one exists (e.g.
text_analysis.chunk_documents is the scale path for chunking; the UDTF
here is the escape-hatch pattern, tested equivalent).

All builders are lazy: pandas_udf/udtf resolve their DDL against the
ACTIVE session, so module-level construction breaks imports (NOTES
invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level so pandas_udf annotation strings
# ('pd.Series', stringified by future-annotations) resolve via module
# globals when the UDAF builder runs

from pyspark.sql import Column
from pyspark.sql import functions as F


def geometric_mean_udaf() -> "Column":
    """GROUPED_AGG pandas UDAF: exp(mean(ln x)) over positive doubles.

    The geometric mean has no Spark built-in, but DOES have an algebraic
    decomposition (sum of logs) — production code should use
    ``exp(avg(ln(x)))`` which aggregates partially map-side. This UDAF is
    the demonstration of the GROUPED_AGG extension point for the cases
    with no such decomposition (e.g. a fitted model per group): Spark
    ships each full group's column to one python worker as a pandas
    Series over Arrow.
    """
    @F.pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        x = v.dropna()
        x = x[x > 0]
        if len(x) == 0:
            return None  # SQL NULL for an empty/non-positive group
        return float(np.exp(np.log(x.to_numpy()).mean()))

    return geomean


def register_chunk_text_udtf(spark, name: str = "chunk_text"):
    """Python UDTF: (text, size, overlap) → rows (chunk_idx, chunk_text)
    of whitespace tokens per window — the table-function escape hatch.

    Registered for SQL so it composes as a LATERAL join::

        SELECT d.doc_id, c.chunk_idx, c.chunk_text
        FROM documents d, LATERAL chunk_text(d.text, 128, 32) c

    Row-at-a-time python: each input row round-trips through the worker.
    The expression-based ``text_analysis.chunk_documents`` computes the
    identical windows JVM-side and is the 100 TB path (equivalence is
    pinned in tests/test_udx.py).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string")
    class ChunkText:
        def eval(self, text: str, size: int, overlap: int):
            if text is None or size is None or size <= 0:
                return
            step = size - (overlap or 0)
            if step <= 0:
                raise ValueError("overlap must be smaller than size")
            toks = [t for t in text.split(" ") if t]
            # one chunk per stride start < len(toks), tail kept short —
            # identical window rule to text_analysis.chunk_documents
            for idx, i in enumerate(range(0, len(toks), step)):
                yield idx, " ".join(toks[i : i + size])

    spark.udtf.register(name, ChunkText)
    return ChunkText


def register_chunk_text_udtf_arrow(spark, name: str = "chunk_text_arrow"):
    """The same chunking UDTF with ``useArrow=True``: rows move to the
    python worker in Arrow record batches instead of pickled one at a
    time — the faster escape hatch when a UDTF is genuinely needed at
    volume. Identical semantics (pinned against the plain UDTF and the
    expression chunker in tests)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string", useArrow=True)
    class ChunkTextArrow:
        def eval(self, text: str, size: int, overlap: int):
            if text is None or size is None or size <= 0:
                return
            step = size - (overlap or 0)
            if step <= 0:
                raise ValueError("overlap must be smaller than size")
            toks = [t for t in text.split(" ") if t]
            for idx, i in enumerate(range(0, len(toks), step)):
                yield idx, " ".join(toks[i : i + size])

    spark.udtf.register(name, ChunkTextArrow)
    return ChunkTextArrow
