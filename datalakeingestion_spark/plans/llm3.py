"""Round-2 continuation queries, part 3: keyword retrieval (BM25).

Same contract as plans/llm.py / llm2.py: the DuckDB oracle is generated
from the SAME constants as the Spark plan, aggregates are aliased
identically on both sides, and every floating-point quantity that feeds a
comparison or a sum is rounded to 6 dp at the same point in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import text_analysis as ta
from ..sources.fixtures import load_table
from .llm import TOKS_SQL
from .registry import register

BM25_TERMS = ("spark", "join", "stream")
BM25_K = 20
BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_oracle(terms: tuple[str, ...], k: int, k1: float, b: float) -> str:
    """DuckDB twin of text_analysis.bm25_rank, arithmetic mirrored
    operation-for-operation (ln rounded to 6 dp, per-term contribution
    rounded to 6 dp, total rounded to 6 dp; ties break on doc_id)."""
    tf_cols = ",\n           ".join(
        f"len(list_filter(toks, t -> t = '{w}')) AS tf{i}"
        for i, w in enumerate(terms)
    )
    df_cols = ",\n           ".join(
        f"SUM((tf{i} > 0)::BIGINT) AS df{i}" for i in range(len(terms))
    )
    contribs = " + ".join(
        f"round(round(ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0), 6)"
        f" * (tf{i} * {k1 + 1.0}) / "
        f"(tf{i} + {k1} * ({1.0 - b} + {b} * dl / (sdl::DOUBLE / n))), 6)"
        for i in range(len(terms))
    )
    return f"""
    WITH base AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    stats AS (SELECT doc_id, len(toks) AS dl,
           {tf_cols}
        FROM base),
    corpus AS (SELECT COUNT(*)::BIGINT AS n, SUM(dl)::BIGINT AS sdl,
           {df_cols}
        FROM stats),
    scored AS (SELECT doc_id, round({contribs}, 6) AS score
               FROM stats CROSS JOIN corpus),
    r AS (SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rn
          FROM scored)
    SELECT doc_id, score, rn AS "rank" FROM r WHERE rn <= {k}
    """


@register(
    "bm25_rank",
    oracle=_bm25_oracle(BM25_TERMS, BM25_K, BM25_K1, BM25_B),
    doc="Okapi BM25 top-k for a fixed query-term set — keyword retrieval "
    "over the corpus (contamination audits, relevance seeding). Zero "
    "shuffles before the final top-k: per-doc tf/dl are column arithmetic "
    "(no explode; the query set is a literal list), corpus stats are one "
    "scalar aggregate broadcast back, and the top-k is a TakeOrdered.",
)
def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ta.bm25_rank(docs, BM25_TERMS, k=BM25_K, k1=BM25_K1, b=BM25_B)
