"""Round-10 queries — the two-corpus DSIR form and this round's new
operators.

- ``dsir_weights_vs_tables`` / ``dsir_select_vs_top100`` — DSIR in the
  paper's classic two-TABLE setup (``operators/dsir.py::
  dsir_logratio_weights_vs``): score every document of a raw pool
  against a SEPARATE curated target corpus (here: the deterministic
  ``lang='en' AND doc_id % 7 = 0`` slice of ``documents`` standing in
  for the Wikipedia/books table), instead of a flag column inside one
  frame. Both hashed-ngram models are still built in ONE pass over the
  tagged union; only raw-side scores return. This is the API shape a
  real mixing pipeline calls — the raw pool and the quality corpus are
  different tables.

Reference pendant: none — greenfield curation operators (SURVEY.md §2
beyond-reference set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .llm import TOKS_SQL, _h32_sql
from .registry import register

# ---------------------------------------------------------------------------
# DSIR, two-corpus (separate target TABLE) form
# ---------------------------------------------------------------------------

_DSIR_B = 4096

# raw pool = ALL documents; target corpus = the deterministic curated
# slice. The models/smoothing/rounding mirror operators/dsir.py (and the
# one-frame oracle in round9.py) line for line; the only structural
# difference is the tagged union — raw rows feed q, target rows feed p,
# and the per-doc aggregate keys on (tgt, doc_id) so a target id that
# collides with a raw id never merges rows.
_DSIR_VS_WEIGHTS_SQL = f"""
    WITH rawd AS (SELECT doc_id, FALSE AS tgt, {TOKS_SQL} AS toks
                  FROM documents),
    tgtd AS (SELECT doc_id, TRUE AS tgt, {TOKS_SQL} AS toks
             FROM documents WHERE lang = 'en' AND doc_id % 7 = 0),
    d AS (SELECT * FROM rawd UNION ALL SELECT * FROM tgtd),
    u AS (SELECT doc_id, tgt, unnest(toks) AS f FROM d),
    bg AS (SELECT doc_id, tgt,
                  unnest(list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i + 1]))
                      AS f
           FROM d),
    feats AS (SELECT doc_id, tgt,
                     {_h32_sql('f')} % {_DSIR_B} AS bucket
              FROM (SELECT * FROM u UNION ALL SELECT * FROM bg)),
    cnt AS (SELECT bucket,
                   SUM(CASE WHEN tgt THEN 1 ELSE 0 END)::BIGINT AS cp,
                   SUM(CASE WHEN tgt THEN 0 ELSE 1 END)::BIGINT AS cq
            FROM feats GROUP BY 1),
    tot AS (SELECT SUM(cp)::DOUBLE AS tp, SUM(cq)::DOUBLE AS tq FROM cnt),
    ratio AS (SELECT bucket,
                     CAST(round(ln((cp + 1) / (tp + {_DSIR_B}))
                                - ln((cq + 1) / (tq + {_DSIR_B})), 6)
                          AS DECIMAL(27,6)) AS lr
              FROM cnt CROSS JOIN tot),
    w AS (SELECT doc_id, COUNT(*)::BIGINT AS n_feats, SUM(lr) AS ws
          FROM feats JOIN ratio USING (bucket)
          WHERE NOT tgt GROUP BY 1)
    SELECT documents.doc_id,
           COALESCE(w.n_feats, 0)::BIGINT AS n_feats,
           COALESCE(CAST(w.ws AS DOUBLE), 0.0) AS weight
    FROM documents LEFT JOIN w USING (doc_id)
"""


def _dsir_vs_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", "text")
    target = docs.filter(
        (F.col("lang") == "en") & (F.col("doc_id") % 7 == 0)
    ).select("doc_id", "text")
    return raw, target


@register(
    "dsir_weights_vs_tables",
    oracle=_DSIR_VS_WEIGHTS_SQL,
    doc="DSIR importance weights in the paper's TWO-CORPUS setup "
    "(operators/dsir.py::dsir_logratio_weights_vs): the raw pool and "
    "the curated target are SEPARATE tables (the call a real mixing "
    "pipeline makes), not a flag column. Both add-1-smoothed hashed-"
    "ngram models are built in one pass over the tagged union (target "
    "rows feed p, raw rows feed q); the per-doc aggregate keys on "
    "(side, id) so colliding ids never merge; only raw-side scores "
    "return, with feature-less docs kept as (0, 0.0).",
)
def dsir_weights_vs_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import dsir_logratio_weights_vs

    raw, target = _dsir_vs_frames(spark, sf_dir)
    return dsir_logratio_weights_vs(raw, target, n_buckets=_DSIR_B)


@register(
    "dsir_select_vs_top100",
    oracle=f"""
    SELECT * FROM ({_DSIR_VS_WEIGHTS_SQL})
    ORDER BY weight DESC, doc_id LIMIT 100
    """,
    doc="Two-corpus DSIR selection (operators/dsir.py::"
    "dsir_select_topk_vs): the top-100 raw-pool docs most like the "
    "separate target corpus, ties by doc_id — compiles to "
    "TakeOrderedAndProject (per-partition heaps + a 100-row driver "
    "merge), never a single-partition global sort.",
)
def dsir_select_vs_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import dsir_select_topk_vs

    raw, target = _dsir_vs_frames(spark, sf_dir)
    return dsir_select_topk_vs(raw, target, k=100, n_buckets=_DSIR_B)
