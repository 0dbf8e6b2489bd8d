"""Privacy-risk audits over landed tables: k-anonymity and l-diversity.

Beyond-reference (SURVEY.md §2 greenfield): a training-data pipeline
that ingests customer-shaped records (the reference's MySQL extracts)
needs a re-identification audit before release — the standard measures
are k-anonymity (every quasi-identifier equivalence class has >= k
records) and l-diversity (every class carries >= l distinct values of
the sensitive attribute, so membership does not disclose it).

This complements the row-level PII redaction pass
(``text_analysis.redact_pii``): redaction scrubs direct identifiers,
this audits INDIRECT identification through attribute combinations.

Scale shape (100 TB): one hash groupBy on the quasi-identifier tuple —
partial-aggregatable counts plus one distinct-count; no joins, no
windows. Class-level output is at most |distinct QI tuples| rows, the
same cardinality any anonymization pass must materialize anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str | Column],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """Per-equivalence-class audit: group by the quasi-identifier columns
    and emit class_size, l_diversity (distinct sensitive values), and the
    pass/fail booleans ``k_anonymous`` (class_size >= k) and ``l_diverse``.

    Rows in classes failing either bound are the ones an anonymizer must
    suppress or generalize before the table can be released.
    """
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(sensitive_col).alias("l_diversity"),
        (F.count(F.lit(1)) >= k).alias("k_anonymous"),
        (F.countDistinct(sensitive_col) >= l_div).alias("l_diverse"),
    )


def generalize_to_k(
    df: DataFrame,
    levels: list[dict[str, str]],
    k: int = 5,
    level_col: str = "lvl",
) -> DataFrame:
    """Local-recoding generalization ladder: records in quasi-identifier
    classes smaller than ``k`` are coarsened to the next generalization
    level; records still failing after the last level are SUPPRESSED
    (all quasi-identifiers NULLed, the implicit final rung).

    ``levels[i]`` maps each output QI name to a PRE-COMPUTED column on
    ``df`` holding that QI at generalization level i (all levels share
    the output names and must be type-compatible — e.g. nation-key
    string → region-name string). Precomputing keeps hierarchy lookups
    (dimension joins, bucket arithmetic) out of the ladder loop.

    Semantics (deterministic): classes are keyed (level, QI...) — a
    level-1 class never absorbs rows that already passed at level 0,
    and its size is counted over promoted rows only (standard local
    recoding: better utility than full-domain recoding, at the cost of
    mixed granularity in the output). Every emitted class either has
    >= k members or is the suppressed class.

    Scale shape: L iterations, each ONE grouped count (class-count
    sized) broadcast-joined back on the QI key — the record frame never
    shuffles; NULL QI values never match the size table (plain
    equality), so NULL-keyed records fail the bound and promote rather
    than pooling into a fake class.
    """
    if not levels:
        raise ValueError("need at least one generalization level")
    qi_names = list(levels[0])
    if any(list(lv) != qi_names for lv in levels):
        raise ValueError("every level must define the same QI names")

    cur = df.withColumn(level_col, F.lit(0)).withColumns(
        {q: F.col(levels[0][q]) for q in qi_names}
    )
    for i in range(len(levels)):
        sizes = (
            cur.filter(F.col(level_col) == i)
            .groupBy(*qi_names)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        joined = cur.join(F.broadcast(sizes), on=qi_names, how="left")
        failing = (F.col(level_col) == i) & ~F.coalesce(
            F.col("__n") >= k, F.lit(False)
        )
        if i + 1 < len(levels):
            nxt = levels[i + 1]
            new_qi = {
                q: F.when(failing, F.col(nxt[q])).otherwise(F.col(q))
                for q in qi_names
            }
        else:  # suppression rung
            new_qi = {
                q: F.when(failing, F.lit(None).cast(dict(cur.dtypes)[q]))
                .otherwise(F.col(q))
                for q in qi_names
            }
        cur = (
            joined.withColumns(new_qi)
            .withColumn(
                level_col,
                F.when(failing, F.lit(i + 1)).otherwise(F.col(level_col)),
            )
            .drop("__n")
        )
    return cur
