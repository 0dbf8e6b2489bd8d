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
