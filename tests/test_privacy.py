"""k-anonymity / l-diversity audit tests (operators/privacy.py)."""

from __future__ import annotations

import pytest

from datalakeingestion_spark.operators.privacy import k_anonymity_audit


def _df(spark):
    rows = [
        # class (10, 'a'): 3 records, 2 distinct sensitive values
        (10, "a", "S1"),
        (10, "a", "S1"),
        (10, "a", "S2"),
        # class (10, 'b'): 1 record -> fails both bounds
        (10, "b", "S1"),
        # class (NULL, 'a'): NULL quasi-identifiers form ONE class
        (None, "a", "S1"),
        (None, "a", "S2"),
    ]
    return spark.createDataFrame(rows, "qi1 int, qi2 string, sens string")


@pytest.mark.smoke
def test_class_bounds_and_null_grouping(spark):
    out = {
        (r["qi1"], r["qi2"]): (
            r["class_size"],
            r["l_diversity"],
            r["k_anonymous"],
            r["l_diverse"],
        )
        for r in k_anonymity_audit(
            _df(spark), ["qi1", "qi2"], "sens", k=3, l_div=2
        ).collect()
    }
    assert out == {
        (10, "a"): (3, 2, True, True),
        (10, "b"): (1, 1, False, False),
        (None, "a"): (2, 2, False, True),
    }


def test_suppression_set_is_the_failing_classes(spark):
    audit = k_anonymity_audit(_df(spark), ["qi1", "qi2"], "sens", k=3, l_div=2)
    failing = audit.filter(~(audit.k_anonymous & audit.l_diverse))
    # rows needing suppression/generalization = members of failing classes
    assert failing.count() == 2
