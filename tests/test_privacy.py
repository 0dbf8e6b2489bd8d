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


# ---------------------------------------------------------------------------
# generalize_to_k
# ---------------------------------------------------------------------------

from datalakeingestion_spark.operators.privacy import generalize_to_k  # noqa: E402


def _ladder_df(spark):
    # fine = city, coarse = country; k=2
    rows = [
        # city A x2 -> passes at level 0
        ("A", "X", 1),
        ("A", "X", 2),
        # cities B and C are singletons in country X -> together they pass
        # at level 1
        ("B", "X", 3),
        ("C", "X", 4),
        # city D singleton in country Y, alone after promotion -> suppressed
        ("D", "Y", 5),
    ]
    return spark.createDataFrame(rows, "city string, country string, id int")


def test_ladder_promotes_then_suppresses(spark):
    out = generalize_to_k(
        _ladder_df(spark), [{"qi": "city"}, {"qi": "country"}], k=2
    )
    got = {r["id"]: (r["lvl"], r["qi"]) for r in out.collect()}
    assert got == {
        1: (0, "A"),
        2: (0, "A"),
        3: (1, "X"),
        4: (1, "X"),
        5: (2, None),  # suppressed
    }


def test_every_emitted_class_passes_k_or_is_suppressed(spark):
    out = generalize_to_k(
        _ladder_df(spark), [{"qi": "city"}, {"qi": "country"}], k=2
    )
    classes = out.groupBy("lvl", "qi").count().collect()
    for r in classes:
        assert r["qi"] is None or r["count"] >= 2, r


def test_null_qi_rows_promote_not_pool(spark):
    # two NULL-city rows do NOT form a size-2 class at level 0 (NULL
    # never matches the size table) — they promote and pass at country
    rows = [(None, "X", 1), (None, "X", 2)]
    df = spark.createDataFrame(rows, "city string, country string, id int")
    out = generalize_to_k(df, [{"qi": "city"}, {"qi": "country"}], k=2)
    assert {(r["lvl"], r["qi"]) for r in out.collect()} == {(1, "X")}


def test_randomized_ladder_matches_python_reference(spark):
    # seeded random batch, one Spark job, record-exact comparison with a
    # pure-Python local-recoding simulation
    import random

    rng = random.Random(9)
    rows = [
        (i, str(rng.randrange(40)), None) for i in range(200)
    ]
    rows = [(i, fine, str(int(fine) // 8)) for i, fine, _ in rows]
    k = 3

    # python reference: level sizes over (level, qi), promoted rows only
    from collections import Counter

    lvl = {i: 0 for i, _, _ in rows}
    qi = {i: fine for i, fine, _ in rows}
    coarse = {i: c for i, _, c in rows}
    for level in (0, 1):
        sizes = Counter(qi[i] for i in lvl if lvl[i] == level)
        for i in lvl:
            if lvl[i] == level and sizes[qi[i]] < k:
                lvl[i] = level + 1
                qi[i] = coarse[i] if level == 0 else None

    df = spark.createDataFrame(rows, "id int, fine string, coarse string")
    out = generalize_to_k(df, [{"qi": "fine"}, {"qi": "coarse"}], k=k)
    got = {r["id"]: (r["lvl"], r["qi"]) for r in out.collect()}
    assert got == {i: (lvl[i], qi[i]) for i in lvl}


def test_level_name_mismatch_rejected(spark):
    with pytest.raises(ValueError, match="same QI names"):
        generalize_to_k(_ladder_df(spark), [{"qi": "city"}, {"other": "country"}])
    with pytest.raises(ValueError, match="at least one"):
        generalize_to_k(_ladder_df(spark), [])
