"""Round tooling (tools/rotate_priority.py)."""

from __future__ import annotations

import pytest

import json
import sys


import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.smoke
def test_load_latest_green_tracks_round_and_requires_all_three(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from rotate_priority import load_latest_green

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "good": {"rows_match": True, "schema_match": True,
                 "hash_match": True},
        "rows_only": {"rows_match": True, "schema_match": True,
                      "hash_match": False},
        "errored": {"rows_match": False, "schema_match": False,
                    "hash_match": False, "err": "boom"},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "good2": {"rows_match": True, "schema_match": True,
                  "hash_match": True},
        # a later green supersedes an earlier failure
        "errored": {"rows_match": True, "schema_match": True,
                    "hash_match": True},
    }))
    got = load_latest_green(str(tmp_path))
    # rows-only never counts as green; the vintage is the LATEST green
    # round, which is what the staleness rotation sorts by (the r8
    # ledger drift came from narrating this instead of recomputing it)
    assert got == {"good": 1, "good2": 2, "errored": 2}


def test_registry_priority_is_exactly_the_recomputed_stalest_50():
    """The DRIVER_PRIORITY tuple must equal the tool's recomputation
    from the CORRECTNESS files: ROUND_TOUCHED queries first (r13,
    ADVICE — rewritten paths must land in the external sample), then
    never-checked, then checked ones by (latest green round,
    registration order). Keeping this pinned prevents the ledger from
    drifting from reality again."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    sys.path.insert(0, REPO)
    from rotate_priority import load_latest_green, pick_priority

    from datalakeingestion_spark.plans.registry import (
        DRIVER_PRIORITY,
        REGISTRY,
        ROUND_TOUCHED,
        _ensure_loaded,
    )

    _ensure_loaded()
    names = list(REGISTRY)
    latest = load_latest_green(REPO)
    assert DRIVER_PRIORITY == tuple(
        pick_priority(names, latest, ROUND_TOUCHED)
    )
    # every touched name must really exist in the registry (a typo here
    # silently shrinks the force-included head)
    missing = [n for n in ROUND_TOUCHED if n not in REGISTRY]
    assert missing == []
