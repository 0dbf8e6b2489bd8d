"""Round tooling (tools/rotate_priority.py)."""

from __future__ import annotations

import json
import sys


def test_load_green_requires_all_three_checks(tmp_path):
    sys.path.insert(0, "/root/repo/tools")
    from rotate_priority import load_green

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
    got = load_green(str(tmp_path))
    assert got == {"good", "good2", "errored"}
