"""Suggest the next round's DRIVER_PRIORITY.

The external correctness driver hash-checks the FIRST 50 exposed
queries each round (see plans/registry.py).  This tool diffs every
CORRECTNESS_r*.json against the live registry and prints, in
registration order:

- queries NEVER green-checked by the driver (the rotation candidates);
- queries already green (safe to rotate out);
- a ready-to-paste 50-name tuple preferring never-checked queries.

Usage:  python tools/rotate_priority.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def load_green(repo: str) -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return green


def main(repo: str) -> int:
    sys.path.insert(0, repo)
    from datalakeingestion_spark.plans.registry import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    names = list(REGISTRY)
    green = load_green(repo)
    never = [n for n in names if n not in green]
    done = [n for n in names if n in green]
    print(f"registry: {len(names)}  driver-green ever: {len(done)}  "
          f"never-checked: {len(never)}")
    print("\n# never driver-checked (rotation candidates, registration order):")
    for n in never:
        print(f"  {n}")
    pick = (never + done)[:50]
    print("\n# suggested DRIVER_PRIORITY (paste into plans/registry.py):")
    print("DRIVER_PRIORITY: tuple[str, ...] = (")
    for n in pick:
        print(f'    "{n}",')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else os.getcwd()))
