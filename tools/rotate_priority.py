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


def load_latest_green(repo: str) -> dict[str, int]:
    """name -> round of the LATEST green external check (hash match)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
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
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def pick_priority(
    names: list[str],
    latest: dict[str, int],
    touched: tuple[str, ...] = (),
) -> list[str]:
    """The 50-name driver window: round-TOUCHED queries first (their
    code paths changed — an external green on the final tree is worth
    more than rotation coverage; ADVICE r12 item 3), then never-checked,
    then stalest by (latest green round, registration order)."""
    order = {n: i for i, n in enumerate(names)}
    head = [n for n in names if n in set(touched)]
    rest = [n for n in names if n not in set(head)]
    never = [n for n in rest if n not in latest]
    done = sorted(
        (n for n in rest if n in latest),
        key=lambda n: (latest[n], order[n]),
    )
    return (head + never + done)[:50]


def main(repo: str) -> int:
    sys.path.insert(0, repo)
    from datalakeingestion_spark.plans.registry import (
        REGISTRY,
        ROUND_TOUCHED,
        _ensure_loaded,
    )

    _ensure_loaded()
    names = list(REGISTRY)
    order = {n: i for i, n in enumerate(names)}
    latest = load_latest_green(repo)
    never = [n for n in names if n not in latest]
    # stalest first: sort the checked queries by (latest green round,
    # registration order) — narrating vintage from memory instead of
    # recomputing it is exactly the r8 ledger-drift bug
    done = sorted(
        (n for n in names if n in latest),
        key=lambda n: (latest[n], order[n]),
    )
    print(f"registry: {len(names)}  driver-green ever: {len(done)}  "
          f"never-checked: {len(never)}  round-touched: "
          f"{len([n for n in names if n in set(ROUND_TOUCHED)])}")
    hist: dict[int, int] = {}
    for n in done:
        hist[latest[n]] = hist.get(latest[n], 0) + 1
    print("vintage histogram (latest green round -> queries): "
          + ", ".join(f"r{r}: {c}" for r, c in sorted(hist.items())))
    print("\n# never driver-checked (rotation candidates, registration order):")
    for n in never:
        print(f"  {n}")
    pick = pick_priority(names, latest, ROUND_TOUCHED)
    print("\n# suggested DRIVER_PRIORITY (paste into plans/registry.py):")
    touched = set(ROUND_TOUCHED)
    print("DRIVER_PRIORITY: tuple[str, ...] = (")
    for n in pick:
        tag = (
            f"last green r{latest[n]}" if n in latest else "never checked"
        )
        if n in touched:
            tag = "ROUND-TOUCHED; " + tag
        print(f'    "{n}",  # {tag}')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else os.getcwd()))
