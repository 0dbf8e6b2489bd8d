#!/usr/bin/env python3
"""Re-paste DRIVER_PRIORITY in plans/registry.py from rotate_priority's
recomputation — the mechanical half of the round-boundary re-sync."""

import re
import subprocess
import sys

REG = "datalakeingestion_spark/plans/registry.py"

out = subprocess.run(
    [sys.executable, "tools/rotate_priority.py"],
    capture_output=True,
    text=True,
    check=True,
).stdout
lines = out.splitlines()
i = next(j for j, l in enumerate(lines) if l.startswith("DRIVER_PRIORITY"))
new_tuple = "\n".join(lines[i:]).rstrip() + "\n"
if not new_tuple.rstrip().endswith(")"):
    raise SystemExit("tool output did not end with a closing paren")

src = open(REG).read()
pat = re.compile(
    r"^DRIVER_PRIORITY: tuple\[str, \.\.\.\] = \(\n(?:.*\n)*?^\)\n",
    re.MULTILINE,
)
if not pat.search(src):
    raise SystemExit("DRIVER_PRIORITY tuple not found")
open(REG, "w").write(pat.sub(new_tuple, src, count=1))
print("pasted", sum(1 for l in new_tuple.splitlines() if '",' in l), "entries")
