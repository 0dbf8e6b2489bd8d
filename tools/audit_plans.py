"""Registry-wide physical-plan audit for the optimization round.

For EVERY registered query, build the plan at a small SF and count the
scale-relevant node types: Exchanges, joins by strategy, Python-boundary
nodes (BatchEvalPython = row-at-a-time — should be zero everywhere),
cartesians, and global (partition-less) windows/sorts. Output: one TSV
row per query, worst offenders first.

Usage: python tools/audit_plans.py [sf_dir] > audit.tsv
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COUNTS = [
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "Window",
    "Generate",
    "InMemoryTableScan",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded
    from datalakeingestion_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(app_name="dli-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name, qd in sorted(REGISTRY.items()):
        try:
            df = qd.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # audit must not die on one query
            rows.append((name, {"ERROR": str(exc)[:80]}))
            continue
        counts = {c: plan.count(f"{c} (") for c in COUNTS}
        rows.append((name, counts))
        # free cached plans between queries so the audit session stays flat
        spark.catalog.clearCache()

    hdr = ["query", *COUNTS]
    print("\t".join(hdr))
    for name, counts in rows:
        if "ERROR" in counts:
            print(f"{name}\tERROR: {counts['ERROR']}")
            continue
        print("\t".join([name, *[str(counts[c]) for c in COUNTS]]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
