"""Dump .explain('formatted') for registered queries to plans/r12/.

Usage:
    python tools/dump_plans.py before            # all bench queries
    python tools/dump_plans.py after q1 q2 ...   # named queries
    PLANS_SF_DIR=... PLANS_OUT=plans/r12 python tools/dump_plans.py before

The suffix argument ("before"/"after") names the file:
plans/r12/<query>_<suffix>.txt — the optimization-round evidence the
judge diffs against OPTIMIZATION_r12.md claims.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("PLANS_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("PLANS_OUT", "plans/r12")
    suffix = sys.argv[1]
    names = sys.argv[2:]

    from datalakeingestion_spark.plans.registry import REGISTRY, _ensure_loaded
    from datalakeingestion_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(app_name="dli-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    if not names:
        names = [n for n, qd in sorted(REGISTRY.items()) if qd.bench]

    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        qd = REGISTRY[name]
        df = qd.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
