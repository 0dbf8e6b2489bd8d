"""Bare-session driver mimic — the definitive pre-round correctness gate.

Replays what the external correctness driver does: import
``__spark_entry__`` into a BARE SparkSession (none of session.py's tuned
confs — this is what catches conf-dependency bugs like the
nanosecond-parquet flag), run each exposed query at sf0.01, run its
DuckDB oracle over the same parquet, canonicalize both (sort columns by
name, normalize dtypes, sort rows) and compare values exactly.

Usage:
    python tools/driver_mimic.py            # first 50 (the driver's sample)
    python tools/driver_mimic.py --all      # full registry
    python tools/driver_mimic.py q1 q2 ...  # named queries
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

SF_DIR = os.environ.get("MIMIC_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = SparkSession.builder.master("local[8]").getOrCreate()  # BARE
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    from conftest import canonicalize

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, osql = e.queries(), e.oracle_sql()
    args = sys.argv[1:]
    if args == ["--all"]:
        names = list(qs)
    elif args:
        names = args
    else:
        names = list(qs)[:50]

    t_start = time.time()
    failures = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            a = canonicalize(qs[name](spark, SF_DIR).toPandas())
            if name in osql:
                b = canonicalize(con.execute(osql[name]).df())
                ok = a.equals(b)
                detail = f"{len(a)} vs {len(b)} rows"
            else:
                ok = len(a) >= 0
                detail = f"{len(a)} rows (rows-only)"
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"ERROR {type(exc).__name__}: {exc}"[:200]
        status = "ok " if ok else "FAIL"
        print(
            f"[{i + 1}/{len(names)}] {status} {name}: {detail} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )
        if not ok:
            failures.append(name)
    print(
        f"\n{len(names) - len(failures)}/{len(names)} match in "
        f"{time.time() - t_start:.0f}s"
    )
    if failures:
        print("FAILURES:", failures)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
