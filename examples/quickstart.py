"""Quickstart: the three ways to use the engine.

Run from the repo root: python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalakeingestion_spark.api import open_session
from datalakeingestion_spark.operators import curate, latest_rows, minhash_near_duplicates

SF = "/root/testdata/sf0.001"

# 1. SQL over the registered tables (the engine as a query layer)
spark = open_session(SF)
spark.sql(
    """
    SELECT l_returnflag, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY l_returnflag ORDER BY revenue DESC
    """
).show()

# 2. Operator library (latest-row dedup — the reference's signature view)
events = spark.table("events")
latest_rows(events, ["user_id"], "ts", ["event_id"]).show(5)

# 3. LLM-data pipeline (near-dedup + curation over documents)
docs = spark.table("documents")
minhash_near_duplicates(docs, threshold=0.9).show(5)
print("curated docs:", curate(docs).count(), "/", docs.count())
