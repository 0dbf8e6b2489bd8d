"""datalakeingestion_spark — a PySpark-native analytics/ingestion engine.

A ground-up re-expression of the capabilities of the reference
`simbu175/datalakeingestion` (an incremental MySQL→S3-parquet ingestion
framework, see SURVEY.md) as an idiomatic Spark library:

- ``session``     — SparkSession factory tuned for the fixture/bench harness.
- ``sources``     — parquet fixture loader, JDBC incremental source codegen.
- ``config``      — control-table schema, partition-spec parsing/validation.
- ``operators``   — relational vocabulary (latest-row dedup, top-k, coalesce
                    range filters, reconciliation) + LLM-data operators
                    (exact/MinHash/SimHash dedup, similarity search, text
                    analysis).
- ``functions``   — scalar/column helpers (date buckets, id buckets, clamps,
                    portable hashes).
- ``ingest``      — watermark manager, incremental pipeline, partitioned
                    sink, validation, latest-row views (the reference's
                    whole dataflow, Spark-first).
- ``plans``       — the query registry surfaced through ``__spark_entry__``.
"""

__version__ = "0.1.0"
