"""Contract-schema enforcement (ingest/schema_registry.py): pin, evolve
additively, abort loudly on drops/type changes — at WRITE time, before a
byte lands in the lake."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.config.partition_spec import PartitionSpec
from datalakeingestion_spark.ingest.pipeline import IncrementalIngestJob, read_lake
from datalakeingestion_spark.ingest.schema_registry import (
    SchemaDriftError,
    SchemaRegistry,
)
from datalakeingestion_spark.ingest.watermark import STATUS_SUCCESS, ExecutionLog
from datalakeingestion_spark.sources.fixtures import load_table

from .conftest import SF_SMALL

MID = "2024-01-15 00:00:00"


def _job(spark, source, tmp_path, registry, **kw):
    defaults = dict(
        spark=spark,
        ingestion_id=1,
        source=source,
        delta_field="ts",
        target_location=str(tmp_path / "lake" / "events"),
        log=ExecutionLog(spark, str(tmp_path / "log")),
        partition_spec=PartitionSpec("ts", "time-based", "YYYYMM"),
        schema_registry=registry,
    )
    defaults.update(kw)
    return IncrementalIngestJob(**defaults)


def test_contract_pins_evolves_and_rejects(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    reg = SchemaRegistry(spark, str(tmp_path / "schemas"))

    # first run pins version 0
    r1 = _job(spark, events, tmp_path, reg, end_value_cap=MID).run()
    assert r1.status == STATUS_SUCCESS
    d0 = reg.check_and_evolve(1, events.schema)
    assert d0.version == 0 and not d0.evolved

    # additive nullable column → contract evolves to v1, append proceeds
    evolved = events.withColumn("quality", F.round(F.col("value") * 2, 3))
    r2 = _job(spark, evolved, tmp_path, reg).run()
    assert r2.status == STATUS_SUCCESS
    assert reg.check_and_evolve(1, evolved.schema).version == 1
    lake = read_lake(spark, str(tmp_path / "lake" / "events"))
    assert "quality" in lake.columns and lake.count() == events.count()

    # dropped column → loud failure BEFORE any write
    dropped = evolved.drop("props")
    with pytest.raises(SchemaDriftError, match="dropped contract column"):
        _job(spark, dropped, tmp_path, reg).run()

    # type change → loud failure naming the column and both types
    retyped = evolved.withColumn("value", F.col("value").cast("string"))
    with pytest.raises(SchemaDriftError, match="value: double -> string"):
        _job(spark, retyped, tmp_path, reg).run()

    # the lake is untouched by the two rejected runs
    assert read_lake(spark, str(tmp_path / "lake" / "events")).count() == events.count()


def test_contract_versions_are_immutable_files(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events")
    reg = SchemaRegistry(spark, str(tmp_path / "schemas"))
    reg.check_and_evolve(7, events.schema)
    # same schema re-checked: same version, no new file
    d = reg.check_and_evolve(7, events.schema)
    assert d.version == 0 and not d.evolved
    latest = reg._latest(7)
    assert latest is not None and latest[0] == 0
    assert latest[1] == events.schema
