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


@pytest.mark.smoke
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


def test_runner_enforces_contracts_per_table(spark, tmp_path):
    """run_groups with schema_registry_path: a drifted table FAILS (logged,
    non-fatal) while healthy tables keep ingesting."""
    from datalakeingestion_spark.ingest.watermark import STATUS_FAILED
    from datalakeingestion_spark.runner import run_groups

    from datalakeingestion_spark.config.control import CONTROL_SCHEMA

    events = load_table(spark, SF_SMALL, "events")
    src_ok = str(tmp_path / "src_ok")
    events.write.parquet(src_ok)

    def control_for(src):
        row = (
            1, "parquet-table", src, "db1", "t1", "ts", "", 0, 1, "NULL",
            "c", "g", "s3", str(tmp_path / "lake" / "t1"), "", "vdb",
            "t1_lv", 0, "()", "dag_a", "2024-01-01",
        )
        return spark.createDataFrame([row], CONTROL_SCHEMA)

    reg_path = str(tmp_path / "schemas")
    rep1 = run_groups(
        spark, control_for(src_ok), str(tmp_path / "state"),
        schema_registry_path=reg_path, register_views=False,
    )
    assert rep1.results[1].status == STATUS_SUCCESS  # pins v0

    # upstream retypes the column: next run must fail loudly, not append
    src_drift = str(tmp_path / "src_drift")
    spark.read.parquet(src_ok).withColumn(
        "value", F.col("value").cast("string")
    ).write.parquet(src_drift)
    rep2 = run_groups(
        spark, control_for(src_drift), str(tmp_path / "state"),
        schema_registry_path=reg_path, register_views=False,
    )
    assert rep2.results[1].status == STATUS_FAILED
    log = ExecutionLog(spark, str(tmp_path / "state"))
    last = log.latest_entry(1)
    assert "changed column type" in last["reason_code"]
    # nothing appended by the drifted run
    assert spark.read.parquet(str(tmp_path / "lake" / "t1")).count() == events.count()


def test_concurrent_evolution_converges(spark, tmp_path):
    """Two writers evolving the same contract concurrently: the version
    file is create-no-overwrite, so one wins and the other re-validates
    against the winner — identical additions converge, incompatible ones
    still raise."""
    from concurrent.futures import ThreadPoolExecutor

    events = load_table(spark, SF_SMALL, "events")
    reg = SchemaRegistry(spark, str(tmp_path / "schemas"))
    reg.check_and_evolve(3, events.schema)  # pin v0

    evolved = events.withColumn("extra", F.lit(1.0)).schema
    with ThreadPoolExecutor(max_workers=2) as pool:
        out = list(pool.map(lambda _: reg.check_and_evolve(3, evolved), range(2)))
    # both callers end on the same version with the column present
    assert {d.version for d in out} <= {1, 2}
    latest = reg._latest(3)
    assert "extra" in [f.name for f in latest[1].fields]

    # the loser path also rejects a conflicting racer's type change
    retyped = events.withColumn("extra", F.lit("s")).schema
    with pytest.raises(SchemaDriftError):
        reg.check_and_evolve(3, retyped)


def test_concurrent_first_pin_converges(spark, tmp_path):
    """Two FIRST-TIME writers racing on the version-0 pin: create is
    no-overwrite so exactly one wins; the loser must re-validate against
    the winner's pin (not surface a raw FS error)."""
    from concurrent.futures import ThreadPoolExecutor

    events = load_table(spark, SF_SMALL, "events")
    reg = SchemaRegistry(spark, str(tmp_path / "schemas"))
    with ThreadPoolExecutor(max_workers=2) as pool:
        out = list(
            pool.map(lambda _: reg.check_and_evolve(9, events.schema), range(2))
        )
    assert all(d.version == 0 for d in out)
    latest = reg._latest(9)
    assert latest is not None and latest[0] == 0 and latest[1] == events.schema

    # loser path with an INCOMPATIBLE schema still raises drift: simulate
    # by pre-pinning then racing a retyped first-timer
    retyped = events.withColumn("value", F.col("value").cast("string")).schema
    with pytest.raises(SchemaDriftError):
        reg.check_and_evolve(9, retyped)


def test_latest_view_sees_evolved_columns(spark, tmp_path):
    """The latest-row view over an evolved lake must carry the late-added
    column (it reads via read_lake's schema merge)."""
    from datalakeingestion_spark.ingest.views import register_latest_view

    events = load_table(spark, SF_SMALL, "events")
    _job(spark, events, tmp_path, None, end_value_cap=MID).run()
    evolved = events.withColumn("quality", F.round(F.col("value") * 2, 3))
    _job(spark, evolved, tmp_path, None).run()

    view = register_latest_view(
        spark, "ev_latest_sr", str(tmp_path / "lake" / "events"),
        ["user_id"], "ts", ["event_id"],
    )
    assert "quality" in view.columns
    # latest rows all come from the post-evolution window → non-null
    assert view.filter(F.col("quality").isNull()).count() < view.count()
