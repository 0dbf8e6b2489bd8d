"""Crash-matrix fault injection for the staged-commit ingestion protocol.

The existing orphan tests (tests/test_pipeline.py) hand-write the log
state a crash would leave. This matrix instead crashes the REAL code
path — one injected failure per externally-observable protocol step —
and asserts the single recovery invariant the protocol promises
(ingest/pipeline.py::_cleanup_orphans): after the crashed run, a plain
retry (which runs crash recovery first) plus a catch-up run converge to
EXACTLY the source — no duplicate rows, no lost rows, no stray files —
and the run log closes the crashed batch.

Steps covered, in protocol order:
  staging-write    crash while the batch parquet is being staged
  before-loaded    staged OK, crash writing the LOADED log row
  before-move      LOADED row written, crash before any file moves
  mid-move         crash halfway through the per-file rename loop
  staging-cleanup  all files moved, crash deleting the staging dir
  before-success   validation passed, crash writing the SUCCESS row

mid-move is the reason the LOADED row lists destinations BEFORE the
move: a half-moved batch is indistinguishable from a fully-moved one
without that list, and recovery must delete the moved half AND the
unmoved (still-staged) half.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import datalakeingestion_spark.ingest.pipeline as pipeline_mod
from datalakeingestion_spark.config.partition_spec import PartitionSpec
from datalakeingestion_spark.ingest.pipeline import IncrementalIngestJob
from datalakeingestion_spark.ingest.watermark import (
    STATUS_LOADED,
    STATUS_SUCCESS,
    ExecutionLog,
)
from datalakeingestion_spark.sources.fixtures import load_table

from .conftest import SF_SMALL

MID = "2024-01-15 00:00:00"


def _job(spark, events, tmp_path):
    # YYYYMMDD partitioning -> ~14 partition dirs in the first window, so
    # the mid-move case genuinely strands a moved half and a staged half
    return IncrementalIngestJob(
        spark=spark,
        ingestion_id=1,
        source=events,
        delta_field="ts",
        target_location=str(tmp_path / "lake" / "events"),
        log=ExecutionLog(spark, str(tmp_path / "log")),
        partition_spec=PartitionSpec("ts", "time-based", "YYYYMMDD"),
        end_value_cap=MID,
    )


def _inject(mp, step):
    """Arm one crash point inside the pipeline module."""
    if step == "staging-write":
        real = pipeline_mod._list_files  # first call is the staged listing

        def boom(spark, path):
            raise RuntimeError("injected: staging write/listing")

        mp.setattr(pipeline_mod, "_list_files", boom)
    elif step in ("before-loaded", "before-success"):
        status = {
            "before-loaded": STATUS_LOADED,
            "before-success": STATUS_SUCCESS,
        }[step]
        real = ExecutionLog.append

        def boom(self, ingestion_id, st, **kw):
            if st == status:
                raise RuntimeError(f"injected: log append {st}")
            return real(self, ingestion_id, st, **kw)

        mp.setattr(ExecutionLog, "append", boom)
    elif step == "before-move":

        def boom(spark, moves):
            raise RuntimeError("injected: before move")

        mp.setattr(pipeline_mod, "_move_files", boom)
    elif step == "mid-move":
        real = pipeline_mod._move_files

        def boom(spark, moves):
            assert len(moves) >= 2, "fixture must stage multiple files"
            real(spark, moves[: len(moves) // 2])
            raise RuntimeError("injected: mid move")

        mp.setattr(pipeline_mod, "_move_files", boom)
    elif step == "staging-cleanup":
        real = pipeline_mod._delete_dir

        def boom(spark, path):
            if ".staging-" in path:
                raise RuntimeError("injected: staging cleanup")
            return real(spark, path)

        mp.setattr(pipeline_mod, "_delete_dir", boom)
    else:  # pragma: no cover
        raise ValueError(step)


@pytest.mark.parametrize(
    "step",
    [
        "staging-write",
        "before-loaded",
        "before-move",
        "mid-move",
        "staging-cleanup",
        "before-success",
    ],
)
def test_crash_then_retry_converges(spark, tmp_path, step):
    events = load_table(spark, SF_SMALL, "events")

    with pytest.MonkeyPatch.context() as mp:
        _inject(mp, step)
        with pytest.raises(RuntimeError, match="injected"):
            _job(spark, events, tmp_path).run()

    # retry with the injection removed: recovery runs first, then the
    # window is re-pulled; a catch-up run ingests the rest
    r2 = _job(spark, events, tmp_path).run()
    assert r2.status == STATUS_SUCCESS
    job3 = _job(spark, events, tmp_path)
    job3.end_value_cap = None
    assert job3.run().status == STATUS_SUCCESS

    lake = spark.read.parquet(job3.target_location)
    n_src = events.count()
    assert lake.count() == n_src  # no duplicates survived recovery
    assert lake.select("event_id").distinct().count() == n_src  # no loss
    # no stray staging dirs left behind
    strays = [
        d
        for d in os.listdir(job3.target_location)
        if d.startswith(".staging-")
    ]
    assert strays == []
    # the crashed batch is closed in the log: the run after the crash saw
    # it as open iff anything observable happened before the crash
    if step in ("before-move", "mid-move", "staging-cleanup",
                "before-success"):
        closed = job3.log.read().filter(
            F.col("reason_code") == "orphaned-batch-cleaned"
        )
        assert closed.count() == 1
    elif step in ("staging-write", "before-loaded"):
        closed = job3.log.read().filter(
            F.col("reason_code") == "orphaned-staging-cleaned"
        )
        assert closed.count() == 1


def test_mid_move_leaves_recoverable_split(spark, tmp_path):
    """White-box check that the mid-move case actually exercises the
    half-moved state (some destinations present, staging non-empty) —
    otherwise the matrix's worst case silently degenerates."""
    events = load_table(spark, SF_SMALL, "events")
    seen = {}

    with pytest.MonkeyPatch.context() as mp:
        real = pipeline_mod._move_files

        def boom(sp, moves):
            real(sp, moves[: len(moves) // 2])
            seen["moved"] = [d for _, d in moves[: len(moves) // 2]]
            seen["stranded"] = [s for s, _ in moves[len(moves) // 2:]]
            raise RuntimeError("injected: mid move")

        mp.setattr(pipeline_mod, "_move_files", boom)
        with pytest.raises(RuntimeError):
            _job(spark, events, tmp_path).run()

    assert seen["moved"] and seen["stranded"]
    moved_local = [p.removeprefix("file:") for p in seen["moved"]]
    stranded_local = [p.removeprefix("file:") for p in seen["stranded"]]
    assert all(os.path.exists(p) for p in moved_local)
    assert all(os.path.exists(p) for p in stranded_local)

    r2 = _job(spark, events, tmp_path).run()
    assert r2.status == STATUS_SUCCESS
    # the half-moved originals were cleaned, then re-pulled fresh
    lake = spark.read.parquet(str(tmp_path / "lake" / "events"))
    assert lake.count() == events.filter(F.col("ts") <= MID).count()
