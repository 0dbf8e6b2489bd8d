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
    STATUS_STARTED,
    STATUS_SUCCESS,
    STATUS_VALIDATION_FAILURE,
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


def _id_job(spark, source, tmp_path, ingestion_id, target="events"):
    return IncrementalIngestJob(
        spark=spark,
        ingestion_id=ingestion_id,
        source=source,
        delta_field="ts",
        target_location=str(tmp_path / "lake" / target),
        log=ExecutionLog(spark, str(tmp_path / "log")),
        partition_spec=PartitionSpec("ts", "time-based", "YYYYMMDD"),
        end_value_cap=MID,
    )


@pytest.mark.smoke
def test_concurrent_writers_shared_log_both_commit(spark, tmp_path):
    """Two pipelines with distinct ingestion ids appending SIMULTANEOUSLY
    through one shared execution log (the reference shape: one log, many
    tables): unique per-append batch dirs must yield both commits with no
    lost or duplicated log entries, and each id's watermark resolves
    independently afterwards."""
    import threading

    from datalakeingestion_spark.ingest.watermark import resolve_watermark

    events = load_table(spark, SF_SMALL, "events")
    a = _id_job(spark, events, tmp_path, 1, target="ev_a")
    b = _id_job(spark, events, tmp_path, 2, target="ev_b")

    results, errors = {}, {}

    def run(tag, job):
        try:
            results[tag] = job.run()
        except Exception as exc:  # pragma: no cover - failure detail
            errors[tag] = exc

    ts = [
        threading.Thread(target=run, args=("a", a)),
        threading.Thread(target=run, args=("b", b)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    assert results["a"].status == STATUS_SUCCESS
    assert results["b"].status == STATUS_SUCCESS

    n = events.filter(F.col("ts") <= MID).count()
    assert spark.read.parquet(a.target_location).count() == n
    assert spark.read.parquet(b.target_location).count() == n

    # log integrity: exactly one STARTED/LOADED/SUCCESS row per id, no
    # interleaving corruption, and per-id watermarks advance independently
    log = ExecutionLog(spark, str(tmp_path / "log")).read().collect()
    for ing_id in (1, 2):
        by_status = {}
        for r in log:
            if r["lake_ingestion_id"] == ing_id:
                by_status.setdefault(r["execution_status"], []).append(r)
        assert len(by_status[STATUS_STARTED]) == 1
        assert len(by_status[STATUS_LOADED]) == 1
        assert len(by_status[STATUS_SUCCESS]) == 1
    # each id resolves to ITS OWN committed end (bumped +1µs), never the
    # other id's row and never the cold-start default
    wm_a = resolve_watermark(a.log, 1, False)
    wm_b = resolve_watermark(b.log, 2, False)
    assert wm_a == wm_b
    assert wm_a > results["a"].end_value
    assert wm_a[:19] == results["a"].end_value[:19]


def test_concurrent_writers_one_target_conflict_detected(spark, tmp_path):
    """Two writers racing on ONE target with overlapping delta ranges is
    a duplicate-producing misconfiguration — the commit protocol must
    refuse it, not corrupt the lake. Deterministic interleaving: writer B
    commits fully inside writer A's move-to-validate window. B's count
    validation then sees A's already-moved rows (target > source), so B
    rolls back ITS OWN files and closes its batch as a validation
    failure; A's commit lands intact. Lake afterwards == exactly one
    writer's rows — never a merge of both, never a torn state."""
    events = load_table(spark, SF_SMALL, "events")
    a = _id_job(spark, events, tmp_path, 1)
    b = _id_job(spark, events, tmp_path, 2)

    state = {"fired": False}
    real_move = pipeline_mod._move_files

    def hijack(sp, moves):
        real_move(sp, moves)
        if not state["fired"]:
            state["fired"] = True
            state["b_result"] = b.run()

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(pipeline_mod, "_move_files", hijack)
        r_a = a.run()

    r_b = state["b_result"]
    assert r_a.status == STATUS_SUCCESS
    assert r_b.status == STATUS_VALIDATION_FAILURE

    # lake holds exactly A's batch: B's rollback removed every B file
    lake = spark.read.parquet(a.target_location)
    n = events.filter(F.col("ts") <= MID).count()
    assert lake.count() == n
    assert lake.select("event_id").distinct().count() == n
    for f in r_b.files:
        assert not os.path.exists(f.removeprefix("file:")), f
    for f in r_a.files:
        assert os.path.exists(f.removeprefix("file:")), f
    # no staging debris from either writer
    strays = [
        d
        for d in os.listdir(a.target_location)
        if d.startswith(".staging-")
    ]
    assert strays == []
    # B's batch is CLOSED (validation-failure row) — a later B run must
    # not treat it as an orphan and delete A's files
    assert (
        b.log.latest_entry(2, STATUS_VALIDATION_FAILURE) is not None
    )
