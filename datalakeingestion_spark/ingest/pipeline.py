"""The incremental ingestion pipeline — the reference's core "query".

One run answers (reference: extractors/ingest_mysql_data.py:583-643, and
SURVEY.md §3.2): *"give me all rows of the source with delta ∈ (watermark,
now], typed, partitioned per the spec, appended to the lake, with
min/max/count recorded, counts validated, and the latest-row view
available."*

Spark-first design:
- the delta filter is a plan predicate (pushed into parquet/JDBC scans by
  Catalyst) instead of generated SQL text;
- chunking disappears (partitions + AQE replace the 400k/100k-row loops);
- bounds + count are captured in ONE aggregate over the delta frame
  (the reference folds per-chunk min/max lists — ingest_mysql_data.py:
  273-289 — which is exactly Spark's partial aggregation, automatic);
- the written-file list is captured for rollback on validation failure
  (reference T5 manual rollback, ingest_mysql_data.py:569-581). On a real
  deployment Delta Lake's atomic commit replaces this entirely; the
  file-list rollback is the dependency-free stand-in with the same
  semantics.

Quirks preserved for parity (SURVEY.md §4):
- coalesce watermark uses min(max(a), max(b)) as the conservative
  end_value (ingest_mysql_data.py:281-282);
- validation is skipped when a delta_field_expr is configured
  (start_ingestion.py:109,134-138);
- next start = last success end + 1s/+1 (can skip same-second commits).
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config.partition_spec import PartitionSpec
from ..operators.relational import coalesce_range_filter
from .schema_registry import SchemaRegistry
from .watermark import (
    STATUS_FAILED,
    STATUS_LOADED,
    STATUS_NO_DATA,
    STATUS_STARTED,
    STATUS_SUCCESS,
    STATUS_VALIDATION_FAILURE,
    ExecutionLog,
    resolve_watermark,
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@dataclass
class IngestResult:
    status: str
    start_value: str
    end_value: str = ""
    source_count: int = 0
    target_count: int = 0
    files: list[str] = field(default_factory=list)


def _list_files(spark: SparkSession, path: str) -> set[str]:
    """Recursive data-file listing via the Hadoop FS API (works for any
    supported scheme: file://, hdfs://, s3a://...)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = fs_path.getFileSystem(conf)
    if not fs.exists(fs_path):
        return set()
    files: set[str] = set()
    it = fs.listFiles(fs_path, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().toString()
        if not name.endswith("_SUCCESS"):
            files.add(name)
    return files


def _delete_files(spark: SparkSession, files: set[str]) -> None:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        p.getFileSystem(conf).delete(p, False)


def _delete_dir(spark: SparkSession, path: str) -> None:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).delete(p, True)


def _move_files(spark: SparkSession, moves: list[tuple[str, str]]) -> None:
    """Per-file rename (same filesystem). Parent dirs are created; an
    already-present destination means a retry already moved it — skip."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for src, dst in moves:
        sp = jvm.org.apache.hadoop.fs.Path(src)
        dp = jvm.org.apache.hadoop.fs.Path(dst)
        fs = sp.getFileSystem(conf)
        if fs.exists(dp):
            continue
        fs.mkdirs(dp.getParent())
        fs.rename(sp, dp)


def read_lake(spark: SparkSession, target_location: str) -> DataFrame:
    """Consumer read of an append-only lake zone with SCHEMA EVOLUTION.

    Incremental sources grow columns over time (the reference re-derives
    its projection from information_schema every run —
    extractors/ingest_mysql_data.py:164-200 — so a new source column
    starts appearing in new batches automatically). A plain
    ``spark.read.parquet(dir)`` infers the schema from ONE footer, so
    depending on which file wins, late-added columns silently vanish for
    every consumer. ``mergeSchema`` unions all footers: old rows surface
    the new column as NULL, which is also what the validation count and
    latest-zone merge expect.

    Footer-merge cost is metadata-scale (one footer per file, computed
    distributed); production deployments pin the contract schema in a
    catalog table instead — this is the catalog-less default that is
    never silently wrong.
    """
    return spark.read.option("mergeSchema", "true").parquet(target_location)


@dataclass
class IncrementalIngestJob:
    spark: SparkSession
    ingestion_id: int
    source: DataFrame  # already-typed source relation (JDBC/parquet/...)
    delta_field: str
    target_location: str
    log: ExecutionLog
    integer_watermark: bool = False
    # coalesce watermark: e.g. ("modified_datetime", "created_datetime") —
    # reference delta_field_expr 'coalesce(modified, created)'
    delta_expr_cols: tuple[str, ...] = ()
    partition_spec: PartitionSpec | None = None
    end_value_cap: str | None = None  # optional closed upper bound ("now")
    # materialized latest-row zone, maintained incrementally per batch
    # (merge.merge_latest) instead of the reference's read-time view
    maintain_latest: bool = False
    primary_key: tuple[str, ...] = ()
    latest_tie_breaks: tuple[str, ...] = ()
    # contract-schema enforcement (ingest/schema_registry.py): when set,
    # the SOURCE schema is validated before anything is written — additive
    # columns evolve the pinned contract, drops/type changes abort the run
    schema_registry: "SchemaRegistry | None" = None
    # "parquet" (default): staged commit + log rollback, self-contained.
    # "delta": the production ACID path — atomic append, RESTORE-based
    # validation rollback, MERGE-maintained latest zone. Package-gated on
    # delta-spark (ingest/delta_sink.py); raises loudly when absent.
    sink_format: str = "parquet"

    def _delta_col(self) -> Column:
        if self.delta_expr_cols:
            return F.coalesce(*[F.col(c) for c in self.delta_expr_cols])
        return F.col(self.delta_field)

    def _wm_lit(self, value: str) -> Column:
        if self.integer_watermark:
            return F.lit(int(value))
        # cast handles both second- and microsecond-precision strings
        return F.lit(value).cast("timestamp")

    def _delta_frame(self, start: str) -> DataFrame:
        if self.delta_expr_cols and self.end_value_cap:
            # windowed BETWEEN with the index-friendly OR prefilter (F2)
            return coalesce_range_filter(
                self.source,
                list(self.delta_expr_cols),
                self._wm_lit(start),
                self._wm_lit(self.end_value_cap),
            )
        pred = self._delta_col() >= self._wm_lit(start)
        if self.end_value_cap:
            pred = pred & (self._delta_col() <= self._wm_lit(self.end_value_cap))
        return self.source.filter(pred)

    def _bounds(self, delta: DataFrame) -> tuple[str, str, int]:
        """(min, max, count) of the delta column in ONE aggregate.

        Coalesce case: end_value = least of the per-column maxes — the
        reference's deliberate conservative watermark
        (ingest_mysql_data.py:281-282).
        """
        if self.delta_expr_cols:
            max_expr = F.least(
                *[F.max(F.col(c)) for c in self.delta_expr_cols]
            )
        else:
            max_expr = F.max(self._delta_col())
        row = delta.agg(
            F.min(self._delta_col()).alias("mn"),
            max_expr.alias("mx"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        if row["n"] == 0:
            return "", "", 0
        if self.integer_watermark:
            return str(row["mn"]), str(row["mx"]), row["n"]

        def _fmt(ts):
            # Spark TimestampType always carries microsecond precision, so
            # ALWAYS record the 6-digit fraction — even when it is .000000.
            # Dropping it for exact-second maxima would make bump_watermark
            # take the +1s path and skip rows later committed inside that
            # same sub-second window (the gap the µs bump exists to close).
            # Date watermarks (no sub-second notion) keep the bare format.
            base = ts.strftime("%Y-%m-%d %H:%M:%S")
            us = getattr(ts, "microsecond", None)
            return base if us is None else f"{base}.{us:06d}"

        return _fmt(row["mn"]), _fmt(row["mx"]), row["n"]

    def _staging_dir(self, token: str) -> str:
        # dot-prefixed → invisible to Spark/Hive lake readers while in flight
        return f"{self.target_location.rstrip('/')}/.staging-{token}"

    def _cleanup_orphans(self, rows: list) -> None:
        """Crash-recovery for the staged append (reference T5 analog).

        Every append goes through a run-private staging dir whose path is
        recorded in the STARTED row; the final file list is recorded in the
        LOADED row BEFORE files move into place. Whatever the trailing log
        record is, the crash point is therefore recoverable:

        - batch died before the move (STARTED, maybe mid-staging-write):
          delete the staging dir (never visible to readers — it is
          dot-prefixed);
        - batch died during/after the move but before the SUCCESS/
          VALIDATION row (a LOADED row exists): delete the listed final
          files (the moved ones) AND the staging dir (the unmoved ones).
          Without this, the re-pulled range would out-count the source and
          validation would fail on every retry.

        The decision is BATCH-aware, not trailing-row-aware: the runner
        appends a FAILED row when a job raises mid-commit, so the crash
        state (STARTED/LOADED) is usually NOT the trailing record. A batch
        counts as closed only by SUCCESS / VALIDATION_FAILURE / NO_DATA /
        a prior cleanup marker logged at-or-after its STARTED row; an
        exception-text FAILED row does not close it (that was the
        duplicate-on-retry window this method exists to shut).

        ``rows`` is the run's one :meth:`ExecutionLog.id_rows` snapshot
        (this method only APPENDS cleanup markers, so the snapshot stays
        valid for the watermark resolution that follows it).
        """
        started = self.log.latest_entry(
            self.ingestion_id, STATUS_STARTED, rows=rows
        )
        if started is None:
            return
        # one batch's rows — a handful, driver-side by design
        batch = [
            r for r in rows if r["insert_datetime"] >= started["insert_datetime"]
        ]
        closed = {STATUS_SUCCESS, STATUS_VALIDATION_FAILURE, STATUS_NO_DATA}
        markers = {"orphaned-staging-cleaned", "orphaned-batch-cleaned"}
        for r in batch:
            if r["execution_status"] in closed:
                return
            if (
                r["execution_status"] == STATUS_FAILED
                and (r["reason_code"] or "") in markers
            ):
                return
        loaded = max(
            (r for r in batch if r["execution_status"] == STATUS_LOADED),
            key=lambda r: r["insert_datetime"],
            default=None,
        )
        staging = started["reason_code"] or ""
        if loaded is None:
            if staging.startswith(self._staging_dir("")):
                _delete_dir(self.spark, staging)
                self.log.append(
                    self.ingestion_id,
                    STATUS_FAILED,
                    start_value=started["start_value"] or "",
                    reason_code="orphaned-staging-cleaned",
                )
            return
        try:
            files = set(json.loads(loaded["reason_code"] or "[]"))
        except ValueError:
            files = set()
        if files:
            _delete_files(self.spark, files)
        if staging.startswith(self._staging_dir("")):
            _delete_dir(self.spark, staging)
        self.log.append(
            self.ingestion_id,
            STATUS_FAILED,
            start_value=loaded["start_value"] or "",
            end_value=loaded["end_value"] or "",
            reason_code="orphaned-batch-cleaned",
        )

    def run(self) -> IngestResult:
        if self.sink_format not in ("parquet", "delta"):
            raise ValueError(f"unsupported sink_format {self.sink_format!r}")
        if self.schema_registry is not None:
            # fail BEFORE the watermark/staging machinery touches anything:
            # schema drift must not burn a STARTED log row per retry
            self.schema_registry.check_and_evolve(
                self.ingestion_id, self.source.schema
            )
        if self.sink_format == "delta":
            from .delta_sink import require_delta

            # loud before any log row burns: a misconfigured deployment
            # must not leave STARTED orphans per retry
            require_delta("IncrementalIngestJob(sink_format='delta')")
            return self._run_delta()
        # one log snapshot serves orphan cleanup AND watermark resolution
        # (cleanup only appends marker rows, never SUCCESS rows)
        log_rows = self.log.id_rows(self.ingestion_id)
        self._cleanup_orphans(log_rows)
        start = resolve_watermark(
            self.log, self.ingestion_id, self.integer_watermark, rows=log_rows
        )
        staging = self._staging_dir(uuid.uuid4().hex)
        self.log.append(
            self.ingestion_id,
            STATUS_STARTED,
            start_value=start,
            reason_code=staging,
        )

        delta = self._delta_frame(start)
        if self.partition_spec is not None:
            delta = self.partition_spec.derive(delta)

        mn, mx, n = self._bounds(delta)
        if n == 0:
            self.log.append(self.ingestion_id, STATUS_NO_DATA, start_value=start)
            return IngestResult(STATUS_NO_DATA, start)

        # The bounds pass and the write below are SEPARATE scans of the
        # source. Against a live source (JDBC), rows committed in between
        # with delta > mx would be written now yet the watermark only
        # advances to mx — the next run re-pulls them as duplicates into
        # the append-only lake. Cap the write at the observed mx so this
        # batch is exactly the rows the bounds/validation saw; later rows
        # belong to the next watermark window. (The reference's single
        # chunked pull computes bounds DURING its one scan — this is the
        # two-scan design's closing of that same contract.)
        delta = delta.filter(self._delta_col() <= self._wm_lit(mx))
        if self.delta_expr_cols:
            # mx is least(per-column maxes), so rows whose coalesce delta
            # lies in (mx, cap] were counted by _bounds but are excluded
            # from this write — recount on the capped frame so the LOADED
            # row's source_count matches the files the commit lists (the
            # excluded rows belong to the next window, not this batch).
            # Validation is skipped in coalesce mode, so nothing downstream
            # would otherwise catch the overstatement.
            n = delta.count()
            if n == 0:
                self.log.append(
                    self.ingestion_id, STATUS_NO_DATA, start_value=start
                )
                return IngestResult(STATUS_NO_DATA, start)

        # staged commit: write the batch beside the lake, record the final
        # destinations, THEN move into place — every crash point is
        # recoverable from the log (see _cleanup_orphans)
        writer = delta.write.mode("append").option("compression", "snappy")
        if self.partition_spec is not None:
            writer = writer.partitionBy(self.partition_spec.partition_column_name)
        writer.parquet(staging)
        staged = sorted(_list_files(self.spark, staging))
        target = self.target_location.rstrip("/")
        # listed paths are fully-qualified URIs (file:/..., s3a://...);
        # splice the destination around the staging path inside them
        moves = []
        for f in staged:
            i = f.find(staging)
            if i < 0:  # pragma: no cover - FS returned an unrelated path
                raise RuntimeError(f"staged file {f} outside {staging}")
            moves.append((f, f[:i] + target + f[i + len(staging):]))
        written = sorted(dst for _, dst in moves)

        self.log.append(
            self.ingestion_id,
            STATUS_LOADED,
            start_value=mn,
            end_value=mx,
            source_count=n,
            reason_code=json.dumps(written),
        )
        _move_files(self.spark, moves)
        _delete_dir(self.spark, staging)

        # Count validation (V1): lake rows under the same delta predicate
        # vs the source count. Skipped for coalesce watermarks, like the
        # reference (start_ingestion.py:109,134-138).
        if self.delta_expr_cols:
            self.log.append(
                self.ingestion_id,
                STATUS_SUCCESS,
                start_value=mn,
                end_value=mx,
                source_count=n,
                reason_code="validation-skipped",
            )
            self._maintain_latest(written)
            return IngestResult(STATUS_SUCCESS, mn, mx, n, files=written)

        lake = self.spark.read.parquet(self.target_location)
        target_n = lake.filter(
            (F.col(self.delta_field) >= self._wm_lit(start))
            & (F.col(self.delta_field) <= self._wm_lit(mx))
        ).count()
        if target_n != n:
            _delete_files(self.spark, set(written))
            self.log.append(
                self.ingestion_id,
                STATUS_VALIDATION_FAILURE,
                start_value=mn,
                end_value=mx,
                source_count=n,
                target_count=target_n,
                reason_code="count-mismatch-rolled-back",
            )
            return IngestResult(
                STATUS_VALIDATION_FAILURE, mn, mx, n, target_n, written
            )
        self.log.append(
            self.ingestion_id,
            STATUS_SUCCESS,
            start_value=mn,
            end_value=mx,
            source_count=n,
            target_count=target_n,
        )
        self._maintain_latest(written)
        return IngestResult(STATUS_SUCCESS, mn, mx, n, target_n, written)

    def _run_delta(self) -> IngestResult:
        """Delta-sink variant of :meth:`run` — same watermark/log/
        validation contract, but the commit machinery collapses onto
        Delta's transaction log:

        - no staging dir / file moves / orphan cleanup — ``append_delta``
          is atomic (a crash mid-write leaves NO visible commit);
        - the LOADED row records the Delta commit VERSION instead of a
          file list;
        - validation rollback is ``RESTORE TO VERSION AS OF pre`` (or
          dropping the table when this batch created it) instead of
          deleting listed files;
        - the latest zone is maintained by ``MERGE INTO`` over the
          commit's change feed instead of a directory swap.

        All Delta IO goes through module-level functions in
        ``ingest.delta_sink`` so the orchestration (log-row ordering,
        validation, watermark advancement) is testable by substituting
        that seam — tests/test_delta_sink.py runs this method end-to-end
        against a parquet-backed fake of the seam."""
        from . import delta_sink as dsink

        log_rows = self.log.id_rows(self.ingestion_id)
        self._cleanup_orphans_delta(log_rows)
        start = resolve_watermark(
            self.log, self.ingestion_id, self.integer_watermark, rows=log_rows
        )
        self.log.append(
            self.ingestion_id,
            STATUS_STARTED,
            start_value=start,
            reason_code="delta-sink",
        )

        delta = self._delta_frame(start)
        if self.partition_spec is not None:
            delta = self.partition_spec.derive(delta)

        mn, mx, n = self._bounds(delta)
        if n == 0:
            self.log.append(self.ingestion_id, STATUS_NO_DATA, start_value=start)
            return IngestResult(STATUS_NO_DATA, start)

        # same two-scan watermark cap as the parquet path (see run())
        delta = delta.filter(self._delta_col() <= self._wm_lit(mx))
        if self.delta_expr_cols:
            n = delta.count()
            if n == 0:
                self.log.append(
                    self.ingestion_id, STATUS_NO_DATA, start_value=start
                )
                return IngestResult(STATUS_NO_DATA, start)

        target = self.target_location.rstrip("/")
        pre = dsink.table_version(self.spark, target)  # None: first commit
        dsink.append_delta(
            delta,
            target,
            self.partition_spec.partition_column_name
            if self.partition_spec is not None
            else None,
        )
        post = dsink.table_version(self.spark, target)
        self.log.append(
            self.ingestion_id,
            STATUS_LOADED,
            start_value=mn,
            end_value=mx,
            source_count=n,
            reason_code=json.dumps({"delta_commit": post}),
        )

        if self.delta_expr_cols:
            self.log.append(
                self.ingestion_id,
                STATUS_SUCCESS,
                start_value=mn,
                end_value=mx,
                source_count=n,
                reason_code="validation-skipped",
            )
            self._maintain_latest_delta(post)
            return IngestResult(STATUS_SUCCESS, mn, mx, n)

        lake = dsink.read_delta(self.spark, target)
        target_n = lake.filter(
            (F.col(self.delta_field) >= self._wm_lit(start))
            & (F.col(self.delta_field) <= self._wm_lit(mx))
        ).count()
        if target_n != n:
            if pre is None:
                _delete_dir(self.spark, target)  # batch created the table
            else:
                dsink.restore_version(self.spark, target, pre)
            self.log.append(
                self.ingestion_id,
                STATUS_VALIDATION_FAILURE,
                start_value=mn,
                end_value=mx,
                source_count=n,
                target_count=target_n,
                reason_code="count-mismatch-restored",
            )
            return IngestResult(
                STATUS_VALIDATION_FAILURE, mn, mx, n, target_n
            )
        self.log.append(
            self.ingestion_id,
            STATUS_SUCCESS,
            start_value=mn,
            end_value=mx,
            source_count=n,
            target_count=target_n,
        )
        self._maintain_latest_delta(post)
        return IngestResult(STATUS_SUCCESS, mn, mx, n, target_n)

    def _cleanup_orphans_delta(self, rows: list) -> None:
        """Delta twin of :meth:`_cleanup_orphans` — the T5 crash window
        that remains under an atomic sink: a crash AFTER the append
        commit but BEFORE the SUCCESS row. The watermark then still
        points before the batch, so the next run would re-pull the same
        range and append it AGAIN (duplicates the atomic commit cannot
        prevent — it already landed). Recovery mirrors the parquet
        path's file-list delete: the LOADED row records the orphaned
        commit's VERSION; if the table is still at exactly that version
        we RESTORE to the version before it (or drop the table when the
        orphan was its first commit). If the table has moved past the
        orphaned version, someone else committed on top — restoring
        would destroy their data, so fail loudly for manual repair
        (single-writer-per-target is the supported deployment, same as
        the parquet path's concurrent-writer contract)."""
        from . import delta_sink as dsink

        started = self.log.latest_entry(
            self.ingestion_id, STATUS_STARTED, rows=rows
        )
        if started is None or started["reason_code"] != "delta-sink":
            return
        batch = [
            r for r in rows if r["insert_datetime"] >= started["insert_datetime"]
        ]
        closed = {STATUS_SUCCESS, STATUS_VALIDATION_FAILURE, STATUS_NO_DATA}
        for r in batch:
            if r["execution_status"] in closed:
                return
            if (
                r["execution_status"] == STATUS_FAILED
                and (r["reason_code"] or "") == "orphaned-delta-commit-restored"
            ):
                return
        loaded = max(
            (r for r in batch if r["execution_status"] == STATUS_LOADED),
            key=lambda r: r["insert_datetime"],
            default=None,
        )
        if loaded is None:
            return  # crash before the append: the atomic sink shows nothing
        try:
            commit = json.loads(loaded["reason_code"] or "{}").get("delta_commit")
        except ValueError:
            commit = None
        if commit is None:
            return
        target = self.target_location.rstrip("/")
        cur = dsink.table_version(self.spark, target)
        if cur != commit:
            raise RuntimeError(
                f"orphaned delta commit {commit} for id {self.ingestion_id} "
                f"but table {target} is at version {cur}: later commits "
                "exist — restore manually, then close the batch in the log"
            )
        if commit == 0:
            _delete_dir(self.spark, target)
        else:
            dsink.restore_version(self.spark, target, commit - 1)
        self.log.append(
            self.ingestion_id,
            STATUS_FAILED,
            start_value=loaded["start_value"] or "",
            end_value=loaded["end_value"] or "",
            reason_code="orphaned-delta-commit-restored",
        )

    def _maintain_latest_delta(self, commit_version: int) -> None:
        """Delta-path latest zone: MERGE the committed batch (re-read from
        the table's change feed, never the lazy source frame — same
        live-source argument as :meth:`_maintain_latest`) into
        ``{target}__latest``."""
        if not self.maintain_latest:
            return
        if not self.primary_key:
            raise ValueError("maintain_latest requires a primary_key")
        from . import delta_sink as dsink

        target = self.target_location.rstrip("/")
        batch = dsink.read_changes_delta(
            self.spark, target, commit_version - 1
        ).drop("_change_type", "_commit_version", "_commit_timestamp")
        dsink.merge_latest_delta(
            self.spark,
            target + "__latest",
            batch,
            list(self.primary_key),
            self._latest_order_col(),
            list(self.latest_tie_breaks),
        )

    def run_windows(self, until: str, window_hours: int = 24) -> list[IngestResult]:
        """Voluminous-table mode: pull in serial time windows until caught
        up to ``until`` (reference T2 — the day-advance while-loop,
        ingest_mysql_data.py:231-303, used to bound per-query source load).

        Each window is a normal ``run()`` with a capped end value, so
        watermark records advance per window and a failure loses at most
        one window. On JDBC sources, prefer the PARALLEL range read
        (partition options, sources/jdbc.py) — this serial mode exists for
        sources that throttle concurrent scans.
        """
        from datetime import datetime, timedelta

        if self.integer_watermark:
            raise ValueError("run_windows applies to datetime watermarks")
        results: list[IngestResult] = []
        fmt = "%Y-%m-%d %H:%M:%S"

        def _parse(s: str) -> datetime:
            # keep the fraction: truncating here would compare X.000001
            # as X == end and loop forever on a batch whose max landed
            # exactly on `until`
            if "." in s:
                return datetime.strptime(s, fmt + ".%f")
            return datetime.strptime(s, fmt)

        end = _parse(until)
        while True:
            start_s = resolve_watermark(
                self.log, self.ingestion_id, self.integer_watermark
            )
            start = _parse(start_s)
            if start > end:
                break
            # fast-forward over empty ranges: one cheap min-aggregate
            # instead of crawling empty windows (the reference walks
            # day-by-day from the epoch default — ~1500 no-op source
            # queries on a first voluminous run)
            first = self.source.filter(
                self._delta_col() >= self._wm_lit(start_s)
            ).agg(F.min(self._delta_col()).alias("m")).first()["m"]
            if first is None:
                break  # nothing at/after the watermark at all
            start = max(start, first.replace(microsecond=0))
            cap = min(start + timedelta(hours=window_hours), end)
            # full µs precision: a plain strftime(fmt) would TRUNCATE a
            # sub-second `until` (e.g. now()) below the running watermark —
            # the final window then either skips the tail rows or, via the
            # empty-window record, re-resolves the same start forever
            windowed = IncrementalIngestJob(
                **{**self.__dict__, "end_value_cap": cap.strftime(fmt + ".%f")}
            )
            res = windowed.run()
            results.append(res)
            if res.status == STATUS_NO_DATA:
                # nothing in this window; advance past it by recording an
                # empty successful window so the loop terminates. Full µs
                # precision like every other timestamp end_value — mixing
                # bare-second and .000000 forms would create max_by ties
                # between equal instants with different bump behavior.
                self.log.append(
                    self.ingestion_id,
                    STATUS_SUCCESS,
                    start_value=start_s,
                    end_value=cap.strftime(fmt + ".%f"),
                    reason_code="empty-window",
                )
            if res.status not in (STATUS_SUCCESS, STATUS_NO_DATA):
                break
        return results

    def _maintain_latest(self, written: list[str]) -> None:
        """Merge the appended batch into the latest zone by re-reading the
        WRITTEN FILES, not the source delta frame: the delta frame is lazy,
        so merging it would re-scan the source at merge time — a row
        updated between the lake append and the merge would make the
        latest zone disagree with the lake (and a JDBC source would pay a
        second remote scan). The written data files are the batch as the
        lake actually recorded it; partition columns live in directory
        names, not the files, so the read matches the pre-partition schema
        merge_latest expects."""
        if not self.maintain_latest:
            return
        if not self.primary_key:
            raise ValueError("maintain_latest requires a primary_key")
        from .merge import merge_latest

        merge_latest(
            self.spark,
            self.target_location.rstrip("/") + "__latest",
            self.spark.read.parquet(*written),
            list(self.primary_key),
            self._latest_order_col(),
            list(self.latest_tie_breaks),
        )

    def _latest_order_col(self) -> str:
        # coalesce watermarks order the view by the delta expr's first col
        # chain — use the plain delta field, matching the reference's view
        # ORDER BY {delta} DESC (start_ingestion.py:369)
        return self.delta_field
