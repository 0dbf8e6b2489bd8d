"""Watermark resolution + execution-log state store.

The reference keeps per-run state as CSV "execution log" files on S3 under
date-partitioned prefixes, found again via a today→month→previous-month→
all-time fallback scan (utils/common_utils.py:292-401). Here state is ONE
append-only parquet table; watermark resolution is a single filtered
aggregate — no prefix cascade (SURVEY.md §2.10 T4).

Semantics replicated exactly from the reference (T1,
extractors/ingest_mysql_data.py:73-149):

- first run (no successful row): epoch default '2020-01-01 00:00:00'
  (datetime watermark) or '1' (integer watermark);
- later runs: max(end_value) over rows with execution_status='success',
  bumped by +1 second (datetime) or +1 (integer). The +1s bump can skip
  rows committed within the same second after the previous read — a known
  reference gap, preserved for parity (SURVEY.md §4).
"""

from __future__ import annotations

import uuid
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 8 columns per the reference (config/basic_config.py:54-57).
LOG_SCHEMA = T.StructType(
    [
        T.StructField("lake_ingestion_id", T.IntegerType()),
        T.StructField("execution_status", T.StringType()),
        T.StructField("start_value", T.StringType()),
        T.StructField("end_value", T.StringType()),
        T.StructField("source_count", T.LongType()),
        T.StructField("target_count", T.LongType()),
        T.StructField("reason_code", T.StringType()),
        T.StructField("insert_datetime", T.TimestampType()),
    ]
)

STATUS_STARTED = "started"
STATUS_LOADED = "data-loaded-to-s3"
STATUS_NO_DATA = "no-data-to-load"
STATUS_SUCCESS = "success"
STATUS_VALIDATION_FAILURE = "validation-failure"
STATUS_EXTRACTION_FAILURE = "extraction-failure"
STATUS_FAILED = "failed"
# a table whose task_order stage never ran because an upstream stage
# failed (runner barrier semantics — Airflow's all_success trigger rule)
STATUS_SKIPPED = "skipped-upstream-failed"

# reason_code of the SUCCESS row a compaction re-baseline writes; history
# treats such a commit's file list as COMPLETE (it replaces, not extends,
# everything before it — ingest/timetravel.py)
BASELINE_MARKER = "compaction-baseline"

DATETIME_EPOCH = "2020-01-01 00:00:00"
INTEGER_EPOCH = "1"
_TS_FMT = "%Y-%m-%d %H:%M:%S"


class ExecutionLog:
    """Append-only parquet state table (the Delta-table shape without the
    Delta dependency; single-row appends are driver-side and tiny).

    Every append writes its OWN batch subdirectory: concurrent writers
    (the runner ingests tables in parallel threads — and possibly parallel
    processes) would otherwise race on the shared parquet `_temporary`
    committer directory. Distinct directories need no locking at all;
    reads recurse over all batches. A Delta table's ACID append replaces
    this on a production deployment.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(self.path)
        return p.getFileSystem(conf).exists(p)

    def read(self) -> DataFrame:
        """Missing path == genuinely empty log (first run). Any OTHER read
        failure re-raises: swallowing a transient error here would silently
        reset the watermark to the 2020 epoch and re-ingest the whole
        source as duplicates. The reference likewise propagates log-read
        errors (utils/common_utils.py:292-401 has no blanket except)."""
        if not self._exists():
            return self.spark.createDataFrame([], LOG_SCHEMA)
        return (
            self.spark.read.schema(LOG_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(self.path)
        )

    def append(
        self,
        ingestion_id: int,
        status: str,
        start_value: str = "",
        end_value: str = "",
        source_count: int = 0,
        target_count: int = 0,
        reason_code: str = "",
    ) -> None:
        row = (
            ingestion_id,
            status,
            start_value,
            end_value,
            source_count,
            target_count,
            reason_code,
            datetime.now(),
        )
        df = self.spark.createDataFrame([row], LOG_SCHEMA)
        batch_dir = f"{self.path}/batch-{uuid.uuid4().hex}"
        df.coalesce(1).write.mode("overwrite").parquet(batch_dir)

    def append_commit(
        self,
        ingestion_id: int,
        start_value: str,
        end_value: str,
        source_count: int,
        files_json: str,
    ) -> None:
        """Atomically append a LOADED→SUCCESS pair in ONE batch directory.

        Used by compaction to re-baseline history (ingest/timetravel.py):
        both rows land in a single parquet write, so no crash point can
        leave a dangling LOADED whose reason_code lists LIVE lake files —
        which orphan cleanup would otherwise delete. The SUCCESS row is
        stamped 1 µs after the LOADED row so the history pairing window
        (ordered by insert_datetime) is deterministic."""
        t0 = datetime.now()
        t1 = t0 + timedelta(microseconds=1)
        rows = [
            (
                ingestion_id,
                STATUS_LOADED,
                start_value,
                end_value,
                source_count,
                0,
                files_json,
                t0,
            ),
            (
                ingestion_id,
                STATUS_SUCCESS,
                start_value,
                end_value,
                source_count,
                source_count,
                BASELINE_MARKER,
                t1,
            ),
        ]
        df = self.spark.createDataFrame(rows, LOG_SCHEMA)
        batch_dir = f"{self.path}/batch-{uuid.uuid4().hex}"
        df.coalesce(1).write.mode("overwrite").parquet(batch_dir)

    def latest_entry(self, ingestion_id: int, status: str | None = None):
        """Most recent log row for an id (argmax over insert_datetime —
        reference: start_ingestion.py:94-97)."""
        df = self.read().filter(F.col("lake_ingestion_id") == ingestion_id)
        if status is not None:
            df = df.filter(F.col("execution_status") == status)
        return df.orderBy(F.desc("insert_datetime")).limit(1).first()

    def last_success_end(
        self, ingestion_id: int, integer_watermark: bool = False
    ) -> str | None:
        """Largest successful end_value in the watermark's own order.

        end_value is stored as a string; a plain string max is lexicographic
        and regresses integer watermarks at digit-length boundaries
        ('99' > '100'). Order by the TYPED cast instead — long for integer
        watermarks, timestamp for datetime ones — and return the original
        string via max_by."""
        order = (
            F.col("end_value").cast("long")
            if integer_watermark
            else F.col("end_value").cast("timestamp")
        )
        row = (
            self.read()
            .filter(
                (F.col("lake_ingestion_id") == ingestion_id)
                & (F.col("execution_status") == STATUS_SUCCESS)
                & (F.col("end_value") != "")
            )
            .agg(F.max_by("end_value", order).alias("m"))
            .first()
        )
        return row["m"]


def bump_watermark(value: str, integer_watermark: bool) -> str:
    """Advance the watermark by the smallest representable unit.

    Reference semantics (ingest_mysql_data.py:138-147): +1 second
    (datetime; strptime of the first 19 chars — MySQL DATETIME is
    second-precision so this is lossless there) or +1 (integer).
    Generalization: when the stored end_value carries a fractional second
    (microsecond-precision sources like parquet event streams), bump by
    1 µs instead — the verbatim +1s rule would widen the reference's known
    same-second skip gap (SURVEY.md §4) to a whole sub-second window.
    """
    if integer_watermark:
        return str(int(value) + 1)
    if "." in value:
        ts = datetime.strptime(value, _TS_FMT + ".%f")
        return (ts + timedelta(microseconds=1)).strftime(_TS_FMT + ".%f")
    ts = datetime.strptime(value[:19], _TS_FMT)
    return (ts + timedelta(seconds=1)).strftime(_TS_FMT)


def resolve_watermark(
    log: ExecutionLog, ingestion_id: int, integer_watermark: bool
) -> str:
    """Start value for the next incremental pull (T1)."""
    last = log.last_success_end(ingestion_id, integer_watermark)
    if last is None or last == "":
        return INTEGER_EPOCH if integer_watermark else DATETIME_EPOCH
    return bump_watermark(last, integer_watermark)
