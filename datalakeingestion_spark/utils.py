"""Small process-model utilities (SURVEY.md §2.12 parity).

- ``section_logger`` — the reference builds rotating-file loggers per
  section (DEFAULT / PROCESS / EXCEPTION; utils/customlogger.py:36-60).
  Kept as a thin stdlib factory: same section concept, no custom config
  parser, driver-side only (executors log through log4j).
- ``with_retries`` — the reference retries DB connects 3× with linear
  backoff i*5s (utils/MySQLWrapper.py:32-41). Spark retries *tasks*
  natively; this wrapper is for driver-side calls (JDBC metadata probes,
  control-table fetches) where the reference used it.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from logging.handlers import RotatingFileHandler
from typing import TypeVar

T = TypeVar("T")

SECTIONS = ("DEFAULT", "PROCESS", "EXCEPTION")


def section_logger(
    section: str = "DEFAULT",
    log_dir: str | None = None,
    max_bytes: int = 10_000_000,
    backups: int = 3,
) -> logging.Logger:
    if section not in SECTIONS:
        raise ValueError(f"unknown log section {section!r}; expected {SECTIONS}")
    logger = logging.getLogger(f"datalakeingestion.{section.lower()}")
    if not logger.handlers:
        if log_dir:
            handler: logging.Handler = RotatingFileHandler(
                f"{log_dir}/{section.lower()}.out",
                maxBytes=max_bytes,
                backupCount=backups,
            )
        else:
            handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


def write_driver_parquet(
    spark,
    table,
    dest_dir: str,
    filename: str = "part-00000.snappy.parquet",
    overwrite: bool = False,
) -> None:
    """Write a DRIVER-SIDE pyarrow table as one parquet file under
    ``dest_dir`` without launching a Spark job — the metadata-write twin
    of ``ExecutionLog._write_batch`` (ingest/watermark.py): serialize
    locally, copy into place through the Hadoop FS API (works for any
    supported scheme), land under a dot-prefixed in-flight name and
    rename so a concurrent recursive reader never sees a partial footer.
    For metadata-scale frames only (a k×dim centroid table, a 1-row meta
    record); data-scale writes stay distributed.

    ``overwrite=True`` replaces the directory (delete, then write) —
    the same non-atomic window the Spark committer's overwrite mode had
    for these single-file metadata dirs. The default appends a new file
    beside existing ones (pass a unique ``filename``)."""
    import os
    import tempfile
    import uuid

    import pyarrow.parquet as pq

    with tempfile.NamedTemporaryFile(suffix=".parquet", delete=False) as tmp:
        local = tmp.name
    try:
        pq.write_table(table, local, compression="snappy")
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        hpath = jvm.org.apache.hadoop.fs.Path
        dst_dir = hpath(dest_dir)
        fs = dst_dir.getFileSystem(conf)
        if overwrite and fs.exists(dst_dir):
            fs.delete(dst_dir, True)
        fs.mkdirs(dst_dir)
        inflight = hpath(f"{dest_dir}/.inflight-{uuid.uuid4().hex}")
        # delSrc=True: a successful copy consumes the local temp file
        fs.copyFromLocalFile(True, True, hpath("file:" + local), inflight)
        # Hadoop FileSystem.rename reports failure by RETURNING false —
        # swallowing it would silently lose the record (the row would sit
        # under the dot-prefixed in-flight name, hidden from readers)
        if not fs.rename(inflight, hpath(f"{dest_dir}/{filename}")):
            raise RuntimeError(
                f"rename failed publishing {dest_dir}/{filename} "
                "(in-flight file left for inspection)"
            )
    finally:
        # the copy consumed it on success; clean up on any failure path
        if os.path.exists(local):
            os.unlink(local)


def with_retries(
    fn: Callable[[], T],
    attempts: int = 3,
    backoff_seconds: float = 5.0,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
) -> T:
    """Call ``fn`` up to ``attempts`` times with linear backoff i*backoff
    (reference semantics). Raises the final error."""
    last: BaseException | None = None
    for i in range(attempts):
        try:
            return fn()
        except retry_on as exc:  # noqa: PERF203
            last = exc
            if i < attempts - 1:
                time.sleep(backoff_seconds * (i + 1))
    assert last is not None
    raise last
