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
