from __future__ import annotations

import pytest

from datalakeingestion_spark.ingest.watermark import (
    DATETIME_EPOCH,
    INTEGER_EPOCH,
    STATUS_FAILED,
    STATUS_SUCCESS,
    ExecutionLog,
    bump_watermark,
    resolve_watermark,
)


@pytest.fixture()
def log(spark, tmp_path):
    return ExecutionLog(spark, str(tmp_path / "execution_log"))


@pytest.mark.smoke
def test_first_run_epoch_defaults(log):
    assert resolve_watermark(log, 1, integer_watermark=False) == DATETIME_EPOCH
    assert resolve_watermark(log, 1, integer_watermark=True) == INTEGER_EPOCH


def test_bump_semantics():
    # second-precision values: reference-parity +1s
    assert bump_watermark("2024-06-01 10:20:30", False) == "2024-06-01 10:20:31"
    # fractional values: +1µs (avoids widening the same-second skip gap)
    assert (
        bump_watermark("2024-06-01 10:20:30.999000", False)
        == "2024-06-01 10:20:30.999001"
    )
    assert bump_watermark("41", True) == "42"


def test_resolution_uses_max_success_only(log):
    log.append(1, STATUS_SUCCESS, end_value="2024-01-05 00:00:00")
    log.append(1, STATUS_SUCCESS, end_value="2024-02-01 12:00:00")
    log.append(1, STATUS_FAILED, end_value="2024-09-09 00:00:00")  # ignored
    log.append(2, STATUS_SUCCESS, end_value="2025-01-01 00:00:00")  # other id
    assert resolve_watermark(log, 1, False) == "2024-02-01 12:00:01"


def test_latest_entry_argmax(log):
    log.append(1, STATUS_SUCCESS, end_value="a", reason_code="first")
    log.append(1, STATUS_SUCCESS, end_value="b", reason_code="second")
    assert log.latest_entry(1, STATUS_SUCCESS)["reason_code"] == "second"


def test_empty_log_reads_empty(log):
    assert log.read().count() == 0
    assert log.latest_entry(7) is None


def test_integer_watermark_digit_boundary(log):
    """ADVICE r1 (high): '99' vs '100' — the max over end_value must be
    numeric for integer watermarks, not lexicographic, or the watermark
    regresses at digit-length boundaries and re-ingests duplicates."""
    log.append(1, STATUS_SUCCESS, end_value="99")
    log.append(1, STATUS_SUCCESS, end_value="100")
    assert log.last_success_end(1, integer_watermark=True) == "100"
    assert resolve_watermark(log, 1, integer_watermark=True) == "101"


def test_corrupt_log_raises_not_resets(log, tmp_path):
    """ADVICE r1 (medium): a log path that EXISTS but fails to read must
    raise — silently returning an empty log would reset the watermark to
    the epoch and duplicate the whole source."""
    (tmp_path / "execution_log").mkdir()
    (tmp_path / "execution_log" / "garbage.parquet").write_text("not parquet")
    with pytest.raises(Exception):
        log.read().count()


def test_mixed_precision_end_values_ordered_as_timestamps(log):
    # fraction-less empty-window records and µs-precision batch records
    # coexist; the typed (timestamp) order must pick the true max
    log.append(1, STATUS_SUCCESS, end_value="2024-03-01 00:00:00.500000")
    log.append(1, STATUS_SUCCESS, end_value="2024-03-01 00:00:00")
    assert log.last_success_end(1) == "2024-03-01 00:00:00.500000"
