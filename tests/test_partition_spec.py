from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.config.partition_spec import (
    PartitionSpec,
    parse_partition_config,
)

REF_TIME = (
    "({'partition_seq_no': 1, 'partition_column_type': 'time-based', "
    "'partition_column': 'created_datetime', 'partition_format': 'YYYYMMDD'},)"
)
REF_INT = (
    "({'partition_seq_no': 1, 'partition_column_type': 'non-time-based', "
    "'partition_column': 'id', 'partition_format': '1M'},)"
)


@pytest.mark.smoke
def test_parse_reference_shapes():
    spec = parse_partition_config(REF_TIME)
    assert spec == PartitionSpec("created_datetime", "time-based", "YYYYMMDD")
    spec = parse_partition_config(REF_INT)
    assert spec == PartitionSpec("id", "non-time-based", "1M")


def test_parse_empty_variants():
    assert parse_partition_config("()") is None
    assert parse_partition_config("") is None
    assert parse_partition_config(None) is None


@pytest.mark.parametrize(
    "raw",
    [
        "not a tuple",
        "({'partition_column_type': 'time-based'},)",  # missing column
        "({'partition_column_type': 'weird', 'partition_column': 'x'},)",
        "({'partition_column_type': 'time-based', 'partition_column': 'x', "
        "'partition_format': 'YYYYMMDDHH'},)",  # unsupported format
        "__import__('os')",  # literal_eval must reject code
    ],
)
def test_parse_rejects_malformed(raw):
    with pytest.raises(ValueError):
        parse_partition_config(raw)


def test_multi_entry_takes_seq_no_1():
    raw = (
        "({'partition_seq_no': 2, 'partition_column_type': 'non-time-based', "
        "'partition_column': 'b', 'partition_format': '1M'}, "
        "{'partition_seq_no': 1, 'partition_column_type': 'time-based', "
        "'partition_column': 'a', 'partition_format': 'YYYY'})"
    )
    assert parse_partition_config(raw).column == "a"


def test_derive_time_bucket(spark):
    df = spark.createDataFrame(
        [(1, "2024-03-05 10:00:00")], ["id", "ts_str"]
    ).withColumn("created_datetime", F.to_timestamp("ts_str"))
    spec = parse_partition_config(REF_TIME.replace("YYYYMMDD", "YYYYMM"))
    out = spec.derive(df)
    assert out.select("created_datetime_part").first()[0] == "202403"


def test_derive_int_bucket(spark):
    df = spark.createDataFrame([(999_999,), (1_000_000,), (1_000_001,)], ["id"])
    spec = parse_partition_config(REF_INT)
    vals = [r[0] for r in spec.derive(df).select("id_part").collect()]
    assert vals == [0, 1, 1]  # reference 1M-bucket boundary semantics


def test_validation_errors(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "name"])
    with pytest.raises(ValueError, match="non-time"):
        PartitionSpec("name", "time-based", "YYYY").derive(df)
    with pytest.raises(ValueError, match="not in schema"):
        PartitionSpec("missing", "time-based", "YYYY").derive(df)
    with pytest.raises(ValueError, match="integral"):
        PartitionSpec("name", "non-time-based", "1M").derive(df)
    # MySQL TIME (interval) columns are banned (reference :439-440)
    idf = df.withColumn("t_time", F.expr("INTERVAL '10' SECOND"))
    with pytest.raises(ValueError, match="interval"):
        PartitionSpec("t_time", "time-based", "YYYY").derive(idf)


def test_type_mapping_and_compat(spark):
    from decimal import Decimal

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datalakeingestion_spark.config.type_mapping import (
        apply_compat,
        spark_type_for,
    )

    assert spark_type_for("DECIMAL") == T.DecimalType(38, 10)
    assert spark_type_for("datetime") == T.TimestampType()
    assert spark_type_for("json") == T.StringType()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unmapped"):
        spark_type_for("geometry")

    df = spark.createDataFrame(
        [(Decimal("12.3456789012"), "2300-01-01 00:00:00", "1850-06-01 00:00:00")],
        "amount decimal(38,10), hi_s string, lo_s string",
    ).select(
        "amount",
        F.to_timestamp("hi_s").alias("hi"),
        F.to_timestamp("lo_s").alias("lo"),
    )
    # defaults: exact (no casts)
    same = apply_compat(df)
    assert dict(same.dtypes)["amount"] == "decimal(38,10)"
    r = same.first()
    assert r["hi"].year == 2300 and r["lo"].year == 1850

    # opt-in reference modes: lossy decimal + pandas-range clamp
    compat = apply_compat(df, decimal_as_double=True, clamp_timestamps=True)
    assert dict(compat.dtypes)["amount"] == "double"
    r = compat.first()
    assert r["hi"].year == 2262 and r["lo"].year == 1900
