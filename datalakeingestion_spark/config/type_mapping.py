"""MySQL→Spark type mapping + pandas-compatibility modes.

The reference maps MySQL types to pandas dtypes via a config file loaded
attribute-by-attribute and resolved with ``eval`` per column
(config/datatype_mapping.config:1-20, extractors/ingest_mysql_data.py:
41-61,174). Two of its choices are LOSSY and exist only because of pandas
limitations (SURVEY.md §1.2):

- ``decimal → float64`` (precision loss on money columns);
- timestamps clamped into pandas' datetime64[ns] range
  [1900-01-01, 2262-04-11] inside generated SQL
  (ingest_mysql_data.py:183-189).

Spark needs neither. The defaults here are exact (`DecimalType`,
unclamped timestamps); ``apply_compat`` opts INTO the reference's lossy
behavior for byte-for-byte migration comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.buckets import clamp_timestamp

# MySQL type → exact Spark type (the reference's pandas mapping is in the
# comments where it differs).
MYSQL_TO_SPARK: dict[str, T.DataType] = {
    "bigint": T.LongType(),
    "int": T.IntegerType(),
    "mediumint": T.IntegerType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "char": T.StringType(),
    "enum": T.StringType(),
    "varchar": T.StringType(),
    "text": T.StringType(),
    "longtext": T.StringType(),
    "mediumtext": T.StringType(),
    "json": T.StringType(),  # opaque string, like the reference
    "decimal": T.DecimalType(38, 10),  # reference: float64 (lossy!)
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "time": T.DayTimeIntervalType(),  # banned as partition col
}


def spark_type_for(mysql_type: str) -> T.DataType:
    try:
        return MYSQL_TO_SPARK[mysql_type.lower()]
    except KeyError as exc:
        raise ValueError(f"unmapped MySQL type {mysql_type!r}") from exc


def apply_compat(
    df: DataFrame,
    decimal_as_double: bool = False,
    clamp_timestamps: bool = False,
) -> DataFrame:
    """Opt-in reference-compatibility casts (both OFF by default — the
    Spark engine is exact; see module docstring)."""
    out = df
    for field in df.schema.fields:
        if decimal_as_double and isinstance(field.dataType, T.DecimalType):
            out = out.withColumn(field.name, out[field.name].cast("double"))
        if clamp_timestamps and isinstance(field.dataType, T.TimestampType):
            out = out.withColumn(field.name, clamp_timestamp(out[field.name]))
    return out
