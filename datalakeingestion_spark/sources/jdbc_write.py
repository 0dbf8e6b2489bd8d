"""JDBC DML writers — the reverse-ETL half of the JDBC source (K5).

The reference's MySQLWrapper executes row-at-a-time DML from Python
dicts: INSERT-from-dict, REPLACE (MySQL upsert) and UPDATE-from-dict
over a live connection (reference: utils/MySQLWrapper.py:78-106). The
Spark-first mapping splits the work by volume:

- **bulk append/overwrite** — ``df.write.format("jdbc")``: every
  partition opens its own connection and streams batched INSERTs
  (``batchsize`` rows per round trip), so the write parallelizes like
  any other Spark sink. ``overwrite`` uses ``truncate`` when the table
  exists so indexes/grants survive (plain overwrite would DROP+CREATE
  with Spark-inferred types).
- **upsert (REPLACE semantics)** — engine-portable staging protocol:
  stage the batch as a table (distributed write), then ONE
  transactional DELETE-matching + INSERT-all pair executed inside the
  database. MySQL's ``REPLACE``/``ON DUPLICATE KEY`` and SQL MERGE are
  dialect-specific; the staging pair is ANSI and runs identically on
  the embedded-Derby test database and a production MySQL. The data
  volume moves through the distributed staging write — the DELETE/
  INSERT are set-based statements the database executes locally, so
  nothing row-sized crosses the driver.
- **driver-side DML** (``insert_rows`` / ``update_rows`` /
  ``execute_dml``) — the dict-shaped control-plane operations the
  reference uses for status bookkeeping, via ``java.sql`` through the
  session's JVM (same driver jar the executors use), with
  PreparedStatement parameter binding (never string-spliced values).

Scale note: upsert cost is one staged write of |batch| rows plus an
indexed anti-probe inside the DB — independent of target-table size
when ``key_cols`` are indexed. That is the same contract as the
reference's REPLACE, minus the per-row Python round trips.
"""

from __future__ import annotations

import uuid
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: Mapping[str, str] | None = None,
    batchsize: int = 10_000,
) -> None:
    """Distributed JDBC write (K5). ``mode``: append | overwrite.

    ``overwrite`` sets ``truncate=true``: when the target exists Spark
    empties it instead of DROP+CREATE, preserving the DBA's types,
    indexes and grants (the reference's tables are pre-created DDL).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"write_jdbc mode must be append|overwrite, got {mode!r}")
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("truncate", "true")
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def _connect(spark: SparkSession, url: str, properties: Mapping[str, str] | None):
    jvm = spark._jvm
    props = dict(properties or {})
    driver = props.pop("driver", None)
    if driver:
        # load the driver class so DriverManager can route the URL even
        # when the jar predates service-loader registration
        jvm.java.lang.Class.forName(driver)
    jprops = jvm.java.util.Properties()
    for k, v in props.items():
        jprops.setProperty(k, str(v))
    return jvm.java.sql.DriverManager.getConnection(url, jprops)


def execute_dml(
    spark: SparkSession,
    url: str,
    sql: str,
    properties: Mapping[str, str] | None = None,
) -> int:
    """Execute one driver-side DML/DDL statement; returns the update
    count (0 for DDL). Control-plane only — bulk data goes through
    ``write_jdbc``."""
    conn = _connect(spark, url, properties)
    try:
        st = conn.createStatement()
        try:
            return st.executeUpdate(sql)
        finally:
            st.close()
    finally:
        conn.close()


def _bind(ps, i: int, v) -> None:
    # py4j maps str/bool/int/float to java.lang equivalents; setObject
    # lets the driver coerce to the column's SQL type (timestamps travel
    # as strings, exactly like the reference's dict values)
    if v is None:
        ps.setObject(i, None)
    else:
        ps.setObject(i, v)


def insert_rows(
    spark: SparkSession,
    url: str,
    table: str,
    rows: Sequence[Mapping[str, object]],
    properties: Mapping[str, str] | None = None,
) -> int:
    """INSERT a small batch of dict rows (reference MySQLWrapper insert-
    from-dict) with one PreparedStatement + executeBatch. Returns rows
    inserted. All rows must share the first row's key set."""
    if not rows:
        return 0
    cols = list(rows[0].keys())
    sql = (
        f"INSERT INTO {table} ({', '.join(cols)}) "
        f"VALUES ({', '.join(['?'] * len(cols))})"
    )
    conn = _connect(spark, url, properties)
    try:
        ps = conn.prepareStatement(sql)
        try:
            for row in rows:
                if set(row.keys()) != set(cols):
                    raise ValueError(
                        "insert_rows: all rows must share the same columns"
                    )
                for i, c in enumerate(cols):
                    _bind(ps, i + 1, row[c])
                ps.addBatch()
            counts = ps.executeBatch()
            return sum(max(int(c), 0) for c in counts)
        finally:
            ps.close()
    finally:
        conn.close()


def update_rows(
    spark: SparkSession,
    url: str,
    table: str,
    set_values: Mapping[str, object],
    where: Mapping[str, object],
    properties: Mapping[str, str] | None = None,
) -> int:
    """UPDATE-from-dict (reference MySQLWrapper update): SET every
    ``set_values`` pair on rows matching ALL ``where`` equality pairs.
    Parameter-bound; returns the number of rows updated."""
    if not set_values:
        raise ValueError("update_rows: set_values must be non-empty")
    set_cols = list(set_values.keys())
    where_cols = list(where.keys())
    sql = f"UPDATE {table} SET " + ", ".join(f"{c} = ?" for c in set_cols)
    if where_cols:
        sql += " WHERE " + " AND ".join(f"{c} = ?" for c in where_cols)
    conn = _connect(spark, url, properties)
    try:
        ps = conn.prepareStatement(sql)
        try:
            i = 1
            for c in set_cols:
                _bind(ps, i, set_values[c])
                i += 1
            for c in where_cols:
                _bind(ps, i, where[c])
                i += 1
            return ps.executeUpdate()
        finally:
            ps.close()
    finally:
        conn.close()


def upsert_jdbc(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    key_cols: Sequence[str],
    properties: Mapping[str, str] | None = None,
    batchsize: int = 10_000,
) -> None:
    """REPLACE-semantics upsert (reference MySQLWrapper.py:78-106):
    rows matching on ``key_cols`` are replaced by the batch row, new
    keys are inserted.

    Protocol: distributed write of ``df`` into a uuid-suffixed staging
    table, then one transaction of DELETE-matching + INSERT-all against
    the target, then DROP the staging table. The batch must be
    key-unique (duplicate keys inside one batch make "replace"
    ambiguous — rejected loudly rather than resolved arbitrarily).
    """
    if not key_cols:
        raise ValueError("upsert_jdbc requires at least one key column")
    missing = [k for k in key_cols if k not in df.columns]
    if missing:
        raise ValueError(f"upsert_jdbc: key column(s) {missing} not in frame")
    dupes = df.groupBy(*key_cols).count().filter("count > 1").limit(1).count()
    if dupes:
        raise ValueError(
            "upsert_jdbc: batch contains duplicate keys; dedupe (e.g. "
            "latest_rows) before upserting"
        )

    staging = f"{table}_STG{uuid.uuid4().hex[:8].upper()}"
    cols = ", ".join(df.columns)
    match = " AND ".join(
        f"{staging}.{k} = {table}.{k}" for k in key_cols
    )
    write_jdbc(df, url, staging, mode="overwrite", properties=properties,
               batchsize=batchsize)
    try:
        conn = _connect(spark, url, properties)
        try:
            conn.setAutoCommit(False)
            st = conn.createStatement()
            try:
                st.executeUpdate(
                    f"DELETE FROM {table} WHERE EXISTS "
                    f"(SELECT 1 FROM {staging} WHERE {match})"
                )
                st.executeUpdate(
                    f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging}"
                )
                conn.commit()
            except Exception:
                conn.rollback()
                raise
            finally:
                st.close()
        finally:
            conn.close()
    finally:
        # the staging table must not outlive the upsert, success or not —
        # the target is untouched on failure (single rolled-back txn), so
        # a leaked staging table would be the only residue. Best-effort:
        # a drop failure must not shadow the original error.
        try:
            execute_dml(spark, url, f"DROP TABLE {staging}", properties)
        except Exception:  # pragma: no cover - drop races are benign
            pass
