"""Extended query coverage: remaining §2 scalar/filter operators plus the
grouped/window generalizations the Spark engine gets beyond the reference
(rollup, pivot, exact percentiles, sessionization, running frames —
SURVEY.md §2.5/§2.6 note these as free capabilities; they are first-class
here with oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.zorder import z_value_sql
from ..sources.fixtures import load_table
from .registry import register


def _dec(col, scale: int = 4):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Remaining filter / scalar operators
# ---------------------------------------------------------------------------


@register(
    "f3_predicate_string_filter",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_rows
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 200.0
    GROUP BY o_orderpriority
    """,
    doc="F3: composed SQL-string predicate — the reference's pandas "
    "df.query('active_indicator == 1 and ...') (start_ingestion.py:221-229) "
    "is the same string, natively parsed by Catalyst.",
)
def f3_predicate_string_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter("o_orderstatus = 'O' AND o_totalprice > 200.0")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "f5_key_lookup",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders WHERE o_custkey = 42
    """,
    doc="F5: key-lookup filter (per-id control row selection, "
    "start_ingestion.py:346) — an equality predicate pushed to the scan; "
    "broadcast semi-join shape at scale.",
)
def f5_key_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_custkey") == 42).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


@register(
    "c3_parse_truncate",
    oracle="""
    SELECT event_id,
           CAST(substr(CAST(ts AS VARCHAR), 1, 19) AS TIMESTAMP) AS ts_sec
    FROM events WHERE event_id < 100
    """,
    doc="C3: strptime(v[:19]) parse-and-truncate "
    "(ingest_mysql_data.py:141-143) as substring+cast.",
)
def c3_parse_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") < 100).select(
        "event_id",
        F.substring(F.col("ts").cast("string"), 1, 19)
        .cast("timestamp")
        .alias("ts_sec"),
    )


@register(
    "c6_regex_extract",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_val
    FROM events WHERE event_id < 100
    """,
    doc="C6/C8: regex extraction (URL/path parsing shapes, "
    "aws_utils.py:234-237, ingest_files.py:136).",
)
def c6_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") < 100).select(
        "event_id",
        F.regexp_extract("props", '"k": ([0-9]+)', 1).cast("long").alias("k_val"),
    )


@register(
    "c7_concat_case",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment) || '|' || trim(c_name) AS seg_name
    FROM customer WHERE c_custkey <= 50
    """,
    doc="C7: string concat/trim/case (query-assembly shapes, "
    "start_ingestion.py:222-227).",
)
def c7_concat_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(F.col("c_custkey") <= 50).select(
        "c_custkey",
        F.concat(
            F.upper("c_mktsegment"), F.lit("|"), F.trim(F.col("c_name"))
        ).alias("seg_name"),
    )


@register(
    "a4_count_with_predicate",
    oracle="""
    SELECT COUNT(*) AS t_count FROM events
    WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    """,
    doc="A4: COUNT under the delta predicate — the validation count the "
    "reference sends to Athena (aws_utils.py:139-163), in-engine.",
)
def a4_count_with_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.fixtures import load_events_pruned

    events = load_events_pruned(spark, sf_dir, lo="2024-01-15 00:00:00")
    return events.filter(
        F.col("ts") >= F.lit("2024-01-15").cast("timestamp")
    ).agg(F.count(F.lit(1)).alias("t_count"))


# ---------------------------------------------------------------------------
# Window / grouping generalizations beyond the reference
# ---------------------------------------------------------------------------


@register(
    "w3_sessionize",
    bench=True,
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (SELECT user_id,
                 SUM(new_session) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
          FROM g)
    SELECT user_id,
           CAST(MAX(session_id) + 1 AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id
    """,
    doc="Sessionization: lag-gap (30 min) + running sum session ids — the "
    "batch twin of streaming session_window. Gap arithmetic in integral "
    "epoch-microseconds on both engines for exactness. Session count is "
    "max(session_id)+1, NOT count(distinct): running-sum ids are dense "
    "from 0, so the max carries the distinct count without a distinct "
    "aggregate — one Exchange total, agg reuses the window partitioning.",
)
def w3_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_session = F.when(us - F.lag(us).over(w) > 1_800_000_000, 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(run))
        .groupBy("user_id")
        .agg(
            (F.max("session_id") + F.lit(1)).cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "w4_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders WHERE o_custkey <= 100
    """,
    doc="Frame-based running aggregate per key (cumulative spend) — exact "
    "decimal accumulation so frame order can't produce float drift.",
)
def w4_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.filter(F.col("o_custkey") <= 100).select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@register(
    "g1_rollup_counts",
    bench=True,
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP hierarchy totals — grouped-aggregation generalization "
    "(SURVEY §2.5: the reference has no GROUP BY at all).",
)
def g1_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("sum_total"),
    )


@register(
    "g2_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot (status → columns) via groupBy().pivot(); the oracle is the "
    "equivalent FILTER-aggregation form.",
)
def g2_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_finished"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


@register(
    "g3_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 6) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact continuous percentiles per group (Spark percentile ≡ DuckDB "
    "quantile_cont: linear interpolation on the sorted values; rounded to "
    "6 dp against float division noise).",
)
def g3_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
    )


# ---------------------------------------------------------------------------
# Custom operators Spark lacks natively: as-of join, deterministic sketches
# ---------------------------------------------------------------------------


@register(
    "asof_latest_order_per_event",
    bench=True,
    oracle="""
    WITH u AS (
      SELECT user_id AS k, ts AS t, 1 AS tag, NULL::BIGINT AS tie,
             event_id, NULL::BIGINT AS v_orderkey, NULL::DOUBLE AS v_totalprice
      FROM events WHERE event_id < 2000
      UNION ALL
      SELECT o_custkey, o_orderdate, 0, o_orderkey,
             NULL, o_orderkey, o_totalprice
      FROM orders),
    s AS (SELECT event_id, k, tag,
            last_value(v_orderkey IGNORE NULLS) OVER w AS o_orderkey,
            last_value(v_totalprice IGNORE NULLS) OVER w AS o_totalprice
          FROM u
          WINDOW w AS (PARTITION BY k ORDER BY t ASC, tag ASC, tie ASC NULLS FIRST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_id, k AS user_id, o_orderkey, o_totalprice
    FROM s WHERE tag = 1
    """,
    doc="As-of join (Spark has no native one): each event matched to the "
    "user's most recent order at/before the event time, via the "
    "union+window formulation — ONE shuffle on the key, no quadratic "
    "range join (operators/asof.py). Oracle uses the identical window "
    "formulation in DuckDB.",
)
def asof_latest_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    orders = load_table(spark, sf_dir, "orders")
    out = asof_join(
        events.select("event_id", "user_id", "ts"),
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
    )
    return out.select("event_id", "user_id", "o_orderkey", "o_totalprice")


@register(
    "sketch_kmv_distinct",
    bench=True,
    oracle="""
    WITH h AS (SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
               FROM (SELECT DISTINCT l_partkey FROM lineitem)),
    k AS (SELECT h FROM h ORDER BY h LIMIT 256)
    SELECT 256 AS k, MAX(h) AS kth_hash,
           CASE WHEN COUNT(*) < 256 THEN COUNT(*)
                ELSE CAST(round(255 / (MAX(h) / 1152921504606846976.0)) AS BIGINT)
           END AS est_distinct
    FROM k
    """,
    doc="KMV distinct-count sketch (operators/sketches.py): an approximate "
    "operator whose estimate is a pure function of the input set thanks to "
    "the portable hash family — unlike HLL, even the sketch is "
    "oracle-checkable. Executes as distinct + global top-k (partial "
    "per-partition top-k, tiny final merge).",
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import kmv_distinct_estimate

    li = load_table(spark, sf_dir, "lineitem")
    return kmv_distinct_estimate(li, "l_partkey", k=256)


@register(
    "t7_windowed_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
    doc="T6/T7: tumbling-window aggregation via window() — the batch twin "
    "of the streaming windowed counts (streaming/incremental.py); 1-hour "
    "windows align with epoch hours, matching date_trunc in the oracle.",
)
def t7_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "zorder_clustering_key",
    oracle=f"""
    SELECT l_orderkey, l_partkey,
           {z_value_sql('(l_orderkey % 65536)', '(l_partkey % 65536)')} AS z
    FROM lineitem WHERE l_orderkey < 500
    """,
    doc="Z-order (Morton) clustering key: bit-interleave of two key "
    "columns (functions/zorder.py) — the layout primitive behind "
    "two-dimensional file skipping (Delta OPTIMIZE ZORDER equivalent); "
    "pure codegen shifts with an exact SQL twin.",
)
def zorder_clustering_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.zorder import z_value

    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 500).select(
        "l_orderkey",
        "l_partkey",
        z_value(F.col("l_orderkey") % 65536, F.col("l_partkey") % 65536).alias("z"),
    )


@register(
    "g4_cube_counts",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over status × priority — completes the grouping-set family "
    "(GROUP BY / ROLLUP / CUBE / pivot).",
)
def g4_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "w5_latest_composite_key",
    oracle="""
    SELECT o_custkey, o_orderstatus, o_orderkey, o_orderdate
    FROM (SELECT o_custkey, o_orderstatus, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    """,
    doc="W1 with a COMPOSITE key (the reference's comma-joined primary_key, "
    "update_config.py:160-174): latest order per (customer, status).",
)
def w5_latest_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import latest_rows

    orders = load_table(spark, sf_dir, "orders")
    return latest_rows(
        orders, ["o_custkey", "o_orderstatus"], "o_orderdate", ["o_orderkey"]
    ).select("o_custkey", "o_orderstatus", "o_orderkey", "o_orderdate")


@register(
    "t8_session_window_counts",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (SELECT user_id, ts,
                 SUM(new_session) OVER
                   (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
          FROM g)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
    doc="Native session_window(ts, gap) sessionization — merges events "
    "within a 30-min inactivity gap per user; the oracle derives identical "
    "sessions via the lag-gap formulation (window end = last event + gap). "
    "Same code runs on a stream with state GC via withWatermark.",
)
def t8_session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS column, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderkey) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
    """,
    doc="Column profiling (operators/profiling.py): per-column row/null/"
    "exact-distinct counts in ONE scan (single aggregation + stack "
    "unpivot); the approx=True variant swaps in HLL++ for corpus scale.",
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import column_profile

    orders = load_table(spark, sf_dir, "orders")
    return column_profile(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


@register(
    "d3_grouped_zscore",
    oracle="""
    SELECT user_id, event_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 6) AS zscore
    FROM events WHERE user_id < 5
    """,
    doc="D3 grouped-map UDAF surface: per-user z-score normalization via "
    "applyInPandas (Arrow batch per group, vectorized numpy inside) — "
    "checked against the window-function oracle; 6dp rounding absorbs the "
    "mean/std summation-order ulps.",
)
def d3_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "zscore": ((pdf["value"] - mu) / sd).round(6),
            }
        )

    return events.select("user_id", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandas(zscore, "user_id long, event_id long, zscore double")


@register(
    "g5_unpivot_balances",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val
    FROM customer WHERE c_custkey <= 20
    UNION ALL
    SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
    FROM customer WHERE c_custkey <= 20
    """,
    doc="Unpivot/melt (wide→long) via stack — the inverse of g2's pivot.",
)
def g5_unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(F.col("c_custkey") <= 20).selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) "
        "AS (metric, val)",
    )
