"""Core relational queries (SURVEY.md §2.3-§2.9) with DuckDB oracles.

Each query exercises one (or a small family of) reference operators,
re-expressed as a declarative Spark plan. Reference citations in each
docstring point into /root/reference (the pandas-based original).

Determinism rules applied throughout (so order-insensitive value hashes
match the oracle):
- sums/avgs over doubles go through exact decimal arithmetic, cast back to
  double (`_dsum`) — summation order can't change the result;
- every top-k / limit query has a total tie-break order;
- no nullable outputs unless the null is semantically meaningful.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.buckets import clamp_timestamp, date_bucket, int_bucket
from ..operators.relational import (
    coalesce_range_filter,
    count_reconciliation,
    latest_rows,
    topk_per_group,
)
from ..sources.fixtures import load_events_pruned, load_table
from .registry import register


def _dec(col: Column | str, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Aggregation pipeline queries (A1-A7 generalized to grouped aggregation)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    doc="TPC-H Q1 shape: the grouped generalization of the reference's global "
    "min/max/count aggregates (ingest_mysql_data.py:273-289). Executed as "
    "fixed-point arithmetic: TPC-H money/quantity/discount columns are "
    "DECIMAL(15,2) semantically, so each value converts losslessly to "
    "integer cents and every sum is a LONG sum inside whole-stage codegen "
    "(~1.7x over decimal(18,4) sums, whose >18-digit accumulator falls off "
    "Spark's compact-long decimal path). Overflow safety at 100 TB: the "
    "long sums are PER-PARTITION partials (groupBy includes "
    "spark_partition_id; a 128 MB partition holds ~1.3e6 rows, keeping "
    "partial sums < 2^51); the final cross-partition merge is decimal(38). "
    "Results are bit-identical to the decimal plan and the DuckDB oracle "
    "because all arithmetic is exact.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # exact integer cents (values are 2-dp decimals stored as doubles; the
    # double is within 1e-10 of k/100, so round(x*100) recovers k exactly)
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    base = li.filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        qty_c.alias("_q"),
        price_c.alias("_p"),
        disc_c.alias("_d"),
        # price * (1 - disc) in 1e-4 units: cents * (100 - disc_cents)
        (price_c * (100 - disc_c)).alias("_dp"),
    )
    partial = base.groupBy(
        "l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid")
    ).agg(
        F.sum("_q").alias("sq"),
        F.sum("_p").alias("sp"),
        F.sum("_d").alias("sd"),
        F.sum("_dp").alias("sdp"),
        F.count(F.lit(1)).alias("n"),
    )

    def d38(c):
        return F.col(c).cast("decimal(38,0)")

    return partial.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(d38("sq")) / 100).cast("double").alias("sum_qty"),
        (F.sum(d38("sp")) / 100).cast("double").alias("sum_base_price"),
        (F.sum(d38("sdp")) / 10000).cast("double").alias("sum_disc_price"),
        ((F.sum(d38("sq")) / 100).cast("double") / F.sum("n")).alias("avg_qty"),
        ((F.sum(d38("sp")) / 100).cast("double") / F.sum("n")).alias("avg_price"),
        ((F.sum(d38("sd")) / 100).cast("double") / F.sum("n")).alias("avg_disc"),
        F.sum("n").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    bench=True,
    doc="TPC-H Q3 shape: 3-way join + grouped agg + deterministic top-10. "
    "customer is broadcastable; orders⋈lineitem shuffles on orderkey.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    bench=True,
    doc="TPC-H Q5 shape: 6-way star join. region/nation/supplier/customer "
    "are broadcast dims; only orders⋈lineitem shuffles. Catalyst reorders "
    "and prunes — verify via .explain that dims go BroadcastHashJoin.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    bench=True,
    doc="TPC-H Q6 shape: pure scan+filter+global agg — all predicates reach "
    "the parquet scan (PushedFilters), no shuffle beyond the final reduce.",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Window / dedup queries (W1 — the reference's signature semantic)
# ---------------------------------------------------------------------------


@register(
    "w1_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (SELECT user_id, event_id, ts, event_type, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    bench=True,
    doc="THE reference semantic: latest-row-per-key dedup view "
    "(start_ingestion.py:361-374). One shuffle on user_id; scales where "
    "the reference's Athena view times out (README.md:34-35).",
)
def w1_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return latest_rows(events, ["user_id"], "ts", tie_breaks=["event_id"]).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


@register(
    "w2_top3_events_per_user",
    oracle="""
    SELECT user_id, event_id, value, rn
    FROM (SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events)
    WHERE rn <= 3
    """,
    doc="Top-k per group — the natural generalization of W1 the Spark engine "
    "gets for free from Window.",
)
def w2_top3_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return topk_per_group(
        events,
        ["user_id"],
        [F.desc("value"), F.asc("event_id")],
        k=3,
    ).select("user_id", "event_id", "value", "rn")


# ---------------------------------------------------------------------------
# Filters / predicates (F1-F8)
# ---------------------------------------------------------------------------


@register(
    "f1_watermark_range_scan",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value
    FROM events
    WHERE ts > TIMESTAMP '2024-01-10 00:00:00'
      AND ts <= TIMESTAMP '2024-01-20 00:00:00'
    """,
    doc="The incremental delta scan: WHERE delta BETWEEN start AND end "
    "(ingest_mysql_data.py:250-267). Catalyst pushes both bounds into the "
    "parquet scan; on JDBC the same predicate reaches MySQL.",
)
def f1_watermark_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # superset range prefilter on the raw column reaches the parquet scan
    # (row-group skipping); the exact predicate below is the residual
    events = load_events_pruned(
        spark, sf_dir, lo="2024-01-10 00:00:00", hi="2024-01-20 00:00:00"
    )
    return events.filter(
        (F.col("ts") > F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") <= F.lit("2024-01-20").cast("timestamp"))
    ).select("event_id", "user_id", "ts", "event_type", "value")


@register(
    "f2_coalesce_range_filter",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           MIN(coalesce(modified_ts, ts)) AS min_eff,
           MAX(coalesce(modified_ts, ts)) AS max_eff
    FROM (SELECT ts,
                 CASE WHEN event_type IN ('purchase','signup')
                      THEN ts + INTERVAL 1 HOUR END AS modified_ts
          FROM events)
    WHERE coalesce(modified_ts, ts) >= TIMESTAMP '2024-01-10 00:00:00'
      AND coalesce(modified_ts, ts) <= TIMESTAMP '2024-01-20 00:00:00'
    """,
    doc="F2: the coalesce(modified,created) BETWEEN filter. The reference "
    "rewrites it to an OR-disjunction for MySQL index use "
    "(ingest_mysql_data.py:256-262); coalesce_range_filter applies the "
    "pushable OR prefilter AND the exact coalesce predicate.",
)
def f2_coalesce_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn(
        "modified_ts",
        F.when(
            F.col("event_type").isin("purchase", "signup"),
            F.col("ts") + F.expr("INTERVAL 1 HOUR"),
        ),
    )
    lo = F.lit("2024-01-10").cast("timestamp")
    hi = F.lit("2024-01-20").cast("timestamp")
    filtered = coalesce_range_filter(events, ["modified_ts", "ts"], lo, hi)
    eff = F.coalesce(F.col("modified_ts"), F.col("ts"))
    return filtered.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(eff).alias("min_eff"),
        F.max(eff).alias("max_eff"),
    )


@register(
    "f6_in_list_filter",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_rows
    FROM lineitem WHERE l_returnflag IN ('A','R')
    GROUP BY l_returnflag
    """,
    doc="F6 IN-list membership (basic_config voluminous-table switch shape).",
)
def f6_in_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "f8_null_fill_group",
    oracle="""
    SELECT coalesce(nullif(source, ''), 'unknown') AS src, COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
    doc="F8 null handling: fillna('') / coalesce defaults "
    "(start_ingestion.py:255, common_utils.py:239-241).",
)
def f8_null_fill_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "src", F.coalesce(F.nullif(F.col("source"), F.lit("")), F.lit("unknown"))
        )
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Watermark / incremental aggregates (A1-A3, C4, T1 shapes)
# ---------------------------------------------------------------------------


@register(
    "a1_watermark_bounds",
    oracle="""
    SELECT MIN(ts) AS min_delta, MAX(ts) AS max_delta, COUNT(*) AS source_count
    FROM events WHERE ts > TIMESTAMP '2024-01-10 00:00:00'
    """,
    doc="A1+A2: per-run watermark bounds + row count, captured in one agg "
    "(the reference tracks per-chunk min/max lists then folds — "
    "ingest_mysql_data.py:273-289; Spark's partial aggregation is exactly "
    "that, automatic).",
)
def a1_watermark_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_events_pruned(spark, sf_dir, lo="2024-01-10 00:00:00")
    return events.filter(F.col("ts") > F.lit("2024-01-10").cast("timestamp")).agg(
        F.min("ts").alias("min_delta"),
        F.max("ts").alias("max_delta"),
        F.count(F.lit(1)).alias("source_count"),
    )


@register(
    "c4_next_watermark",
    oracle="""
    SELECT MAX(ts) + INTERVAL 1 SECOND AS next_start FROM events
    """,
    doc="T1/C4: watermark resolution — next start = max(end_value)+1s "
    "(ingest_mysql_data.py:140-143).",
)
def c4_next_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        (F.max("ts") + F.expr("INTERVAL 1 SECOND")).alias("next_start")
    )


@register(
    "a3_scalar_max",
    oracle="SELECT MAX(o_orderkey) AS max_id FROM orders",
    doc="A3: column max as scalar (next lake_ingestion_id, update_config.py:122).",
)
def a3_scalar_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(F.max("o_orderkey").alias("max_id"))


@register(
    "a5_distinct_event_types",
    oracle="SELECT DISTINCT event_type FROM events",
    doc="A5: distinct collection (crawler-name dedup, start_ingestion.py:413-421).",
)
def a5_distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select("event_type").distinct()


@register(
    "a6_argmax_latest_event",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
    doc="A6/A7/O3: global argmax row — latest log entry "
    "(start_ingestion.py:96-97); orderBy+limit(1), or max_by at scale.",
)
def a6_argmax_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_id", "ts", "user_id", "event_type")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
    )


@register(
    "a2_group_count_validation",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="A2 generalized: per-group counts + distinct counts (validation shape).",
)
def a2_group_count_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Scalar-function queries (C1, C2, C9, C11/P3)
# ---------------------------------------------------------------------------


@register(
    "c1_date_bucket_monthly",
    oracle="""
    SELECT strftime(o_orderdate, '%Y%m') AS part_col,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
    FROM orders GROUP BY 1
    """,
    doc="C1: strftime partition derivation (ingest_mysql_data.py:459-468) as "
    "date_format — the write-side partition column, here aggregated to "
    "verify bucket assignment.",
)
def c1_date_bucket_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("part_col", date_bucket(F.col("o_orderdate"), "YYYYMM"))
        .groupBy("part_col")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_total"),
        )
    )


@register(
    "c2_int_bucket",
    oracle="""
    SELECT CAST(FLOOR(l_orderkey / 1000) AS BIGINT) AS bucket, COUNT(*) AS n_rows
    FROM lineitem GROUP BY 1
    """,
    doc="C2: 1M-id partition bucketing (ingest_mysql_data.py:452-477) — the "
    "reference's per-row df.apply becomes codegen'd arithmetic; width 1000 "
    "at test scale per FIXTURES.md.",
)
def c2_int_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("bucket", int_bucket("l_orderkey", 1000))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "c9_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
    doc="C9/§1.2: JSON kept as opaque string in the reference; the Spark "
    "engine exposes access via get_json_object without changing storage.",
)
def c9_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
    )


@register(
    "p3_timestamp_clamp",
    oracle="""
    SELECT date_trunc('day', greatest(least(ts, TIMESTAMP '2024-01-22 00:00:00'),
                                      TIMESTAMP '2024-01-08 00:00:00')) AS clamp_day,
           COUNT(*) AS n_rows
    FROM events GROUP BY 1
    """,
    doc="P3+C11: the pandas-range timestamp clamp (ingest_mysql_data.py:183-189) "
    "as least/greatest — a compat flag in this engine, not a default.",
)
def p3_timestamp_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # bounds INSIDE the fixture's January span so below-lo, pass-through,
    # and above-hi rows all exist (out-of-span bounds would collapse every
    # row into one clamped bucket and leave two branches untested)
    clamped = clamp_timestamp("ts", "2024-01-08 00:00:00", "2024-01-22 00:00:00")
    return (
        events.withColumn("clamp_day", F.date_trunc("day", clamped))
        .groupBy("clamp_day")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# Sorts / set ops / joins (O1, U1, U2/F7, V1)
# ---------------------------------------------------------------------------


@register(
    "o1_sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    doc="O1-O3: global sort + top-k. Spark does a distributed TakeOrdered — "
    "no full sort materialization.",
)
def o1_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "u1_union_append",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_rows
    FROM (SELECT * FROM orders WHERE o_orderstatus = 'O'
          UNION ALL
          SELECT * FROM orders WHERE o_orderstatus = 'F')
    GROUP BY o_orderstatus
    """,
    doc="U1: union/append (pd.concat shapes, update_config.py:317-320) as "
    "unionByName — no shuffle, just plan concatenation.",
)
def u1_union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    open_o = orders.filter(F.col("o_orderstatus") == "O")
    finished = orders.filter(F.col("o_orderstatus") == "F")
    return (
        open_o.unionByName(finished)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "u2_anti_join_new_tables",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderdate >= DATE '2000-01-01')
    """,
    doc="F7/U2: NOT-IN set difference (update_config.py:80-83 discovery "
    "anti-join) as left_anti — at scale a broadcast anti-join when the "
    "right side is small. The right side is the customers with RECENT "
    "orders (dormant-customer shape): every fixture customer has SOME "
    "order, so the unrestricted NOT-IN is empty at every SF and the "
    "oracle check would pass vacuously.",
)
def u2_anti_join_new_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "v1_count_reconciliation",
    oracle="""
    WITH s AS (SELECT user_id, COUNT(*) AS source_count FROM events GROUP BY user_id),
         t AS (SELECT user_id, COUNT(*) AS target_count FROM events
               WHERE value >= 1.0 GROUP BY user_id)
    SELECT coalesce(s.user_id, t.user_id) AS user_id,
           coalesce(source_count, 0) AS source_count,
           coalesce(target_count, 0) AS target_count,
           coalesce(source_count, 0) = coalesce(target_count, 0) AS count_match
    FROM s FULL OUTER JOIN t ON s.user_id = t.user_id
    """,
    doc="V1: source-vs-lake count validation (validators/base_validator.py:32-55) "
    "generalized per-key via full-outer reconcile.",
)
def v1_count_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    target = events.filter(F.col("value") >= 1.0)
    return count_reconciliation(events, target, ["user_id"])
