"""Second wave of join-shape coverage: two-sided dimension joins with
derived grouping (Q7), conditional counts over joins (Q12), outer-join
histograms (Q13), scalar-subquery + anti-join (Q22) — adapted to the
fixture schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .registry import register


def _dec(col, scale: int = 4):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


@register(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(date_part('year', l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: the same dimension joined twice (supplier-side and "
    "customer-side nation) with a symmetric pair predicate + year-derived "
    "grouping; both nation copies broadcast.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    one = F.lit(1).cast("decimal(18,4)")
    joined = (
        li.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1.n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2.n_nationkey") == F.col("c_nationkey"))
        .filter(
            # fixture nations are NATION_0..24 (TPC-H names like FRANCE
            # don't exist there — they'd make this query trivially empty)
            ((F.col("n1.n_name") == "NATION_1") & (F.col("n2.n_name") == "NATION_2"))
            | ((F.col("n1.n_name") == "NATION_2") & (F.col("n2.n_name") == "NATION_1"))
        )
    )
    return (
        joined.groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))
               AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH'))
               AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: conditional counting over the fact join "
    "(sum-of-case ≡ FILTER aggregation).",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM
      (SELECT c_custkey, COUNT(o_orderkey) AS c_count
       FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey)
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left-outer join + two-level aggregation — the "
    "orders-per-customer histogram including zero-order customers.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM (SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode, c_acctbal
          FROM customer
          WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                                    / COUNT(*)
                             FROM customer WHERE c_acctbal > 0.0)
            AND c_custkey NOT IN (SELECT o_custkey FROM orders
                                  WHERE o_orderdate >= DATE '2000-01-01'))
    GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape: scalar subquery threshold (computed with a "
    "decimal-exact mean so both engines agree bit-for-bit) + NOT IN "
    "anti-join (vs customers with RECENT orders — the unrestricted form "
    "is empty at every fixture SF) + derived-code grouping.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    row = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("m")
        )
        .first()
    )
    threshold = float(row["m"])
    return (
        customer.filter(F.col("c_acctbal") > threshold)
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select(
            (F.col("c_nationkey") % 10).cast("long").alias("cntrycode"),
            "c_acctbal",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS o_year,
           round(CAST(SUM(CASE WHEN r_name = 'ASIA'
                      THEN CAST(l_extendedprice AS DECIMAL(18,4))
                           * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6)
               AS asia_share
    FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
    GROUP BY 1
    """,
    doc="TPC-H Q8 shape: per-group conditional revenue share (ASIA-supplier "
    "revenue / total) — ratio of two decimal-exact sums, rounded to 6dp.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    one = F.lit(1).cast("decimal(18,4)")
    rev = _dec("l_extendedprice") * (one - _dec("l_discount"))
    asia = F.when(F.col("r_name") == "ASIA", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(asia).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("asia_share")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (SELECT l_suppkey,
                        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                                 * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                            AS total_revenue
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
                 GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15 shape: argmax over an aggregated view via scalar "
    "subquery — equality against MAX is exact because revenues are "
    "decimal-exact doubles.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    one = F.lit(1).cast("decimal(18,4)")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("m"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )
