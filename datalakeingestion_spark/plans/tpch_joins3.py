"""Third wave of join-shape coverage: correlated-aggregate decorrelation
(Q17) and multi-way self semi/anti joins (Q21) — adapted to the fixture
schema (no p_container / l_receiptdate columns, so the filters use the
columns the fixtures have; the plan shapes are the point).

Determinism: the Q17 threshold comparison is multiplied through
(5·qty·cnt < sum) so both engines compare exactly-representable doubles —
no 0.2·avg() division whose rounding could flip boundary rows.
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
    "q17_small_quantity_revenue",
    oracle="""
    WITH pq AS (SELECT l_partkey AS pq_partkey,
                       SUM(l_quantity) AS s, COUNT(*) AS c
                FROM lineitem GROUP BY l_partkey)
    SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / 7.0, 6) AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN pq   ON pq_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND 5.0 * l_quantity * c < s
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part average "
    "quantity) decorrelated into a grouped aggregate + join — the rewrite "
    "Catalyst performs for correlated subqueries. The 'qty < 0.2*avg' "
    "predicate is multiplied through to 5*qty*cnt < sum so the comparison "
    "is exact on both engines (all operands are integer-valued doubles). "
    "Reference pendant: none (no subqueries in the reference); greenfield "
    "relational coverage.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    # Prune the fact FIRST: only lineitems of the brand's parts can survive,
    # and the per-part average over that subset equals the average over the
    # full table (the aggregate is per partkey). Aggregating before pruning
    # would build sums for EVERY part — and broadcasting that frame is
    # |part|-sized at 100 TB. li_b is derived twice (aggregate + probe);
    # both derivations are a brand-pruned broadcast-join scan.
    li_b = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    pq = li_b.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c")
    )
    return (
        li_b.join(pq, F.col("pq_partkey") == F.col("l_partkey"))
        .filter(F.lit(5.0) * F.col("l_quantity") * F.col("c") < F.col("s"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 6).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q2_min_acctbal_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    ranked AS (SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
                      row_number() OVER (
                          PARTITION BY p_partkey
                          ORDER BY s_acctbal, s_suppkey) AS rn
               FROM part
                 JOIN ps ON l_partkey = p_partkey
                 JOIN supplier ON s_suppkey = l_suppkey
               WHERE p_size <= 10)
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
    FROM ranked WHERE rn = 1
    ORDER BY s_acctbal, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape adapted to the fixtures (no partsupp table — the "
    "DISTINCT (l_partkey, l_suppkey) pairs of lineitem stand in for it): "
    "per-part argmin supplier by account balance with total tie-break "
    "(s_acctbal, s_suppkey), deterministic top-100. Spark: the pair "
    "extraction is one dedup shuffle on the fact; suppliers and the "
    "part filter broadcast; the argmin is a WindowGroupLimit-eligible "
    "row_number window.",
)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supplier = load_table(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    joined = (
        ps.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
    )
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_acctbal", "p_partkey")
        .limit(100)
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
    WITH lo AS (SELECT l_orderkey, l_suppkey,
                       l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
                FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                WHERE o_orderstatus = 'F')
    SELECT s_name, COUNT(*) AS numwait
    FROM lo l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM lo l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lo l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins on the fact table "
    "(suppliers who were the SOLE late supplier on a multi-supplier "
    "finished order; 'late' adapted to shipdate > orderdate + 60d — the "
    "fixtures carry no receipt/commit dates). Spark: left_semi + left_anti "
    "with mixed equi/non-equi conditions, hashed on the equi key.",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    lo = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("late"))
    )
    l1 = lo.filter("late").alias("l1")
    l2 = lo.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = lo.filter("late").select("l_orderkey", "l_suppkey").alias("l3")
    waited = (
        # another supplier contributed to the same order …
        l1.join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        # … and no OTHER supplier was late on it
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waited.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "q21_sole_late_supplier_agg",
    oracle="""
    WITH lo AS (SELECT l_orderkey, l_suppkey,
                       l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
                FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                WHERE o_orderstatus = 'F'),
    per_order AS (SELECT l_orderkey,
                         COUNT(DISTINCT l_suppkey) AS n_supp,
                         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END)
                             AS n_late_supp,
                         MAX(CASE WHEN late THEN l_suppkey END) AS late_supp,
                         COUNT(*) FILTER (WHERE late) AS late_lines
                  FROM lo GROUP BY l_orderkey)
    SELECT s_name, CAST(SUM(late_lines) AS BIGINT) AS numwait
    FROM per_order JOIN supplier ON s_suppkey = late_supp
    WHERE n_supp > 1 AND n_late_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="Q21 rewritten Spark-first: the EXISTS/NOT-EXISTS self-joins "
    "shuffle the fact table three times; the same answer falls out of ONE "
    "groupBy(l_orderkey) — an order qualifies iff it has >1 distinct "
    "supplier and exactly 1 late supplier, and numwait is that supplier's "
    "late-line count. At 100 TB this is the plan to run (1 fact shuffle + "
    "a tiny per-order aggregate join); the semi/anti sibling exists for "
    "canonical-shape coverage.",
)
def q21_sole_late_supplier_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    lo = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("late"))
    )
    # Two-level aggregate instead of countDistinct: two DISTINCT aggregates
    # would Expand the fact rows 3x before the shuffle. Repartitioning on
    # l_orderkey up front lets BOTH groupBys reuse the same partitioning
    # (hash(ok) clusters (ok, sk) groups too), so the fact table moves
    # exactly once and everything after runs exchange-free.
    per_supp = (
        lo.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max("late").alias("supp_late"),
            F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("supp_late_lines"),
        )
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.when(F.col("supp_late"), 1).otherwise(0)).alias("n_late_supp"),
        F.max(F.when(F.col("supp_late"), F.col("l_suppkey"))).alias("late_supp"),
        F.sum(F.when(F.col("supp_late"), F.col("supp_late_lines")).otherwise(0)).alias(
            "late_lines"
        ),
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.sum("late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
