"""Fourth wave of join-shape coverage: the remaining partsupp-dependent
TPC-H shapes (Q9, Q16, Q20), adapted to the fixture schema. The fixtures
carry no partsupp table, so:

- Q9's ``ps_supplycost`` is replaced by a deterministic stand-in,
  ``0.6 * p_retailprice`` (a fixed margin — the join/aggregate shape is
  the point, and both engines compute the identical expression);
- Q16's supplier-complaint exclusion becomes ``s_acctbal < 0``
  (fixtures carry no s_comment);
- Q20's ``ps_availqty > 0.5 * yearly shipped qty`` becomes
  "more than half of the (part, supplier)'s all-time quantity shipped
  in 1996" — the same correlated-aggregate-threshold shape built from
  columns the fixtures have.

Determinism: money math is exact decimal with TIGHT precisions so no
product exceeds decimal(38) and neither engine rounds (l_quantity and
the threshold comparison in q20 are integer-valued doubles, exact at
any summation order). Reference pendant: none (the reference has no
joins — SURVEY.md §2.4 is beyond-reference coverage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .registry import register


@register(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                        * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))
                    - CAST(0.6 AS DECIMAL(2,1))
                        * CAST(p_retailprice AS DECIMAL(8,4))
                        * CAST(l_quantity AS DECIMAL(6,1))) AS DOUBLE) AS sum_profit
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation ON n_nationkey = s_nationkey
                  JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE 'small%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: product-line profit per nation per year — a "
    "5-way join where THREE dims broadcast (part filtered by name, "
    "supplier, nation) and the only real shuffle is lineitem⋈orders on "
    "orderkey + the final group-by. Supply cost is the deterministic "
    "stand-in 0.6*p_retailprice (no partsupp in fixtures). All money "
    "math in tight exact decimals: (12,4)*(5,4)→(18,8) and "
    "(2,1)*(8,4)*(6,1)→(17,6) both stay far under decimal(38), so "
    "neither engine rounds and the value-hash matches bit-exactly.",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    ext = F.col("l_extendedprice").cast("decimal(12,4)")
    disc = F.col("l_discount").cast("decimal(5,4)")
    one = F.lit(1).cast("decimal(5,4)")
    cost = (
        F.lit("0.6").cast("decimal(2,1)")
        * F.col("p_retailprice").cast("decimal(8,4)")
        * F.col("l_quantity").cast("decimal(6,1)")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(ext * (one - disc) - cost).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct-supplier variety per part segment with "
    "a NOT-IN supplier blacklist (acctbal<0 stands in for complaints; the "
    "distinct (l_partkey,l_suppkey) pairs of lineitem stand in for "
    "partsupp). Spark: the part filter and the tiny blacklist both "
    "broadcast (left_anti), and the single countDistinct plans as a "
    "two-phase partial aggregate on (group, suppkey) — no Expand, one "
    "fact shuffle. NOT-IN needs no null guard here: s_suppkey is a "
    "non-null key on both engines.",
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(
            F.broadcast(bad_supp),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_half_volume_suppliers",
    oracle="""
    WITH agg AS (
      SELECT l_partkey, l_suppkey,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                      THEN l_quantity ELSE 0 END) AS qty_96,
             SUM(l_quantity) AS qty_all
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'small%')
      GROUP BY l_partkey, l_suppkey)
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name IN ('NATION_3', 'NATION_7'))
      AND s_suppkey IN (SELECT l_suppkey FROM agg
                        WHERE 2 * qty_96 > qty_all)
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape: nested semi-join chain with a correlated "
    "aggregate threshold — suppliers (in two nations) who shipped more "
    "than half of a small-part's all-time (part,supplier) volume during "
    "1996. availqty does not exist in fixtures, so the threshold is the "
    "all-time quantity of the SAME (part,supplier) — the same "
    "aggregate-then-compare decorrelation. Spark: part ids broadcast "
    "semi-join prunes the fact before the one groupBy shuffle; the "
    "threshold is multiplied through (2*qty_96 > qty_all — quantities "
    "are integer-valued, sums exact in double); the supplier probe is a "
    "left_semi against the distinct qualifying suppkeys.",
)
def q20_half_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part_ids = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    nation_ids = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    ).select("n_nationkey")
    supplier = load_table(spark, sf_dir, "supplier")
    in_96 = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qualifying = (
        li.join(
            F.broadcast(part_ids),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in_96, F.col("l_quantity")).otherwise(0.0)).alias("qty_96"),
            F.sum("l_quantity").alias("qty_all"),
        )
        .filter(F.lit(2) * F.col("qty_96") > F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(nation_ids),
            F.col("n_nationkey") == F.col("s_nationkey"),
            "left_semi",
        )
        .join(qualifying, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                 * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))
                 AS value_dec
      FROM lineitem
      WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                            JOIN nation ON n_nationkey = s_nationkey
                          WHERE n_name IN ('NATION_2', 'NATION_11', 'NATION_19'))
      GROUP BY l_partkey)
    SELECT l_partkey AS ps_partkey, CAST(value_dec AS DOUBLE) AS value
    FROM v
    WHERE 2000 * value_dec > (SELECT SUM(value_dec) FROM v)
    ORDER BY value DESC, ps_partkey
    """,
    doc="TPC-H Q11 shape: per-part net value for three nations' suppliers, "
    "kept when it exceeds 1/2000 of the filtered total — a grouped "
    "aggregate compared against a SCALAR subquery over itself. Spark: the "
    "supplier id set broadcasts (semi-join prunes the fact before its one "
    "groupBy shuffle); the global total is a 1-row aggregate broadcast "
    "back over the per-part frame (no driver round-trip, no second fact "
    "scan — the grouped frame is reused for both sides). The threshold is "
    "multiplied through (2000*value > total) so both engines compare "
    "exact decimals, not divided doubles.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    nation_ids = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_11", "NATION_19")
    ).select("n_nationkey")
    supp_ids = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation_ids),
            F.col("n_nationkey") == F.col("s_nationkey"),
            "left_semi",
        )
        .select("s_suppkey")
    )
    ext = F.col("l_extendedprice").cast("decimal(12,4)")
    disc = F.col("l_discount").cast("decimal(5,4)")
    one = F.lit(1).cast("decimal(5,4)")
    v = (
        li.join(
            F.broadcast(supp_ids),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(F.sum(ext * (one - disc)).alias("value_dec"))
        .persist()  # reused by both sides of the threshold comparison
    )
    total = v.agg(F.sum("value_dec").alias("total_dec"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.lit(2000) * F.col("value_dec") > F.col("total_dec"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("value_dec").cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )
