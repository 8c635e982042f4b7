"""Set operations (SURVEY.md §2.2.G).

Absent from the reference (its pipeline is a single linear dataflow);
declared because any engine user reaches for UNION/INTERSECT/EXCEPT.
Spark physical notes: UNION ALL is a zero-shuffle concatenation of
children; INTERSECT/EXCEPT plan as left-semi/left-anti joins over
distinct-aggregated inputs (one shuffle each on the compared columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table


@register(
    "q_union_all",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) + 0.0 AS o_totalprice,
       'high' AS bucket
FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT o_orderkey, round(o_totalprice, 2) + 0.0 AS o_totalprice,
       'low' AS bucket
FROM orders WHERE o_totalprice < 10000
""",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two disjoint order slices, tagged by provenance.
    ``unionByName`` = schema-checked concatenation, no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    price = (F.round(F.col("o_totalprice"), 2) + F.lit(0.0)).alias("o_totalprice")
    high = orders.where(F.col("o_totalprice") > 400000).select(
        "o_orderkey", price, F.lit("high").alias("bucket")
    )
    low = orders.where(F.col("o_totalprice") < 10000).select(
        "o_orderkey", price, F.lit("low").alias("bucket")
    )
    return high.unionByName(low)


@register(
    "q_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both 1995 and 1996 (set semantics — Spark
    ``intersect`` ≡ SQL INTERSECT DISTINCT, planned as semi-join)."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.where(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.where(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


@register(
    "q_except",
    oracle="""
SELECT o_custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_totalprice > 300000
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders, minus anyone who ever placed a >$300k order
    (set semantics — ``subtract`` ≡ SQL EXCEPT DISTINCT, planned as an
    anti-join; ``exceptAll`` would keep multiplicity instead)."""
    orders = load_table(spark, sf_dir, "orders")
    all_cust = orders.select("o_custkey")
    big = orders.where(F.col("o_totalprice") > 300000).select("o_custkey")
    return all_cust.subtract(big)
