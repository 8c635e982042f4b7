"""Window functions + top-N (SURVEY.md §2.2.E–F).

The reference has exactly one "window": the R13/R14 re-keying trick where
the similarity value is moved into the MapReduce key so Hadoop's
shuffle-sort delivers each item's neighbors pre-ranked to the reducer
(``calculate_ranking`` / ``top_similar_items``,
moviesSimilarities.py:≈142–175, reconstructed).  A window function is that
trick expressed declaratively — partition = reduce key, ORDER BY = sort
key — and generalizes to ranks, running frames, lag/lead and value-range
frames without one-off re-keying jobs.

Determinism discipline (SURVEY §7.4): every ORDER BY that feeds a
``row_number`` or LIMIT carries a unique tie-break key; rankings order by
ROUNDED measures so float noise between engines can't flip near-ties.

Scale: a window is one shuffle on its partition key.  All windows here
partition on high-cardinality keys (customer, brand, item); none is a
global ORDER BY over the data.  The one global sort, ``q_topn_orders``,
is TakeOrderedAndProject — per-partition top-10 heaps + a 10-row driver
merge, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table


def _round2(c):
    return F.round(c, 2) + F.lit(0.0)


@register(
    "q_window_rank",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) + 0.0 AS o_totalprice,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
       dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
FROM orders
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per customer by order value."""
    orders = load_table(spark, sf_dir, "orders")
    by_price = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    unique = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _round2(F.col("o_totalprice")).alias("o_totalprice"),
        # .cast("long"): Spark ranks are INT, DuckDB's BIGINT — align the
        # arrow type so the driver's schema/value hash sees one integer
        # kind (round-4 arrow-type parity sweep).
        F.row_number().over(unique).cast("long").alias("rn"),
        F.rank().over(by_price).cast("long").alias("rnk"),
        F.dense_rank().over(by_price).cast("long").alias("drnk"),
    )


@register(
    "q_window_running",
    oracle="""
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) + 0.0
           AS running_revenue
FROM orders
""",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) revenue per customer in order-date order.
    The ROWS frame over a unique (date, key) ordering makes each prefix —
    and therefore each cumulative sum — identical across engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        _round2(F.sum("o_totalprice").over(w)).alias("running_revenue"),
    )


@register(
    "q_window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       date_diff('day',
                 lag(CAST(o_orderdate AS DATE)) OVER w,
                 CAST(o_orderdate AS DATE)) AS days_since_prev,
       lead(CAST(o_orderdate AS DATE)) OVER w AS next_orderdate
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day gap to the previous order and date of the next one, per customer."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        d.alias("o_orderdate"),
        F.datediff(d, F.lag(d).over(w)).cast("long").alias("days_since_prev"),
        F.lead(d).over(w).alias("next_orderdate"),
    )


@register(
    "q_window_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) + 0.0 AS o_totalprice,
       round(avg(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice ASC
           RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 6) + 0.0
           AS avg_nearby_price
FROM orders
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: average over orders within $1000 below the
    current order's price.  Range frames are defined by the ORDER BY value,
    not row position, so peers/ties resolve identically in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_totalprice"))
        .rangeBetween(-1000, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _round2(F.col("o_totalprice")).alias("o_totalprice"),
        (F.round(F.avg("o_totalprice").over(w), 6) + F.lit(0.0)).alias(
            "avg_nearby_price"
        ),
    )


@register(
    "q_window_topk_per_group",
    oracle="""
WITH part_rev AS (
    SELECT p.p_brand, l.l_partkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) + 0.0 AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand, l.l_partkey
)
SELECT p_brand, l_partkey, revenue, rn
FROM (SELECT *, row_number() OVER (PARTITION BY p_brand
                                   ORDER BY revenue DESC, l_partkey ASC) AS rn
      FROM part_rev)
WHERE rn <= 5
""",
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 parts by revenue within each brand — the generalized R13/R14
    shape (aggregate → rank in group → keep K).  Ranking is on the ROUNDED
    revenue so engine float noise can't flip near-ties."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_brand"))
    rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(
            _round2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("l_partkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 5)
        .select("p_brand", "l_partkey", "revenue", "rn")
    )


@register(
    "q_topn_orders",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) + 0.0 AS o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
)
def q_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by value.  Physically TakeOrderedAndProject:
    per-partition heaps, no global sort — O(n) scan + O(k) merge at any
    scale.  Unique tie-break (o_orderkey) pins the selected SET."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            _round2(F.col("o_totalprice")).alias("o_totalprice"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
    )


@register(
    "q_window_ntile",
    oracle="""
SELECT o_orderkey, o_custkey,
       ntile(4) OVER w AS price_quartile,
       round(percent_rank() OVER w, 6) + 0.0 AS pct_rank,
       round(cume_dist() OVER w, 6) + 0.0 AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
""",
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile assignment, percent rank,
    cumulative distribution per order status — unique (price, key)
    ordering makes every tile boundary identical across engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
        (F.round(F.percent_rank().over(w), 6) + F.lit(0.0)).alias("pct_rank"),
        (F.round(F.cume_dist().over(w), 6) + F.lit(0.0)).alias("cume"),
    )


@register(
    "q_window_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
       count(*) OVER (PARTITION BY o_custkey) AS n_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / unbounded count frames — last_value over
    the FULL frame (the default running frame is the classic silent-wrong
    trap both engines share)."""
    orders = load_table(spark, sf_dir, "orders")
    ordered = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    full = ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(ordered).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_custkey"))
        .alias("n_orders"),
    )
