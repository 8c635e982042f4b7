"""Aggregation surface (SURVEY.md §2.2.D).

The reference's aggregations are R4 (per-user count/sum) and R6 (pair
sufficient statistics) — both plain group-by reducers
(``count_ratings_users_freq`` / ``calculate_similarity``,
moviesSimilarities.py:≈72–140, reconstructed).  This module generalizes to
the full agg surface: multi-measure hash aggregation, distinct aggregation,
ROLLUP/CUBE/GROUPING SETS, statistical aggregates, and HLL approximate
distinct.  Spark runs every one as partial (map-side) + final hash
aggregation — the combiner the reference's ``pairwise_items`` docstring
wished for — so the shuffle carries one row per (partition × group), not
per input row.

Rounding discipline (SURVEY §7.4): price-magnitude sums round to 2 decimals
(a 1e7-scale double sum legitimately differs across engines' summation
orders at ~1e-4 absolute), averages and second-moment statistics to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table


def _round2(c):
    return F.round(c, 2) + F.lit(0.0)


def _round6(c):
    return F.round(c, 6) + F.lit(0.0)


@register(
    "q_agg_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) + 0.0 AS sum_qty,
       round(sum(l_extendedprice), 2) + 0.0 AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) + 0.0 AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) + 0.0 AS sum_charge,
       round(avg(l_quantity), 6) + 0.0 AS avg_qty,
       round(avg(l_extendedprice), 6) + 0.0 AS avg_price,
       round(avg(l_discount), 6) + 0.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the engine's bread-and-butter multi-measure agg."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _round2(F.sum("l_quantity")).alias("sum_qty"),
            _round2(F.sum("l_extendedprice")).alias("sum_base_price"),
            _round2(F.sum(disc_price)).alias("sum_disc_price"),
            _round2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            _round6(F.avg("l_quantity")).alias("avg_qty"),
            _round6(F.avg("l_extendedprice")).alias("avg_price"),
            _round6(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_distinct",
    oracle="""
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed distinct + plain aggregation (Expand-based two-phase plan)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# Orders joined to their customer's nation/region — the hierarchy the
# multi-level aggregations roll up.  Dims broadcast (KB-scale always).
def _orders_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )


_GEO_ORACLE = """
geo AS (
    SELECT o.*, c.c_mktsegment, n.n_name, r.r_name
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
)
"""


@register(
    "q_agg_rollup",
    oracle=f"""
WITH {_GEO_ORACLE}
SELECT r_name, n_name,
       CAST(grouping(r_name) AS INT) AS grp_r,
       CAST(grouping(n_name) AS INT) AS grp_n,
       round(sum(o_totalprice), 2) + 0.0 AS revenue,
       count(*) AS n_orders
FROM geo
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals region → nation → grand total.  ``grouping()``
    flags disambiguate subtotal NULLs from (hypothetical) data NULLs so the
    oracle hash is unambiguous."""
    return (
        _orders_geo(spark, sf_dir)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("grp_r"),
            F.grouping("n_name").cast("int").alias("grp_n"),
            _round2(F.sum("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("r_name", "n_name", "grp_r", "grp_n", "revenue", "n_orders")
    )


@register(
    "q_agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT) AS grp_s,
       CAST(grouping(o_orderpriority) AS INT) AS grp_p,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) + 0.0 AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2² grouping combinations in one pass (Expand under the hood)."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("grp_s"),
            F.grouping("o_orderpriority").cast("int").alias("grp_p"),
            F.count(F.lit(1)).alias("n_orders"),
            _round2(F.sum("o_totalprice")).alias("revenue"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "grp_s", "grp_p", "n_orders", "revenue"
        )
    )


@register(
    "q_agg_grouping_sets",
    oracle=f"""
WITH {_GEO_ORACLE}
SELECT c_mktsegment, n_name,
       CAST(grouping(c_mktsegment) AS INT) AS grp_seg,
       CAST(grouping(n_name) AS INT) AS grp_nat,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) + 0.0 AS revenue
FROM geo
GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
""",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets: per-segment, per-nation, and grand total —
    three aggregations in one shuffle."""
    return (
        _orders_geo(spark, sf_dir)
        .groupingSets(
            [["c_mktsegment"], ["n_name"], []], "c_mktsegment", "n_name"
        )
        .agg(
            F.grouping("c_mktsegment").cast("int").alias("grp_seg"),
            F.grouping("n_name").cast("int").alias("grp_nat"),
            F.count(F.lit(1)).alias("n_orders"),
            _round2(F.sum("o_totalprice")).alias("revenue"),
        )
        .select("c_mktsegment", "n_name", "grp_seg", "grp_nat", "n_orders", "revenue")
    )


@register(
    "q_agg_stats",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) + 0.0 AS sd_qty,
       round(var_samp(l_quantity), 6) + 0.0 AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS covar_qty_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistical aggregates (builtin, one pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _round6(F.stddev_samp("l_quantity")).alias("sd_qty"),
        _round6(F.var_samp("l_quantity")).alias("var_qty"),
        _round6(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias(
            "covar_qty_price"
        ),
    )


@register("q_agg_approx_distinct")  # rows-only: HLL estimates differ by engine
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB cardinality
    estimator (fixed-size sketch vs count_distinct's exact shuffle).
    Declared rows-only: HLL implementations differ across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )


@register(
    "q_agg_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) + 0.0 AS p50_qty,
       round(quantile_cont(l_quantity, 0.9), 6) + 0.0 AS p90_qty,
       round(quantile_cont(l_extendedprice, 0.99), 6) + 0.0 AS p99_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines implement the same
    linear-interpolation continuous quantile, so this is exact-checkable).
    Exact percentiles need a per-group sort — fine per group; at 100 TB
    the drop-in replacement is ``approx_percentile`` (t-digest sketch,
    one pass, no sort), traded the same way as approx_count_distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _round6(F.percentile("l_quantity", F.lit(0.5))).alias("p50_qty"),
        _round6(F.percentile("l_quantity", F.lit(0.9))).alias("p90_qty"),
        _round6(F.percentile("l_extendedprice", F.lit(0.99))).alias("p99_price"),
    )


_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "q_pivot_events",
    oracle=f"""
SELECT user_id,
       {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY user_id
""",
)
def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: per-user count column per event type.  Explicit
    pivot values (no discovery job, deterministic column order); absent
    combinations coalesced to 0 to match SQL FILTER-count semantics."""
    from ..sources.readers import load_events

    e = load_events(spark, sf_dir)
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    )


@register(
    "q_agg_string_agg",
    oracle="""
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: distinct statuses per priority joined
    in sorted order — collect_set → array_sort → concat_ws, so the result
    is deterministic regardless of row arrival order."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias(
            "statuses"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q_agg_salted_twophase",
    oracle="""
SELECT l_returnflag,
       count(*) AS n_lines,
       round(sum(l_quantity), 2) + 0.0 AS sum_qty,
       round(sum(l_extendedprice), 2) + 0.0 AS sum_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation: the salted two-phase rewrite, exact-result.

    ``l_returnflag`` has 3 values over the whole fact table — the textbook
    hot-key aggregation.  Spark's partial aggregation already blunts it,
    but when per-key state is heavy (collect_list, exact distinct) or AQE
    is off, the standard rewrite is: phase 1 groups by
    ``(key, salt = hash(row) mod 16)`` spreading each hot key over 16
    reducers, phase 2 re-aggregates the 16 partials per key.  The salt is
    a DETERMINISTIC row hash (never rand(): speculative re-execution of a
    rand() salt double-counts rows).  Counts and sums re-combine exactly,
    so the oracle is the plain GROUP BY — the rewrite is invisible in the
    result, visible in the shuffle profile.
    """
    li = load_table(spark, sf_dir, "lineitem")
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(16))
    phase1 = (
        li.groupBy("l_returnflag", salt.alias("salt"))
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("l_quantity").alias("pqty"),
            F.sum("l_extendedprice").alias("pprice"),
        )
    )
    return phase1.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n_lines"),
        _round2(F.sum("pqty")).alias("sum_qty"),
        _round2(F.sum("pprice")).alias("sum_price"),
    )
