"""Bucketed co-located joins: the 100 TB technique for repeated joins on
the same key — write both sides bucketed by the join key, and the join
plans with ZERO exchanges (no shuffle at read time, ever).

This is the engine's answer to DESIGN.md's "reuse a partitioning across
stages": pay the shuffle once at write time, then every downstream join
on that key is exchange-free.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from recsys_mapreduce_mrjob_spark.sources.readers import load_table


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(tmp_path / "orders_b"))
        .saveAsTable("orders_bucketed")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(tmp_path / "customer_b"))
        .saveAsTable("customer_bucketed")
    )
    yield "orders_bucketed", "customer_bucketed"
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    import io
    from contextlib import redirect_stdout

    o_name, c_name = bucketed_tables
    o = spark.table(o_name)
    c = spark.table(c_name)
    # Disable auto-broadcast so the join would otherwise shuffle both sides.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "c_custkey", "o_totalprice"
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert "Bucketed: true" in plan
        # And it computes the same answer as the shuffled join on the raw
        # tables.
        raw = load_table(spark, sf_dir, "orders").join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert joined.count() == raw.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
