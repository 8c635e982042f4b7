"""q_skew_profile → salting-knob integration (VERDICT r6 #8): the
profiled hot keys FEED the targeted salted join, and the rewrite's cost
lands only on the flagged keys.

The uniform demo (`q_join_salted_skew`) replicates the whole build side
n_salt×; `salted_join_hot_keys` scopes replication and probe-side
salting to the profiled list — the shape that matters at 100 TB, where
the build side is too big to multiply for a handful of hot keys.
"""

from __future__ import annotations

import contextlib
import io
from collections import Counter

from pyspark.sql import functions as F

from recsys_mapreduce_mrjob_spark.operators.relational import (
    profile_hot_keys,
    salted_join_hot_keys,
)
from recsys_mapreduce_mrjob_spark.sources.readers import load_events, load_table

N_SALT = 8


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


def _frames(spark, sf_dir):
    events = load_events(spark, sf_dir).select("event_id", "user_id", "event_type")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return events, customer


def test_profiled_hot_keys_drive_targeted_salting_exactly(spark, sf_dir):
    """Wire the diagnostic into the knob end-to-end: profile events.user_id,
    salt only the flagged keys, and the re-aggregated join must be
    bit-identical to the plain join."""
    events, customer = _frames(spark, sf_dir)
    # The fixture's events stream is near-uniform over ~150 users
    # (skew_factor ≈ 1.2-1.3), so the production threshold 2.0 flags
    # nothing; 1.2 flags the genuinely-heaviest keys, which is the wiring
    # under test.
    hot = profile_hot_keys(events.select("user_id"), "user_id", threshold=1.2, top=5)
    assert hot, "fixture profile produced no hot keys at threshold 1.2"

    joined = salted_join_hot_keys(
        events, customer, "user_id", "c_custkey", hot, n_salt=N_SALT
    )
    salted_agg = joined.groupBy("c_custkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )
    plain_agg = (
        events.join(customer, events.user_id == customer.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )
    assert _multiset(salted_agg) == _multiset(plain_agg)


def test_salting_touches_only_flagged_keys(spark, sf_dir):
    """Behavioral scope check: flagged keys spread across >1 salt value
    (their rows land on multiple reducers), cold keys all carry salt 0
    (no replication, no extra reducer keys)."""
    events, customer = _frames(spark, sf_dir)
    hot = profile_hot_keys(events.select("user_id"), "user_id", threshold=1.2, top=5)
    joined = salted_join_hot_keys(
        events, customer, "user_id", "c_custkey", hot, n_salt=N_SALT
    )

    cold_salts = [
        r["salt"]
        for r in joined.where(~F.col("user_id").isin(hot))
        .select("salt")
        .distinct()
        .collect()
    ]
    assert cold_salts == [0], f"cold keys were salted: {sorted(cold_salts)}"
    hot_salts = [
        r["salt"]
        for r in joined.where(F.col("user_id").isin(hot))
        .select("salt")
        .distinct()
        .collect()
    ]
    assert len(hot_salts) > 1, "flagged keys never spread across salts"


def test_targeted_salted_plan_shuffles_on_key_and_salt(spark, sf_dir):
    """Plan audit: the rewrite must take the shuffle path (no broadcast),
    exchange on the composite (key, salt), and the salt expression must
    reference exactly the profiled hot-key literals — the evidence that
    the exchange is salted only for flagged keys."""
    events, customer = _frames(spark, sf_dir)
    hot = profile_hot_keys(events.select("user_id"), "user_id", threshold=1.2, top=5)
    joined = salted_join_hot_keys(
        events, customer, "user_id", "c_custkey", hot, n_salt=N_SALT
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()

    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    exchange_lines = [
        l for l in plan.splitlines() if "hashpartitioning(user_id" in l
    ]
    assert exchange_lines, plan
    assert any("salt" in l for l in exchange_lines), plan
    # The profiled literals gate the salting CASE in the plan text.
    hot_list = ", ".join(str(k) for k in sorted(hot))
    assert f"IN ({hot_list})" in plan or all(str(k) in plan for k in hot), plan


def test_empty_hot_list_degenerates_to_plain_join(spark, sf_dir):
    """No flagged keys (the production-threshold outcome on uniform data)
    → constant salt, no replication, same exact result."""
    events, customer = _frames(spark, sf_dir)
    joined = salted_join_hot_keys(
        events, customer, "user_id", "c_custkey", [], n_salt=N_SALT
    )
    plain = events.join(customer, events.user_id == customer.c_custkey)
    assert joined.count() == plain.count()
    assert [r["salt"] for r in joined.select("salt").distinct().collect()] == [0]
