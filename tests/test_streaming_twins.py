"""Batch/streaming agreement: each §J streaming twin, drained to
end-of-input, must produce exactly the batch operator's answer.

This pins the engine's core streaming claim (SURVEY §1.2: "semantics
defined so batch and streaming agree") with real Structured Streaming
executions — watermarks, state store, availableNow trigger — not by
re-running batch code.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from recsys_mapreduce_mrjob_spark import registry
from recsys_mapreduce_mrjob_spark.sources.readers import load_events
from recsys_mapreduce_mrjob_spark.streaming import twins

registry.load_all()


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, sf_dir):
    batch = registry.QUERIES["q_window_tumbling"](spark, sf_dir)
    stream = twins.run_to_memory(
        twins.tumbling_stream(twins.stream_events(spark, sf_dir)), "t_tumbling"
    )
    assert _multiset(stream) == _multiset(batch)


def test_sliding_stream_matches_batch(spark, sf_dir):
    batch = registry.QUERIES["q_window_sliding"](spark, sf_dir)
    stream = twins.run_to_memory(
        twins.sliding_stream(twins.stream_events(spark, sf_dir)), "t_sliding"
    )
    assert _multiset(stream) == _multiset(batch)


def test_session_stream_matches_batch(spark, sf_dir):
    """session_window must reproduce the batch lag+cumsum sessionization:
    same (user, session_start, n_events) triples.  (The streaming window's
    `end` is last_event + gap, while the batch query reports duration =
    last − first, so compare on the shared columns.)"""
    batch = registry.QUERIES["q_window_session"](spark, sf_dir).select(
        "user_id", "session_start", "n_events"
    )
    stream = twins.run_to_memory(
        twins.session_stream(twins.stream_events(spark, sf_dir)), "t_session"
    ).select("user_id", "session_start", "n_events")
    assert _multiset(stream) == _multiset(batch)


def test_dedup_stream_matches_batch(spark, sf_dir):
    batch = registry.QUERIES["q_stateful_dedup_events"](spark, sf_dir)
    stream = twins.run_to_memory(
        twins.dedup_stream(twins.stream_events(spark, sf_dir)),
        "t_dedup",
        output_mode="append",
    )
    assert _multiset(stream) == _multiset(batch)


def test_late_data_filter_is_watermark_consistent(spark, sf_dir):
    """The batch late-data filter keeps exactly the rows a 1-hour
    watermark would still admit at end-of-input: nothing earlier than
    max(ts) − 1 h survives, and the newest row always does."""
    kept = registry.QUERIES["q_late_data_filter"](spark, sf_dir)
    all_events = load_events(spark, sf_dir)
    max_epoch = all_events.agg(
        F.max(F.unix_timestamp("ts")).alias("m")
    ).collect()[0]["m"]
    epochs = [r["ts_epoch"] for r in kept.select("ts_epoch").collect()]
    assert epochs, "late-data filter kept nothing"
    assert min(epochs) >= max_epoch - 3600
    assert max(epochs) == max_epoch


def test_stateful_counter_matches_batch(spark, sf_dir):
    """applyInPandasWithState per-user running totals, drained to
    end-of-input, must equal the batch groupBy aggregate."""
    batch = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.round(F.sum("value"), 4) + F.lit(0.0)).alias("sum_value"),
        )
    )
    stream = twins.run_to_memory(
        twins.stateful_counter_stream(twins.stream_events(spark, sf_dir)),
        "t_stateful",
        output_mode="update",
    )
    assert _multiset(stream) == _multiset(batch)


def test_incremental_item_stats_matches_batch(spark, sf_dir, tmp_path):
    """foreachBatch incremental merge over 3 micro-batches must equal the
    one-shot batch aggregate (additive sufficient statistics)."""
    from recsys_mapreduce_mrjob_spark.sources.readers import derive_ratings

    ratings = derive_ratings(spark, sf_dir)
    src = str(tmp_path / "ratings_src")
    ratings.repartition(3).write.parquet(src)
    state = str(tmp_path / "state")
    twins.incremental_item_stats(spark, src, state)

    import glob as _glob

    versions = sorted(
        int(p.rsplit("v", 1)[1])
        for p in _glob.glob(f"{state}/v*")
        if p.rsplit("v", 1)[1].isdigit()
    )
    assert len(versions) >= 2, f"expected multiple micro-batches, got {versions}"
    final = twins.read_bucketed_state(spark, state).select(
        "item_id", "n", (F.round("rating_sum", 4) + F.lit(0.0)).alias("rating_sum")
    )
    expect = ratings.groupBy("item_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.sum("rating"), 4) + F.lit(0.0)).alias("rating_sum"),
    )
    assert _multiset(final) == _multiset(expect)


def test_enriched_stream_matches_batch(spark, sf_dir):
    """Stream–static broadcast enrichment must agree with the same join +
    aggregate run in batch (per-segment per-type counts and value sums)."""
    from pyspark.sql import functions as F
    from recsys_mapreduce_mrjob_spark.sources.readers import load_events, load_table

    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch = (
        load_events(spark, sf_dir)
        .join(customer, "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    stream = twins.run_to_memory(
        twins.enriched_stream(spark, twins.stream_events(spark, sf_dir), sf_dir),
        "t_enriched",
    )
    assert _multiset(stream) == _multiset(batch)


def test_click_purchase_join_stream_matches_batch(spark, sf_dir):
    """Stream–stream inner join with watermarked time bounds must emit
    exactly the batch self-join's (click, purchase-within-1h) pairs."""
    from pyspark.sql import functions as F
    from recsys_mapreduce_mrjob_spark.sources.readers import load_events

    ev = load_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") > F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "click_id",
            "purchase_id",
            F.col("c_user").alias("user_id"),
            F.unix_timestamp("click_ts").alias("click_epoch"),
            F.unix_timestamp("purchase_ts").alias("purchase_epoch"),
        )
    )
    stream = twins.run_to_memory(
        twins.click_purchase_join_stream(twins.stream_events(spark, sf_dir)),
        "t_ss_join",
        output_mode="append",
    )
    assert stream.count() > 0
    assert _multiset(stream) == _multiset(batch)


def test_left_outer_attribution_null_emission_split_invariant(spark, sf_dir):
    """The LEFT-OUTER stream–stream join's null rows are watermark-DRIVEN
    output (a click's no-purchase row may emit only once the watermark
    closes its match window), so the emitted relation must be invariant
    to how the input is micro-batched — 1 real chunk vs 4 — and equal to
    the batch LEFT JOIN, unattributed clicks included."""
    ev = load_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        F.unix_timestamp("click_ts").alias("click_epoch"),
        F.unix_timestamp("purchase_ts").alias("purchase_epoch"),
    )
    expected = _multiset(batch)
    assert any(t[1] is None for t in expected), "fixture has no unattributed click"
    import shutil
    import tempfile

    results = []
    for n_real_chunks in (1, 4):
        base = tempfile.mkdtemp(prefix=f"attr_outer_{n_real_chunks}_")
        try:
            out = twins.run_to_memory(
                twins.click_purchase_left_outer_stream(
                    twins.stream_events_with_flush(
                        spark, sf_dir, f"{base}/src", n_real_chunks=n_real_chunks
                    )
                ),
                f"t_ss_outer_{n_real_chunks}",
                output_mode="append",
            ).where(F.col("user_id") >= 0)
            results.append(_multiset(out))
        finally:
            shutil.rmtree(base, ignore_errors=True)
    assert results[0] == expected
    assert results[1] == expected


def test_full_outer_attribution_matches_batch_both_directions(spark, sf_dir):
    """FULL-outer: unattributed clicks AND orphan purchases must both
    emit — two-directional watermark-driven finalization — and equal the
    batch FULL JOIN."""
    ev = load_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "fullOuter",
    ).select(
        "click_id",
        "purchase_id",
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        F.unix_timestamp("click_ts").alias("click_epoch"),
        F.unix_timestamp("purchase_ts").alias("purchase_epoch"),
    )
    expected = _multiset(batch)
    assert any(t[1] is None for t in expected), "no unattributed click in fixture"
    assert any(t[0] is None for t in expected), "no orphan purchase in fixture"
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="attr_full_")
    try:
        out = twins.run_to_memory(
            twins.click_purchase_full_outer_stream(
                twins.stream_events_with_flush(
                    spark, sf_dir, f"{base}/src", n_real_chunks=3
                )
            ),
            "t_ss_full_outer",
            output_mode="append",
        ).where(F.col("user_id") >= 0)
        assert _multiset(out) == expected
    finally:
        shutil.rmtree(base, ignore_errors=True)
