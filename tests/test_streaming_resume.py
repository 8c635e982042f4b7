"""Checkpoint crash-resume: the exactly-once claim as a TEST, not a
construction argument (VERDICT r6 #4).

Two failure shapes, both killed after ≥1 committed micro-batch and
restarted from the same checkpoint:

  - ``foreachBatch`` incremental maintenance: a deterministic exception
    INSIDE the batch function (before its state version commits) fails
    the stream; the restart must skip the committed batch, replay only
    the uncommitted ones, and land on a final state bit-identical to the
    one-shot batch aggregate.
  - parquet file sink + stream–stream join: ``query.stop()`` mid-drain
    (join state half-built in the state store); the restart must recover
    the join state from the checkpoint and the sink's ``_spark_metadata``
    commit log must make the read-back exactly-once — the end relation
    equals the batch self-join regardless of where the kill landed.
"""

from __future__ import annotations

import os
import time
from collections import Counter

import pytest
from pyspark.sql import functions as F

from recsys_mapreduce_mrjob_spark.sources.readers import derive_ratings, load_events
from recsys_mapreduce_mrjob_spark.streaming.twins import (
    click_purchase_join_stream,
    incremental_item_stats,
)


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


class _InjectedCrash(RuntimeError):
    pass


def test_foreachbatch_crash_resume_is_exact(spark, sf_dir, tmp_path):
    """Kill the foreachBatch stream after batch 0 commits (exception
    raised at the top of batch 1, before v1 is written); restart from
    the checkpoint; the committed batch must NOT re-run and the final
    merged state must equal the one-shot aggregate exactly."""
    src = str(tmp_path / "ratings_src")
    state = str(tmp_path / "state")
    ratings = derive_ratings(spark, sf_dir)
    ratings.repartition(3).write.parquet(src)

    def crash_on_second(batch_id: int) -> None:
        if batch_id >= 1:
            raise _InjectedCrash(f"injected crash before batch {batch_id} commit")

    # Spark wraps the foreachBatch exception in StreamingQueryException /
    # Py4J layers; asserting on the message keeps the check version-proof.
    with pytest.raises(Exception, match="injected crash"):
        incremental_item_stats(spark, src, state, on_batch=crash_on_second)

    # The crash landed after ≥1 committed micro-batch: v0 exists, and the
    # checkpoint recorded exactly one committed batch.
    assert os.path.isdir(f"{state}/v0"), "batch 0 state version missing"
    commits = [c for c in os.listdir(f"{state}/_checkpoint/commits") if c.isdigit()]
    assert commits == ["0"], f"expected exactly batch 0 committed, got {commits}"

    replayed: list[int] = []
    incremental_item_stats(spark, src, state, on_batch=replayed.append)

    # Exactly-once at foreachBatch granularity: the committed batch is
    # skipped on restart, the uncommitted ones replay.
    assert replayed, "restart processed nothing"
    assert 0 not in replayed, f"committed batch 0 was re-run: {replayed}"

    versions = sorted(
        int(d[1:]) for d in os.listdir(state) if d.startswith("v") and d[1:].isdigit()
    )
    final = spark.read.parquet(f"{state}/v{versions[-1]}")
    oneshot = ratings.groupBy("item_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rating").cast("decimal(20,6)"))
        .cast("decimal(38,6)")
        .alias("rating_sum"),
    )
    assert _multiset(final) == _multiset(oneshot)


def test_parquet_sink_kill_resume_is_exact(spark, sf_dir, tmp_path):
    """Stop a running parquet-sink stream–stream join mid-drain (after
    ≥1 committed micro-batch of 12), restart from the checkpoint, and
    assert the read-back relation equals the batch self-join — the
    sink's _spark_metadata log plus the recovered join state make the
    kill invisible in the result."""
    src = str(tmp_path / "events_src")
    data = str(tmp_path / "sink" / "data")
    ckpt = str(tmp_path / "sink" / "checkpoint")
    ev = load_events(spark, sf_dir)
    # 12 files × maxFilesPerTrigger=1 → 12 micro-batches: the stop lands
    # mid-stream with overwhelming probability, and the join state built
    # from early batches must survive into the resumed run.  The slices
    # are EVENT-TIME ordered and written with strictly increasing mtimes
    # (the file source processes oldest-first): a random split would feed
    # the watermark out of order and the join would legitimately DROP
    # late rows — the registered single-batch drain never advances the
    # watermark mid-data, but a multi-batch replay only matches the batch
    # answer if arrival respects event time, as a real ingest's does.
    from pyspark.sql import Window

    buckets = ev.withColumn(
        "bkt", F.ntile(12).over(Window.orderBy("ts", "event_id"))
    )
    for i in range(1, 13):
        buckets.where(F.col("bkt") == i).drop("bkt").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(0.05)  # distinct mtimes fix the source's file order

    joined_stream = click_purchase_join_stream(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def start():
        return (
            joined_stream.writeStream.format("parquet")
            .option("path", data)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    def committed() -> list[str]:
        try:
            return [c for c in os.listdir(f"{ckpt}/commits") if c.isdigit()]
        except FileNotFoundError:
            return []

    q = start()
    deadline = time.monotonic() + 120
    while not committed():
        assert time.monotonic() < deadline, "no micro-batch committed in 120s"
        assert q.exception() is None, f"stream died before first commit: {q.exception()}"
        time.sleep(0.02)
    q.stop()  # kill mid-drain, ≥1 batch committed
    q.awaitTermination()
    n_at_kill = len(committed())
    assert n_at_kill >= 1

    q2 = start()
    q2.awaitTermination()
    assert len(committed()) > n_at_kill, (
        "restart committed nothing — the kill was not mid-stream "
        f"({n_at_kill} commits at stop)"
    )

    # Batch twin: withWatermark is a no-op on a batch relation, so the
    # same composition IS the batch self-join answer.
    batch = click_purchase_join_stream(ev)
    result = spark.read.schema(batch.schema).parquet(data)
    assert _multiset(result) == _multiset(batch)
