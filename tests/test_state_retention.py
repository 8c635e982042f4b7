"""Version retention for the versioned-state streaming twins (round 9).

`incremental_item_stats` / `incremental_scd2` write one `v{batch_id}`
parquet dir per micro-batch and never delete — correct (the newest
version is the state; old ones are snapshots) but unbounded.
`prune_state_versions` is the retention pass: it must keep the newest
`keep` COMPLETE versions, never count or touch incomplete ones, survive
being killed mid-run (oldest-first deletion), and leave the reader's
answer — the max version — bit-identical.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections import Counter

import pytest

from recsys_mapreduce_mrjob_spark.sources.readers import derive_ratings
from recsys_mapreduce_mrjob_spark.streaming.twins import (
    incremental_item_stats,
    prune_state_versions,
)

SF = "/root/testdata/sf0.001"


def _versions(state_dir: str) -> list[int]:
    return sorted(
        int(d[1:])
        for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
    )


def _final_state(spark, state_dir: str) -> Counter:
    from recsys_mapreduce_mrjob_spark.streaming.twins import read_bucketed_state

    return Counter(
        tuple(r) for r in read_bucketed_state(spark, state_dir).collect()
    )


@pytest.fixture()
def stats_state(spark):
    base = tempfile.mkdtemp(prefix="retention_")
    src, state = f"{base}/src", f"{base}/state"
    derive_ratings(spark, SF).repartition(4).write.parquet(src)
    incremental_item_stats(spark, src, state)
    yield spark, state
    shutil.rmtree(base, ignore_errors=True)


def test_prune_keeps_newest_and_preserves_reader_answer(stats_state):
    spark, state = stats_state
    before_versions = _versions(state)
    assert len(before_versions) >= 3, "fixture needs a multi-batch run"
    answer = _final_state(spark, state)
    pruned = prune_state_versions(state, keep=2)
    assert pruned == before_versions[:-2]
    assert _versions(state) == before_versions[-2:]
    assert _final_state(spark, state) == answer


def test_prune_is_idempotent_and_respects_keep(stats_state):
    spark, state = stats_state
    prune_state_versions(state, keep=1)
    assert prune_state_versions(state, keep=1) == []
    assert len(_versions(state)) == 1


def test_prune_never_counts_or_touches_incomplete_versions(stats_state):
    """An in-flight write (no _SUCCESS) must neither satisfy `keep` nor
    be deleted — the writer's overwrite owns it."""
    spark, state = stats_state
    versions = _versions(state)
    inflight = f"{state}/v{versions[-1] + 1}"
    os.makedirs(inflight)  # crashed/in-progress write: no _SUCCESS
    with open(f"{inflight}/part-00000.parquet.tmp", "w") as fh:
        fh.write("partial")
    answer = _final_state_complete(spark, state, versions[-1])
    prune_state_versions(state, keep=1)
    kept = _versions(state)
    # newest COMPLETE version kept, in-flight dir untouched
    assert versions[-1] in kept and versions[-1] + 1 in kept
    assert os.path.exists(f"{inflight}/part-00000.parquet.tmp")
    assert (
        Counter(
            tuple(r)
            for r in spark.read.parquet(f"{state}/v{versions[-1]}").collect()
        )
        == answer
    )


def _final_state_complete(spark, state_dir: str, v: int) -> Counter:
    return Counter(
        tuple(r) for r in spark.read.parquet(f"{state_dir}/v{v}").collect()
    )


def test_prune_keep_must_be_positive(stats_state):
    _, state = stats_state
    with pytest.raises(ValueError):
        prune_state_versions(state, keep=0)


def test_prune_collects_stale_incomplete_orphans(stats_state):
    """A pruner killed mid-rmtree can delete _SUCCESS before the data
    files, leaving an incomplete dir OLDER than every kept version that
    no writer will ever overwrite (ADVICE r9).  Such orphans must be
    collected; incomplete dirs at-or-newer than the oldest kept complete
    version stay untouched (they may be a writer's in-flight batch)."""
    spark, state = stats_state
    versions = _versions(state)
    assert len(versions) >= 3
    # Simulate the half-deleted oldest version: strip its _SUCCESS.
    orphan = f"{state}/v{versions[0]}"
    os.remove(f"{orphan}/_SUCCESS")
    # And a legitimately in-flight NEWER write (no _SUCCESS either).
    inflight = f"{state}/v{versions[-1] + 1}"
    os.makedirs(inflight)
    prune_state_versions(state, keep=2)
    assert not os.path.exists(orphan), "stale incomplete orphan not collected"
    assert os.path.exists(inflight), "in-flight newer write must survive"


def test_flush_feed_rejects_negative_user_ids(spark):
    """The sentinel flush convention reserves negative user_ids; a source
    that legitimately uses them must fail fast instead of having real
    rows silently dropped by the consumers' `user_id >= 0` filter
    (VERDICT r9 wrong-list #4)."""
    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.sources.readers import load_events
    from recsys_mapreduce_mrjob_spark.streaming.twins import (
        stream_events_with_flush,
    )

    base = tempfile.mkdtemp(prefix="negid_")
    try:
        bad_sf = f"{base}/sf"
        os.makedirs(bad_sf)
        load_events(spark, SF).limit(50).withColumn(
            "user_id", -F.col("user_id") - 1
        ).write.parquet(f"{bad_sf}/events.parquet")
        with pytest.raises(ValueError, match="negative"):
            stream_events_with_flush(spark, bad_sf, f"{base}/src")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_flush_feed_rejects_empty_events_table(spark):
    """An empty events table has no max ts to anchor the sentinel flush
    chunks; the feed must fail fast with a named error, not an opaque
    TypeError on the flush_ts arithmetic (ADVICE r9 / VERDICT r10 #3)."""
    from recsys_mapreduce_mrjob_spark.sources.readers import load_events
    from recsys_mapreduce_mrjob_spark.streaming.twins import (
        stream_events_with_flush,
    )

    base = tempfile.mkdtemp(prefix="emptyev_")
    try:
        bad_sf = f"{base}/sf"
        os.makedirs(bad_sf)
        load_events(spark, SF).limit(0).write.parquet(f"{bad_sf}/events.parquet")
        with pytest.raises(ValueError, match="empty"):
            stream_events_with_flush(spark, bad_sf, f"{base}/src")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_prune_preserves_sole_bucket_copies_in_old_versions(spark):
    """Bucketed layout (round 10): a version dir holds only the buckets
    its batch touched, so an OLD version can be the sole live copy of an
    untouched bucket.  Pruning must keep that version (dropping only its
    superseded bucket subtrees) and leave the assembled reader answer
    bit-identical."""
    from recsys_mapreduce_mrjob_spark.streaming.twins import (
        prune_state_versions,
        read_bucketed_state,
    )

    base = tempfile.mkdtemp(prefix="retention_bkt_")
    try:
        state = f"{base}/state"
        # v0 touches buckets {0, 1}; v1 and v2 touch only bucket 0 —
        # bucket 1's sole copy lives in v0 forever.
        spark.createDataFrame(
            [(1, 10, 0), (2, 20, 1)], "item_id long, n long, bkt int"
        ).write.partitionBy("bkt").parquet(f"{state}/v0")
        for v in (1, 2):
            spark.createDataFrame(
                [(1, 10 + v, 0)], "item_id long, n long, bkt int"
            ).write.partitionBy("bkt").parquet(f"{state}/v{v}")
        before = Counter(
            tuple(r) for r in read_bucketed_state(spark, state).collect()
        )
        assert before == Counter({(1, 12), (2, 20)})
        pruned = prune_state_versions(state, keep=1)
        # v0 survives (sole copy of bucket 1) minus its bkt=0 subtree;
        # v1's only bucket is superseded by v2 → whole dir pruned.
        assert pruned == [1]
        assert os.path.isdir(f"{state}/v0/bkt=1")
        assert not os.path.exists(f"{state}/v0/bkt=0")
        assert not os.path.exists(f"{state}/v1")
        assert os.path.isdir(f"{state}/v2/bkt=0")
        after = Counter(
            tuple(r) for r in read_bucketed_state(spark, state).collect()
        )
        assert after == before
        # idempotent
        assert prune_state_versions(state, keep=1) == []
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_reader_ignores_incomplete_versions(spark):
    """A crashed batch leaves a version dir without _SUCCESS; the
    bucketed reader must resolve per-bucket latest over COMPLETE
    versions only — the replayed batch will overwrite the partial."""
    from recsys_mapreduce_mrjob_spark.streaming.twins import (
        read_bucketed_state,
    )

    base = tempfile.mkdtemp(prefix="retention_rd_")
    try:
        state = f"{base}/state"
        spark.createDataFrame(
            [(1, 10, 0)], "item_id long, n long, bkt int"
        ).write.partitionBy("bkt").parquet(f"{state}/v0")
        # Complete newer version for bucket 0, then strip its _SUCCESS:
        # the reader must fall back to v0's copy.
        spark.createDataFrame(
            [(1, 99, 0)], "item_id long, n long, bkt int"
        ).write.partitionBy("bkt").parquet(f"{state}/v1")
        os.remove(f"{state}/v1/_SUCCESS")
        rows = [tuple(r) for r in read_bucketed_state(spark, state).collect()]
        assert rows == [(1, 10)], rows
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_bucket_layout_mismatch_fails_fast(stats_state):
    """A resumed ingest configured with a different bucket count must
    fail at the layout claim, not silently split keys across buckets
    (code-review r10): the state dir records (key, n_buckets) on first
    write and every later writer's claim is checked against it."""
    spark, state = stats_state
    src = state.replace("/state", "/src")
    with pytest.raises(ValueError, match="bucket-layout mismatch"):
        incremental_item_stats(spark, src, state, n_buckets=7)
    # The recorded layout still resumes fine (processes nothing new).
    incremental_item_stats(spark, src, state)


def test_migrate_old_layout_then_resume_ingest(spark):
    """The migration path every mixed-layout guard points at, end to
    end: a pre-bucketing full-layout state rewrites into the bucketed
    layout at the RESERVED version -1, a FRESH ingest stream (batch ids
    restarting at 0) resumes against it — batch 0's replay guard reads
    strictly-below-0, so it sees exactly the migrated state — and the
    final merged state equals the one-shot aggregate over old + new
    data.  Also pins the two refusals: migrating into an existing dir,
    and migrating a dir that already holds bucketed versions."""
    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.streaming.twins import (
        migrate_state_to_bucketed,
        read_bucketed_state,
    )

    def stats(df):
        return df.groupBy("item_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("rating").cast("decimal(20,6)"))
            .cast("decimal(38,6)")
            .alias("rating_sum"),
        )

    base = tempfile.mkdtemp(prefix="migrate_")
    try:
        ratings = derive_ratings(spark, SF)
        part_a = ratings.where(F.col("item_id") % 3 == 0)
        part_b = ratings.where(F.col("item_id") % 3 != 0)
        old, new = f"{base}/old_state", f"{base}/new_state"
        # Pre-bucketing layout: the whole state in one full version dir
        # (arbitrary batch id — only the newest complete one migrates).
        stats(part_a).write.parquet(f"{old}/v5")
        migrate_state_to_bucketed(spark, old, new, key="item_id", n_buckets=8)
        assert os.path.isdir(f"{new}/v-1/bkt=0")
        migrated = Counter(
            tuple(r) for r in read_bucketed_state(spark, new).collect()
        )
        assert migrated == Counter(tuple(r) for r in stats(part_a).collect())
        # Resume: a fresh stream over the remaining data, folding into
        # the migrated dir.
        src_b = f"{base}/src_b"
        part_b.repartition(2).write.parquet(src_b)
        incremental_item_stats(spark, src_b, new, n_buckets=8)
        final = Counter(
            tuple(r) for r in read_bucketed_state(spark, new).collect()
        )
        assert final == Counter(tuple(r) for r in stats(ratings).collect())
        # Refusals: existing target; already-bucketed source.
        with pytest.raises(ValueError, match="already exists"):
            migrate_state_to_bucketed(spark, old, new, key="item_id")
        with pytest.raises(ValueError, match="bucketed version"):
            migrate_state_to_bucketed(
                spark, new, f"{base}/new2", key="item_id"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_reader_handles_pure_old_layout_and_rejects_mixed(spark):
    """A PRE-bucketing state dir (versions with no bkt= subdirs) stays
    readable — newest complete full version wins — while a dir MIXING
    both layouts raises: reconciling a full snapshot with per-bucket
    slices needs the writer's bucket count, so any silent union would
    double-count keys."""
    from recsys_mapreduce_mrjob_spark.streaming.twins import (
        read_bucketed_state,
    )

    base = tempfile.mkdtemp(prefix="retention_mix_")
    try:
        state = f"{base}/state"
        spark.createDataFrame(
            [(1, 10)], "item_id long, n long"
        ).write.parquet(f"{state}/v0")
        spark.createDataFrame(
            [(1, 11)], "item_id long, n long"
        ).write.parquet(f"{state}/v1")
        assert [tuple(r) for r in read_bucketed_state(spark, state).collect()] == [
            (1, 11)
        ]
        spark.createDataFrame(
            [(2, 20, 0)], "item_id long, n long, bkt int"
        ).write.partitionBy("bkt").parquet(f"{state}/v2")
        with pytest.raises(ValueError, match="mixes"):
            read_bucketed_state(spark, state)
    finally:
        shutil.rmtree(base, ignore_errors=True)
