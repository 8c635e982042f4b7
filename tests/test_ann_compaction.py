"""IVF index compaction (round 9, VERDICT r8 "what's missing" #2).

The incrementally-maintained index accumulates one ``batch={id}/cid={k}``
subtree per micro-batch by design (idempotent retries).  Compaction must:

  - leave the probe RESULT bit-identical (same rows, same bytes — the
    index is a set and compaction only moves files);
  - actually consolidate (≤ one file per cid, vs one per batch × cid);
  - be crash-safe in both directions of the swap window and idempotent
    when re-run.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from collections import Counter

import pytest

from recsys_mapreduce_mrjob_spark.operators.embeddings import centroid_rows
from recsys_mapreduce_mrjob_spark.streaming.twins import (
    compact_ivf_index,
    incremental_ivf_index,
    write_embedding_chunks,
)

SF = "/root/testdata/sf0.001"


def _multiset(df):
    return Counter(
        (r.vec_id, tuple(r.embedding), r.label, r.cid) for r in df.collect()
    )


def _data_files(path: str) -> list[str]:
    return [
        p
        for p in glob.glob(f"{path}/**/*.parquet", recursive=True)
        if os.path.basename(p).startswith("part-")
    ]


@pytest.fixture()
def ingested(spark):
    base = tempfile.mkdtemp(prefix="ann_compact_test_")
    src, state = f"{base}/src", f"{base}/state"
    write_embedding_chunks(spark, SF, src, n_chunks=4)
    index = incremental_ivf_index(spark, src, state, centroid_rows(spark, SF))
    yield spark, index
    shutil.rmtree(base, ignore_errors=True)


def test_compaction_preserves_rows_and_consolidates(ingested):
    spark, index = ingested
    before = _multiset(spark.read.parquet(index))
    files_before = _data_files(index)
    compact_ivf_index(spark, index)
    after = _multiset(spark.read.parquet(index))
    assert after == before
    files_after = _data_files(index)
    # One consolidated file per cid, strictly fewer than batch × cid.
    cids = {os.path.basename(os.path.dirname(p)) for p in files_after}
    assert all(d.startswith("cid=") for d in cids)
    per_cid = Counter(os.path.dirname(p) for p in files_after)
    assert max(per_cid.values()) == 1
    assert len(files_after) < len(files_before)
    # The batch partition layer is PRESERVED and everything merged into
    # the RESERVED id -1 (the stream ended cleanly, so every batch is in
    # the checkpoint commits log and is mergeable).
    compacted = spark.read.parquet(index)
    assert "batch" in compacted.columns
    assert [r.batch for r in compacted.select("batch").distinct().collect()] == [-1]


def test_compaction_is_idempotent(ingested):
    spark, index = ingested
    compact_ivf_index(spark, index)
    once = _multiset(spark.read.parquet(index))
    compact_ivf_index(spark, index)  # re-run on already-compacted layout
    assert _multiset(spark.read.parquet(index)) == once


def test_compaction_rolls_forward_after_crash_between_renames(ingested):
    """Crash window: index renamed away, staging complete but not yet
    renamed in.  The next compaction call must roll FORWARD to the
    staged tree (it carries _SUCCESS) and end bit-identical."""
    spark, index = ingested
    expected = _multiset(spark.read.parquet(index))
    staging = f"{index}.compact_staging"
    displaced = f"{index}.displaced"
    # Reproduce the crash state by hand: staged full compaction (with
    # the publish marker, written last), index displaced, process dies
    # before staging → index.
    from pyspark.sql import functions as F

    idx_df = spark.read.parquet(index)
    data_cols = [c for c in idx_df.columns if c not in ("batch", "cid")]
    idx_df.select(*data_cols, F.lit(-1).alias("batch"), "cid").repartition(
        "cid"
    ).write.partitionBy("batch", "cid").parquet(staging)
    with open(f"{staging}/_COMPACT_PUBLISH_READY", "w") as fh:
        fh.write("")
    os.rename(index, displaced)
    compact_ivf_index(spark, index)
    assert _multiset(spark.read.parquet(index)) == expected
    assert not os.path.exists(staging) and not os.path.exists(displaced)


def test_compaction_rolls_back_after_crash_before_staging_completes(ingested):
    """Crash window: index renamed away but staging has NO _SUCCESS (the
    write died).  Recovery must roll BACK to the displaced tree, then
    rebuild — still ending bit-identical."""
    spark, index = ingested
    expected = _multiset(spark.read.parquet(index))
    staging = f"{index}.compact_staging"
    displaced = f"{index}.displaced"
    os.makedirs(staging)  # partial staging: no _SUCCESS marker
    os.rename(index, displaced)
    compact_ivf_index(spark, index)
    assert _multiset(spark.read.parquet(index)) == expected
    assert not os.path.exists(staging) and not os.path.exists(displaced)


def test_compaction_missing_everything_raises(spark):
    with pytest.raises(FileNotFoundError):
        compact_ivf_index(spark, tempfile.mkdtemp() + "/nonexistent_index")


def test_ingest_resumes_after_compaction(spark, ingested):
    """Round-9 regression: compaction must leave the table writable by a
    RESUMED ingest stream.  The first formulation dropped the batch=
    partition layer, so the next micro-batch created a mixed-depth
    layout that parquet partition discovery rejects
    (CONFLICTING_PARTITION_COLUMN_NAMES) — the compacted tree keeps one
    batch={max committed id} subtree instead."""
    spark_, index = ingested
    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.operators.embeddings import centroid_rows
    from recsys_mapreduce_mrjob_spark.sources.readers import load_table

    base = os.path.dirname(os.path.dirname(index))  # {base}/state/index
    src = f"{base}/src"
    before = _multiset(spark.read.parquet(index))
    compact_ivf_index(spark, index)
    # Resume: a fifth chunk (vec_id % 4 == 0 rows re-keyed to be new) —
    # simplest honest continuation is re-feeding one more file through
    # the SAME checkpoint, which assigns it the next batch id.
    emb = load_table(spark, SF, "embeddings")
    extra = emb.withColumn("vec_id", F.col("vec_id") + F.lit(10_000_000))
    extra.coalesce(1).write.mode("append").parquet(src)
    index2 = incremental_ivf_index(
        spark, src, f"{base}/state", centroid_rows(spark, SF)
    )
    after = _multiset(spark.read.parquet(index2))  # must not raise
    assert sum(after.values()) == sum(before.values()) + extra.count()
    # Probe layer still prunes: the cid filter works on the mixed
    # (compacted subtree + new batch subtree) table.
    some_cid = spark.read.parquet(index2).select("cid").first().cid
    assert spark.read.parquet(index2).where(F.col("cid") == some_cid).count() > 0


def test_compaction_never_merges_uncommitted_batches(ingested):
    """Code-review r9 data-loss regression: a batch subtree whose
    checkpoint commit never landed is REPLAYED on resume, and the
    replay's mode('overwrite') of batch={id} must not be able to erase
    consolidated data.  Compaction must leave the uncommitted subtree
    verbatim, merge only committed ids into the reserved batch=-1, and
    survive the replay."""
    spark, index = ingested
    state = os.path.dirname(index)
    commits = f"{state}/_checkpoint/commits"
    ids = sorted(int(f) for f in os.listdir(commits) if f.lstrip("-").isdigit())
    maxb = ids[-1]
    expected = _multiset(spark.read.parquet(index))
    uncommitted_files = sorted(os.listdir(f"{index}/batch={maxb}"))
    uncommitted_rows = _multiset(spark.read.parquet(f"{index}/batch={maxb}"))
    os.remove(f"{commits}/{maxb}")  # simulate crash-before-commit
    compact_ivf_index(spark, index)
    # Full content preserved; uncommitted subtree untouched; the rest in -1.
    assert _multiset(spark.read.parquet(index)) == expected
    assert sorted(os.listdir(f"{index}/batch={maxb}")) == uncommitted_files
    batches = {
        int(d.split("=")[1]) for d in os.listdir(index) if d.startswith("batch=")
    }
    assert batches == {-1, maxb}
    # Simulate the resume replay: overwrite batch={maxb} with its own
    # rows (exactly what the foreachBatch upsert does) — the index must
    # still be complete afterwards.
    src = spark.read.parquet(f"{index}/batch={maxb}")
    replay_rows, replay_schema = src.collect(), src.schema
    spark.createDataFrame(replay_rows, replay_schema).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(f"{index}/batch={maxb}")
    assert _multiset(spark.read.parquet(index)) == expected
    assert _multiset(spark.read.parquet(f"{index}/batch={maxb}")) == uncommitted_rows


def test_compaction_without_commits_log_spares_newest(ingested):
    """With no readable commits log the newest data id is conservatively
    treated as uncommitted: merged = everything older, newest verbatim."""
    import shutil as _shutil

    spark, index = ingested
    state = os.path.dirname(index)
    _shutil.rmtree(f"{state}/_checkpoint/commits")
    expected = _multiset(spark.read.parquet(index))
    compact_ivf_index(spark, index)
    assert _multiset(spark.read.parquet(index)) == expected
    batches = {
        int(d.split("=")[1]) for d in os.listdir(index) if d.startswith("batch=")
    }
    assert -1 in batches and len(batches) == 2


def test_compaction_recovers_from_stale_staging_with_index_present(ingested):
    """Crash window 1 of the swap matrix: staging written (even fully,
    marker included) but the index was never renamed away.  A re-run
    must DISCARD the stale staging (never trust a partial artifact —
    the index may have gained batches since) and rebuild from scratch."""
    spark, index = ingested
    expected = _multiset(spark.read.parquet(index))
    staging = f"{index}.compact_staging"
    os.makedirs(staging)
    with open(f"{staging}/_COMPACT_PUBLISH_READY", "w") as fh:
        fh.write("")  # even a 'complete' marker must not be trusted here
    compact_ivf_index(spark, index)
    assert _multiset(spark.read.parquet(index)) == expected
    assert not os.path.exists(staging)


def test_compaction_recovers_from_leftover_displaced_tree(ingested):
    """Crash window 4: swap finished but the displaced old tree was
    never deleted.  A re-run must drop it and leave the index intact."""
    spark, index = ingested
    compact_ivf_index(spark, index)
    expected = _multiset(spark.read.parquet(index))
    displaced = f"{index}.displaced"
    os.makedirs(displaced)
    with open(f"{displaced}/leftover", "w") as fh:
        fh.write("old tree remnant")
    compact_ivf_index(spark, index)
    assert _multiset(spark.read.parquet(index)) == expected
    assert not os.path.exists(displaced)


def test_batch_probe_identical_across_index_layouts(ingested):
    """The round-10 batched probe must answer identically from the
    streamed per-batch layout, the compacted layout, and the one-shot
    session index — the layouts differ only in file arrangement, never
    in the relation (the invariant the single-probe queries already pin,
    extended to the multi-probe path)."""
    from recsys_mapreduce_mrjob_spark.operators.embeddings import (
        batch_probe_ivf,
        ivf_index_dir,
    )

    spark, index = ingested

    def rows(path: str):
        return sorted(
            map(tuple, batch_probe_ivf(spark, SF, spark.read.parquet(path), 8).collect())
        )

    streamed = rows(index)
    assert streamed, "batched probe returned nothing"
    compact_ivf_index(spark, index)
    assert rows(index) == streamed
    assert rows(ivf_index_dir(spark, SF)) == streamed
