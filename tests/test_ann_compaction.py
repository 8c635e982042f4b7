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
    # The batch partition layer is PRESERVED (single subtree = the max
    # committed id) so a resumed ingest keeps the layout uniform.
    compacted = spark.read.parquet(index)
    assert "batch" in compacted.columns
    assert compacted.select("batch").distinct().count() == 1


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
    # Reproduce the crash state by hand: staged full compaction, index
    # displaced, process dies before staging → index.
    from pyspark.sql import functions as F

    idx_df = spark.read.parquet(index)
    data_cols = [c for c in idx_df.columns if c not in ("batch", "cid")]
    maxb = idx_df.agg(F.max("batch")).collect()[0][0]
    idx_df.select(*data_cols, F.lit(maxb).alias("batch"), "cid").repartition(
        "cid"
    ).write.partitionBy("batch", "cid").parquet(staging)
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
