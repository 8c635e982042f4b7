#!/usr/bin/env python
"""Incremental IVF index INGEST at honest scale (round 8).

BASELINE.md's ANN rung measured the persisted-index QUERY winning (flat
~0.6 s probe at 200k vectors) but left the index BUILD one-shot — the r7
verdict named the missing piece: maintenance cost as the corpus grows.
`q_stream_ann_index_exec` added the foreachBatch upsert path; this tool
measures its scale property at the same 200k-vector rung the query rung
used: per-batch upsert cost must track the BATCH size, not the index
size (the upsert is assignment of the new vectors + an append-shaped
partitioned write of one `batch=` subtree — nothing reads or rewrites
committed cells).

Reports, per corpus size:
  - one-shot build wall (assignment pass + partitioned write — the r7
    shape, rebuilt from scratch);
  - incremental ingest over N equal chunks: total wall, per-batch walls
    (the flat sequence IS the claim), and index-content row parity vs
    the one-shot build.

Round 9 adds the COMPACTION rung (`--compact`): ingest one fixed-size
corpus as B micro-batches for growing B, probe the batch-partitioned
layout and the compacted layout (streaming/twins.py compact_ivf_index),
and report probe wall + files-opened per layout.  The claim under grade:
pre-compaction probe cost grows with batch count (one small file per
batch × probed cell), post-compaction it is FLAT — the lifecycle gap
VERDICT r8 named.

Usage: python tools/bench_ann_ingest.py [n_vectors ...] (default 200000)
       python tools/bench_ann_ingest.py --compact [n_vectors] (default 100000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.bench_ann_scale import build_corpus
from recsys_mapreduce_mrjob_spark.operators.embeddings import (
    _ivf_assign,
    centroid_rows,
)
from recsys_mapreduce_mrjob_spark.session import session_builder
from recsys_mapreduce_mrjob_spark.streaming.twins import (
    compact_ivf_index,
    incremental_ivf_index,
    write_embedding_chunks,
)

N_CHUNKS = 8


def _time_probe(spark, base: str, index_path: str, reps: int = 3) -> dict:
    """Median wall of the full pruned probe (driver probe ranking +
    pruned scan + exact re-rank + top-10) against ``index_path``, plus
    how many data files the probed cells expose in that layout."""
    import glob as _glob

    from recsys_mapreduce_mrjob_spark.operators.embeddings import _ivf_probe
    from recsys_mapreduce_mrjob_spark.streaming.queries import _probe_ivf_table

    probe = _ivf_probe(spark, base)
    if probe is None:
        # Every operator-side probe site guards this; the bench must too
        # (ADVICE r9) — a missing query vector should read as a clear
        # message, not a TypeError subscript.
        raise RuntimeError(
            f"_time_probe: query vector absent from {base}/embeddings.parquet"
            " — cannot rank probe cells for this rung"
        )
    probe_cids = probe[0]
    # recursive '**' also matches zero directories, so this one pattern
    # covers the per-batch, compacted, and flat one-shot layouts alike.
    files = [
        p
        for cid in probe_cids
        for p in _glob.glob(
            f"{index_path}/**/cid={cid}/*.parquet", recursive=True
        )
    ]
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        _probe_ivf_table(spark, base, index_path).collect()
        walls.append(time.monotonic() - t0)
    walls.sort()
    return {
        "probe_sec_med": round(walls[len(walls) // 2], 3),
        "probed_cell_files": len(set(files)),
    }


def run_compact_rung(spark, n: int) -> None:
    """Probe wall vs batch count, pre/post compaction, fixed corpus."""
    results = {}
    for n_batches in (4, 16, 64):
        base = tempfile.mkdtemp(prefix=f"ann_compact_{n_batches}_")
        try:
            build_corpus(spark, n, base)
            cents = centroid_rows(spark, base)
            src, state = f"{base}/src", f"{base}/state"
            write_embedding_chunks(spark, base, src, n_chunks=n_batches)
            index = incremental_ivf_index(spark, src, state, cents)
            pre = _time_probe(spark, base, index)
            t0 = time.monotonic()
            compact_ivf_index(spark, index)
            t_compact = round(time.monotonic() - t0, 3)
            post = _time_probe(spark, base, index)
            results[n_batches] = {
                "pre": pre,
                "post": post,
                "compact_sec": t_compact,
            }
            print(f"batches={n_batches}: {json.dumps(results[n_batches])}",
                  flush=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"mode": "compact", "n_vectors": n, "rungs": results}))


def main() -> None:
    if sys.argv[1:] and sys.argv[1] == "--compact":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        spark = (
            session_builder(
                master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            )
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        run_compact_rung(spark, n)
        spark.stop()
        return
    sizes = [int(a) for a in sys.argv[1:]] or [200_000]
    spark = (
        session_builder(
            master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
            shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        )
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for n in sizes:
        base = tempfile.mkdtemp(prefix=f"ann_ingest_{n}_")
        try:
            build_corpus(spark, n, base)
            cents = centroid_rows(spark, base)

            # One-shot build (the r7 shape, from scratch).
            oneshot_dir = f"{base}/oneshot"
            t0 = time.monotonic()
            _ivf_assign(spark, base).write.mode("overwrite").partitionBy(
                "cid"
            ).parquet(oneshot_dir)
            t_oneshot = round(time.monotonic() - t0, 3)

            # Incremental ingest: the corpus as N_CHUNKS equal files.
            src = f"{base}/src"
            emb = spark.read.parquet(f"{base}/embeddings.parquet")
            for k in range(N_CHUNKS):
                emb.where(
                    F.pmod(F.col("vec_id"), F.lit(N_CHUNKS)) == k
                ).coalesce(1).write.mode("append").parquet(src)
                time.sleep(0.05)  # distinct mtimes order the file source

            state = f"{base}/state"
            marks: list[float] = []
            t0 = time.monotonic()
            index_path = incremental_ivf_index(
                spark,
                src,
                state,
                cents,
                on_batch=lambda b: marks.append(time.monotonic()),
            )
            t_total = round(time.monotonic() - t0, 3)
            marks.append(time.monotonic())
            samples = [
                round(marks[i + 1] - marks[i], 3) for i in range(len(marks) - 1)
            ]
            # The final sample spans from the last on_batch callback to
            # AFTER awaitTermination, so it includes the stream's commit +
            # teardown overhead — report it separately instead of letting
            # it overstate the last batch in the 'per-batch cost tracks
            # batch size' evidence (ADVICE r8).  on_batch itself stays a
            # start-of-batch hook: it doubles as the crash-injection point
            # in tests/test_streaming_resume.py, so moving it after the
            # write would change what 'crash at batch k' means.
            per_batch = samples[:-1]
            last_incl_teardown = samples[-1] if samples else None

            streamed_rows = spark.read.parquet(index_path).count()
            oneshot_rows = spark.read.parquet(oneshot_dir).count()
            results[n] = {
                "oneshot_build_sec": t_oneshot,
                "ingest_total_sec": t_total,
                "ingest_batches": len(samples),
                "per_batch_sec": per_batch,
                "last_batch_sec_incl_teardown": last_incl_teardown,
                "rows_match": streamed_rows == oneshot_rows == n,
            }
            print(f"n={n}: {json.dumps(results[n])}", flush=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"chunks": N_CHUNKS, "rungs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
