#!/usr/bin/env python
"""Per-batch cost of incremental state maintenance as state grows.

VERDICT r9 "what's missing" #1: the versioned-state twins re-aggregated
and rewrote the WHOLE state every micro-batch — O(|state|) per batch, the
last scale-killer shape in the streaming family.  Round 10 buckets the
state by pmod(xxhash64(key), B) and rewrites only the buckets a batch
touches.  This rung measures exactly that claim, the way
tools/bench_ann_ingest.py measured the IVF upsert: seed the state with S
items (micro-batch 0), then feed N_SMALL fixed-size small batches (~100
items each) and time each one via the on_batch hook deltas.

Two shapes per rung, same source, same end state (asserted):
  - bucketed: n_buckets sized so a bucket holds ~1.5–2k keys (what a
    deployment does — bucket count scales with the dimension, bucket
    SIZE stays constant), so a 100-item batch reads+rewrites ~100
    constant-size buckets regardless of S → per-batch wall FLAT.
  - full-rewrite: n_buckets=1 reproduces the pre-round-10 layout (one
    bucket = the whole state) → per-batch wall grows with S.

Usage: python tools/bench_state_ingest.py            (default ladder)
       python tools/bench_state_ingest.py 100000:64 400000:256
       python tools/bench_state_ingest.py --scd2 200000:256 ...
           (same ladder over incremental_scd2: seed = one event per
           user, then 100-user CDC chunks whose timestamps postdate
           every earlier chunk — the time-ordered contract)
       python tools/bench_state_ingest.py --docs 400000:256 ...
           (same ladder over incremental_doc_dedup: seed = S distinct
           documents, then 100-doc chunks half duplicate / half novel —
           the ingestion gate's real mix; key = md5(text))
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

RUNGS = [(400_000, 256), (1_600_000, 1024), (6_400_000, 4096)]
# Near-dup rungs are smaller in rows but bigger per row: state carries
# each doc's ~38-element hashed-shingle set plus 8 band rows, and the
# seed batch pays the full 32-member minhash derivation over S docs.
# 16× growth across the ladder still answers the flatness question.
NEARDUP_RUNGS = [(10_000, 128), (40_000, 512), (160_000, 2048)]
# full-rewrite (n_buckets=1) comparison cap for --neardup: rewriting a
# state that carries per-doc shingle sets is minutes per batch past
# this S — the growth shape is established on the smaller rungs.
NEARDUP_FULL_REWRITE_MAX = 40_000
N_SMALL = 6
BATCH_ITEMS = 100


def _write_chunk(path: str, items: np.ndarray, mtime: float) -> None:
    n = len(items)
    tbl = pa.table(
        {
            "user_id": pa.array(np.arange(n, dtype=np.int64)),
            "item_id": pa.array(items.astype(np.int64)),
            # Exact multiples of 1e-6 (the DECIMAL(38,6) contract).
            "rating": pa.array((items % 9).astype(np.float64) / 2.0 + 0.5),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def build_source(src: str, s_items: int) -> None:
    """Seed chunk (every item once) + N_SMALL 100-item chunks, mtimes
    strictly increasing so the file source drains them in order."""
    os.makedirs(src)
    t0 = time.time()
    _write_chunk(f"{src}/chunk00.parquet", np.arange(s_items), t0)
    for i in range(N_SMALL):
        items = (7919 * (i + 1) + 104729 * np.arange(BATCH_ITEMS)) % s_items
        _write_chunk(f"{src}/chunk{i + 1:02d}.parquet", items, t0 + i + 1)


def _write_event_chunk(
    path: str, users: np.ndarray, chunk_idx: int, mtime: float
) -> None:
    """One event per user, timestamped AFTER every earlier chunk (the
    incremental_scd2 CDC contract), statuses alternating per chunk so
    runs genuinely extend/close."""
    n = len(users)
    base = np.datetime64("2024-01-01T00:00:00") + np.timedelta64(
        chunk_idx * 3600, "s"
    )
    tbl = pa.table(
        {
            "event_id": pa.array(
                chunk_idx * 100_000_000 + np.arange(n, dtype=np.int64)
            ),
            "ts": pa.array(base + np.arange(n, dtype="timedelta64[s]")),
            "user_id": pa.array(users.astype(np.int64)),
            "event_type": pa.array(
                np.where((users + chunk_idx) % 2 == 0, "click", "view")
            ),
            "value": pa.array(np.ones(n)),
            "props": pa.array([None] * n, type=pa.string()),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def build_event_source(src: str, s_users: int) -> None:
    os.makedirs(src)
    t0 = time.time()
    _write_event_chunk(f"{src}/chunk00.parquet", np.arange(s_users), 0, t0)
    for i in range(N_SMALL):
        users = (7919 * (i + 1) + 104729 * np.arange(BATCH_ITEMS)) % s_users
        _write_event_chunk(
            f"{src}/chunk{i + 1:02d}.parquet", np.unique(users), i + 1, t0 + i + 1
        )


def _write_doc_chunk(
    path: str, doc_ids: np.ndarray, content_ids: np.ndarray, mtime: float
) -> None:
    """Documents whose text is a pure function of ``content_ids`` — reuse
    a content id and the doc is an exact duplicate that must die at the
    ingestion gate; the state key is md5(text), computed on read."""
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids.astype(np.int64)),
            "text": pa.array([f"document body {c}" for c in content_ids]),
            "lang": pa.array(["en"] * len(doc_ids)),
            "source": pa.array(["bench"] * len(doc_ids)),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def build_doc_source(src: str, s_docs: int) -> None:
    """Seed chunk of S distinct documents, then N_SMALL 100-doc chunks:
    half duplicates of seed content (the gate's work), half novel."""
    os.makedirs(src)
    t0 = time.time()
    _write_doc_chunk(
        f"{src}/chunk00.parquet", np.arange(s_docs), np.arange(s_docs), t0
    )
    half = BATCH_ITEMS // 2
    for i in range(N_SMALL):
        dup = (7919 * (i + 1) + 104729 * np.arange(half)) % s_docs
        new = s_docs + i * half + np.arange(half)
        _write_doc_chunk(
            f"{src}/chunk{i + 1:02d}.parquet",
            s_docs + i * BATCH_ITEMS + np.arange(BATCH_ITEMS),
            np.concatenate([dup, new]),
            t0 + i + 1,
        )


def _neardup_text(content_id: int) -> str:
    """~40-token text as a pure function of the content id; near-dup
    variants (see build_neardup_source) share all but the last token —
    3-shingle Jaccard ≈ 0.92, comfortably over the 0.8 gate."""
    return " ".join(f"w{(content_id * 31 + j) % 50_000}" for j in range(40))


def _write_neardup_chunk(
    path: str, doc_ids: np.ndarray, texts: list, mtime: float
) -> None:
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids.astype(np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(doc_ids)),
            "source": pa.array(["bench"] * len(doc_ids)),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def build_neardup_source(src: str, s_docs: int) -> None:
    """Seed chunk of S distinct documents, then N_SMALL 100-doc chunks:
    half NEAR-duplicates of seed content (same 40 tokens, last one
    changed — these must die at the gate via a band-bucket probe of the
    accumulated state), half novel."""
    os.makedirs(src)
    t0 = time.time()
    _write_neardup_chunk(
        f"{src}/chunk00.parquet",
        np.arange(s_docs),
        [_neardup_text(c) for c in range(s_docs)],
        t0,
    )
    half = BATCH_ITEMS // 2
    for i in range(N_SMALL):
        dup = (7919 * (i + 1) + 104729 * np.arange(half)) % s_docs
        texts = [
            _neardup_text(int(c)).rsplit(" ", 1)[0] + " znear" for c in dup
        ] + [
            _neardup_text(s_docs + i * half + j) for j in range(half)
        ]
        _write_neardup_chunk(
            f"{src}/chunk{i + 1:02d}.parquet",
            s_docs + i * BATCH_ITEMS + np.arange(BATCH_ITEMS),
            texts,
            t0 + i + 1,
        )


def run_shape(
    spark, src: str, state: str, n_buckets: int, mode: str = "stats"
) -> dict:
    from recsys_mapreduce_mrjob_spark.streaming.twins import (
        incremental_doc_dedup,
        incremental_item_stats,
        incremental_neardup,
        incremental_scd2,
    )

    fn = {
        "stats": incremental_item_stats,
        "scd2": incremental_scd2,
        "docs": incremental_doc_dedup,
        "neardup": incremental_neardup,
    }[mode]
    stamps: list[tuple[int, float]] = []
    fn(
        spark,
        src,
        state,
        on_batch=lambda bid: stamps.append((bid, time.monotonic())),
        n_buckets=n_buckets,
    )
    end = time.monotonic()
    durs = {
        bid: (stamps[i + 1][1] if i + 1 < len(stamps) else end) - t
        for i, (bid, t) in enumerate(stamps)
    }
    small = sorted(d for bid, d in durs.items() if bid >= 1)
    return {
        "n_batches": len(durs),
        "seed_batch_sec": round(durs.get(0, float("nan")), 3),
        "small_batch_med_sec": round(small[len(small) // 2], 3),
        "small_batch_sec": [round(d, 3) for d in small],
    }


def main() -> None:
    args = sys.argv[1:]
    mode = "stats"
    if "--scd2" in args:
        mode = "scd2"
        args.remove("--scd2")
    if "--docs" in args:
        mode = "docs"
        args.remove("--docs")
    if "--neardup" in args:
        mode = "neardup"
        args.remove("--neardup")
    rungs = (
        [tuple(int(x) for x in a.split(":")) for a in args]
        if args
        else (NEARDUP_RUNGS if mode == "neardup" else RUNGS)
    )

    from recsys_mapreduce_mrjob_spark.session import session_builder
    from recsys_mapreduce_mrjob_spark.streaming.twins import (
        read_bucketed_state,
    )

    spark = (
        session_builder(
            master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
            shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        )
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for s_items, n_buckets in rungs:
        base = tempfile.mkdtemp(prefix=f"state_ingest_{s_items}_")
        try:
            src = f"{base}/src"
            if mode == "stats":
                build_source(src, s_items)
            elif mode == "scd2":
                build_event_source(src, s_items)
            elif mode == "neardup":
                build_neardup_source(src, s_items)
            else:
                build_doc_source(src, s_items)
            out: dict[str, dict] = {"mode": mode}
            states = {}
            shapes = [("bucketed", n_buckets), ("full_rewrite", 1)]
            if mode == "neardup" and s_items > NEARDUP_FULL_REWRITE_MAX:
                shapes = shapes[:1]  # see NEARDUP_FULL_REWRITE_MAX note
            for label, nb in shapes:
                state = f"{base}/state_{label}"
                out[label] = run_shape(spark, src, state, nb, mode)
                out[label]["n_buckets"] = nb
                states[label] = state

            def _state_rows(state: str):
                sub = f"{state}/docs" if mode == "neardup" else state
                df = read_bucketed_state(spark, sub)
                if mode == "neardup":
                    # sh_set is an (order-nondeterministic) array; the
                    # graded projection is the keeper decision.
                    df = df.select("doc_id", "lang", "source", "dropped")
                return sorted(map(tuple, df.collect()))

            rows_a = _state_rows(states["bucketed"])
            if "full_rewrite" in states:
                rows_b = _state_rows(states["full_rewrite"])
                out["end_state_identical"] = rows_a == rows_b
            out["state_rows"] = len(rows_a)
            results[str(s_items)] = out
            print(f"S={s_items}: {json.dumps(out)}", flush=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"rungs": results, "batch_items": BATCH_ITEMS}))
    spark.stop()


if __name__ == "__main__":
    main()
